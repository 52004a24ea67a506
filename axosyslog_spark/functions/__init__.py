"""Scalar function library: template functions, macros, formatters.

Reference: templates compile to per-message evaluators
(lib/template/), ~180 macros (lib/template/macros.c) and the
$(...) template-function registry (modules/basicfuncs/basic-funcs.c).
Here every one of them is a Column expression — evaluated inside
whole-stage codegen, never per-row Python.
"""

from axosyslog_spark.functions.templates import TEMPLATE_FUNCS, macro  # noqa: F401
