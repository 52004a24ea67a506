"""Operators: parse / enrich / filter / rewrite / route / aggregate stages.

Each module maps a family from SURVEY.md §2 onto idiomatic PySpark:
every per-message mutation in the reference becomes a vectorized
Column expression (JVM-side, whole-stage-codegen) — pandas/Arrow UDFs
only where column algebra genuinely cannot express the semantics.
"""
