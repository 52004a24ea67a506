"""axosyslog_spark — a PySpark-native log/telemetry analytics engine.

A from-scratch reimplementation of the query & data-processing
capabilities of axoflow/axosyslog (reference: /root/reference, studied
for semantics only) as an idiomatic batch PySpark DataFrame pipeline:

    parse -> enrich -> filter -> rewrite -> route (fan-out) -> aggregate

The unit of data is a *turn* of a multi-turn agent transcript
(conv_id, turn_idx, role, text, tool, ts) — the batch analog of the
reference's unbounded LogMessage stream (lib/logmsg/logmsg.h:241-327).

Design stance (SURVEY.md §7.0): this is NOT a port. There is no pipe
graph, no queues, no flow control — a declarative PipelineSpec compiles
into DataFrame transformations and Catalyst does the physical planning.
Semantics preserved exactly: header-parse field extraction, type-aware
comparison truth table (lib/filter/filter-cmp.c:161-235), route
final/fallback resolution (lib/logmpx.c:97-178), grouping-by with
sorted contexts, enrichment default-selector fallback
(modules/add-contextual-data/add-contextual-data.c:111-137).
"""

__version__ = "0.1.0"
