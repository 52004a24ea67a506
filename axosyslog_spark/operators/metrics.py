"""metrics-probe() / stats analogs: labeled counters as aggregates.

Reference: modules/metrics-probe/metrics-probe.c:93-110 (counter keyed
by label templates, increment() template) and lib/stats/ (per-element
counters). In batch Spark a counter family is a groupBy over the label
columns — map-side partial aggregation makes this a single cheap
shuffle of pre-aggregated partials, linear at any scale.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def metrics_probe(
    df: DataFrame,
    labels: list[str],
    increment: Column | None = None,
    counter_name: str = "n",
) -> DataFrame:
    """Counter keyed by label columns; increment defaults to 1/row."""
    inc = increment if increment is not None else F.lit(1)
    return df.groupBy(*labels).agg(F.sum(inc).alias(counter_name))


def sink_counts(routed: DataFrame) -> DataFrame:
    """Per-sink delivered-row counts — the exact per-sink count gate."""
    return routed.groupBy("sink").agg(F.count(F.lit(1)).alias("n")).orderBy("sink")


def sink_histogram(routed: DataFrame) -> DataFrame:
    """(sink, severity, tool_category) histogram (FIXTURES.md F6)."""
    return (
        routed.groupBy("sink", "severity", "tool_category")
        .agg(F.count(F.lit(1)).alias("n"))
        .orderBy("sink", "severity", "tool_category")
    )
