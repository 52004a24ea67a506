"""The flagship pipeline: parse → enrich → route → aggregate.

This is the end-to-end job the north_star describes. Physical shape
(one Spark job, SURVEY.md §4):

    scan transcripts (parquet/Iceberg; partition prune on ts/conv)
    → parse stage        (pure projections, whole-stage codegen)
    → enrich             (broadcast hash join, no shuffle)
    → route              (projection: per-sink booleans + routes array)
    → per-sink writes    (filter + write, no extra shuffle)
    → aggregates         (groupBy with map-side partials, one exchange)

The routed frame is computed once and persisted before fan-out — the
Spark analog of the reference's copy-on-write clone at the multiplexer
(lib/logmpx.c:86-96): every sink derives from the same materialized
routing pass instead of re-running parse per sink.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame, Observation, SparkSession
from pyspark.sql import functions as F

from axosyslog_spark.operators.enrich import enrich_tools
from axosyslog_spark.operators.metrics import sink_counts, sink_histogram
from axosyslog_spark.operators.parse import parse_stage
from axosyslog_spark.operators.route import (
    RouteSpec,
    flagship_route_spec,
    route_explode,
)


@dataclass
class PipelineResult:
    parsed: DataFrame
    routed: DataFrame          # exploded (sink, …) frame
    counts: DataFrame          # per-sink counts
    histogram: DataFrame       # (sink, severity, tool_category, n)


def run_pipeline(
    spark: SparkSession,
    transcripts: DataFrame,
    spec: RouteSpec | None = None,
) -> PipelineResult:
    """Compose the full flagship pipeline lazily (no action triggered)."""
    spec = spec or flagship_route_spec()
    parsed = enrich_tools(parse_stage(transcripts), spark)
    routed = route_explode(parsed, spec)
    return PipelineResult(
        parsed=parsed,
        routed=routed,
        counts=sink_counts(routed),
        histogram=sink_histogram(routed),
    )


def run_pipeline_observed(
    spark: SparkSession,
    transcripts: DataFrame,
    spec: RouteSpec | None = None,
) -> tuple[DataFrame, Observation]:
    """Pipeline with per-sink counters piggybacked on the SAME pass.

    The reference attaches ingress/egress counters to every named log
    path (lib/cfg-tree.c:1087-1101, lib/stats/) — they update as
    messages flow, costing no extra traversal. Spark's ``observe()``
    is the exact analog: the counter aggregates are computed inside
    whatever action consumes the routed frame (e.g. the sink write),
    so per-sink counts never trigger a second scan of the input.
    """
    spec = spec or flagship_route_spec()
    routed = run_pipeline(spark, transcripts, spec).routed
    obs = Observation("sink_counts")
    aggs = [
        F.sum(F.when(F.col("sink") == s, 1).otherwise(0)).alias(s)
        for s in spec.sinks()
    ] + [F.count(F.lit(1)).alias("__total")]
    return routed.observe(obs, *aggs), obs


def partition_and_sort(
    df: DataFrame, n_partitions: int | None = None
) -> DataFrame:
    """The parallelize() analog + stable-order contract: hash-partition
    by conv_id (lib/logscheduler.c:278-281 hash(key)%N) and sort each
    partition by (conv_id, turn_idx). Use before sink writes so output
    files are clustered by conversation in turn order — the layout the
    per-turn-text-equality gate reads back. sortWithinPartitions is a
    local sort: no extra shuffle beyond the repartition itself."""
    out = (
        df.repartition(n_partitions, "conv_id")
        if n_partitions
        else df.repartition("conv_id")
    )
    return out.sortWithinPartitions("conv_id", "turn_idx")


def write_sinks(
    routed: DataFrame,
    target: str,
    iceberg: bool = False,
    mode: str = "overwrite",
    n_partitions: int | None = None,
) -> None:
    """Per-sink fan-out write in ONE job: the routed frame is clustered
    by conversation (stable (conv_id, turn_idx) order inside every
    file) and split by sink at the file level — no per-sink re-scan,
    no extra shuffle beyond the single conv_id repartition.

    ``iceberg=True`` writes to an Iceberg table identifier via the v2
    writeTo API (partitioned by sink) — the production path of the
    north_star; this sandbox ships no Iceberg catalog, so the default
    is a sink-partitioned parquet directory with identical layout
    semantics (partition column = sink, files ordered per turn).
    """
    ordered = partition_and_sort(routed, n_partitions)
    if iceberg:
        writer = ordered.writeTo(target).using("iceberg").partitionedBy(
            F.col("sink")
        )
        if mode == "overwrite":
            writer.createOrReplace()
        else:
            writer.append()
    else:
        ordered.write.mode(mode).partitionBy("sink").parquet(target)


def routed_output(routed: DataFrame) -> DataFrame:
    """The canonical routed-row output: stable (sink, conv_id, turn_idx)
    identity plus the formatted per-turn text — the routed-row equality
    surface of the correctness gate (per-turn text equality under
    stable ordering)."""
    return routed.select(
        "sink",
        "conv_id",
        "turn_idx",
        "severity",
        F.coalesce("tool_category", F.lit("")).alias("tool_category"),
        "text",
    )
