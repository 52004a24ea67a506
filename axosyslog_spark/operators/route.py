"""Routing: ordered predicate branches with final / fallback / catch-all.

Reference contract (SURVEY.md §2.6, lib/logmpx.c:77-180 and the
light-framework specs tests/light/functional_tests/logpath/):

  - branches are evaluated in declaration order; each non-fallback
    branch whose predicate matches receives the row (multi-delivery);
  - a matching branch marked ``final`` stops propagation to LATER
    branches (lib/logpipe.h:57, logmpx.c:117-121);
  - a ``fallback`` branch fires iff NO non-fallback branch matched
    (two-phase loop, logmpx.c:97-110).

Spark mapping: everything is column algebra over one pass — per-branch
``delivered_i`` booleans composed with an ``eligible`` running flag,
assembled into a ``routes: array<string>`` column. Fan-out is
``explode(routes)`` — Spark's immutable frames make the reference's
copy-on-write clone (logmsg.h:475-501) free. No shuffle is introduced:
routing is a projection.
"""

from __future__ import annotations

from dataclasses import dataclass, field

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


@dataclass(frozen=True)
class RouteBranch:
    """One log-path branch: predicate -> sink, with logpath flags.

    ``predicate`` may be a Column, a template-condition STRING like
    '("${status}" == "error")' (compiled via functions/
    template_compiler.parse_condition, field names resolving to frame
    columns), or None for pure fallback branches.
    """

    sink: str
    predicate: Column | str | None = None
    final: bool = False
    fallback: bool = False

    def predicate_column(self) -> Column | None:
        if isinstance(self.predicate, str):
            from axosyslog_spark.functions.template_compiler import (
                TemplateContext,
                parse_condition,
            )

            return parse_condition(
                self.predicate, TemplateContext(field_fallback=True)
            )
        return self.predicate


@dataclass(frozen=True)
class RouteSpec:
    branches: tuple[RouteBranch, ...] = field(default_factory=tuple)

    def sinks(self) -> list[str]:
        return [b.sink for b in self.branches]


def route_flags(df: DataFrame, spec: RouteSpec) -> DataFrame:
    """Add one boolean ``__route_<sink>`` column per branch plus
    ``routes: array<string>`` (ordered, deduplicated delivery set)."""
    eligible: Column = F.lit(True)
    delivered: list[tuple[str, Column]] = []
    matched_any: Column = F.lit(False)

    # phase 1: non-fallback branches in declaration order
    for b in spec.branches:
        if b.fallback:
            continue
        p = b.predicate_column()
        pred = p if p is not None else F.lit(True)
        # null predicate result counts as no-match (filter drop semantics,
        # lib/filter/filter-pipe.c:56-87)
        m = F.coalesce(pred, F.lit(False))
        d = eligible & m
        delivered.append((b.sink, d))
        matched_any = matched_any | d
        if b.final:
            eligible = eligible & ~d

    # phase 2: fallback branches fire iff nothing matched in phase 1
    for b in spec.branches:
        if not b.fallback:
            continue
        p = b.predicate_column()
        pred = p if p is not None else F.lit(True)
        m = F.coalesce(pred, F.lit(False))
        delivered.append((b.sink, eligible & ~matched_any & m))

    # ONE projection materializes every delivery boolean (the flags
    # chain through `eligible`/`matched_any`; per-sink withColumns
    # would re-evaluate earlier predicates after project collapse).
    # `routes` is a concat of conditional singleton arrays — NOT
    # filter(array(when...)): higher-order filter inlined under the
    # downstream Generate(explode) runs interpreted per row and
    # measured 2x slower at 5M rows (10.0s vs 4.7s for flags+explode).
    out = df.withColumns({f"__route_{sink}": d for sink, d in delivered})
    empty = F.array().cast("array<string>")
    route_cols = [
        F.when(F.col(f"__route_{sink}"), F.array(F.lit(sink))).otherwise(empty)
        for sink, _ in delivered
    ]
    out = out.withColumn("routes", F.concat(*route_cols))
    return out


def route_explode(df: DataFrame, spec: RouteSpec) -> DataFrame:
    """Fan out: one row per (sink, message). Messages routed nowhere
    vanish (matched=FALSE drop semantics)."""
    flagged = route_flags(df, spec)
    return flagged.withColumn("sink", F.explode("routes")).drop(
        "routes", *[f"__route_{b.sink}" for b in spec.branches]
    )


def sink_frame(df: DataFrame, spec: RouteSpec, sink: str) -> DataFrame:
    """The routed frame for one sink (per-sink write path)."""
    flagged = route_flags(df, spec)
    return flagged.filter(F.col(f"__route_{sink}")).drop(
        "routes", *[f"__route_{b.sink}" for b in spec.branches]
    )


def flagship_route_spec() -> RouteSpec:
    """The F3 route fixture (FIXTURES.md):

      r1 severity<=3                      -> sink_errors
      r2 role='tool' AND risk='high'      -> sink_high_risk   (final)
      r3 tool_category='retrieval'        -> sink_retrieval
      r4 NOT parse_ok                     -> sink_unparsed
      r5 (true)                           -> sink_default     (fallback)
    """
    return RouteSpec(
        branches=(
            RouteBranch("sink_errors", F.col("severity") <= 3),
            RouteBranch(
                "sink_high_risk",
                (F.col("role") == "tool") & (F.col("risk_level") == "high"),
                final=True,
            ),
            RouteBranch("sink_retrieval", F.col("tool_category") == "retrieval"),
            RouteBranch("sink_unparsed", ~F.col("parse_ok")),
            RouteBranch("sink_default", None, fallback=True),
        )
    )
