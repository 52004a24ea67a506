"""Declarative pipeline spec — the config-compile analog.

The reference compiles a syslog-ng.conf into a pipe graph
(lib/cfg-tree.c:982-1170). Our equivalent: a PipelineSpec dataclass a
user assembles in Python; compile() turns it into DataFrame
transformations. No engine state — the spec is the whole "config".

Example ("switch from the reference" shape):

    spec = PipelineSpec(
        patterns=[PdbRule("login", "Accepted @ESTRING:method: @...")],
        lookups=[LookupSpec(key="tool", db_key="tool",
                            columns=("tool_category", "risk_level"),
                            default={"tool_category": "unknown"})],
        routes=RouteSpec(branches=(
            RouteBranch("errors", F.col("severity") <= 3),
            RouteBranch("rest", None, fallback=True),
        )),
        aggregates=[AggSpec(labels=["sink", "severity"])],
    )
    result = spec.compile(spark, transcripts, lookup_dfs={"tool": dim})
"""

from __future__ import annotations

from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession

from axosyslog_spark.operators.enrich import LookupSpec, enrich
from axosyslog_spark.operators.metrics import metrics_probe
from axosyslog_spark.operators.parse import parse_stage
from axosyslog_spark.operators.patterndb import PatternDB, PdbRule
from axosyslog_spark.operators.route import RouteSpec, route_explode


@dataclass(frozen=True)
class AggSpec:
    labels: list[str]
    counter_name: str = "n"


@dataclass
class PipelineSpec:
    """parse → (patterndb) → enrich* → route → aggregate*."""

    routes: RouteSpec
    patterns: list[PdbRule] = field(default_factory=list)
    pattern_source_col: str = "body"
    lookups: list[LookupSpec] = field(default_factory=list)
    aggregates: list[AggSpec] = field(default_factory=list)
    header_parse: bool = True
    # derived columns from template STRINGS ("${HOST} $(fn ...)"),
    # compiled once at plan time; available to routes and aggregates
    templates: dict[str, str] = field(default_factory=dict)
    # a filterx {} block applied after enrich/templates, before routing
    filterx_block: str | None = None

    def compile(
        self,
        spark: SparkSession,
        transcripts: DataFrame,
        lookup_dfs: dict[str, DataFrame] | None = None,
    ) -> "CompiledPipeline":
        df = parse_stage(transcripts) if self.header_parse else transcripts
        if self.patterns:
            df = PatternDB(self.patterns).apply(
                df,
                text_col=self.pattern_source_col,
                with_class=any(r.rule_class for r in self.patterns),
                with_tags=any(r.tags for r in self.patterns),
            )
        for spec in self.lookups:
            db = (lookup_dfs or {})[spec.key]
            df = enrich(df, db, spec)
        if self.templates:
            from axosyslog_spark.functions.template_compiler import (
                TemplateContext,
                compile_template,
                parsed_template_context,
            )

            ctx = (
                parsed_template_context(field_fallback=True)
                if self.header_parse
                else TemplateContext(field_fallback=True)
            )
            df = df.withColumns(
                {name: compile_template(t, ctx) for name, t in self.templates.items()}
            )
        if self.filterx_block:
            from axosyslog_spark.functions.filterx_lang import filterx

            df = filterx(df, self.filterx_block)
        routed = route_explode(df, self.routes)
        aggs = {
            "_".join(a.labels): metrics_probe(routed, a.labels, counter_name=a.counter_name)
            for a in self.aggregates
        }
        return CompiledPipeline(parsed=df, routed=routed, aggregates=aggs)


@dataclass
class CompiledPipeline:
    parsed: DataFrame
    routed: DataFrame
    aggregates: dict[str, DataFrame]


def junction(*frames: DataFrame) -> DataFrame:
    """junction { channel {...} ... } — parallel branches rejoined
    (lib/cfg-tree.c:1188-1287): union by column name."""
    out = frames[0]
    for f in frames[1:]:
        out = out.unionByName(f, allowMissingColumns=True)
    return out
