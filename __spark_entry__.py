"""Driver contract for the spark-graft builder (PySpark target).

entry(spark)   — flagship parse→enrich→route→aggregate pipeline on
                 sf0.001 transcripts (synthesized deterministically
                 from events.parquet, see axosyslog_spark/sources/).
queries()      — one entry per implemented operator (SURVEY.md §2).
oracle_sql()   — DuckDB SQL computing the identical result.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from axosyslog_spark import oracle
from axosyslog_spark.operators import grouping
from axosyslog_spark.operators.enrich import enrich_tools
from axosyslog_spark.operators.parse import parse_stage
from axosyslog_spark.operators.patterndb import PatternDB, PdbRule
from axosyslog_spark.plans.pipeline import routed_output, run_pipeline
from axosyslog_spark.sources.transcripts import (
    TS_FMT_DUCK,
    TS_FMT_SPARK,
    synthesize_transcripts,
)

SF0001 = "/root/testdata/sf0.001"


def _utc(spark: SparkSession) -> SparkSession:
    """Pin session TZ so event-time strings match the naive-UTC oracle."""
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    return spark


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    _utc(spark)
    res = run_pipeline(spark, synthesize_transcripts(spark, SF0001))
    return res.histogram


# ---------------------------------------------------------------------------
# queries: (spark, sf_dir) -> DataFrame
# ---------------------------------------------------------------------------


def _transcripts(spark: SparkSession, sf: str) -> DataFrame:
    return synthesize_transcripts(_utc(spark), sf)


def q_pipe_transcripts(spark: SparkSession, sf: str) -> DataFrame:
    t = _transcripts(spark, sf)
    return t.select(
        "conv_id", "turn_idx", "role", "text", "tool",
        F.date_format("ts", TS_FMT_SPARK).alias("ts_str"),
    )


def q_pipe_parse(spark: SparkSession, sf: str) -> DataFrame:
    p = parse_stage(_transcripts(spark, sf))
    return p.select(
        "conv_id", "turn_idx", "kind", "parse_ok", "pri", "severity",
        "facility", "host", "appname", "procid", "status", "latency_ms",
        "path", "retry", "json_k", "json_event",
    )


def q_pipe_enrich(spark: SparkSession, sf: str) -> DataFrame:
    e = enrich_tools(parse_stage(_transcripts(spark, sf)), spark)
    return e.select(
        "conv_id", "turn_idx", "tool", "tool_category", "risk_level", "owner"
    )


def q_pipe_routed(spark: SparkSession, sf: str) -> DataFrame:
    res = run_pipeline(spark, _transcripts(spark, sf))
    return routed_output(res.routed)


def q_pipe_sink_counts(spark: SparkSession, sf: str) -> DataFrame:
    res = run_pipeline(spark, _transcripts(spark, sf))
    return res.counts


def q_pipe_sink_histogram(spark: SparkSession, sf: str) -> DataFrame:
    res = run_pipeline(spark, _transcripts(spark, sf))
    return res.histogram.select(
        "sink", "severity",
        F.coalesce("tool_category", F.lit("")).alias("tool_category"), "n",
    )


def q_pipe_grouping_by(spark: SparkSession, sf: str) -> DataFrame:
    g = grouping.grouped_ordered_agg(_transcripts(spark, sf))
    return g.select(
        "conv_id", "n_turns",
        F.date_format("first_ts", TS_FMT_SPARK).alias("first_ts"),
        F.date_format("last_ts", TS_FMT_SPARK).alias("last_ts"),
        "agg_values",
    )


def q_pipe_grouping_salted(spark: SparkSession, sf: str) -> DataFrame:
    """Same contract as q_pipe_grouping_by but via the skew-aware
    two-phase aggregation — the oracle SQL is identical, which IS the
    equivalence proof for the salting path."""
    g = grouping.salted_ordered_agg(_transcripts(spark, sf), fragment_rows=8)
    return g.select(
        "conv_id", F.col("n_turns").cast("bigint").alias("n_turns"),
        F.date_format("first_ts", TS_FMT_SPARK).alias("first_ts"),
        F.date_format("last_ts", TS_FMT_SPARK).alias("last_ts"),
        "agg_values",
    )


def q_pipe_sessionize(spark: SparkSession, sf: str) -> DataFrame:
    s = grouping.sessionize(_transcripts(spark, sf), gap_minutes=30.0)
    return s.groupBy("conv_id").agg(
        (F.max("session_id") + 1).cast("bigint").alias("n_sessions")
    )


def q_pipe_suppress(spark: SparkSession, sf: str) -> DataFrame:
    s = grouping.suppress(_transcripts(spark, sf))
    return s.groupBy("conv_id").agg(F.count(F.lit(1)).alias("n_kept"))


def q_pipe_rate_limit(spark: SparkSession, sf: str) -> DataFrame:
    r = grouping.rate_limit(_transcripts(spark, sf), ["conv_id"], max_rows=5)
    return r.select("conv_id", "turn_idx", "role")


def q_pipe_rate_window(spark: SparkSession, sf: str) -> DataFrame:
    """rate-limit(rate(3/86400s)) — the time-replenished windowed
    allowance (first 3 turns per conversation per event-time day),
    vs pipe_rate_limit's whole-batch cap."""
    r = grouping.rate_limit_bucket(
        _transcripts(spark, sf), ["conv_id"], rate=3, window_s=86400
    )
    return r.select("conv_id", "turn_idx", "role")


def q_pipe_format_output(spark: SparkSession, sf: str) -> DataFrame:
    """Bit-exact sink formatting: every routed row re-rendered as an
    RFC5424 line (the template-output contract — per-turn text
    equality under stable (conv_id, turn_idx) order)."""
    from axosyslog_spark.operators.parse import format_rfc5424

    res = run_pipeline(spark, _transcripts(spark, sf))
    line = format_rfc5424(
        F.col("pri"), F.coalesce("msg_ts", "ts"), F.col("host"),
        F.col("appname"), F.col("procid"), F.col("body"),
    )
    return res.routed.select("sink", "conv_id", "turn_idx", line.alias("line"))


def q_pipe_correlate(spark: SparkSession, sf: str) -> DataFrame:
    """Correlation trigger: one synthetic alert row per conversation
    with >= 80 turns (aggregate-only inject mode)."""
    s = grouping.correlate(
        _transcripts(spark, sf),
        value="role",
        trigger=F.col("n_turns") >= 80,
        synthetic_template={
            "text": F.concat(
                F.lit("ALERT conv "), F.col("conv_id"),
                F.lit(" turns="), F.col("n_turns").cast("string"),
            )
        },
        inject_mode="aggregate-only",
    )
    return s.select("conv_id", "turn_idx", "text")


def q_pipe_group_lines(spark: SparkSession, sf: str) -> DataFrame:
    g = grouping.group_lines(_transcripts(spark, sf), sep=" | ")
    return g.select("conv_id", "assembled", "n_lines")


# F4-style pattern rules applied to the parsed message body
PDB_RULES = [
    PdbRule(
        "kv_retry",
        "status=@ESTRING:status: @latency_ms=@NUMBER:latency_ms@ path=@ESTRING:path: @retry=@NUMBER:retry@",
    ),
    PdbRule(
        "kv_plain",
        "status=@ESTRING:status: @latency_ms=@NUMBER:latency_ms@ path=@ESTRING:path:@",
    ),
    PdbRule(
        "badhdr",
        "BADHDR @STRING:bts@ @STRING:bhost@ status=@ESTRING:status: @latency_ms=@NUMBER:latency_ms@",
    ),
    PdbRule("free", "turn about @ESTRING:topic: @with no structure"),
]


def q_pipe_patterndb(spark: SparkSession, sf: str) -> DataFrame:
    from axosyslog_spark.operators.parse import parse_header

    pdb = PatternDB(PDB_RULES)
    p = parse_header(_transcripts(spark, sf))
    out = pdb.apply(p, text_col="body")
    return out.select(
        "conv_id", "turn_idx", "rule_id",
        "status", "latency_ms", "path", "retry", "topic", "bts", "bhost",
    )


def q_pipe_pdb_actions(spark: SparkSession, sf: str) -> DataFrame:
    """PatternDB <actions>: match-triggered synthetic messages
    (pdb-action.c / synthetic-message.c) — every kv_retry match emits
    one synthetic row (alert template + tag) plus a second, condition-
    gated one for error statuses, plus a RATED third (<action
    rate="5/3600">, pdb-ratelimit.c analog: first 5 per correlation
    key per hour-long event-time bucket); originals pass through
    (inject-mode pass-through). The oracle reconstructs the
    classification (hand-written fixture regexes), the synthetic
    multiset, and the rate window (row_number over the same bucket
    and ordering) independently in SQL."""
    from axosyslog_spark.operators.parse import parse_header
    from axosyslog_spark.operators.patterndb import PdbAction

    rules = [
        PdbRule(
            "kv_retry",
            "status=@ESTRING:status: @latency_ms=@NUMBER:latency_ms@ path=@ESTRING:path: @retry=@NUMBER:retry@",
            actions=(
                PdbAction(values=(("alert", "retry ${path}"),), tags=("retried",)),
                PdbAction(
                    condition='"${status}" eq "error"',
                    values=(("alert", "ERROR ${path}"),),
                    tags=("alerted",),
                ),
                PdbAction(
                    rate=5, rate_quantum=3600,
                    values=(("alert", "ratelimited ${path}"),),
                    tags=("rate",),
                ),
            ),
        ),
        *[r for r in PDB_RULES if r.rule_id != "kv_retry"],
    ]
    pdb = PatternDB(rules)
    p = parse_header(_transcripts(spark, sf))
    # unique, oracle-mirrorable within-bucket ordering for the rated
    # action (turn_idx alone repeats across conversations)
    p = p.withColumn(
        "ordk",
        F.concat_ws("#", F.col("conv_id"), F.format_string("%09d", "turn_idx")),
    )
    out = pdb.apply_match_actions(pdb.apply(p, text_col="body"), order_col="ordk")
    return out.select(
        "conv_id", "turn_idx", "rule_id", "synthetic", "alert",
        F.array_join(F.col("pdb_tags"), ",").alias("tags"),
    )


def q_pipe_patterndb_xml(spark: SparkSession, sf: str) -> DataFrame:
    """db-parser() with an XML ruleset: load the packaged pdb document
    (pdb-load.c analog), classify bodies, extract typed fields, render
    <values> templates, surface rule class."""
    from axosyslog_spark.operators.parse import parse_header
    from axosyslog_spark.operators.pdb_load import load_fixture

    [rs] = load_fixture()
    pdb = rs.pattern_db()
    p = parse_header(_transcripts(spark, sf))
    out = pdb.apply(p, text_col="body", with_class=True)
    return out.select(
        "conv_id", "turn_idx", "rule_id", "rule_class",
        "status", "latency_ms", "path", "retry", "topic", "bts", "bhost",
        "status_up", "kv_key", "note",
    )


# ---------------------------------------------------------------------------
# classic operator families over events / documents (oracle-checked)
# ---------------------------------------------------------------------------


def q_op_csv_parse(spark: SparkSession, sf: str) -> DataFrame:
    """csv-parser(): build a csv line from events, parse it back into
    typed columns (greedy last column)."""
    from axosyslog_spark.operators.csvparse import CsvColumn, CsvSpec, csv_parse

    ev = _utc(spark).read.parquet(f"{sf}/events.parquet")
    line = F.concat_ws(
        ",",
        F.col("event_id").cast("string"),
        F.col("event_type"),
        F.col("user_id").cast("string"),
        F.col("props"),
    )
    df = ev.select(F.col("event_id"), line.alias("text"))
    spec = CsvSpec(
        columns=(
            CsvColumn("eid", "bigint"),
            CsvColumn("etype"),
            CsvColumn("uid", "bigint"),
            CsvColumn("rest"),
        ),
        quote=None,
        greedy=True,
    )
    return csv_parse(df, spec).select("event_id", "eid", "etype", "uid", "rest", "csv_ok")


def q_pipe_filterx(spark: SparkSession, sf: str) -> DataFrame:
    """FilterX language block (lib/filterx grammar subset) compiled to
    column algebra and applied to the parsed frame: declare/if/elif/
    else, switch/case/default/break (jump-table fallthrough,
    expr-switch.c), `+=`, string slicing, strptime/strftime, field
    writes, builtin call, bare-expression filter."""
    from axosyslog_spark.functions.filterx_lang import filterx

    p = parse_stage(_transcripts(spark, sf))
    out = filterx(
        p,
        """
        declare slow_ms = 40;
        if ($severity <= 3) {
          $class = "err";
        } elif ($latency_ms > slow_ms) {
          $class = "slow";
        } else {
          $class = "norm";
        };
        $flagged = false;
        switch ($status) {
        case "ok":
          $verdict = "fine";
          break;
        case "error":
          $verdict = "bad";
        default:
          $flagged = true;
        };
        $retry += 1;
        $short = $conv_id[0..8];
        $hh = strftime("%H:%M", strptime(strftime("%Y-%m-%d %H:%M:%S", $ts), "%Y-%m-%d %H:%M:%S"));
        $digest = sha256($conv_id);
        $kind != "free";
        """,
    )
    return out.select(
        "conv_id", "turn_idx", "class", "verdict", "flagged", "retry",
        "short", "hh", "digest",
    )


def q_pipe_smart_multiline(spark: SparkSession, sf: str) -> DataFrame:
    """smart-multi-line(): FSM stack-trace assembly over synthesized
    JVM-trace-shaped turn streams. The oracle derives the expected
    segments independently from the generating rule (lines at
    event_id%5 in {0,3,4} start messages; %5 in {1,2} are frames)."""
    from axosyslog_spark.operators import multiline

    ev = _utc(spark).read.parquet(f"{sf}/events.parquet")
    eid = F.col("event_id")
    line = (
        F.when(eid % 5 == 0, F.concat(F.lit("java.lang.RuntimeException: boom-"),
                                      (eid % 17).cast("string")))
        .when(eid % 5 == 1, F.concat(F.lit("\tat com.example.App.run(App.java:"),
                                     (eid % 97).cast("string"), F.lit(")")))
        .when(eid % 5 == 2, F.concat(F.lit("\tat com.example.Main.main(Main.java:"),
                                     (eid % 89).cast("string"), F.lit(")")))
        .when(eid % 5 == 3, F.concat(F.lit("plain turn "), (eid % 13).cast("string")))
        .otherwise(F.concat(F.lit("another plain "), (eid % 11).cast("string")))
    )
    from pyspark.sql.window import Window

    w = Window.partitionBy("user_id").orderBy("event_id")
    df = ev.select(
        F.concat(F.lit("conv-"), F.lpad(F.col("user_id").cast("string"), 8, "0")).alias("conv_id"),
        (F.row_number().over(w) - 1).cast("int").alias("turn_idx"),
        line.alias("text"),
    )
    out = multiline.smart(df, sep=" // ")
    return out.select("conv_id", "segment_id", "turn_idx", "assembled", "n_lines")


def q_op_sdata_rekey(spark: SparkSession, sf: str) -> DataFrame:
    """RFC5424 SDATA parse + value-pairs rekey transforms over the
    dynamic map (replace-prefix + upper), exploded to rows."""
    from axosyslog_spark.operators.parse import parse_sdata
    from axosyslog_spark.operators.rewrite import value_pairs_rekey_map

    ev = _utc(spark).read.parquet(f"{sf}/events.parquet")
    sd = F.concat(
        F.lit('[meta seq="'), (F.col("event_id") % 1000).cast("string"),
        F.lit('" et="'), F.col("event_type"),
        F.lit('"][origin ip="10.0.0.'), (F.col("user_id") % 250).cast("string"),
        F.lit('"]'),
    )
    df = ev.select("event_id", sd.alias("sd"))
    parsed = parse_sdata(df, "sd")
    rekeyed = value_pairs_rekey_map(
        F.col("sdata"), [("replace-prefix", ".SDATA.", ".sd."), ("upper",)]
    )
    pairs = parsed.select("event_id", F.explode(rekeyed).alias("key", "value"))
    return pairs.select("event_id", "key", "value")


def q_op_audit_parse(spark: SparkSession, sf: str) -> DataFrame:
    """linux-audit-parser over synthesized audit lines: kv map +
    audit(ts:serial) split + hex decode of a hexcoded field."""
    from axosyslog_spark.operators.kvscan import linux_audit_parse

    ev = _utc(spark).read.parquet(f"{sf}/events.parquet")
    # proctitle hex for '/bin/tool -N' (contains a space -> decodes)
    hexpt = F.upper(
        F.hex(F.concat(F.lit("/bin/tool "), (F.col("event_id") % 7).cast("string")).cast("binary"))
    )
    line = F.concat(
        F.lit("type=SYSCALL msg=audit(1700000000."),
        F.lpad((F.col("event_id") % 1000).cast("string"), 3, "0"),
        F.lit(":"), (F.col("event_id") % 100000).cast("string"),
        F.lit('): arch=c000003e comm="tool" proctitle='), hexpt,
    )
    df = ev.select("event_id", line.alias("text"))
    out = linux_audit_parse(df)
    return out.select(
        "event_id",
        "audit_type",
        "audit_serial",
        F.date_format("audit_ts", "yyyy-MM-dd'T'HH:mm:ss").alias("audit_ts_str"),
        F.element_at(F.col("audit"), F.lit("arch")).alias("arch"),
        F.element_at(F.col("audit"), F.lit("comm")).alias("comm"),
        F.element_at(F.col("audit"), F.lit("proctitle")).alias("proctitle"),
    )


def q_op_json_flatten(spark: SparkSession, sf: str) -> DataFrame:
    """Generic JSON flatten over nested documents synthesized from
    events: dotted keys, comma-joined string arrays, depth-3 nesting
    (modules/json/json-parser.c). Oracle computes the expected pairs
    independently per key."""
    from axosyslog_spark.operators.jsonflatten import json_flatten

    ev = _utc(spark).read.parquet(f"{sf}/events.parquet")
    k = F.regexp_extract(F.col("props"), "([0-9]+)", 1)
    line = F.concat(
        F.lit('{"event": {"type": "'), F.col("event_type"),
        F.lit('", "k": '), k,
        F.lit('}, "meta": {"retry": '), (F.col("event_id") % 3).cast("string"),
        F.lit(', "tags": ["t'), (F.col("event_id") % 4).cast("string"),
        F.lit('", "all"], "deep": {"x": {"y": '), (F.col("user_id") % 7).cast("string"),
        F.lit('}}}, "plain": "v'), (F.col("user_id") % 5).cast("string"),
        F.lit('", "ok": true}'),
    )
    df = ev.select("event_id", line.alias("text"))
    out = json_flatten(df)
    pairs = out.select(
        "event_id", F.explode(F.col("jsonf")).alias("key", "value")
    )
    return pairs.select("event_id", "key", "value")


def q_op_template_compile(spark: SparkSession, sf: str) -> DataFrame:
    """Template-string compiler end-to-end: a mixed macro + function +
    default-value template rendered over the parsed transcript frame
    (lib/template/compiler.c semantics, plan-time compilation)."""
    from axosyslog_spark.functions.template_compiler import (
        compile_template,
        parsed_template_context,
    )
    from axosyslog_spark.operators.parse import parse_stage

    p = parse_stage(_transcripts(spark, sf))
    ctx = parsed_template_context(include_fields=["status", "path"])
    tmpl = (
        "<${PRI}> ${HOST:-nohost}/$(uppercase ${PROGRAM:-na}) "
        "sev+100=$(+ ${SEVERITY_NUM} 100) $$literal "
        "head=$(substr ${MSG} 0 12) sha=$(sha256 --length 8 ${MSG}) "
        "st=$(or ${status} unknown) $(if (\"${status}\" == \"error\") BAD OK) "
        "bin=$(binary 0x2D 0x62 0x2D) "
        "fj=$(format-flat-json z.h=${HOST:-nohost} a.p=${PROGRAM:-na})"
    )
    return p.select(
        "conv_id", "turn_idx", compile_template(tmpl, ctx).alias("rendered")
    )


def q_op_patternize(spark: SparkSession, sf: str) -> DataFrame:
    """pdbtool patternize (SLCT clustering,
    modules/correlation/patternize.c) over the raw transcript lines:
    space-delimited, absolute support 30, lexicographic 3-sample set.
    The oracle mirrors the full pipeline — frequent (pos, word) pairs,
    cluster keys with delimiter sequences, support pruning and the
    @ESTRING@ pattern rendering — in independent DuckDB SQL."""
    from axosyslog_spark.operators.patternize import patternize

    out = patternize(
        _transcripts(spark, sf), "text",
        absolute_support=30, delimiters=" ", num_samples=3,
    )
    return out.select(
        "pattern",
        "support",
        F.array_join("samples", "\x1f").alias("samples"),
    )


def q_op_winlog_parse(spark: SparkSession, sf: str) -> DataFrame:
    """windows-eventlog-xml-parser over synthesized Event XML: named
    <Data Name=..> entries promote to per-name keys (even event_ids),
    unnamed ones list-append (odd). The oracle does NOT parse XML —
    it constructs the expected (key, value) pairs straight from the
    source columns, so the parser is checked against an independent
    derivation (modules/xml/windows-eventlog-xml-parser.c)."""
    from axosyslog_spark.operators.xmlparse import windows_eventlog_xml_parser

    ev = _utc(spark).read.parquet(f"{sf}/events.parquet")
    eid = F.col("event_id")
    named = F.concat(
        F.lit("<Data Name='p1'>v"), (eid % 7).cast("string"),
        F.lit("</Data><Data Name='p2'>w"), (eid % 11).cast("string"),
        F.lit("</Data>"),
    )
    unnamed = F.concat(
        F.lit("<Data>x"), (eid % 7).cast("string"),
        F.lit("</Data><Data>y"), (eid % 11).cast("string"), F.lit("</Data>"),
    )
    xml = F.concat(
        F.lit("<Event xmlns='http://schemas.microsoft.com/win/2004/08/events/event'>"
              "<System><EventID>"),
        (eid % 1000).cast("string"),
        F.lit("</EventID><Channel>Application</Channel><Computer>h"),
        (F.col("user_id") % 5).cast("string"),
        F.lit("</Computer></System><EventData>"),
        F.when(eid % 2 == 0, named).otherwise(unnamed),
        F.lit("</EventData></Event>"),
    )
    parsed = windows_eventlog_xml_parser(ev.select("event_id", xml.alias("text")))
    return parsed.select("event_id", F.explode("winlog").alias("key", "value"))


def q_op_macro_expand(spark: SparkSession, sf: str) -> DataFrame:
    """Header/network/identity + week macro family (macros.c:207-230,
    372-376): MSGHDR, TAG, BSDTAG, WEEK_DAY/WEEK, the SOURCEIP/PORT +
    PROTO_NAME non-IP-transport fallbacks, RAWMSG_SIZE and the P_
    (processed) time base rendered over the parsed transcript frame."""
    from axosyslog_spark.functions.template_compiler import (
        compile_template,
        parsed_template_context,
    )
    from axosyslog_spark.operators.parse import parse_stage

    p = parse_stage(_transcripts(spark, sf))
    ctx = parsed_template_context()
    tmpl = (
        "hdr=${MSGHDR}tag=${TAG} bsd=${BSDTAG} wd=${R_WEEK_DAY} wk=${R_WEEK} "
        "src=${SOURCEIP}:${SOURCEPORT} proto=${PROTO_NAME} "
        "raw=${RAWMSG_SIZE} p=${P_ISODATE}"
    )
    return p.select(
        "conv_id", "turn_idx", compile_template(tmpl, ctx).alias("rendered")
    )


def q_op_kv_parse(spark: SparkSession, sf: str) -> DataFrame:
    """Generic kv-scanner over synthesized lines with double/single
    quoted values (spaces inside), a ', ' pair separator and plain
    tokens (lib/scanner/kv-scanner semantics; absorption-free fixture
    so DuckDB's lookahead-less RE2 can mirror it)."""
    from axosyslog_spark.operators.kvscan import kv_scan

    ev = _utc(spark).read.parquet(f"{sf}/events.parquet")
    line = F.concat(
        F.lit('user="u '), F.col("user_id").cast("string"),
        F.lit('" action='), F.col("event_type"),
        F.lit(" path=/v1/"), F.col("event_type"),
        F.lit(" retry="), (F.col("event_id") % 3).cast("string"),
        F.lit(", host=h-"), (F.col("user_id") % 5).cast("string"),
        F.lit(" note='n "), (F.col("event_id") % 7).cast("string"), F.lit("'"),
    )
    df = ev.select("event_id", line.alias("text"))
    pairs = df.select(
        "event_id", F.posexplode(kv_scan(F.col("text"))).alias("pos", "p")
    )
    return pairs.select(
        "event_id",
        F.col("pos").cast("int").alias("pos"),
        F.col("p.key").alias("key"),
        F.col("p.value").alias("value"),
        F.col("p.was_quoted").alias("was_quoted"),
    )


def q_op_date_parse(spark: SparkSession, sf: str) -> DataFrame:
    """date-parser(): multi-format strptime chain."""
    from axosyslog_spark.operators.dateparse import date_parser

    ev = _utc(spark).read.parquet(f"{sf}/events.parquet")
    fmt = (
        F.when(F.col("event_id") % 3 == 0, F.date_format("ts", "yyyy-MM-dd'T'HH:mm:ss"))
        .when(F.col("event_id") % 3 == 1, F.date_format("ts", "yyyy/MM/dd HH:mm:ss"))
        .otherwise(F.date_format("ts", "yyyy-MM-dd"))
    )
    df = ev.select("event_id", fmt.alias("raw"))
    out = date_parser(df, "raw")
    return out.select(
        "event_id", "raw",
        F.date_format("parsed_ts", TS_FMT_SPARK).alias("parsed_str"),
    )


def q_op_geoip_range(spark: SparkSession, sf: str) -> DataFrame:
    """geoip2() analog: ip -> int, broadcast range join on intervals
    (modules/geoip2/geoip-parser.c as interval enrichment)."""
    from axosyslog_spark.operators.filters import ip_to_long

    ev = _utc(spark).read.parquet(f"{sf}/events.parquet")
    ip = F.concat_ws(
        ".",
        F.lit("10"),
        (F.col("user_id") % 200).cast("string"),
        (F.col("event_id") % 250).cast("string"),
        F.lit("1"),
    )
    df = ev.select("event_id", ip.alias("ip"), ip_to_long(ip).alias("ip_num"))
    ranges = spark.createDataFrame(
        GEO_RANGES, "lo bigint, hi bigint, geo_name string"
    )
    joined = df.join(
        F.broadcast(ranges),
        (F.col("ip_num") >= F.col("lo")) & (F.col("ip_num") <= F.col("hi")),
        "left",
    )
    return joined.select(
        "event_id", "ip",
        F.coalesce("geo_name", F.lit("unknown")).alias("geo_name"),
    )


# deterministic interval dimension shared with the oracle SQL
def _geo_ranges() -> list[tuple[int, int, str]]:
    base = 10 * 16777216
    return [
        (base + i * 50 * 65536, base + (i * 50 + 49) * 65536 + 65535, f"region-{i}")
        for i in range(4)
    ]


GEO_RANGES = _geo_ranges()


def q_op_metrics_probe(spark: SparkSession, sf: str) -> DataFrame:
    """metrics-probe(): labeled counters + integer-cents sum."""
    from axosyslog_spark.operators.metrics import metrics_probe

    ev = _utc(spark).read.parquet(f"{sf}/events.parquet")
    ev = ev.withColumn(
        "value_cents", F.floor(F.col("value") * 100 + 0.5).cast("bigint")
    )
    out = metrics_probe(ev, ["event_type"], counter_name="n")
    cents = ev.groupBy("event_type").agg(F.sum("value_cents").alias("cents"))
    return out.join(cents, "event_type").select("event_type", "n", "cents")


def q_op_template_funcs(spark: SparkSession, sf: str) -> DataFrame:
    """string/crypto/path template functions over documents."""
    from axosyslog_spark.functions import templates as tf

    d = _docs(spark, sf)
    path = F.concat(F.lit("/corpus/"), F.col("source"), F.lit("/doc_"),
                    F.col("doc_id").cast("string"), F.lit(".txt"))
    return d.select(
        "doc_id",
        tf.tf_length(F.col("text")).alias("len"),
        tf.tf_substr(F.col("text"), 0, 16).alias("head16"),
        tf.tf_uppercase(F.col("lang")).alias("lang_up"),
        tf.tf_padding(F.col("doc_id").cast("string"), 6, "0").alias("padded"),
        tf.tf_basename(path).alias("base"),
        tf.tf_dirname(path).alias("dir"),
        tf.tf_sha256(F.col("text"), 16).alias("sha16"),
        tf.tf_md5(F.col("text")).alias("md5"),
    )


def q_op_netmask_inlist(spark: SparkSession, sf: str) -> DataFrame:
    """netmask() + in-list() filters composed."""
    from axosyslog_spark.operators.filters import in_list, ip_to_long, netmask

    ev = _utc(spark).read.parquet(f"{sf}/events.parquet")
    ip = F.concat_ws(
        ".", F.lit("10"), (F.col("user_id") % 200).cast("string"),
        (F.col("event_id") % 250).cast("string"), F.lit("1"),
    )
    df = ev.withColumn("ip", ip)
    kept = df.filter(
        netmask(F.col("ip"), "10.64.0.0/10")
        & in_list(F.col("event_type"), ["click", "view", "error"])
    )
    _ = ip_to_long  # (used by netmask internally)
    return kept.groupBy("event_type").agg(F.count(F.lit(1)).alias("n"))


def q_op_subst(spark: SparkSession, sf: str) -> DataFrame:
    """subst() rewrite: global and first-match-only variants."""
    from axosyslog_spark.operators.rewrite import subst

    d = _docs(spark, sf).select("doc_id", "text")
    g = subst(d, "[aeiou]", "_").withColumnRenamed("text", "t_global")
    one = subst(d, "table", "TABLE", global_=False).withColumnRenamed("text", "t_first")
    return g.join(one.select("doc_id", "t_first"), "doc_id").select(
        "doc_id", "t_global", "t_first"
    )


def q_op_cef_parse(spark: SparkSession, sf: str) -> DataFrame:
    """CEF parser over lines synthesized from events (escape-free, so
    the DuckDB oracle can mirror with plain split)."""
    from axosyslog_spark.operators.cef import parse_cef

    ev = _utc(spark).read.parquet(f"{sf}/events.parquet")
    line = F.concat(
        F.lit("CEF:0|AxoCorp|engine|4.26|"), F.col("event_type"),
        F.lit("|User activity|"), (F.col("event_id") % 10).cast("string"),
        F.lit("|src=10.0.0."), (F.col("user_id") % 250).cast("string"),
        F.lit(" act="), F.col("event_type"),
    )
    df = ev.select("event_id", line.alias("text"))
    out = parse_cef(df)
    return out.select(
        "event_id", "cef_ok", "vendor", "product", "event_class",
        "cef_severity",
        F.col("cef_ext")["src"].alias("src"),
        F.col("cef_ext")["act"].alias("act"),
    )


def q_op_filterx_funcs(spark: SparkSession, sf: str) -> DataFrame:
    """Module-provided FilterX builtins driven from a filterx {} block
    (modules/cef/filterx-func-parse-cef.c, modules/csvparser/
    filterx-func-parse-csv.c, modules/xml/filterx-func-format-xml.c):
    CEF lines + CSV rows are synthesized from events, parsed inside the
    block, and re-rendered; the DuckDB oracle constructs every output
    independently, so a parse+format bug cannot cancel out."""
    from axosyslog_spark.functions.filterx_lang import filterx

    ev = _utc(spark).read.parquet(f"{sf}/events.parquet")
    cef = F.concat(
        F.lit("CEF:0|AxoCorp|engine|4.26|"), F.col("event_type"),
        F.lit("|User activity|"), (F.col("event_id") % 10).cast("string"),
        F.lit("|src=10.0.0."), (F.col("user_id") % 250).cast("string"),
        F.lit(" act="), F.col("event_type"),
    )
    csv = F.concat_ws(
        ",",
        F.col("event_id").cast("string"), F.col("event_type"),
        F.col("user_id").cast("string"),
    )
    df = ev.select("event_id", cef.alias("cef_line"), csv.alias("csv_line"))
    out = filterx(
        df,
        """
        $m = parse_cef($cef_line);
        $vendor = $m["device_vendor"];
        $sev = int($m["agent_severity"]);
        $srcact = $m["src"] + "/" + $m["act"];
        $row = parse_csv($csv_line, "eid,etype,uid");
        $xml = format_xml($row);
        $vals = format_csv_values($row, ";");
        """,
    )
    return out.select("event_id", "vendor", "sev", "srcact", "xml", "vals")


def q_op_scl_apache(spark: SparkSession, sf: str) -> DataFrame:
    """SCL application adapter (scl/apache apache-accesslog-parser):
    combined-format access-log lines synthesized from events, parsed
    into the logstash-like schema; the oracle reconstructs every field
    from the generating columns."""
    from axosyslog_spark.operators.scl import apache_accesslog_parser

    ev = _utc(spark).read.parquet(f"{sf}/events.parquet")
    line = F.concat(
        F.lit("10.0."), (F.col("user_id") % 200).cast("string"),
        F.lit(".7 - user"), (F.col("user_id") % 50).cast("string"),
        F.lit(" [10/Oct/2024:13:55:36 +0000] \"GET /api/"),
        F.col("event_type"), F.lit("/"), F.col("event_id").cast("string"),
        F.lit(" HTTP/1.1\" "), (200 + F.col("event_id") % 4).cast("string"),
        F.lit(" "), (F.col("event_id") % 5000).cast("string"),
        F.lit(' "https://ref.example/" "agent/1.0"'),
    )
    df = ev.select("event_id", line.alias("text"))
    out = apache_accesslog_parser(df)
    return out.select(
        "event_id",
        F.col("apache_clientip").alias("clientip"),
        F.col("apache_auth").alias("auth"),
        F.date_format("apache_timestamp", "yyyy-MM-dd HH:mm:ss").alias("ts_str"),
        F.col("apache_verb").alias("verb"),
        F.col("apache_request").alias("request"),
        F.col("apache_httpversion").alias("httpversion"),
        F.col("apache_response").alias("response"),
        F.col("apache_bytes").alias("bytes"),
        F.col("apache_referrer").alias("referrer"),
    )


def q_op_kmsg_parse(spark: SparkSession, sf: str) -> DataFrame:
    """linux-kmsg-format records synthesized from events (header +
    SUBSYSTEM continuation + block DEVICE decode); the oracle rebuilds
    every output from the generating columns."""
    from axosyslog_spark.operators.kmsg import kmsg_parser

    ev = _utc(spark).read.parquet(f"{sf}/events.parquet")
    rec = F.concat(
        (F.col("event_id") % 192).cast("string"), F.lit(","),
        F.col("event_id").cast("string"), F.lit(","),
        (F.col("user_id") * 1000).cast("string"), F.lit(",-;"),
        F.col("event_type"), F.lit(": device event\n SUBSYSTEM="),
        F.col("event_type"), F.lit("\n DEVICE=b"),
        (F.col("event_id") % 16).cast("string"), F.lit(":"),
        (F.col("user_id") % 4).cast("string"), F.lit("\n"),
    )
    df = ev.select("event_id", rec.alias("text"))
    out = kmsg_parser(df)
    return out.select(
        "event_id", "pri", "severity", "facility", "kmsg_seq", "kmsg_ts_us",
        "message",
        F.col("kmsg_nv")[".linux.SUBSYSTEM"].alias("subsystem"),
        F.col("kmsg_nv")[".linux.DEVICE.type"].alias("dev_type"),
        F.col("kmsg_nv")[".linux.DEVICE.major"].alias("dev_major"),
        F.col("kmsg_nv")[".linux.DEVICE.minor"].alias("dev_minor"),
    )


def q_op_scl_checkpoint(spark: SparkSession, sf: str) -> DataFrame:
    """checkpoint-parser() syslog wire format under the oracle:
    RFC5424-framed lines synthesized from events (7-column ISO-stamp
    variant, null('-') msgid, ':'-separated kv bracket section). The
    kv pass runs over the RAW line (checkpoint[syslog-raw]), so the
    header stamp's colons swallow through the first ';' — a dummy
    first pair absorbs that, exactly like the reference behaves; the
    oracle rebuilds every output from the generating columns."""
    from axosyslog_spark.operators.scl import checkpoint_parser

    ev = _utc(spark).read.parquet(f"{sf}/events.parquet")
    ss = F.lpad((F.col("event_id") % 60).cast("string"), 2, "0")
    line = F.concat(
        F.lit("<134>1 2024-06-15T10:11:"), ss, F.lit("Z gw"),
        (F.col("user_id") % 20).cast("string"),
        F.lit(" fw "), F.col("event_id").cast("string"),
        F.lit(' - [x:"0"; action:"'), F.col("event_type"),
        F.lit('"; id:"'), F.col("event_id").cast("string"), F.lit('"]'),
    )
    df = ev.select("event_id", line.alias("text"))
    out = checkpoint_parser(df)
    kv = F.col("`.checkpoint.kv`")
    return out.select(
        "event_id",
        F.col("`.checkpoint.ok`").alias("ok"),
        "host",
        F.col("program").alias("prog"),
        "pid",
        "msgid",
        F.date_format("`.checkpoint.ts`", "yyyy-MM-dd HH:mm:ss").alias(
            "ts_str"
        ),
        F.element_at(kv, ".checkpoint.action").alias("action"),
        F.element_at(kv, ".checkpoint.id").alias("idv"),
    )


def q_op_scl_dnd(spark: SparkSession, sf: str) -> DataFrame:
    """default-network-drivers() composition under the oracle
    (scl/default-network-drivers/plugin.conf): four wire shapes
    synthesized from events — a raw-topic checkpoint line, an EWMM
    payload, a sudo message routed by app-parser(topic(syslog)), and
    a plain RFC3164 line — flow through the raw-app / ewmm / app /
    syslog branches; the oracle rebuilds every output (branch label,
    parsed header fields, per-branch payload fields) arithmetically
    from the generating columns."""
    from axosyslog_spark.operators.scl import default_network_drivers

    ev = _utc(spark).read.parquet(f"{sf}/events.parquet")
    ss = F.lpad((F.col("event_id") % 60).cast("string"), 2, "0")
    eid = F.col("event_id").cast("string")
    host = F.concat(F.lit("h"), (F.col("user_id") % 20).cast("string"))
    m = F.col("event_id") % 4
    line = (
        F.when(
            m == 0,
            F.concat(
                F.lit("<134>1 2024-06-15T10:11:"), ss, F.lit("Z gw"),
                (F.col("user_id") % 20).cast("string"),
                F.lit(" CheckPoint "), eid,
                F.lit(' - [x:"0"; action:"'), F.col("event_type"),
                F.lit('"; id:"'), eid, F.lit('"]'),
            ),
        )
        .when(
            m == 1,
            F.concat(
                F.lit("<13>1 2024-06-15T10:11:"), ss, F.lit("Z "), host,
                F.lit(' @syslog-ng 9 - - {"MESSAGE":"ev '),
                F.col("event_type"), F.lit('","num":"'), eid,
                F.lit('","._TAGS":".source.s_net"}'),
            ),
        )
        .when(
            m == 2,
            F.concat(
                F.lit("<85>1 2024-06-15T10:11:"), ss, F.lit("Z "), host,
                F.lit(" sudo - - - u"),
                (F.col("user_id") % 50).cast("string"),
                F.lit(" : TTY=pts/0 ; PWD=/srv ; USER=root ;"
                      " COMMAND=/usr/bin/tool "), eid,
            ),
        )
        .otherwise(
            F.concat(
                F.lit("<30>Jun 15 10:11:"), ss, F.lit(" "), host,
                F.lit(" cron["), eid, F.lit("]: job "),
                F.col("event_type"), F.lit(" done"),
            )
        )
    )
    df = ev.select("event_id", line.alias("text"))
    out = default_network_drivers(df)
    return out.select(
        "event_id", "path", "app",
        "host",
        F.coalesce("program", "appname").alias("prog"),
        F.col("severity").cast("int").alias("severity"),
        F.date_format("msg_ts", "yyyy-MM-dd HH:mm:ss").alias("ts_str"),
        F.element_at(F.col("`.checkpoint.kv`"), ".checkpoint.action").alias(
            "cp_action"
        ),
        F.col("ewmm")["MESSAGE"].alias("ewmm_msg"),
        F.col("ewmm")["num"].alias("ewmm_num"),
        F.col("sudo_SUBJECT").alias("sudo_subject"),
        F.col("sudo_COMMAND").alias("sudo_cmd"),
        "body",
    )


def q_op_scl_arr(spark: SparkSession, sf: str) -> DataFrame:
    """arr_parser (scl/arr/arr.conf arr_internal) under the replica
    oracle: 'TS|Severity|Module|MESSAGE' lines synthesized from
    events; the oracle mirrors the pipe split, the syslog-names
    severity resolution (Fatal unresolvable -> default kept), and the
    date parse."""
    from axosyslog_spark.operators.scl import arr_parser

    ev = _utc(spark).read.parquet(f"{sf}/events.parquet")
    sev = F.element_at(
        F.array(*[F.lit(x) for x in ("Info", "Warn", "Error", "Debug", "Fatal")]),
        (F.col("event_id") % 5 + 1).cast("int"),
    )
    line = F.concat(
        F.date_format("ts", "yyyy-MM-dd HH:mm:ss"), F.lit(".0|"), sev,
        F.lit("|Mod"), (F.col("user_id") % 7).cast("string"), F.lit("|evt "),
        F.col("event_type"),
    )
    df = ev.select("event_id", line.alias("text"))
    out = arr_parser(df, "Radarr")
    return out.select(
        "event_id", "program", "severity", "arr_module", "message",
        F.date_format("msg_ts", "yyyy-MM-dd HH:mm:ss").alias("ts_str"),
    )


def q_op_scl_mariadb(spark: SparkSession, sf: str) -> DataFrame:
    """mariadb-audit-parser (scl/mariadb/audit.conf) under the replica
    oracle: audit lines synthesized from events (QUERY rows carry a
    quoted SQL object with an embedded comma; CONNECT rows carry the
    conf's empty database/object fields), parsed by the real csv +
    regexp composition; the oracle computes the expected columns
    straight from the source table so a parser bug cannot cancel."""
    from axosyslog_spark.operators.scl import mariadb_audit_parser

    ev = _utc(spark).read.parquet(f"{sf}/events.parquet")
    is_q = F.col("event_id") % 3 != 0
    u = lambda m: (F.col("user_id") % m).cast("string")  # noqa: E731
    e = lambda m: (F.col("event_id") % m).cast("string")  # noqa: E731
    line = F.concat(
        F.lit("docker h"), u(5), F.lit(",u"), u(3),
        F.lit(",172.18.0."), e(250), F.lit(","), e(100), F.lit(","),
        F.col("event_id").cast("string"), F.lit(","),
        F.when(is_q, F.lit("QUERY")).otherwise(F.lit("CONNECT")), F.lit(","),
        F.when(is_q, F.concat(F.lit("db"), u(4))).otherwise(F.lit("")),
        F.lit(","),
        F.when(
            is_q,
            F.concat(F.lit("'SELECT g, AVG(x) FROM t"), u(4),
                     F.lit(" GROUP BY g'")),
        ).otherwise(F.lit("")),
        F.lit(","), e(2),
    )
    df = ev.select("event_id", line.alias("message"))
    out = mariadb_audit_parser(df)
    p = ".mariadb."
    return out.select(
        "event_id",
        F.col(f"`{p}syslog_info`").alias("syslog_info"),
        F.col(f"`{p}serverhost`").alias("serverhost"),
        F.col(f"`{p}username`").alias("username"),
        F.col(f"`{p}host`").alias("client_host"),
        F.col(f"`{p}connectionid`").alias("connectionid"),
        F.col(f"`{p}queryid`").alias("queryid"),
        F.col(f"`{p}operation`").alias("operation"),
        F.col(f"`{p}database`").alias("dbname"),
        F.col(f"`{p}object`").alias("objectval"),
        F.col(f"`{p}retcode`").alias("retcode"),
        "mariadb_ok",
    )


def q_op_scl_pgsql(spark: SparkSession, sf: str) -> DataFrame:
    """postgresql-csvlog-parser (scl/pgsql/pgsql.conf) under the
    replica oracle: 26-column csvlog lines synthesized from events —
    the message field carries doubled quotes AND an embedded comma
    (escape-double-char dialect), the severity word rotates through
    the ladder (PANIC/ERROR/WARNING shift; LOG/FATAL unresolvable
    keep the default) — parsed by the real 26-column spec; expected
    columns computed straight from the source table."""
    from axosyslog_spark.operators.scl import postgresql_csvlog_parser

    ev = _utc(spark).read.parquet(f"{sf}/events.parquet")
    u = lambda m: (F.col("user_id") % m).cast("string")  # noqa: E731
    e = lambda m: (F.col("event_id") % m).cast("string")  # noqa: E731
    sev_word = F.element_at(
        F.array(*[F.lit(x) for x in (
            "ERROR", "WARNING", "LOG", "INFO", "PANIC", "DEBUG2", "FATAL"
        )]),
        (F.col("event_id") % 7 + 1).cast("int"),
    )
    line = F.concat(
        F.date_format("ts", "yyyy-MM-dd HH:mm:ss"), F.lit('.123 UTC,"postgres","db'),
        u(3), F.lit('",'), e(10000), F.lit(',"10.0.0.'), e(200),
        F.lit(':5432",63eb4c2c.1092,'), e(9), F.lit(',"SELECT",,3/13,0,'),
        sev_word, F.lit(',42P01,"relation ""t'), u(5),
        F.lit('"", missing",,,,,,"SELECT 1",,,"psql","client backend",,'),
        F.col("event_id").cast("string"),
    )
    df = ev.select("event_id", line.alias("text"))
    out = postgresql_csvlog_parser(df)
    p = ".pgsql."
    return out.select(
        "event_id",
        F.col(f"`{p}username`").alias("username"),
        F.col(f"`{p}database`").alias("dbname"),
        "pid",
        F.col(f"`{p}connection_from`").alias("conn_from"),
        "severity",
        "message",
        F.col(f"`{p}query_id`").alias("query_id"),
        F.date_format("ts", "yyyy-MM-dd HH:mm:ss.SSS").alias("ts_str"),
        "pgsql_ok",
    )


_CTX_GREP_XML = """\
<patterndb version='5' pub_date='2024-01-01'>
  <ruleset name='jobs' id='rs-ctxgrep'>
    <rules>
      <rule id='r-job' class='system' provider='gate'
            context-id='job-${jid}' context-timeout='36000'>
        <patterns><pattern>job @NUMBER:jid@ @ESTRING:verb:@</pattern></patterns>
        <actions>
          <action trigger='timeout'>
            <message><values>
              <value name='verbs'>$(context-values ${verb})</value>
              <value name='starts'>$(grep ('${verb}' eq 'v0') ${jid})</value>
              <value name='len'>$(context-length)</value>
              <value name='newest'>${verb}@0</value>
              <value name='prev'>${verb}@1</value>
            </values></message>
          </action>
        </actions>
      </rule>
    </rules>
  </ruleset>
</patterndb>
"""


def q_pipe_context_grep(spark: SparkSession, sf: str) -> DataFrame:
    """Correlation-context template funcs under the replica oracle:
    $(context-values)/$(grep)/$(context-length) and the @N msg_ref
    iterate the closed context's time-ordered message list (one
    collect_list riding the close aggregation — context-funcs.c /
    eval.c:173-188 batch analog). Contexts are one-per-jid (unique
    monotone ts, huge timeout); the oracle mirrors with ordered
    string_agg over the same synthesized lines."""
    from axosyslog_spark.operators.grouping import correlate_pdb
    from axosyslog_spark.operators.pdb_load import load_pdb_xml

    ev = _utc(spark).read.parquet(f"{sf}/events.parquet")
    line = F.concat(
        F.lit("job "), (F.col("event_id") % 50).cast("string"),
        F.lit(" v"), (F.col("event_id") % 7).cast("string"),
    )
    # unique, event_id-monotone stamps -> deterministic context order
    ts = F.timestamp_seconds(F.lit(1700000000) + F.col("event_id"))
    df = ev.select("event_id", line.alias("text"), ts.alias("ts"))
    [rs] = load_pdb_xml(_CTX_GREP_XML)
    matched = rs.pattern_db().apply(df)
    out = correlate_pdb(matched, rs.rules)
    return out.select(
        "context_key", "n_msgs", "verbs", "starts", "len", "newest", "prev",
    )


def q_op_rewrite_suite(spark: SparkSession, sf: str) -> DataFrame:
    """The rewrite/filter family under ONE oracle slot (consolidated
    from the former op_rewrite_filter + op_subst + op_tags gate
    queries so every gate entry fits the driver's 50-row correctness
    harness — each operator below still contributes hash-checked
    output columns): set-pri/set-severity pri algebra
    (rewrite-set-pri.c / -set-severity.c keep
    pri == facility*8+severity), fix-timezone then set-timezone
    wall-clock reinterpretation chain (rewrite-fix-timezone.c /
    -set-timezone.c, DST-aware via IANA zones on both engines), glob
    program match (* and ? wildcards, logmatcher LMF_GLOB), match()
    capture storage ($1..$n, filter-re.c), the level() range filter,
    subst() global + first-match-only variants (rewrite-subst.c,
    reference default is non-global), and set-tag / clear-tag /
    tags() (rewrite-set-tag.c set semantics: idempotent append;
    filter-tags.c membership)."""
    from axosyslog_spark.operators import rewrite
    from axosyslog_spark.operators.filters import (
        glob_match,
        has_tag,
        match_store_groups,
        severity_range,
    )

    ev = _utc(spark).read.parquet(f"{sf}/events.parquet")
    tags0 = F.array(
        F.concat(F.lit("t"), (F.col("event_id") % 4).cast("string")),
        F.lit("all"),
    )
    df = ev.select(
        "event_id", "user_id", "event_type", "ts",
        (F.col("event_id") % 8).cast("int").alias("severity"),
        (F.col("user_id") % 24).cast("int").alias("facility"),
        tags0.alias("tags"),
        F.col("event_type").alias("t_global"),
        F.col("event_type").alias("t_first"),
    )
    df = rewrite.set_pri(df, F.col("event_id") % 192)
    df = rewrite.set_severity(df, F.col("user_id") % 8)
    df = rewrite.fix_timezone(df, "ts", "America/New_York")
    df = rewrite.set_timezone(df, "ts", "Asia/Tokyo")
    df = match_store_groups(df, r"^(err|cli)(.*)$", src_col="event_type", n_groups=2)
    df = rewrite.subst(df, "[aeiou]", "_", value="t_global")
    df = rewrite.subst(df, "[aeiou]", "#", value="t_first", global_=False)
    df = rewrite.set_tag(df, "seen")
    df = rewrite.set_tag(df, "all")   # present -> unchanged (set semantics)
    df = rewrite.clear_tag(df, "t1")
    return df.select(
        "event_id", "pri", "severity", "facility",
        F.date_format("ts", "yyyy-MM-dd HH:mm:ss").alias("ts_str"),
        glob_match(F.col("event_type"), "c*ck").alias("is_click"),
        glob_match(F.col("event_type"), "s?gnup").alias("is_signup"),
        severity_range(3, 5).alias("sev_mid"),
        F.col("__m1").alias("m1"),
        F.col("__m2").alias("m2"),
        F.col("__matched").alias("matched"),
        "t_global",
        "t_first",
        F.array_join("tags", ",").alias("tags_str"),
        has_tag("t2").alias("has_t2"),
        has_tag("gone").alias("has_gone"),
    )


def q_op_tags(spark: SparkSession, sf: str) -> DataFrame:
    """set-tag / clear-tag / tags() under the oracle (rewrite-set-tag.c
    set semantics: idempotent append; filter-tags.c membership): a
    deterministic tag array per event, one fresh tag added, one
    already-present tag re-added (no-op), one conditionally-present
    tag cleared; the oracle rebuilds the final tag list
    arithmetically."""
    from axosyslog_spark.operators import rewrite
    from axosyslog_spark.operators.filters import has_tag

    ev = _utc(spark).read.parquet(f"{sf}/events.parquet")
    tags0 = F.array(
        F.concat(F.lit("t"), (F.col("event_id") % 4).cast("string")),
        F.lit("all"),
    )
    df = ev.select("event_id", tags0.alias("tags"))
    df = rewrite.set_tag(df, "seen")
    df = rewrite.set_tag(df, "all")   # present -> unchanged (set semantics)
    df = rewrite.clear_tag(df, "t1")
    return df.select(
        "event_id",
        F.array_join("tags", ",").alias("tags_str"),
        has_tag("t2").alias("has_t2"),
        has_tag("gone").alias("has_gone"),
    )


def q_op_cc_mask(spark: SparkSession, sf: str) -> DataFrame:
    """credit-card-mask() rewrite (scl/rewrite/cc-mask.conf): card
    numbers synthesized from events (a 16-digit visa + a 15-digit
    amex per line), masked to first6 + '******' + last4 by the
    chained per-scheme substs; the oracle rebuilds the masked text
    arithmetically from the generating columns."""
    from axosyslog_spark.operators.scl import credit_card_mask

    ev = _utc(spark).read.parquet(f"{sf}/events.parquet")
    visa = F.concat(
        F.lit("4111111111"),
        F.lpad((F.col("event_id") % 1000000).cast("string"), 6, "0"),
    )
    amex = F.concat(
        F.lit("37828224631"),
        F.lpad((F.col("user_id") % 10000).cast("string"), 4, "0"),
    )
    text = F.concat(
        F.lit("pay "), visa, F.lit(" then "), amex,
        F.lit(" ref="), F.col("event_type"),
    )
    return ev.select("event_id", credit_card_mask(text).alias("masked"))


def q_op_snmptrapd(spark: SparkSession, sf: str) -> DataFrame:
    """snmptrapd-parser(): v1/v2 trap records synthesized from events
    (header + transport info + v1 trap info + tab-separated varbind
    list with SNMP type annotations); invalid records (debug noise)
    are dropped like the reference parser. Oracle rebuilds every
    output from the generating columns.

    Ref: modules/afsnmp/snmptrapd-header-parser.c,
    varbindlist-scanner.c, snmptrapd-parser.c."""
    from axosyslog_spark.operators.snmptrapd import snmptrapd_parser

    ev = _utc(spark).read.parquet(f"{sf}/events.parquet")
    ts = F.concat(
        F.lit("2024-06-15 10:11:"),
        F.lpad((F.col("event_id") % 60).cast("string"), 2, "0"),
    )
    host = F.concat(F.lit("host"), (F.col("user_id") % 50).cast("string"))
    ti = F.concat(
        F.lit("UDP: [127.0.0.1]:"),
        (30000 + F.col("event_id") % 999).cast("string"),
        F.lit("->[127.0.0.1]:162"),
    )
    vbs = F.concat(
        F.lit("iso.3.6.1.4.1."), F.col("event_id").cast("string"),
        F.lit(" = INTEGER: "), F.col("user_id").cast("string"),
        F.lit('\tnetSnmpExampleString = STRING: "msg '), F.col("event_type"),
        F.lit(" 'q'\"\tMY-MIB::key = Hex-STRING: A0 BB"),
    )
    hdr = F.concat(ts, F.lit(" "), host, F.lit(" ["), ti, F.lit("]:"))
    v1 = F.concat(
        hdr, F.lit(" iso.3.6.1.4.1.8072.2.3.1\n\t Enterprise Specific Trap (."),
        (F.col("event_id") % 20).cast("string"),
        F.lit(") Uptime: 18:41:07.83\n"), vbs,
    )
    v2 = F.concat(hdr, F.lit("\n"), vbs)
    bad = F.concat(ts, F.lit(" NET-SNMP version 5.7.3 Stopped.\nStopping snmptrapd"))
    text = (
        F.when(F.col("event_id") % 17 == 0, bad)
        .when(F.col("event_id") % 3 == 0, v1)
        .otherwise(v2)
    )
    df = ev.select("event_id", "user_id", "event_type", text.alias("text"))
    out = snmptrapd_parser(df).filter("snmp_ok")
    m = F.col("snmp")
    return out.select(
        "event_id",
        m[".snmp.hostname"].alias("hostname"),
        m[".snmp.transport_info"].alias("transport_info"),
        m[".snmp.enterprise_oid"].alias("enterprise_oid"),
        m[".snmp.type"].alias("trap_type"),
        m[".snmp.subtype"].alias("subtype"),
        m[".snmp.uptime"].alias("uptime"),
        F.element_at(
            m, F.concat(F.lit(".snmp.iso.3.6.1.4.1."), F.col("event_id").cast("string"))
        ).alias("oid_val"),
        m[".snmp.netSnmpExampleString"].alias("str_val"),
        m[".snmp.MY-MIB_key"].alias("hex_val"),
        F.date_format("snmp_ts", "yyyy-MM-dd HH:mm:ss").alias("ts_str"),
    )


def q_pipe_slog(spark: SparkSession, sf: str) -> DataFrame:
    """secure-logging: forward-secure sealing of each conversation's
    turn chain (slog.c protocol over hash primitives — key evolution,
    per-entry MAC, aggregated MAC). Crypto chains aren't
    SQL-expressible, so this is a declared rows-only gate entry; the
    protocol itself is unit-verified (tamper/truncation/reorder
    detection, test_slog.py)."""
    from axosyslog_spark.operators.slog import slog_seal

    t = _transcripts(spark, sf)
    out = slog_seal(t, "00" * 32)
    return out.select(
        "conv_id", "turn_idx", "slog_ctr", "slog_ct", "slog_mac", "slog_agg"
    )


def q_pipe_multiline(spark: SparkSession, sf: str) -> DataFrame:
    """regexp-prefix multi-line assembly over transcripts: syslog-
    headed turns start a message, everything else continues it."""
    from axosyslog_spark.operators import multiline

    t = _transcripts(spark, sf)
    out = multiline.regexp_prefix(t, r"^<[0-9]", sep=" // ")
    return out.select("conv_id", "segment_id", "turn_idx", "assembled", "n_lines")


# ---------------------------------------------------------------------------
# training-data ops over documents / embeddings
# ---------------------------------------------------------------------------


def _docs(spark: SparkSession, sf: str) -> DataFrame:
    return _utc(spark).read.parquet(f"{sf}/documents.parquet")


# embeddings.parquet vector dimensionality (fixed across all SFs; see
# TESTDATA.md). Passed explicitly so LSH planning never probes the data
# with a driver-side .first().
EMB_DIM = 64


def _embs(spark: SparkSession, sf: str) -> DataFrame:
    return _utc(spark).read.parquet(f"{sf}/embeddings.parquet")


def q_doc_text_profile(spark: SparkSession, sf: str) -> DataFrame:
    from axosyslog_spark.operators import textstats as ts

    t = F.col("text")
    swr = ts.stopword_ratio(t)
    pr = ts.punct_ratio(t)
    mtl = ts.mean_token_len(t)
    n_tok = ts.token_count(t)
    quality_x4 = (
        ((n_tok >= 5) & (n_tok <= 100_000)).cast("int")
        + ((mtl >= 2.0) & (mtl <= 12.0)).cast("int")
        + (pr <= 0.3).cast("int")
        + (swr >= 0.01).cast("int")
    )
    return _docs(spark, sf).select(
        "doc_id",
        n_tok.alias("n_tokens"),
        ts.bpe_ish_token_count(t).alias("n_tokens_bpe"),
        F.floor(swr * 1_000_000).cast("bigint").alias("stopword_e6"),
        F.floor(pr * 1_000_000).cast("bigint").alias("punct_e6"),
        ts.langid(t).alias("lang_guess"),
        quality_x4.cast("bigint").alias("quality_x4"),
        ts.fingerprint(t).alias("fingerprint"),
    )


def q_doc_exact_dedup(spark: SparkSession, sf: str) -> DataFrame:
    from axosyslog_spark.operators.dedup import exact_dup_groups

    return exact_dup_groups(_docs(spark, sf))


def q_doc_jaccard_pairs(spark: SparkSession, sf: str) -> DataFrame:
    from axosyslog_spark.operators.dedup import jaccard_pairs

    return jaccard_pairs(_docs(spark, sf), threshold=0.1)


def q_doc_minhash_bands(spark: SparkSession, sf: str) -> DataFrame:
    from axosyslog_spark.operators.dedup import minhash_bands

    return minhash_bands(_docs(spark, sf), k=8, bands=4).withColumnRenamed(
        "id", "doc_id"
    )


def q_doc_minhash_pairs(spark: SparkSession, sf: str) -> DataFrame:
    from axosyslog_spark.operators.dedup import minhash_near_dups

    return minhash_near_dups(_docs(spark, sf), k=8, bands=4, threshold=0.1)


def q_doc_contamination(spark: SparkSession, sf: str) -> DataFrame:
    """Benchmark decontamination (new r4): every 97th document plays
    the evaluation corpus; training docs sharing any 3-word gram with
    it are flagged with their overlap count. Broadcast the benchmark
    grams, explode-join the corpus — the GPT-3/Gopher 13-gram rule at
    gate-friendly n."""
    from axosyslog_spark.operators.dedup import contamination

    docs = _docs(spark, sf)
    bench = docs.filter(F.col("doc_id") % 97 == 0)
    out = contamination(docs.filter(F.col("doc_id") % 97 != 0), bench, n=3)
    return out.select(
        F.col("id").alias("doc_id"), "contaminated_grams", "sample_gram"
    )


def q_doc_dup_clusters(spark: SparkSession, sf: str) -> DataFrame:
    """Connected components over the verified MinHash near-dup pairs
    (new r4): cluster = min doc id in the component, `canonical`
    marks the keep-one representative. Spark side: iterative
    min-label propagation (diameter-bounded passes); oracle: a
    recursive CTE computing the same reachability minimum."""
    from axosyslog_spark.operators.dedup import dup_clusters, minhash_near_dups

    docs = _docs(spark, sf)
    pairs = minhash_near_dups(docs, k=8, bands=4, threshold=0.1)
    return dup_clusters(pairs, docs.select("doc_id"))


def q_doc_gopher(spark: SparkSession, sf: str) -> DataFrame:
    """Gopher-style repetition signals (new r4): duplicate-line
    fraction, duplicate-line character fraction, and the top word
    bigram's count + character share."""
    from axosyslog_spark.operators.textstats import gopher_repetition

    return gopher_repetition(_docs(spark, sf))


def q_emb_topk(spark: SparkSession, sf: str) -> DataFrame:
    from axosyslog_spark.operators.similarity import brute_force_topk

    embs = _embs(spark, sf)
    return brute_force_topk(embs, embs.filter(F.col("vec_id") < 10), k=5)


def q_emb_near_dups(spark: SparkSession, sf: str) -> DataFrame:
    from axosyslog_spark.operators.similarity import embedding_near_dups

    return embedding_near_dups(_embs(spark, sf), threshold=0.5, dim=EMB_DIM)


def q_emb_semantic_dedup(spark: SparkSession, sf: str) -> DataFrame:
    """SemDeDup composition: cosine near-dup pairs (LSH->verify) ->
    connected components -> per-vector cluster + canonical flag. The
    oracle recomputes the pair set exactly and resolves components
    with a recursive reachability CTE — an independent algorithm."""
    from axosyslog_spark.operators.similarity import semantic_dedup

    return semantic_dedup(_embs(spark, sf), threshold=0.5, dim=EMB_DIM)


def q_emb_lsh_topk(spark: SparkSession, sf: str) -> DataFrame:
    """Approximate ANN — no SQL oracle (rows-only check); recall is
    instead asserted against brute force in tests/test_training_ops."""
    from axosyslog_spark.operators.similarity import lsh_topk

    embs = _embs(spark, sf)
    return lsh_topk(embs, embs.filter(F.col("vec_id") < 10), dim=EMB_DIM, k=5)


def q_emb_ivf_topk(spark: SparkSession, sf: str) -> DataFrame:
    """IVF ANN top-k (coarse quantizer from md5-sampled centroids,
    nprobe=4 of 16 lists, equi-join candidates, exact re-rank). The
    whole approximate path is deterministic + integer-quantized, so
    unlike LSH it gets a FULL hash-check against an independent SQL
    mirror (oracle.emb_ivf_topk_sql)."""
    from axosyslog_spark.operators.similarity import ivf_topk

    embs = _embs(spark, sf)
    return ivf_topk(
        embs, embs.filter(F.col("vec_id") < 10), k=5, n_lists=16, nprobe=4
    )


def q_doc_simhash_pairs(spark: SparkSession, sf: str) -> DataFrame:
    """SimHash near-dups — bit-vote semantics aren't reasonably
    SQL-expressible; rows-only check + unit tests."""
    from axosyslog_spark.operators.dedup import simhash_near_dups

    return simhash_near_dups(_docs(spark, sf), max_hamming=3)


def q_doc_tfidf(spark: SparkSession, sf: str) -> DataFrame:
    """TF-IDF top-3 terms per document (integer-exact linear idf so
    the oracle hashes bit-for-bit; see textstats.tfidf_top_terms)."""
    from axosyslog_spark.operators.textstats import tfidf_top_terms

    return tfidf_top_terms(_docs(spark, sf), k=3)


def q_doc_rarity_buckets(spark: SparkSession, sf: str) -> DataFrame:
    """CCNet-style quality terciles (head/middle/tail) from the
    corpus's own unigram frequency table, integer-quantized — the
    perplexity-bucket stage of a web-corpus pipeline with the KenLM
    swapped for an oracle-hashable unigram rarity score."""
    from axosyslog_spark.operators.textstats import unigram_rarity_buckets

    return unigram_rarity_buckets(_docs(spark, sf), n_buckets=3)


# doc_c4_filter staging: the synthetic corpus is punctuation-free
# word soup, so the gate query deterministically synthesizes the page
# structure the C4 rules inspect — ' table ' becomes a sentence/line
# break, a terminal '.' closes the page, and two id-keyed injections
# exercise the brace and lorem-ipsum page rules. The operator itself
# (textstats.c4_filter) takes any text column.
_C4_BRACE_MOD = 31
_C4_LOREM_MOD = 37


_MIX_WEIGHTS = {"src0": 0.25, "src1": 0.5, "src2": 0.0, "src3": 1.0}
_SPLIT_FRACTIONS = {"train": 0.8, "val": 0.1, "test": 0.1}


def q_doc_source_mix(spark: SparkSession, sf: str) -> DataFrame:
    """Deterministic source re-weighting (the Pile/DoReMi mixing
    stage): keep each source at its target rate via an md5 hex-prefix
    threshold — no RNG, rerun-stable, auditable per document."""
    from axosyslog_spark.operators.sampling import source_mix

    return source_mix(
        _docs(spark, sf), _MIX_WEIGHTS, default_weight=0.75
    )


def q_doc_hash_split(spark: SparkSession, sf: str) -> DataFrame:
    """Reproducible train/val/test split over the document id hash
    (cumulative hex bounds; last bucket absorbs the remainder)."""
    from axosyslog_spark.operators.sampling import hash_split

    return hash_split(_docs(spark, sf), _SPLIT_FRACTIONS)


def q_doc_substr_spans(spark: SparkSession, sf: str) -> DataFrame:
    """Exact-substring dedup (Lee et al. 2021): longest shared token
    run per document pair via the positional k-gram diagonal trick —
    the distributed stand-in for the paper's suffix array."""
    from axosyslog_spark.operators.dedup import substring_spans

    return substring_spans(_docs(spark, sf), k=5, min_tokens=8)


_PII_MODS = (3, 5, 7, 11)  # email / ip / phone / ssn injection keys


def q_doc_pii_redact(spark: SparkSession, sf: str) -> DataFrame:
    """PII scrub (emails/SSNs/phones/IPv4): the corpus is synthetic
    word soup, so the gate query deterministically injects PII keyed
    on doc_id (all four categories, overlapping on lcm factors), then
    redacts and counts. The operator (textstats.pii_redact) takes any
    text column; the reference ships the credit-card specialization
    (scl/rewrite cc-mask)."""
    from axosyslog_spark.operators.textstats import pii_redact

    em, ip, ph, ssn = _PII_MODS
    d = F.col("doc_id")
    staged = _docs(spark, sf).select(
        "doc_id",
        F.concat(
            F.col("text"),
            F.when(
                d % em == 0,
                F.concat(
                    F.lit(" reach user"), d.cast("string"),
                    F.lit("@example.com now"),
                ),
            ).otherwise(F.lit("")),
            F.when(
                d % ip == 0,
                F.concat(
                    F.lit(" from 10."), (d % 256).cast("string"),
                    F.lit(".0.1"),
                ),
            ).otherwise(F.lit("")),
            F.when(d % ph == 0, F.lit(" call 555-867-5309")).otherwise(
                F.lit("")
            ),
            F.when(d % ssn == 0, F.lit(" ssn 123-45-6789")).otherwise(
                F.lit("")
            ),
        ).alias("text"),
    )
    return pii_redact(staged)


def q_doc_c4_filter(spark: SparkSession, sf: str) -> DataFrame:
    """C4 cleaning rules (Raffel et al. 2020 §2.2): line-level
    terminal-punctuation / min-words / javascript rules + page-level
    brace / lorem-ipsum / min-sentences rules, as one shuffle-free
    projection."""
    from axosyslog_spark.operators.textstats import c4_filter

    staged = _docs(spark, sf).select(
        "doc_id",
        F.concat(
            F.regexp_replace(
                F.col("text"), F.lit(" table "), F.lit(".\n")
            ),
            F.lit("."),
            F.when(
                F.col("doc_id") % _C4_BRACE_MOD == 0, F.lit(" {")
            ).otherwise(F.lit("")),
            F.when(
                F.col("doc_id") % _C4_LOREM_MOD == 0, F.lit(" Lorem ipsum")
            ).otherwise(F.lit("")),
        ).alias("text"),
    )
    return c4_filter(staged)


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """The driver-checked gate. HARD CAP: the driver's correctness
    harness records rows for at most the first 50 entries, so this
    dict must stay <= 50 keys — every entry here gets a driver
    CORRECTNESS row. Subsumed/prefix variants live in
    extra_queries() below (still replica- and pytest-checked);
    tests/test_entry_contract.py enforces the cap."""
    return {
        "pipe_routed": q_pipe_routed,
        "pipe_sink_counts": q_pipe_sink_counts,
        "pipe_grouping_by": q_pipe_grouping_by,
        "pipe_grouping_salted": q_pipe_grouping_salted,
        "pipe_sessionize": q_pipe_sessionize,
        "pipe_suppress": q_pipe_suppress,
        "pipe_rate_limit": q_pipe_rate_limit,
        "pipe_rate_window": q_pipe_rate_window,
        "pipe_group_lines": q_pipe_group_lines,
        "pipe_correlate": q_pipe_correlate,
        "pipe_format_output": q_pipe_format_output,
        "pipe_patterndb_xml": q_pipe_patterndb_xml,
        "pipe_pdb_actions": q_pipe_pdb_actions,
        "op_csv_parse": q_op_csv_parse,
        "op_kv_parse": q_op_kv_parse,
        "op_template_compile": q_op_template_compile,
        "op_macro_expand": q_op_macro_expand,
        "op_winlog_parse": q_op_winlog_parse,
        "op_patternize": q_op_patternize,
        "op_json_flatten": q_op_json_flatten,
        "op_date_parse": q_op_date_parse,
        "op_geoip_range": q_op_geoip_range,
        "op_metrics_probe": q_op_metrics_probe,
        "op_template_funcs": q_op_template_funcs,
        "op_netmask_inlist": q_op_netmask_inlist,
        "op_cef_parse": q_op_cef_parse,
        "op_filterx_funcs": q_op_filterx_funcs,
        "op_scl_apache": q_op_scl_apache,
        "op_kmsg_parse": q_op_kmsg_parse,
        "op_scl_checkpoint": q_op_scl_checkpoint,
        "op_scl_dnd": q_op_scl_dnd,
        "op_rewrite_suite": q_op_rewrite_suite,
        "op_cc_mask": q_op_cc_mask,
        "op_snmptrapd": q_op_snmptrapd,
        "pipe_slog": q_pipe_slog,
        "pipe_multiline": q_pipe_multiline,
        "pipe_filterx": q_pipe_filterx,
        "pipe_smart_multiline": q_pipe_smart_multiline,
        "op_sdata_rekey": q_op_sdata_rekey,
        "op_audit_parse": q_op_audit_parse,
        "doc_text_profile": q_doc_text_profile,
        "doc_exact_dedup": q_doc_exact_dedup,
        "doc_jaccard_pairs": q_doc_jaccard_pairs,
        "doc_minhash_pairs": q_doc_minhash_pairs,
        "doc_contamination": q_doc_contamination,
        "doc_dup_clusters": q_doc_dup_clusters,
        "doc_gopher": q_doc_gopher,
        "emb_topk": q_emb_topk,
        "emb_near_dups": q_emb_near_dups,
        "emb_ivf_topk": q_emb_ivf_topk,
    }


# ---------------------------------------------------------------------------
# DuckDB oracles
# ---------------------------------------------------------------------------


def _patterndb_xml_oracle() -> str:
    """Mirror of q_pipe_patterndb_xml built from oracle.py's HAND-
    WRITTEN fixture regexes (independent of compile_pattern — a Spark-
    side compiler bug cannot cancel out); <values> templates hand-
    mirrored in SQL (uppercase / concat)."""
    inner = oracle.patterndb_fixture_sql(
        "body", "FROM parsed2", "conv_id, turn_idx", with_class=True
    )
    return (
        "WITH "
        + oracle.TRANSCRIPTS_ORACLE_CTE.strip()
        + ",\n"
        + oracle.PARSED_CTE.strip()
        + f"""
        SELECT conv_id, turn_idx, rule_id, rule_class,
               status, latency_ms, path, retry, topic, bts, bhost,
               CASE WHEN rule_id IN ('kv_retry', 'kv_plain')
                    THEN upper(status) END AS status_up,
               CASE WHEN rule_id = 'kv_retry'
                    THEN status || '/' || CAST(retry AS VARCHAR) END AS kv_key,
               CASE WHEN rule_id = 'badhdr'
                    THEN 'badhdr at ' || bts || ' on ' || bhost END AS note
        FROM ({inner})
        """
    )


def _all_oracle_sql() -> dict[str, str]:
    P = oracle.pipeline_prefix()
    W = oracle.with_transcripts
    grouping_sql = W(
        f"""
        SELECT conv_id,
               count(*) AS n_turns,
               strftime(min(ts), '{TS_FMT_DUCK}') AS first_ts,
               strftime(max(ts), '{TS_FMT_DUCK}') AS last_ts,
               string_agg(role, ',' ORDER BY turn_idx) AS agg_values
        FROM transcripts GROUP BY conv_id
        """
    )
    return {
        "pipe_transcripts": W(
            f"SELECT conv_id, turn_idx, role, text, tool, "
            f"strftime(ts, '{TS_FMT_DUCK}') AS ts_str FROM transcripts"
        ),
        "pipe_parse": P
        + """
        SELECT conv_id, turn_idx, kind, parse_ok, pri, severity, facility,
               host, appname, procid, status, latency_ms, path, retry,
               json_k, json_event
        FROM parsed3
        """,
        "pipe_enrich": P
        + """
        SELECT conv_id, turn_idx, tool, tool_category, risk_level, owner
        FROM enriched
        """,
        "pipe_routed": P
        + """
        SELECT sink, conv_id, turn_idx, severity,
               coalesce(tool_category, '') AS tool_category, text
        FROM routed
        """,
        "pipe_sink_counts": P
        + "SELECT sink, count(*) AS n FROM routed GROUP BY sink",
        "pipe_sink_histogram": P
        + """
        SELECT sink, severity, coalesce(tool_category, '') AS tool_category,
               count(*) AS n
        FROM routed GROUP BY sink, severity, tool_category
        """,
        "pipe_grouping_by": grouping_sql,
        "pipe_grouping_salted": grouping_sql,
        "pipe_sessionize": W(
            """
            SELECT conv_id,
                   CAST(1 + sum(CASE WHEN prev_ts IS NOT NULL
                                AND epoch(ts) - epoch(prev_ts) > 1800
                                THEN 1 ELSE 0 END) AS BIGINT) AS n_sessions
            FROM (
              SELECT conv_id, ts,
                     lag(ts) OVER (PARTITION BY conv_id ORDER BY ts, turn_idx) AS prev_ts
              FROM transcripts
            ) GROUP BY conv_id
            """
        ),
        "pipe_suppress": W(
            """
            SELECT conv_id, count(*) AS n_kept
            FROM (
              SELECT conv_id,
                     (text = lag(text) OVER (PARTITION BY conv_id ORDER BY turn_idx)) AS dup
              FROM transcripts
            ) WHERE dup IS NOT TRUE GROUP BY conv_id
            """
        ),
        "pipe_rate_limit": W(
            """
            SELECT conv_id, turn_idx, role
            FROM (
              SELECT conv_id, turn_idx, role,
                     row_number() OVER (PARTITION BY conv_id ORDER BY turn_idx) AS rn
              FROM transcripts
            ) WHERE rn <= 5
            """
        ),
        "pipe_rate_window": W(
            """
            SELECT conv_id, turn_idx, role
            FROM (
              SELECT conv_id, turn_idx, role,
                     row_number() OVER (
                       PARTITION BY conv_id, floor(epoch(ts) / 86400)
                       ORDER BY turn_idx) AS rn
              FROM transcripts
            ) WHERE rn <= 3
            """
        ),
        "pipe_group_lines": W(
            """
            SELECT conv_id,
                   string_agg(text, ' | ' ORDER BY turn_idx) AS assembled,
                   count(*) AS n_lines
            FROM transcripts GROUP BY conv_id
            """
        ),
        "pipe_patterndb": (
            # hand-written fixture regexes (oracle.PDB_FIXTURE_RULES),
            # independent of the Spark-side pattern compiler
            "WITH "
            + oracle.TRANSCRIPTS_ORACLE_CTE.strip()
            + ",\n"
            + oracle.PARSED_CTE.strip()
            + "\n"
            + oracle.patterndb_fixture_sql(
                "body", "FROM parsed2", "conv_id, turn_idx"
            )
        ),
        "pipe_patterndb_xml": _patterndb_xml_oracle(),
        "pipe_pdb_actions": (
            # hand-written classification regexes + an independently
            # constructed synthetic-row multiset
            "WITH "
            + oracle.TRANSCRIPTS_ORACLE_CTE.strip()
            + ",\n"
            + oracle.PARSED_CTE.strip()
            # MATERIALIZED is load-bearing: with the inlined (default)
            # CTE, DuckDB's triple scan of the regexp-extract columns
            # exhausts its buffer-manager accounting (bad_alloc on KB
            # blocks even at sf0.001) and poisons the connection for
            # every later query on it
            + ", classified AS MATERIALIZED (\n"
            + oracle.patterndb_fixture_sql(
                "body", "FROM parsed2", "conv_id, turn_idx, ts"
            )
            + """
            )
            SELECT conv_id, turn_idx, rule_id,
                   FALSE AS synthetic,
                   CAST(NULL AS VARCHAR) AS alert,
                   CAST(NULL AS VARCHAR) AS tags
            FROM classified
            UNION ALL
            SELECT conv_id, turn_idx, rule_id, TRUE,
                   'retry ' || path, 'retried'
            FROM classified WHERE rule_id = 'kv_retry'
            UNION ALL
            SELECT conv_id, turn_idx, rule_id, TRUE,
                   'ERROR ' || path, 'alerted'
            FROM classified WHERE rule_id = 'kv_retry' AND status = 'error'
            UNION ALL
            -- rated action: first 5 per hour-long event-time bucket
            -- (kv rows share one correlation key: host/appname/procid
            -- are NULL outside syslog-headed turns)
            SELECT conv_id, turn_idx, rule_id, TRUE,
                   'ratelimited ' || path, 'rate'
            FROM (
              SELECT conv_id, turn_idx, rule_id, path,
                     row_number() OVER (
                       PARTITION BY floor(epoch(ts) / 3600)
                       ORDER BY conv_id || '#'
                                || lpad(CAST(turn_idx AS VARCHAR), 9, '0')
                     ) AS rn
              FROM classified WHERE rule_id = 'kv_retry'
            ) WHERE rn <= 5
            """
        ),
        "op_csv_parse": """
        WITH lines AS (
          SELECT event_id,
                 CAST(event_id AS VARCHAR) || ',' || event_type || ',' ||
                 CAST(user_id AS VARCHAR) || ',' || props AS text
          FROM events
        )
        SELECT event_id,
               CAST(split_part(text, ',', 1) AS BIGINT) AS eid,
               split_part(text, ',', 2) AS etype,
               CAST(split_part(text, ',', 3) AS BIGINT) AS uid,
               regexp_extract(text, '^[^,]*,[^,]*,[^,]*,(.*)$', 1) AS rest,
               TRUE AS csv_ok
        FROM lines
        """,
        "op_json_flatten": """
        WITH expected AS (
          SELECT event_id, 'event.type' AS key, event_type AS value FROM events
          UNION ALL
          SELECT event_id, 'event.k', regexp_extract(props, '([0-9]+)', 1) FROM events
          UNION ALL
          SELECT event_id, 'meta.retry', CAST(event_id % 3 AS VARCHAR) FROM events
          UNION ALL
          SELECT event_id, 'meta.tags', 't' || CAST(event_id % 4 AS VARCHAR) || ',all' FROM events
          UNION ALL
          SELECT event_id, 'meta.deep.x.y', CAST(user_id % 7 AS VARCHAR) FROM events
          UNION ALL
          SELECT event_id, 'plain', 'v' || CAST(user_id % 5 AS VARCHAR) FROM events
          UNION ALL
          SELECT event_id, 'ok', 'true' FROM events
        )
        SELECT event_id, key, value FROM expected
        """,
        "op_template_compile": P
        + """
        SELECT conv_id, turn_idx,
               '<' || CAST(pri AS VARCHAR) || '> '
               || coalesce(host, 'nohost') || '/' || upper(coalesce(appname, 'na'))
               || ' sev+100=' || CAST(severity + 100 AS VARCHAR)
               || ' $literal head=' || substr(body, 1, 12)
               || ' sha=' || substr(sha256(body), 1, 8)
               || ' st=' || coalesce(nullif(coalesce(status, ''), ''), 'unknown')
               || ' ' || CASE WHEN coalesce(status, '') = 'error'
                              THEN 'BAD' ELSE 'OK' END
               || ' bin=-b-'
               || ' fj={"z.h":"' || coalesce(host, 'nohost')
               || '","a.p":"' || coalesce(appname, 'na') || '"}' AS rendered
        FROM parsed3
        """,
        "op_patternize": W(
            """
            , tok AS (
              SELECT conv_id, turn_idx, text,
                     unnest(string_split(text, ' ')) AS word,
                     generate_subscripts(string_split(text, ' '), 1) - 1 AS pos
              FROM transcripts
            ), freq AS (
              SELECT pos, word FROM tok GROUP BY pos, word HAVING count(*) >= 30
            ), pieces AS (
              SELECT t.conv_id, t.turn_idx, t.text, t.pos,
                     CASE WHEN f.word IS NOT NULL
                          THEN CAST(t.pos AS VARCHAR) || ' ' || t.word
                          ELSE CAST(t.pos AS VARCHAR) || ' ' || chr(26) END AS piece,
                     (f.word IS NOT NULL) AS isf
              FROM tok t LEFT JOIN freq f ON t.pos = f.pos AND t.word = f.word
            ), keys AS (
              SELECT conv_id, turn_idx, max(text) AS text,
                     string_agg(piece, chr(30) ORDER BY pos) || chr(30) ||
                       regexp_replace(max(text), '[^ ]', '', 'g') AS key,
                     bool_or(isf) AS cand
              FROM pieces GROUP BY conv_id, turn_idx
            ), clusters AS (
              SELECT key, count(*) AS support,
                     list_sort(array_agg(text))[1:3] AS samples
              FROM keys WHERE cand GROUP BY key HAVING count(*) >= 30
            ), rend AS (
              SELECT key, support, samples, string_split(key, chr(30)) AS parts
              FROM clusters
            ), rtok AS (
              SELECT key, support, samples,
                     parts[len(parts)] AS delims,
                     len(parts) - 1 AS nw,
                     unnest(parts[1:len(parts)-1]) AS w,
                     generate_subscripts(parts[1:len(parts)-1], 1) AS i
              FROM rend
            )
            SELECT string_agg(
                     CASE WHEN regexp_extract(w, '^[0-9]+ (.*)$', 1) = chr(26)
                          THEN CASE WHEN i = nw THEN ''
                               ELSE '@ESTRING::' || substr(delims, i, 1) || '@' END
                          ELSE replace(regexp_extract(w, '^[0-9]+ (.*)$', 1), '@', '@@')
                               || CASE WHEN i = nw THEN '' ELSE substr(delims, i, 1) END
                     END, '' ORDER BY i) AS pattern,
                   max(support) AS support,
                   list_aggr(max(samples), 'string_agg', chr(31)) AS samples
            FROM rtok GROUP BY key
            """
        ),
        "op_winlog_parse": """
        WITH base AS (
          SELECT event_id,
                 CAST(event_id % 1000 AS VARCHAR) AS eid,
                 'h' || CAST(user_id % 5 AS VARCHAR) AS comp,
                 CAST(event_id % 7 AS VARCHAR) AS a,
                 CAST(event_id % 11 AS VARCHAR) AS b,
                 (event_id % 2 = 0) AS is_named
          FROM events
        )
        SELECT event_id, key, value FROM (
          SELECT event_id, 'winlog.Event.System.EventID' AS key, eid AS value FROM base
          UNION ALL
          SELECT event_id, 'winlog.Event.System.Channel', 'Application' FROM base
          UNION ALL
          SELECT event_id, 'winlog.Event.System.Computer', comp FROM base
          UNION ALL
          SELECT event_id, 'winlog.Event.EventData.Data.p1', 'v' || a
          FROM base WHERE is_named
          UNION ALL
          SELECT event_id, 'winlog.Event.EventData.Data.p2', 'w' || b
          FROM base WHERE is_named
          UNION ALL
          SELECT event_id, 'winlog.Event.EventData.Data', 'x' || a || ',' || 'y' || b
          FROM base WHERE NOT is_named
        )
        """,
        "op_macro_expand": P
        + """
        SELECT conv_id, turn_idx,
               'hdr=' || CASE WHEN appname IS NOT NULL AND appname <> ''
                    THEN appname || CASE WHEN procid IS NOT NULL AND procid <> ''
                                         THEN '[' || procid || ']' ELSE '' END || ': '
                    ELSE '' END
               || 'tag=' || lpad(lower(hex(pri)), 2, '0')
               || ' bsd=' || CAST(severity AS VARCHAR) || chr(65 + facility)
               || ' wd=' || CAST(dayofweek(ts) + 1 AS VARCHAR)
               || ' wk=' || lpad(CAST(
                    ((dayofyear(ts) - 1) - ((dayofweek(ts) - 1 + 7) % 7) + 7) // 7
                    AS VARCHAR), 2, '0')
               || ' src=127.0.0.1:0 proto=unknown'
               || ' raw=' || CAST(octet_length(encode(text)) AS VARCHAR)
               || ' p=' || strftime(ts, '%Y-%m-%dT%H:%M:%S') || 'Z' AS rendered
        FROM parsed3
        """,
        "op_kv_parse": r"""
        WITH lines AS (
          SELECT event_id,
            'user="u ' || CAST(user_id AS VARCHAR) || '" action=' || event_type ||
            ' path=/v1/' || event_type || ' retry=' || CAST(event_id % 3 AS VARCHAR) ||
            ', host=h-' || CAST(user_id % 5 AS VARCHAR) ||
            ' note=''n ' || CAST(event_id % 7 AS VARCHAR) || '''' AS text
          FROM events
        ), pairs AS (
          SELECT event_id,
                 unnest(regexp_extract_all(text, '[A-Za-z0-9._-]+=("[^"]*"|''[^'']*''|[^ ,]*)')) AS p,
                 generate_subscripts(regexp_extract_all(text, '[A-Za-z0-9._-]+=("[^"]*"|''[^'']*''|[^ ,]*)'), 1) AS pos
          FROM lines
        )
        SELECT event_id, CAST(pos - 1 AS INT) AS pos,
               regexp_extract(p, '^([A-Za-z0-9._-]+)', 1) AS key,
               CASE WHEN regexp_matches(p, '^[A-Za-z0-9._-]+=["'']')
                    THEN substr(regexp_extract(p, '=(.*)$', 1), 2,
                                length(regexp_extract(p, '=(.*)$', 1)) - 2)
                    ELSE regexp_extract(p, '=(.*)$', 1) END AS value,
               regexp_matches(p, '^[A-Za-z0-9._-]+=["'']') AS was_quoted
        FROM pairs
        """,
        "op_date_parse": """
        WITH raws AS (
          SELECT event_id,
            CASE WHEN event_id % 3 = 0 THEN strftime(ts, '%Y-%m-%dT%H:%M:%S')
                 WHEN event_id % 3 = 1 THEN strftime(ts, '%Y/%m/%d %H:%M:%S')
                 ELSE strftime(ts, '%Y-%m-%d') END AS raw
          FROM events
        )
        SELECT event_id, raw,
               strftime(try_strptime(raw,
                 ['%Y-%m-%dT%H:%M:%S', '%Y/%m/%d %H:%M:%S', '%Y-%m-%d']),
                 '%Y-%m-%dT%H:%M:%S') AS parsed_str
        FROM raws
        """,
        "op_geoip_range": (
            """
        WITH ips AS (
          SELECT event_id,
                 '10.' || CAST(user_id % 200 AS VARCHAR) || '.' ||
                 CAST(event_id % 250 AS VARCHAR) || '.1' AS ip,
                 10 * 16777216 + (user_id % 200) * 65536 + (event_id % 250) * 256 + 1 AS ip_num
          FROM events
        )
        SELECT i.event_id, i.ip, coalesce(g.geo_name, 'unknown') AS geo_name
        FROM ips i LEFT JOIN (VALUES """
            + ", ".join(f"({lo}, {hi}, '{nm}')" for lo, hi, nm in GEO_RANGES)
            + """) AS g(lo, hi, geo_name)
          ON i.ip_num BETWEEN g.lo AND g.hi
        """
        ),
        "op_metrics_probe": """
        SELECT event_type, count(*) AS n,
               CAST(sum(CAST(floor(value * 100 + 0.5) AS BIGINT)) AS BIGINT) AS cents
        FROM events GROUP BY event_type
        """,
        "op_template_funcs": """
        WITH p AS (
          SELECT *, '/corpus/' || source || '/doc_' || CAST(doc_id AS VARCHAR) || '.txt' AS path
          FROM documents
        )
        SELECT doc_id,
               length(text) AS len,
               substr(text, 1, 16) AS head16,
               upper(lang) AS lang_up,
               lpad(CAST(doc_id AS VARCHAR), 6, '0') AS padded,
               regexp_extract(path, '([^/]*)$', 1) AS base,
               regexp_extract(path, '^(.*)/[^/]*$', 1) AS dir,
               substr(sha256(text), 1, 16) AS sha16,
               md5(text) AS md5
        FROM p
        """,
        "op_netmask_inlist": """
        WITH ips AS (
          SELECT *,
                 10 * 16777216 + (user_id % 200) * 65536 + (event_id % 250) * 256 + 1 AS ip_num
          FROM events
        )
        SELECT event_type, count(*) AS n
        FROM ips
        WHERE ip_num BETWEEN 171966464 AND 176160767
          AND event_type IN ('click', 'view', 'error')
        GROUP BY event_type
        """,
        "op_subst": """
        SELECT doc_id,
               regexp_replace(text, '[aeiou]', '_', 'g') AS t_global,
               regexp_replace(text, 'table', 'TABLE') AS t_first
        FROM documents
        """,
        "pipe_format_output": P
        + f"""
        SELECT sink, conv_id, turn_idx,
               '<' || CAST(pri AS VARCHAR) || '>1 '
               || coalesce(CASE WHEN kind = 'syslog'
                                THEN regexp_extract(text, '{oracle.RFC5424_RE_SQL}', 3) END,
                           strftime(ts, '{TS_FMT_DUCK}'))
               || ' ' || coalesce(host, '-')
               || ' ' || coalesce(appname, '-')
               || ' ' || coalesce(procid, '-')
               || ' - - ' || coalesce(body, '') AS line
        FROM routed
        """,
        "pipe_correlate": W(
            """
            SELECT conv_id, CAST(-1 AS INT) AS turn_idx,
                   'ALERT conv ' || conv_id || ' turns=' || CAST(count(*) AS VARCHAR) AS text
            FROM transcripts GROUP BY conv_id HAVING count(*) >= 80
            """
        ),
        "op_cef_parse": """
        WITH lines AS (
          SELECT event_id,
                 'CEF:0|AxoCorp|engine|4.26|' || event_type || '|User activity|' ||
                 CAST(event_id % 10 AS VARCHAR) || '|src=10.0.0.' ||
                 CAST(user_id % 250 AS VARCHAR) || ' act=' || event_type AS text
          FROM events
        ), split_up AS (
          SELECT event_id, string_split(regexp_replace(text, '^CEF:', ''), '|') AS p
          FROM lines
        )
        SELECT event_id,
               TRUE AS cef_ok,
               p[2] AS vendor, p[3] AS product, p[5] AS event_class,
               p[7] AS cef_severity,
               regexp_extract(p[8], 'src=([^ ]+)', 1) AS src,
               regexp_extract(p[8], 'act=([^ ]+)', 1) AS act
        FROM split_up
        """,
        # every output constructed independently of the Spark-side
        # parse+format chain (construction-based oracle)
        "op_filterx_funcs": """
        SELECT event_id,
               'AxoCorp' AS vendor,
               CAST(event_id % 10 AS BIGINT) AS sev,
               '10.0.0.' || CAST(user_id % 250 AS VARCHAR) || '/' || event_type AS srcact,
               '<eid>' || CAST(event_id AS VARCHAR) || '</eid><etype>' ||
               event_type || '</etype><uid>' || CAST(user_id AS VARCHAR) ||
               '</uid>' AS xml,
               CAST(event_id AS VARCHAR) || ';' || event_type || ';' ||
               CAST(user_id AS VARCHAR) AS vals
        FROM events
        """,
        "op_scl_apache": """
        SELECT event_id,
               '10.0.' || CAST(user_id % 200 AS VARCHAR) || '.7' AS clientip,
               'user' || CAST(user_id % 50 AS VARCHAR) AS auth,
               '2024-10-10 13:55:36' AS ts_str,
               'GET' AS verb,
               '/api/' || event_type || '/' || CAST(event_id AS VARCHAR) AS request,
               '1.1' AS httpversion,
               CAST(200 + event_id % 4 AS INT) AS response,
               CAST(event_id % 5000 AS BIGINT) AS bytes,
               'https://ref.example/' AS referrer
        FROM events
        """,
        "op_scl_checkpoint": """
        SELECT event_id,
               TRUE AS ok,
               'gw' || CAST(user_id % 20 AS VARCHAR) AS host,
               'fw' AS prog,
               CAST(event_id AS VARCHAR) AS pid,
               CAST(NULL AS VARCHAR) AS msgid,
               '2024-06-15 10:11:'
                 || lpad(CAST(event_id % 60 AS VARCHAR), 2, '0') AS ts_str,
               event_type AS action,
               CAST(event_id AS VARCHAR) AS idv
        FROM events
        """,
        "op_scl_arr": """
        WITH lines AS (
          SELECT event_id,
                 ['Info', 'Warn', 'Error', 'Debug', 'Fatal']
                   [CAST(event_id % 5 AS INT) + 1] AS sev_word,
                 'Mod' || CAST(user_id % 7 AS VARCHAR) AS module,
                 'evt ' || event_type AS msg,
                 ts
          FROM events
        )
        SELECT event_id,
               'Radarr' AS program,
               CASE sev_word WHEN 'Info' THEN 6 WHEN 'Warn' THEN 4
                             WHEN 'Error' THEN 3 WHEN 'Debug' THEN 7
                             ELSE 5 END AS severity,
               module AS arr_module,
               msg AS message,
               strftime(ts, '%Y-%m-%d %H:%M:%S') AS ts_str
        FROM lines
        """,
        "pipe_context_grep": """
        WITH lines AS (
          SELECT event_id,
                 CAST(event_id % 50 AS VARCHAR) AS jid,
                 'v' || CAST(event_id % 7 AS VARCHAR) AS verb
          FROM events
        )
        SELECT 'job-' || jid AS context_key,
               CAST(COUNT(*) AS BIGINT) AS n_msgs,
               string_agg(verb, ',' ORDER BY event_id) AS verbs,
               string_agg(CASE WHEN verb = 'v0' THEN jid END,
                          ',' ORDER BY event_id) AS starts,
               CAST(COUNT(*) AS VARCHAR) AS len,
               list(verb ORDER BY event_id)[-1] AS newest,
               list(verb ORDER BY event_id)[-2] AS prev
        FROM lines
        GROUP BY jid
        """,
        "op_scl_mariadb": """
        SELECT event_id,
               'docker' AS syslog_info,
               'h' || CAST(user_id % 5 AS VARCHAR) AS serverhost,
               'u' || CAST(user_id % 3 AS VARCHAR) AS username,
               '172.18.0.' || CAST(event_id % 250 AS VARCHAR) AS client_host,
               CAST(event_id % 100 AS VARCHAR) AS connectionid,
               CAST(event_id AS VARCHAR) AS queryid,
               CASE WHEN event_id % 3 != 0 THEN 'QUERY'
                    ELSE 'CONNECT' END AS operation,
               CASE WHEN event_id % 3 != 0
                    THEN 'db' || CAST(user_id % 4 AS VARCHAR) END AS dbname,
               CASE WHEN event_id % 3 != 0
                    THEN 'SELECT g, AVG(x) FROM t'
                         || CAST(user_id % 4 AS VARCHAR) || ' GROUP BY g'
               END AS objectval,
               CAST(event_id % 2 AS VARCHAR) AS retcode,
               TRUE AS mariadb_ok
        FROM events
        """,
        "op_scl_pgsql": """
        SELECT event_id,
               'postgres' AS username,
               'db' || CAST(user_id % 3 AS VARCHAR) AS dbname,
               CAST(event_id % 10000 AS INT) AS pid,
               '10.0.0.' || CAST(event_id % 200 AS VARCHAR)
                 || ':5432' AS conn_from,
               CASE ['ERROR','WARNING','LOG','INFO','PANIC','DEBUG2','FATAL']
                      [CAST(event_id % 7 AS INT) + 1]
                    WHEN 'ERROR' THEN 4 WHEN 'WARNING' THEN 5
                    WHEN 'INFO' THEN 6 WHEN 'PANIC' THEN 2
                    WHEN 'DEBUG2' THEN 7 ELSE 5 END AS severity,
               'relation "t' || CAST(user_id % 5 AS VARCHAR)
                 || '", missing' AS message,
               CAST(event_id AS INT) AS query_id,
               strftime(ts, '%Y-%m-%d %H:%M:%S') || '.123' AS ts_str,
               TRUE AS pgsql_ok
        FROM events
        """,
        "op_scl_dnd": """
        SELECT event_id,
               CASE event_id % 4 WHEN 0 THEN 'raw-app' WHEN 1 THEN 'ewmm'
                    WHEN 2 THEN 'app' ELSE 'syslog' END AS path,
               CASE event_id % 4 WHEN 0 THEN 'checkpoint'
                    WHEN 2 THEN 'sudo' END AS app,
               CASE WHEN event_id % 4 = 0
                    THEN 'gw' || CAST(user_id % 20 AS VARCHAR)
                    ELSE 'h' || CAST(user_id % 20 AS VARCHAR) END AS host,
               CASE event_id % 4 WHEN 0 THEN 'CheckPoint'
                    WHEN 1 THEN '@syslog-ng' WHEN 2 THEN 'sudo'
                    ELSE 'cron' END AS prog,
               CASE event_id % 4 WHEN 0 THEN NULL WHEN 1 THEN 5
                    WHEN 2 THEN 5 ELSE 6 END AS severity,
               CASE WHEN event_id % 4 != 0
                    THEN '2024-06-15 10:11:'
                         || lpad(CAST(event_id % 60 AS VARCHAR), 2, '0')
               END AS ts_str,
               CASE WHEN event_id % 4 = 0 THEN event_type END AS cp_action,
               CASE WHEN event_id % 4 = 1
                    THEN 'ev ' || event_type END AS ewmm_msg,
               CASE WHEN event_id % 4 = 1
                    THEN CAST(event_id AS VARCHAR) END AS ewmm_num,
               CASE WHEN event_id % 4 = 2
                    THEN 'u' || CAST(user_id % 50 AS VARCHAR)
               END AS sudo_subject,
               CASE WHEN event_id % 4 = 2
                    THEN '/usr/bin/tool ' || CAST(event_id AS VARCHAR)
               END AS sudo_cmd,
               CASE event_id % 4
                    WHEN 1 THEN '{"MESSAGE":"ev ' || event_type || '","num":"'
                                || CAST(event_id AS VARCHAR)
                                || '","._TAGS":".source.s_net"}'
                    WHEN 2 THEN 'u' || CAST(user_id % 50 AS VARCHAR)
                                || ' : TTY=pts/0 ; PWD=/srv ; USER=root ;'
                                || ' COMMAND=/usr/bin/tool '
                                || CAST(event_id AS VARCHAR)
                    WHEN 3 THEN 'job ' || event_type || ' done'
               END AS body
        FROM events
        """,
        "op_rewrite_suite": """
        SELECT event_id,
               CAST(((event_id % 192) // 8) * 8 + user_id % 8 AS INT) AS pri,
               CAST(user_id % 8 AS INT) AS severity,
               CAST((event_id % 192) // 8 AS INT) AS facility,
               strftime(timezone('Asia/Tokyo',
                                 timezone('America/New_York', ts)),
                        '%Y-%m-%d %H:%M:%S') AS ts_str,
               event_type LIKE 'c%ck' AS is_click,
               event_type LIKE 's_gnup' AS is_signup,
               (user_id % 8) BETWEEN 3 AND 5 AS sev_mid,
               regexp_extract(event_type, '^(err|cli)(.*)$', 1) AS m1,
               regexp_extract(event_type, '^(err|cli)(.*)$', 2) AS m2,
               regexp_matches(event_type, '^(err|cli)(.*)$') AS matched,
               regexp_replace(event_type, '[aeiou]', '_', 'g') AS t_global,
               regexp_replace(event_type, '[aeiou]', '#') AS t_first,
               CASE WHEN event_id % 4 = 1 THEN 'all,seen'
                    ELSE 't' || CAST(event_id % 4 AS VARCHAR) || ',all,seen'
               END AS tags_str,
               event_id % 4 = 2 AS has_t2,
               FALSE AS has_gone
        FROM events
        """,
        "op_tags": """
        SELECT event_id,
               CASE WHEN event_id % 4 = 1 THEN 'all,seen'
                    ELSE 't' || CAST(event_id % 4 AS VARCHAR) || ',all,seen'
               END AS tags_str,
               event_id % 4 = 2 AS has_t2,
               FALSE AS has_gone
        FROM events
        """,
        "op_cc_mask": """
        SELECT event_id,
               'pay 411111******'
                 || substr(lpad(CAST(event_id % 1000000 AS VARCHAR), 6, '0'), 3, 4)
                 || ' then 378282******'
                 || lpad(CAST(user_id % 10000 AS VARCHAR), 4, '0')
                 || ' ref=' || event_type AS masked
        FROM events
        """,
        "op_snmptrapd": """
        SELECT event_id,
               'host' || CAST(user_id % 50 AS VARCHAR) AS hostname,
               'UDP: [127.0.0.1]:' || CAST(30000 + event_id % 999 AS VARCHAR)
                 || '->[127.0.0.1]:162' AS transport_info,
               CASE WHEN event_id % 3 = 0 THEN 'iso.3.6.1.4.1.8072.2.3.1' END
                 AS enterprise_oid,
               CASE WHEN event_id % 3 = 0 THEN 'Enterprise Specific Trap' END
                 AS trap_type,
               CASE WHEN event_id % 3 = 0
                    THEN '.' || CAST(event_id % 20 AS VARCHAR) END AS subtype,
               CASE WHEN event_id % 3 = 0 THEN '18:41:07.83' END AS uptime,
               CAST(user_id AS VARCHAR) AS oid_val,
               'msg ' || event_type || ' ''q''' AS str_val,
               'A0 BB' AS hex_val,
               '2024-06-15 10:11:'
                 || lpad(CAST(event_id % 60 AS VARCHAR), 2, '0') AS ts_str
        FROM events
        WHERE event_id % 17 <> 0
        """,
        "op_kmsg_parse": """
        SELECT event_id,
               CAST(event_id % 192 AS INT) AS pri,
               CAST(event_id % 192 % 8 AS INT) AS severity,
               CAST((event_id % 192) // 8 AS INT) AS facility,
               CAST(event_id AS BIGINT) AS kmsg_seq,
               CAST(user_id * 1000 AS BIGINT) AS kmsg_ts_us,
               event_type || ': device event' AS message,
               event_type AS subsystem,
               'block' AS dev_type,
               CAST(event_id % 16 AS VARCHAR) AS dev_major,
               CAST(user_id % 4 AS VARCHAR) AS dev_minor
        FROM events
        """,
        "pipe_multiline": W(
            """
            SELECT conv_id, segment_id, min(turn_idx) AS turn_idx,
                   string_agg(text, ' // ' ORDER BY turn_idx) AS assembled,
                   count(*) AS n_lines
            FROM (
              SELECT conv_id, turn_idx, text,
                     CAST(sum(CASE WHEN regexp_matches(text, '^<[0-9]') THEN 1 ELSE 0 END)
                       OVER (PARTITION BY conv_id ORDER BY turn_idx
                             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS segment_id
              FROM transcripts
            ) GROUP BY conv_id, segment_id
            """
        ),
        "pipe_filterx": P
        + """
        SELECT conv_id, turn_idx,
               CASE WHEN severity <= 3 THEN 'err'
                    WHEN coalesce(latency_ms > 40, FALSE) THEN 'slow'
                    ELSE 'norm' END AS class,
               -- switch jump-table: 'ok' enters at verdict then breaks;
               -- 'error' sets verdict and falls through into default;
               -- anything else enters at default only
               CASE WHEN status = 'ok' THEN 'fine'
                    WHEN status = 'error' THEN 'bad' END AS verdict,
               (status IS DISTINCT FROM 'ok') AS flagged,
               retry + 1 AS retry,
               substring(conv_id, 1, 8) AS short,
               strftime(strptime(strftime(ts, '%Y-%m-%d %H:%M:%S'),
                                 '%Y-%m-%d %H:%M:%S'), '%H:%M') AS hh,
               sha256(conv_id) AS digest
        FROM parsed3
        WHERE kind <> 'free'
        """,
        "pipe_smart_multiline": """
        WITH t AS (
          SELECT 'conv-' || lpad(CAST(user_id AS VARCHAR), 8, '0') AS conv_id,
                 CAST(row_number() OVER (PARTITION BY user_id ORDER BY event_id) - 1 AS INT) AS turn_idx,
                 CAST(event_id % 5 AS INT) AS m,
                 CASE CAST(event_id % 5 AS INT)
                   WHEN 0 THEN 'java.lang.RuntimeException: boom-' || CAST(event_id % 17 AS VARCHAR)
                   WHEN 1 THEN chr(9) || 'at com.example.App.run(App.java:' || CAST(event_id % 97 AS VARCHAR) || ')'
                   WHEN 2 THEN chr(9) || 'at com.example.Main.main(Main.java:' || CAST(event_id % 89 AS VARCHAR) || ')'
                   WHEN 3 THEN 'plain turn ' || CAST(event_id % 13 AS VARCHAR)
                   ELSE 'another plain ' || CAST(event_id % 11 AS VARCHAR)
                 END AS text
          FROM events
        ), fsm AS (
          -- FSM outcome derived from the generating rule (the shipped
          -- smart-multi-line.fsm semantics):
          --   plain lines (3,4) always start; an exception line (0)
          --   ALWAYS starts (java_after_exception accepts no new
          --   exception header — the engine retries it from
          --   start_state, opening a fresh trace); a frame line (1,2)
          --   continues iff the nearest preceding non-frame line was
          --   an exception
          SELECT conv_id, turn_idx, text, m,
                 last_value(CASE WHEN m IN (0, 3, 4) THEN m END IGNORE NULLS)
                   OVER (PARTITION BY conv_id ORDER BY turn_idx
                         ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS anchor
          FROM t
        ), seg AS (
          SELECT conv_id, turn_idx, text,
                 CAST(sum(CASE WHEN m IN (0, 3, 4) THEN 1
                               ELSE CASE WHEN coalesce(anchor, -1) = 0 THEN 0 ELSE 1 END END)
                   OVER (PARTITION BY conv_id ORDER BY turn_idx
                         ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS segment_id
          FROM fsm
        )
        SELECT conv_id, segment_id, min(turn_idx) AS turn_idx,
               string_agg(text, ' // ' ORDER BY turn_idx) AS assembled,
               count(*) AS n_lines
        FROM seg GROUP BY conv_id, segment_id
        """,
        "op_sdata_rekey": """
        WITH expected AS (
          SELECT event_id, '.SD.META.SEQ' AS key,
                 CAST(event_id % 1000 AS VARCHAR) AS value FROM events
          UNION ALL
          SELECT event_id, '.SD.META.ET', event_type FROM events
          UNION ALL
          SELECT event_id, '.SD.ORIGIN.IP',
                 '10.0.0.' || CAST(user_id % 250 AS VARCHAR) FROM events
        )
        SELECT event_id, key, value FROM expected
        """,
        "op_audit_parse": """
        SELECT event_id,
               'SYSCALL' AS audit_type,
               CAST(event_id % 100000 AS BIGINT) AS audit_serial,
               '2023-11-14T22:13:20' AS audit_ts_str,
               'c000003e' AS arch,
               'tool' AS comm,
               '/bin/tool ' || CAST(event_id % 7 AS VARCHAR) AS proctitle
        FROM events
        """,
        "doc_text_profile": oracle.doc_text_profile_sql(),
        "doc_exact_dedup": oracle.doc_exact_dedup_sql(),
        "doc_jaccard_pairs": oracle.doc_jaccard_pairs_sql(100_000),
        "doc_minhash_bands": oracle.doc_minhash_sql(8, 4),
        "doc_minhash_pairs": oracle.doc_minhash_pairs_sql(8, 4, 100_000),
        "doc_contamination": oracle.doc_contamination_sql(3, 97),
        "doc_dup_clusters": oracle.doc_dup_clusters_sql(8, 4, 100_000),
        "doc_gopher": oracle.doc_gopher_sql(2),
        "doc_tfidf": oracle.doc_tfidf_sql(3),
        "doc_rarity_buckets": oracle.doc_rarity_buckets_sql(3),
        "doc_c4_filter": oracle.doc_c4_filter_sql(
            _C4_BRACE_MOD, _C4_LOREM_MOD
        ),
        "doc_pii_redact": oracle.doc_pii_redact_sql(*_PII_MODS),
        "doc_source_mix": oracle.doc_source_mix_sql(
            _MIX_WEIGHTS, 0.75, "mix"
        ),
        "doc_hash_split": oracle.doc_hash_split_sql(
            _SPLIT_FRACTIONS, "split"
        ),
        "doc_substr_spans": oracle.doc_substr_spans_sql(5, 8),
        "emb_topk": oracle.emb_topk_sql(5, 10),
        "emb_ivf_topk": oracle.emb_ivf_topk_sql(5, 10, 16, 4),
        "emb_near_dups": oracle.emb_near_dups_sql(500_000),
        "emb_semantic_dedup": oracle.emb_semantic_dedup_sql(500_000),
        # doc_simhash_pairs, emb_lsh_topk: intentionally no oracle
        # (non-SQL-expressible; rows-only check)
    }


def extra_queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """Queries NOT exposed to the driver's 50-entry correctness
    harness: strict stage-prefixes of a gate query (pipe_transcripts/
    parse/enrich are prefixes of pipe_routed's plan; doc_minhash_bands
    of doc_minhash_pairs; pipe_patterndb's flat classify feeds
    pipe_patterndb_xml, with tree==flat unit-proven), single-operator
    variants now folded into op_rewrite_suite, a second aggregate over
    the routed frame (pipe_sink_histogram — pipe_sink_counts covers
    the per-sink fan-out), the declared rows-only ANN/simhash
    variants, and the operators added AFTER the gate filled its 50
    slots (round-5 SCL adapters, emb_semantic_dedup, and the
    continuation-session training ops doc_tfidf / doc_rarity_buckets /
    doc_c4_filter / doc_pii_redact / doc_source_mix / doc_hash_split /
    doc_substr_spans —
    all full-oracle hash-checked). tools/check_oracle.py and
    tests/test_entry_contract.py still run every one of these against
    its oracle each session."""
    return {
        "pipe_transcripts": q_pipe_transcripts,
        "pipe_parse": q_pipe_parse,
        "pipe_enrich": q_pipe_enrich,
        "pipe_sink_histogram": q_pipe_sink_histogram,
        "pipe_patterndb": q_pipe_patterndb,
        "op_subst": q_op_subst,
        "op_tags": q_op_tags,
        "doc_minhash_bands": q_doc_minhash_bands,
        "doc_simhash_pairs": q_doc_simhash_pairs,
        "emb_lsh_topk": q_emb_lsh_topk,
        "op_scl_arr": q_op_scl_arr,
        "op_scl_mariadb": q_op_scl_mariadb,
        "op_scl_pgsql": q_op_scl_pgsql,
        "pipe_context_grep": q_pipe_context_grep,
        "emb_semantic_dedup": q_emb_semantic_dedup,
        "doc_tfidf": q_doc_tfidf,
        "doc_rarity_buckets": q_doc_rarity_buckets,
        "doc_c4_filter": q_doc_c4_filter,
        "doc_pii_redact": q_doc_pii_redact,
        "doc_source_mix": q_doc_source_mix,
        "doc_hash_split": q_doc_hash_split,
        "doc_substr_spans": q_doc_substr_spans,
    }


def oracle_sql() -> dict[str, str]:
    """Oracles for exactly the driver-checked gate in queries()."""
    gate = set(queries())
    return {k: v for k, v in _all_oracle_sql().items() if k in gate}


def extra_oracle_sql() -> dict[str, str]:
    """Oracles for the extra (non-driver) queries."""
    extra = set(extra_queries())
    return {k: v for k, v in _all_oracle_sql().items() if k in extra}
