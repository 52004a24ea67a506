"""grouping-by / sessionize / suppress / rate-limit semantics, including
the salted == unsalted equivalence proof on skewed data."""

from __future__ import annotations

import datetime as dt

from pyspark.sql import functions as F

from axosyslog_spark.operators import grouping
from axosyslog_spark.sources.transcripts import generate_transcripts


def test_salted_equals_unsalted_on_skew(spark):
    # 1 hot conv owns 30% of 20k rows — the salting target scenario
    t = generate_transcripts(spark, 20_000, 200, skew_hot_convs=1, partitions=8)
    a = grouping.grouped_ordered_agg(t).orderBy("conv_id").collect()
    b = (
        grouping.salted_ordered_agg(t, fragment_rows=256)
        .orderBy("conv_id")
        .collect()
    )
    assert len(a) == len(b) == 200
    for x, y in zip(a, b):
        assert x.conv_id == y.conv_id
        assert x.n_turns == y.n_turns
        assert x.first_ts == y.first_ts and x.last_ts == y.last_ts
        assert x.agg_values == y.agg_values


def _turns(spark, rows):
    return spark.createDataFrame(
        rows, "conv_id string, turn_idx int, text string, ts timestamp"
    )


def test_sessionize_gap_detection(spark):
    t0 = dt.datetime(2024, 1, 1)
    rows = [
        ("c1", 0, "a", t0),
        ("c1", 1, "b", t0 + dt.timedelta(minutes=10)),
        ("c1", 2, "c", t0 + dt.timedelta(minutes=50)),   # 40min gap -> new session
        ("c1", 3, "d", t0 + dt.timedelta(minutes=55)),
        ("c2", 0, "e", t0),
    ]
    out = grouping.sessionize(_turns(spark, rows), gap_minutes=30).collect()
    sess = {(r.conv_id, r.turn_idx): r.session_id for r in out}
    assert sess == {
        ("c1", 0): 0, ("c1", 1): 0, ("c1", 2): 1, ("c1", 3): 1, ("c2", 0): 0,
    }


def test_suppress_consecutive_duplicates(spark):
    t0 = dt.datetime(2024, 1, 1)
    rows = [
        ("c1", 0, "same", t0),
        ("c1", 1, "same", t0 + dt.timedelta(seconds=1)),   # dropped
        ("c1", 2, "other", t0 + dt.timedelta(seconds=2)),
        ("c1", 3, "same", t0 + dt.timedelta(seconds=3)),   # kept (not consecutive)
    ]
    out = grouping.suppress(_turns(spark, rows)).collect()
    assert sorted(r.turn_idx for r in out) == [0, 2, 3]


def test_suppress_window_bound(spark):
    t0 = dt.datetime(2024, 1, 1)
    rows = [
        ("c1", 0, "same", t0),
        ("c1", 1, "same", t0 + dt.timedelta(seconds=100)),  # outside 10s window: kept
    ]
    out = grouping.suppress(_turns(spark, rows), within_seconds=10).collect()
    assert len(out) == 2


def test_rate_limit_keeps_first_n(spark):
    t0 = dt.datetime(2024, 1, 1)
    rows = [("c1", i, f"t{i}", t0) for i in range(10)] + [("c2", 0, "x", t0)]
    out = grouping.rate_limit(_turns(spark, rows), ["conv_id"], max_rows=3).collect()
    got = sorted((r.conv_id, r.turn_idx) for r in out)
    assert got == [("c1", 0), ("c1", 1), ("c1", 2), ("c2", 0)]


def test_rate_limit_bucket_replenishes(spark):
    t0 = dt.datetime(2024, 1, 1)
    # 5 rows in hour 0, 3 in hour 1 — rate 2/hour keeps 2 + 2
    rows = [("c1", i, f"t{i}", t0 + dt.timedelta(minutes=i)) for i in range(5)]
    rows += [("c1", 10 + i, f"u{i}", t0 + dt.timedelta(hours=1, minutes=i)) for i in range(3)]
    rows += [("c2", 0, "x", t0)]
    out = grouping.rate_limit_bucket(
        _turns(spark, rows), ["conv_id"], rate=2, window_s=3600
    ).collect()
    got = sorted((r.conv_id, r.turn_idx) for r in out)
    assert got == [("c1", 0), ("c1", 1), ("c1", 10), ("c1", 11), ("c2", 0)]


def test_group_lines_order(spark):
    t0 = dt.datetime(2024, 1, 1)
    # emitted shuffled; assembly must follow turn_idx
    rows = [("c1", 2, "C", t0), ("c1", 0, "A", t0), ("c1", 1, "B", t0)]
    out = grouping.group_lines(_turns(spark, rows), sep="").collect()[0]
    assert out.assembled == "ABC" and out.n_lines == 3


def test_grouping_having(spark):
    t0 = dt.datetime(2024, 1, 1)
    rows = [("c1", i, "x", t0) for i in range(5)] + [("c2", 0, "y", t0)]
    df = _turns(spark, rows).withColumn("role", F.col("text"))
    out = grouping.grouped_ordered_agg(df, having=F.col("n_turns") >= 2).collect()
    assert [r.conv_id for r in out] == ["c1"]


def test_rate_limit_reference_acceptance_table(spark):
    """The rate-limit filter acceptance table (tests/light
    functional_tests/filters/rate-limit): 100 messages in one second,
    keyed on PROGRAM — every (programs, rate) combination must match
    the reference's matched/not_matched stats."""
    import datetime as _dt

    from axosyslog_spark.operators.grouping import rate_limit_bucket

    base = _dt.datetime(2024, 1, 1, 0, 0, 0)
    cases = [
        (100, 1, 100, 100, 0),
        (100, 1, 1, 1, 99),
        (100, 5, 1, 5, 95),
        (100, 5, 5, 25, 75),
    ]
    for n, n_programs, rate, exp_match, exp_nomatch in cases:
        rows = [
            (
                f"prog{(i % n_programs) + 1}",
                i,
                base + _dt.timedelta(microseconds=i * 10_000),  # one sec
            )
            for i in range(n)
        ]
        df = spark.createDataFrame(rows, "program string, idx long, ts timestamp")
        kept = rate_limit_bucket(
            df, key_cols=["program"], rate=rate, ts_col="ts",
            order_col="idx",
        ).count()
        assert kept == exp_match, (n_programs, rate, kept)
        assert n - kept == exp_nomatch


def test_grouping_by_c_suite_inject_modes(spark):
    """Ported from modules/correlation/tests/test_grouping_by.c: a
    trigger on context-length == 3 emits ONE aggregate whose value is
    the comma-joined $(context-values $PROGRAM) list; pass-through
    keeps the originals beside it, aggregate-only drops them, and a
    prefix() renames the aggregate column."""
    import datetime as _dt

    from pyspark.sql import functions as F

    from axosyslog_spark.operators.grouping import correlate

    rows = [
        ("key", i, p, _dt.datetime(2024, 1, 1, 0, 0, i))
        for i, p in enumerate(["first", "second", "third"])
    ]
    df = spark.createDataFrame(rows, "key string, idx long, program string, ts timestamp")

    out = correlate(
        df, key="key", sort_key="idx", value="program",
        trigger=F.col("n_turns") == 3,
        synthetic_template={"aggr": F.col("agg_values")},
        inject_mode="pass-through",
    ).collect()
    # 3 originals + 1 aggregate; the aggregate carries the ordered list
    assert len(out) == 4
    synth = [r for r in out if r["synthetic"]]
    assert len(synth) == 1
    assert synth[0]["aggr"] == "first,second,third"
    assert sorted(r["program"] for r in out if not r["synthetic"]) == [
        "first", "second", "third",
    ]

    only = correlate(
        df, key="key", sort_key="idx", value="program",
        trigger=F.col("n_turns") == 3,
        synthetic_template={"prefix.aggr": F.col("agg_values")},
        inject_mode="aggregate-only",
    ).collect()
    assert len(only) == 1
    assert only[0]["prefix.aggr"] == "first,second,third"

    # an unsatisfied trigger emits NO aggregate
    none = correlate(
        df, key="key", sort_key="idx", value="program",
        trigger=F.col("n_turns") == 4, inject_mode="aggregate-only",
    ).collect()
    assert none == []
