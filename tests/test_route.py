"""Routing semantics — the logpath flags contract.

Mirrors the reference's E2E specs
tests/light/functional_tests/logpath/test_flags_final.py:32-69,
test_flags_fallback.py and the multiplexer two-phase loop
(lib/logmpx.c:97-178): multi-delivery, final short-circuit,
fallback-iff-nothing-matched.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from axosyslog_spark.operators.route import RouteBranch, RouteSpec, route_flags


def _routes(spark, spec, rows, schema):
    df = spark.createDataFrame(rows, schema)
    out = route_flags(df, spec).select("id", "routes").collect()
    return {r.id: list(r.routes) for r in out}


def test_multi_delivery_and_fallback(spark):
    spec = RouteSpec(
        branches=(
            RouteBranch("s1", F.col("a") > 0),
            RouteBranch("s2", F.col("b") > 0),
            RouteBranch("sf", None, fallback=True),
        )
    )
    got = _routes(
        spark,
        spec,
        [(1, 1, 1), (2, 1, 0), (3, 0, 1), (4, 0, 0)],
        "id int, a int, b int",
    )
    assert got == {1: ["s1", "s2"], 2: ["s1"], 3: ["s2"], 4: ["sf"]}


def test_final_stops_later_branches_only(spark):
    # declaration order: s1 (before final) fires regardless; s3 (after)
    # is suppressed for rows where the final branch matched
    spec = RouteSpec(
        branches=(
            RouteBranch("s1", F.col("a") > 0),
            RouteBranch("s2", F.col("b") > 0, final=True),
            RouteBranch("s3", F.col("c") > 0),
            RouteBranch("sf", None, fallback=True),
        )
    )
    got = _routes(
        spark,
        spec,
        [
            (1, 1, 1, 1),  # a,b,c all match: s1 + s2(final) -> s3 blocked
            (2, 0, 1, 1),  # b final: s2 only
            (3, 1, 0, 1),  # no final: s1 + s3
            (4, 0, 0, 0),  # nothing: fallback
            (5, 0, 0, 1),  # s3 only
        ],
        "id int, a int, b int, c int",
    )
    assert got == {
        1: ["s1", "s2"],
        2: ["s2"],
        3: ["s1", "s3"],
        4: ["sf"],
        5: ["s3"],
    }


def test_fallback_not_fired_when_final_matched(spark):
    spec = RouteSpec(
        branches=(
            RouteBranch("s1", F.col("a") > 0, final=True),
            RouteBranch("sf", None, fallback=True),
        )
    )
    got = _routes(spark, spec, [(1, 1), (2, 0)], "id int, a int")
    assert got == {1: ["s1"], 2: ["sf"]}


def test_null_predicate_is_no_match(spark):
    # filter eval failure/NULL == unmatched (filter-pipe.c drop semantics)
    spec = RouteSpec(
        branches=(
            RouteBranch("s1", F.col("a") > 0),
            RouteBranch("sf", None, fallback=True),
        )
    )
    got = _routes(spark, spec, [(1, None), (2, 1)], "id int, a int")
    assert got == {1: ["sf"], 2: ["s1"]}


def test_conditional_fallback_predicate(spark):
    # a fallback branch may itself carry a predicate: fires only when
    # nothing matched AND its own predicate holds -> row can vanish
    spec = RouteSpec(
        branches=(
            RouteBranch("s1", F.col("a") > 0),
            RouteBranch("sf", F.col("b") > 0, fallback=True),
        )
    )
    got = _routes(spark, spec, [(1, 0, 1), (2, 0, 0)], "id int, a int, b int")
    assert got == {1: ["sf"], 2: []}
