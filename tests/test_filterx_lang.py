"""FilterX language front-end tests (lib/filterx grammar subset)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from axosyslog_spark.functions.filterx_lang import (
    FilterXSyntaxError,
    compile_filterx,
    filterx,
)


@pytest.fixture()
def frame(spark):
    rows = [
        (0, "ok", 120, "h1"),
        (1, "error", 2500, "h2"),
        (2, "ok", 1800, "h1"),
        (3, None, 50, "h3"),
    ]
    return spark.createDataFrame(
        rows, "id int, status string, latency_ms int, host string"
    )


def _rows(df):
    return {r["id"]: r.asDict() for r in df.collect()}


def test_assign_and_declare(frame):
    out = filterx(
        frame,
        """
        declare threshold = 1000;
        $slow = $latency_ms > threshold;
        $lat_s = double($latency_ms) / 1000.0;
        """,
    )
    got = _rows(out)
    assert got[0]["slow"] is False and got[1]["slow"] is True
    assert got[1]["lat_s"] == 2.5


def test_if_elif_else_with_drop(frame):
    out = filterx(
        frame,
        """
        if ($status == "error") {
          drop;
        } elif ($latency_ms > 1000) {
          $bucket = "slow";
        } else {
          $bucket = "fast";
        };
        """,
    )
    got = _rows(out)
    assert set(got) == {0, 2, 3}
    assert got[0]["bucket"] == "fast" and got[2]["bucket"] == "slow"


def test_bare_expression_is_a_filter(frame):
    out = filterx(frame, '$status == "ok";')
    assert set(_rows(out)) == {0, 2}


def test_null_coalesce_and_ternary(frame):
    out = filterx(
        frame,
        """
        $st = $status ?? "unset";
        $cls = $latency_ms > 1000 ? "hi" : "lo";
        """,
    )
    got = _rows(out)
    assert got[3]["st"] == "unset" and got[0]["st"] == "ok"
    assert got[1]["cls"] == "hi" and got[3]["cls"] == "lo"


def test_regex_and_membership(frame):
    out = filterx(
        frame,
        """
        $is_h = $host =~ /^h[0-9]$/;
        if ($host in ["h1", "h3"]) { $grp = "a"; } else { $grp = "b"; };
        """,
    )
    got = _rows(out)
    assert all(got[i]["is_h"] for i in got)
    assert got[0]["grp"] == "a" and got[1]["grp"] == "b"


def test_done_stops_the_block(frame):
    out = filterx(
        frame,
        """
        $seen = true;
        if ($status == "error") { done; };
        $late = $latency_ms > 1000;
        """,
    )
    got = _rows(out)
    assert all(got[i]["seen"] for i in got)
    # error row hit done BEFORE $late was assigned -> stays null
    assert got[1]["late"] is None
    assert got[2]["late"] is True and got[0]["late"] is False


def test_unknown_field_reads_null(frame):
    out = filterx(frame, "$copy = $not_a_field ?? \"dflt\";")
    assert all(r["copy"] == "dflt" for r in out.collect())


def test_unset_and_functions(frame):
    out = filterx(
        frame,
        """
        unset($host);
        $up = upper($status ?? "");
        $h = sha256(string($id));
        $n = len($up);
        """,
    )
    got = _rows(out)
    assert got[0]["host"] is None
    assert got[1]["up"] == "ERROR" and got[1]["n"] == 5
    import hashlib

    assert got[0]["h"] == hashlib.sha256(b"0").hexdigest()


def test_parse_kv_builtin(spark):
    df = spark.createDataFrame([(1, 'a=1 b="x y"')], "id int, text string")
    out = filterx(df, "$kv = parse_kv($text);")
    assert out.collect()[0]["kv"] == {"a": "1", "b": "x y"}


def test_arithmetic_and_logic(frame):
    out = filterx(
        frame,
        """
        $x = $latency_ms * 2 + 10;
        $both = $latency_ms > 100 and $host == "h1";
        $either = $latency_ms > 2000 or $host == "h3";
        """,
    )
    got = _rows(out)
    assert got[0]["x"] == 250
    assert got[0]["both"] is True and got[1]["both"] is False
    assert got[1]["either"] is True and got[0]["either"] is False


def test_nested_if(frame):
    out = filterx(
        frame,
        """
        if ($host == "h1") {
          if ($latency_ms > 1000) { $k = "h1-slow"; } else { $k = "h1-fast"; };
        } else {
          $k = "other";
        };
        """,
    )
    got = _rows(out)
    assert got[0]["k"] == "h1-fast" and got[2]["k"] == "h1-slow"
    assert got[1]["k"] == "other"


def test_syntax_errors():
    with pytest.raises(FilterXSyntaxError):
        compile_filterx("$x = ;")
    with pytest.raises(FilterXSyntaxError):
        compile_filterx("if $a { $b = 2; };")  # missing parens
    with pytest.raises(FilterXSyntaxError):
        compile_filterx("$x = unknownfn($y);")
    with pytest.raises(FilterXSyntaxError):
        compile_filterx("$x = notdeclared;")


def test_compiled_block_is_reusable(frame):
    blk = compile_filterx('$ok = $status == "ok";', known_fields=frame.columns)
    out1 = blk.apply(frame)
    out2 = blk.apply(frame.filter(F.col("id") < 2))
    assert out1.count() == 4 and out2.count() == 2


def test_drop_then_assign_same_field(frame):
    # Regression (ADVICE r2): filter must resolve against ORIGINAL values,
    # not post-update ones — drop on $status then overwrite $status.
    out = filterx(
        frame,
        """
        if ($status == "error") { drop; };
        $status = "done";
        """,
    )
    got = _rows(out)
    assert set(got) == {0, 2, 3}
    assert all(r["status"] == "done" for r in got.values())


def test_filter_sees_original_after_assignment(frame):
    # `$lat = $lat * 2; $lat < 500;` — the bare-expression filter already
    # folds the assignment symbolically (lat*2 < 500); applying the frame
    # filter first must NOT double it again to lat*4.
    out = filterx(
        frame,
        """
        $latency_ms = $latency_ms * 2;
        $latency_ms < 500;
        """,
    )
    got = _rows(out)
    assert set(got) == {0, 3}
    assert got[0]["latency_ms"] == 240 and got[3]["latency_ms"] == 100
