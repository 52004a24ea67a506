"""pdbtool patternize (SLCT clustering) — cases ported from
modules/correlation/tests/test_patternize.c plus pattern-render and
iterate-outliers behavior."""

from __future__ import annotations

from pyspark.sql import functions as F

from axosyslog_spark.operators.patternize import (
    DEFAULT_DELIMITERS,
    frequent_words,
    patternize,
)

DELIMS = " :&~?![]=,;()'\""


def _df(spark, lines: list[str]):
    return spark.createDataFrame([(line,) for line in lines], "text string")


def _freq(spark, lines, support):
    rows = frequent_words(_df(spark, lines), "text", support, DELIMS).collect()
    return {f"{r.pos} {r.word}": r.n for r in rows}


def test_frequent_words_cases(spark):
    # test_patternize.c test_frequent_words table
    assert _freq(spark, ["a"], 0)["0 a"] == 1
    got = _freq(spark, ["a b"], 0)
    assert got["0 a"] == 1 and got["1 b"] == 1
    got = _freq(spark, ["a b", "b a"], 1)
    assert (got["0 a"], got["1 a"], got["0 b"], got["1 b"]) == (1, 1, 1, 1)
    got = _freq(spark, ["a b", "a b"], 0)
    assert got["0 a"] == 2 and got["1 b"] == 2
    got = _freq(spark, ["a b", "b a", "a c"], 2)
    assert got == {"0 a": 2}


def _clusters(spark, lines, support):
    out = patternize(
        _df(spark, lines), "text", absolute_support=support,
        delimiters=DELIMS, num_samples=10,
    ).collect()
    return {r.pattern: (r.support, sorted(r.samples)) for r in out}


def test_find_clusters_cases(spark):
    # test_patternize.c test_find_clusters_slct table
    got = _clusters(spark, ["a"], 0)
    assert got == {"a": (1, ["a"])}

    got = _clusters(spark, ["a", "b"], 0)
    assert got == {"a": (1, ["a"]), "b": (1, ["b"])}

    got = _clusters(spark, ["a", "b", "a", "b"], 2)
    assert got == {"a": (2, ["a", "a"]), "b": (2, ["b", "b"])}

    lines = ["alma korte korte alma", "alma korte", "bela korte", "alma"]
    got = _clusters(spark, lines, 1)
    assert len(got) == 4 and all(n == 1 for n, _ in got.values())

    lines = ["alma korte"] * 4 + ["bela korte"] * 2 + ["alma"]
    got = _clusters(spark, lines, 2)
    assert got["alma korte"][0] == 4
    assert got["bela korte"][0] == 2
    assert len(got) == 2

    got = _clusters(spark, lines, 3)
    assert got == {"alma korte": (4, ["alma korte"] * 4)}


def test_estring_rendering(spark):
    lines = [
        "alma korte asdf1 labda",
        "alma korte asdf2 labda",
        "alma korte asdf3 labda",
        "sallala",
    ]
    got = _clusters(spark, lines, 3)
    assert list(got) == ["alma korte @ESTRING:: @labda"]
    assert got["alma korte @ESTRING:: @labda"][0] == 3
    # trailing variable token: reference renders NOTHING for a last
    # ESTRING (the "syslog-ng won't handle that" rule)
    lines = ["user login ok1", "user login ok2", "user login ok3"]
    got = _clusters(spark, lines, 3)
    assert list(got) == ["user login "]


def test_delimiter_sequence_distinguishes_clusters(spark):
    # same word skeleton, different delimiters -> different clusters
    lines = ["a b", "a b", "a=b", "a=b"]
    got = _clusters(spark, lines, 2)
    assert got == {"a b": (2, ["a b", "a b"]), "a=b": (2, ["a=b", "a=b"])}


def test_at_escaping(spark):
    got = _clusters(spark, ["user@host login", "user@host login"], 2)
    assert list(got) == ["user@@host login"]


def test_percentage_support(spark):
    # 50 lines; support 4% -> absolute 2. "only once"/"also once"
    # share the frequent (1, 'once') pair -> a legit variable cluster.
    lines = ["x y"] * 48 + ["only once", "also once"]
    out = patternize(_df(spark, lines), "text", support=4.0).collect()
    assert {(r.pattern, r.support) for r in out} == {
        ("x y", 48),
        ("@ESTRING:: @once", 2),
    }


def test_iterate_outliers(spark):
    # round 1: support = 33 of 330 lines -> the rare family (30 lines,
    # word support 30 < 33) is all outliers; round 2 re-runs on the 30
    # remaining lines with support = 3 and clusters them.
    lines = ["common event x"] * 300 + [
        "rare thing %d happened" % i for i in range(30)
    ]
    base = patternize(
        _df(spark, lines), "text", support=10.0, delimiters=" "
    ).collect()
    assert {(r.pattern, r.support) for r in base} == {("common event x", 300)}
    it = patternize(
        _df(spark, lines), "text", support=10.0, delimiters=" ",
        iterate_outliers=True,
    ).collect()
    got = {(r.pattern, r.support) for r in it}
    assert got == {
        ("common event x", 300),
        ("rare thing @ESTRING:: @happened", 30),
    }


def test_default_delimiters_constant():
    assert DEFAULT_DELIMITERS == " :&~?![]=,;()'\""


def test_pdbtool_dump_smoke(capsys):
    # pdbtool dump: plan-time only (no Spark); shows the dispatch
    # leaves with members in precedence order
    import tools.pdbtool as pt

    rc = pt.main(
        ["dump", "--ruleset", "axosyslog_spark/fixtures/transcripts.pdb"]
    )
    out = capsys.readouterr().out
    assert rc == 0
    assert "prefix 'status='" in out
    assert "rule_id='kv_retry'" in out
    assert out.index("kv_retry") < out.index("kv_plain")  # precedence
