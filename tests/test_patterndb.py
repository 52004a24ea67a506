"""PatternDB golden extraction cases — lifted in spirit from
modules/correlation/tests/test_radix.c (class parsing) and the F4
pattern_rules fixture."""

from __future__ import annotations

import pytest

from axosyslog_spark.operators.patterndb import (
    PatternDB,
    PdbRule,
    compile_rule,
)


def _apply(spark, rules, lines):
    df = spark.createDataFrame([(i, t) for i, t in enumerate(lines)], "id int, text string")
    pdb = PatternDB(rules)
    out = {r.id: r.asDict() for r in pdb.apply(df).collect()}
    return [out[i] for i in range(len(lines))]


F4_RULES = [
    PdbRule("kv_status", "status=@ESTRING:status: @latency_ms=@NUMBER:latency_ms@ path=@ESTRING:path:@"),
    PdbRule("login", "Accepted @ESTRING:auth_method: @for @ESTRING:user: @from @IPv4:src_ip@"),
]


def test_f4_kv_status(spark):
    rows = _apply(spark, F4_RULES, ["status=ok latency_ms=117 path=/v1/run"])
    r = rows[0]
    assert r["rule_id"] == "kv_status"
    assert r["status"] == "ok"
    assert r["latency_ms"] == 117          # NUMBER -> bigint
    assert r["path"] == "/v1/run"


def test_f4_login(spark):
    rows = _apply(
        spark, F4_RULES, ["Accepted password for alice from 10.1.2.3"]
    )
    r = rows[0]
    assert r["rule_id"] == "login"
    assert r["auth_method"] == "password"
    assert r["user"] == "alice"
    assert r["src_ip"] == "10.1.2.3"


def test_unmatched_is_null(spark):
    rows = _apply(spark, F4_RULES, ["no pattern here"])
    assert rows[0]["rule_id"] is None
    assert rows[0]["status"] is None


def test_parser_classes(spark):
    rules = [
        PdbRule("num", "n=@NUMBER:n@ f=@FLOAT:f@"),
        PdbRule("q", "said @QSTRING:quote:\"@ end"),
        PdbRule("mac", "mac=@MACADDR:mac@"),
        PdbRule("mail", "from @EMAIL:addr@"),
        PdbRule("set", "id=@SET:code:ABC0123456789@!"),
        PdbRule("pcre", "v=@PCRE:ver:[0-9]+\\.[0-9]+@;"),
        PdbRule("rest", "tail: @ANYSTRING:rest@"),
    ]
    rows = _apply(
        spark,
        rules,
        [
            "n=-42 f=3.14",
            'said "hello world" end',
            "mac=aa:bb:cc:dd:ee:ff",
            "from bob@example.com",
            "id=A1B2!",
            "v=2.17;",
            "tail: everything else here",
        ],
    )
    assert rows[0]["rule_id"] == "num" and rows[0]["n"] == -42 and rows[0]["f"] == 3.14
    assert rows[1]["rule_id"] == "q" and rows[1]["quote"] == '"hello world"'
    assert rows[2]["mac"] == "aa:bb:cc:dd:ee:ff"
    assert rows[3]["addr"] == "bob@example.com"
    assert rows[4]["code"] == "A1B2"
    assert rows[5]["ver"] == "2.17"
    assert rows[6]["rest"] == "everything else here"


def test_longest_literal_prefix_wins(spark):
    # radix-trie preference: the more specific literal prefix matches
    # even when declared later
    rules = [
        PdbRule("generic", "error @ANYSTRING:msg@"),
        PdbRule("specific", "error code=@NUMBER:code@"),
    ]
    rows = _apply(spark, rules, ["error code=7", "error something broke"])
    assert rows[0]["rule_id"] == "specific" and rows[0]["code"] == 7
    assert rows[1]["rule_id"] == "generic" and rows[1]["msg"] == "something broke"


def test_at_escape(spark):
    rules = [PdbRule("a", "user@@host=@STRING:h@")]
    rows = _apply(spark, rules, ["user@host=web1"])
    assert rows[0]["rule_id"] == "a" and rows[0]["h"] == "web1"


def test_estring_empty_terminator_takes_rest(spark):
    rules = [PdbRule("a", "msg=@ESTRING:m:@")]
    rows = _apply(spark, rules, ["msg=rest of the line"])
    assert rows[0]["m"] == "rest of the line"


def test_shared_field_name_across_rules(spark):
    rules = [
        PdbRule("a", "A st=@STRING:st@"),
        PdbRule("b", "B st=@NUMBER:st@"),
    ]
    rows = _apply(spark, rules, ["A st=up", "B st=9"])
    assert rows[0]["st"] == "up" and rows[1]["st"] == "9"


def test_compile_rejects_bad_patterns():
    with pytest.raises(ValueError):
        compile_rule(PdbRule("x", "open@ESTRING:a"))
    with pytest.raises(ValueError):
        compile_rule(PdbRule("x", "bad @NOCLASS:a@"))
