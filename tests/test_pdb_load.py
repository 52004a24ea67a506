"""PatternDB XML ruleset loader tests (pdb-load.c analog), including
the <examples> self-check replay."""

from __future__ import annotations

import pytest

from pyspark.sql import functions as F
from axosyslog_spark.operators.pdb_load import (
    check_examples,
    load_checked,
    load_fixture,
    load_pdb_xml,
)


def test_load_fixture_shape():
    [rs] = load_fixture()
    assert rs.name == "transcript_bodies"
    assert rs.version == "5" and rs.pub_date == "2026-08-16"
    assert rs.programs == (
        "proc_click", "proc_view", "proc_error", "proc_run", "proc_purchase"
    )
    by_id = {r.rule_id: r for r in rs.rules}
    assert set(by_id) == {"kv_retry", "kv_plain", "badhdr", "free"}
    assert by_id["kv_retry"].rule_class == "system"
    assert by_id["kv_retry"].tags == ("kv", "retryable")
    assert dict(by_id["kv_retry"].values)["status_up"] == "$(uppercase ${status})"
    assert by_id["badhdr"].rule_class == "violation"
    assert len(rs.examples) == 4


def test_examples_self_check_green(spark):
    [rs] = load_fixture()
    assert check_examples(spark, rs) == []


def test_examples_self_check_catches_drift(spark):
    xml = """
    <patterndb version='4'>
      <ruleset name='t' id='1'>
        <rules>
          <rule id='r1' class='system'>
            <patterns><pattern>v=@NUMBER:n@</pattern></patterns>
            <examples>
              <example>
                <test_message program='p'>v=41</test_message>
                <test_values><test_value name='n'>42</test_value></test_values>
              </example>
            </examples>
          </rule>
        </rules>
      </ruleset>
    </patterndb>
    """
    [rs] = load_pdb_xml(xml)
    problems = check_examples(spark, rs)
    assert len(problems) == 1 and "expected '42'" in problems[0]
    with pytest.raises(ValueError, match="self-check failed"):
        load_checked(spark, xml)


def test_multi_pattern_rule_from_xml(spark):
    xml = """
    <patterndb version='4'>
      <ruleset name='t' id='1'>
        <rules>
          <rule id='r1'>
            <patterns>
              <pattern>up n=@NUMBER:n@</pattern>
              <pattern>down n=@NUMBER:n@</pattern>
            </patterns>
          </rule>
        </rules>
      </ruleset>
    </patterndb>
    """
    [rs] = load_pdb_xml(xml)
    assert rs.rules[0].patterns == ("up n=@NUMBER:n@", "down n=@NUMBER:n@")
    pdb = rs.pattern_db()
    df = spark.createDataFrame([("up n=1",), ("down n=2",)], "text string")
    got = [r["rule_id"] for r in pdb.apply(df).collect()]
    assert got == ["r1", "r1"]


def test_load_rejects_bad_documents():
    with pytest.raises(ValueError, match="expected <patterndb>"):
        load_pdb_xml("<notpdb/>")
    with pytest.raises(ValueError, match="no <pattern>"):
        load_pdb_xml(
            "<patterndb version='4'><ruleset name='t' id='1'><rules>"
            "<rule id='r1'></rule></rules></ruleset></patterndb>"
        )


def test_fixture_values_render(spark):
    [rs] = load_fixture()
    pdb = rs.pattern_db()
    df = spark.createDataFrame(
        [
            (0, "status=ok latency_ms=117 path=/v1/run retry=2"),
            (1, "BADHDR 2024-01-01T00:00:07 host-1 status=error latency_ms=3"),
        ],
        "id int, text string",
    )
    out = {r.id: r.asDict() for r in pdb.apply(df, with_class=True, with_tags=True).collect()}
    assert out[0]["rule_id"] == "kv_retry" and out[0]["rule_class"] == "system"
    assert out[0]["status_up"] == "OK" and out[0]["kv_key"] == "ok/2"
    assert out[0]["pdb_tags"] == ["kv", "retryable"]
    assert out[1]["rule_id"] == "badhdr"
    assert out[1]["note"] == "badhdr at 2024-01-01T00:00:07 on host-1"


ACTIONS_XML = """
<patterndb version='5'>
  <ruleset name='acts' id='1'>
    <patterns>
      <pattern>app_*</pattern>
      <pattern>cron</pattern>
    </patterns>
    <rules>
      <rule id='login' class='system'>
        <patterns><pattern>Accepted @ESTRING:method: @for @STRING:user@</pattern></patterns>
        <actions>
          <action trigger='match'>
            <message>
              <values>
                <value name='alert'>login by ${user} via ${method}</value>
              </values>
              <tags><tag>synthetic-login</tag></tags>
            </message>
          </action>
          <action trigger='match' condition='"${user}" eq "root"'>
            <message>
              <values><value name='alert'>ROOT LOGIN</value></values>
            </message>
          </action>
        </actions>
      </rule>
      <rule id='noise' class='unknown'>
        <patterns><pattern>noise @ANYSTRING:rest@</pattern></patterns>
      </rule>
    </rules>
  </ruleset>
</patterndb>
"""


def test_actions_emit_synthetic_rows(spark):
    [rs] = load_pdb_xml(ACTIONS_XML)
    pdb = rs.pattern_db()
    rule = {r.rule_id: r for r in rs.rules}["login"]
    assert len(rule.actions) == 2
    assert rule.actions[1].condition == '"${user}" eq "root"'

    df = spark.createDataFrame(
        [
            (0, "Accepted password for alice"),
            (1, "Accepted publickey for root"),
            (2, "noise whatever"),
        ],
        "id int, text string",
    )
    matched = pdb.apply(df)
    out = pdb.apply_match_actions(matched)
    rows = [(r["id"], r["synthetic"], r.asDict().get("alert")) for r in out.collect()]
    originals = [r for r in rows if not r[1]]
    synth = sorted(r for r in rows if r[1])
    assert len(originals) == 3
    # alice: 1 synthetic; root: unconditional + conditional = 2; noise: 0
    assert synth == [
        (0, True, "login by alice via password"),
        (1, True, "ROOT LOGIN"),
        (1, True, "login by root via publickey"),
    ]


def test_program_scoped_ruleset(spark):
    [rs] = load_pdb_xml(ACTIONS_XML)
    pdb = rs.pattern_db(with_programs=True)
    assert pdb.programs == ("app_*", "cron")
    df = spark.createDataFrame(
        [
            (0, "app_web", "Accepted password for alice"),
            (1, "sshd", "Accepted password for bob"),
            (2, "cron", "noise x"),
        ],
        "id int, program string, text string",
    )
    got = {r["id"]: r["rule_id"] for r in pdb.apply(df, program_col="program").collect()}
    assert got == {0: "login", 1: None, 2: "noise"}


CONTEXT_XML = """
<patterndb version='5'>
  <ruleset name='ctx' id='1'>
    <rules>
      <rule id='job' class='system' context-id='job-${jid}' context-timeout='60' context-scope='global'>
        <patterns><pattern>job @NUMBER:jid@ @ESTRING:step:@</pattern></patterns>
        <actions>
          <action trigger='timeout'>
            <message>
              <values>
                <value name='summary'>context ${CONTEXT_ID} closed after $(context-length) messages</value>
              </values>
            </message>
          </action>
        </actions>
      </rule>
    </rules>
  </ruleset>
</patterndb>
"""


def test_correlation_contexts_from_xml(spark):
    """context-id/context-timeout rule attrs + trigger='timeout'
    actions: contexts close on event-time gaps and emit synthetic
    summaries (pdb-context.c batch analog)."""
    from axosyslog_spark.operators.grouping import correlate_pdb

    [rs] = load_pdb_xml(CONTEXT_XML)
    rule = rs.rules[0]
    assert rule.context_id == "job-${jid}" and rule.context_timeout == 60
    assert rule.actions[0].trigger == "timeout"

    rows = [
        # job 7: two bursts separated by > 60s -> TWO contexts
        (0, "job 7 start", "2024-01-01 00:00:00"),
        (1, "job 7 run",   "2024-01-01 00:00:30"),
        (2, "job 7 retry", "2024-01-01 00:05:00"),
        # job 9: one context
        (3, "job 9 start", "2024-01-01 00:00:10"),
        # unmatched line: never enters a context
        (4, "noise", "2024-01-01 00:00:20"),
    ]
    df = spark.createDataFrame(rows, "id int, text string, ts_s string").select(
        "id", "text", F.to_timestamp("ts_s").alias("ts")
    )
    matched = rs.pattern_db().apply(df)
    synth = correlate_pdb(matched, rs.rules).collect()
    got = {
        (r["context_key"], r["context_instance"]): (r["n_msgs"], r["summary"])
        for r in synth
    }
    assert got == {
        ("job-7", 0): (2, "context job-7 closed after 2 messages"),
        ("job-7", 1): (1, "context job-7 closed after 1 messages"),
        ("job-9", 0): (1, "context job-9 closed after 1 messages"),
    }


def test_action_heavy_ruleset_plan_is_bounded(spark):
    # round-2 verdict item 8: a ruleset with 100 match actions must
    # compile to ONE Generate + ONE Union, not 100 unions.
    from axosyslog_spark.operators.patterndb import PatternDB, PdbAction, PdbRule

    rules = [
        PdbRule(
            f"r{i}",
            f"ev{i} user=@ESTRING:user:@",
            actions=(
                PdbAction(
                    trigger="match",
                    values=((f"alert{i}", f"fired r{i} for ${{user}}"),),
                    tags=(f"t{i}",),
                ),
            ),
        )
        for i in range(100)
    ]
    pdb = PatternDB(rules)
    df = spark.createDataFrame(
        [(i, f"ev{i} user=u{i}") for i in range(0, 100, 25)], "id int, text string"
    )
    out = pdb.apply_match_actions(pdb.apply(df))
    plan = out._jdf.queryExecution().optimizedPlan().toString()
    assert plan.count("Generate") == 1
    assert plan.count("Union") == 1
    rows = out.filter("synthetic").collect()
    assert len(rows) == 4
    by_id = {r["id"]: r for r in rows}
    assert by_id[25]["alert25"] == "fired r25 for u25"
    assert by_id[25]["pdb_tags"] == ["t25"]
    assert by_id[25].asDict().get("alert50") is None


RATED_XML = """<?xml version='1.0' encoding='UTF-8'?>
<patterndb version='4' pub_date='2024-01-01'>
 <ruleset name='rated' id='rs-rate'>
  <rules>
   <rule id='burst' class='system' provider='t'>
    <patterns><pattern>burst from @ESTRING:src:@</pattern></patterns>
    <actions>
     <action rate='2/10'>
      <message><values><value name='alert'>burst ${src}</value></values></message>
     </action>
    </actions>
   </rule>
  </rules>
 </ruleset>
</patterndb>
"""


def test_action_rate_attribute_parsed():
    from axosyslog_spark.operators.patterndb import parse_action_rate

    [rs] = load_pdb_xml(RATED_XML)
    a = rs.rules[0].actions[0]
    assert (a.rate, a.rate_quantum) == (2, 10)
    # pdb-action.c forms: bare N = per second; zero quantum -> 1
    assert parse_action_rate("5") == (5, 1)
    assert parse_action_rate("7/0") == (7, 1)
    assert parse_action_rate("3/60s") == (3, 60)
    assert parse_action_rate(None) == (0, 1)
    # atoi tolerance (pdb-action.c uses atoi): leading digit run,
    # junk parses as 0 — a config the reference loads must not crash
    assert parse_action_rate("5/2h") == (5, 2)
    assert parse_action_rate("junk") == (0, 1)
    assert parse_action_rate("4/junk") == (4, 1)
    assert parse_action_rate("  8abc") == (8, 1)


def test_rated_action_first_n_per_bucket(spark):
    """<action rate='2/10'>: at most 2 synthetic rows per correlation
    key per 10-second event-time bucket (pdb-ratelimit.c analog);
    original rows always pass through."""
    import datetime as dt

    [rs] = load_pdb_xml(RATED_XML)
    pdb = rs.pattern_db()
    t0 = dt.datetime(2024, 1, 1, 0, 0, 0)
    rows = [
        # bucket 1: four matches -> only first two (by turn_idx) fire
        (0, "h1", t0, "burst from a"),
        (1, "h1", t0 + dt.timedelta(seconds=3), "burst from b"),
        (2, "h1", t0 + dt.timedelta(seconds=6), "burst from c"),
        (3, "h1", t0 + dt.timedelta(seconds=9), "burst from d"),
        # bucket 2: budget resets
        (4, "h1", t0 + dt.timedelta(seconds=12), "burst from e"),
        # different host = different correlation key (process scope)
        (5, "h2", t0 + dt.timedelta(seconds=3), "burst from f"),
        # non-matching row: no synthetic, no effect on the budget
        (6, "h1", t0 + dt.timedelta(seconds=4), "noise"),
    ]
    df = spark.createDataFrame(
        rows, "turn_idx int, host string, ts timestamp, text string"
    )
    out = pdb.apply_match_actions(pdb.apply(df))
    originals = [r for r in out.collect() if not r["synthetic"]]
    synth = sorted(
        (r["turn_idx"], r["alert"]) for r in out.collect() if r["synthetic"]
    )
    assert len(originals) == 7
    assert synth == [
        (0, "burst a"),
        (1, "burst b"),
        (4, "burst e"),
        (5, "burst f"),
    ]


# ---------------------------------------------------------------------------
# pdbtool merge (pdbtool.c:259-320) — combine per-program pdb files


_PDB_A = """<patterndb version='6' pub_date='2024-01-01'>
  <ruleset name='app-a' id='rs-a'>
    <patterns><pattern>appa</pattern></patterns>
    <rules>
      <rule id='r-a1' class='system' provider='t'>
        <patterns><pattern>alpha @NUMBER:n@</pattern></patterns>
      </rule>
    </rules>
  </ruleset>
</patterndb>
"""

_PDB_B = """<patterndb version='5' pub_date='2024-02-02'>
  <ruleset name='app-b' id='rs-b'>
    <patterns><pattern>appb</pattern></patterns>
    <rules>
      <rule id='r-b1' class='security' provider='t'>
        <patterns><pattern>beta @ESTRING:w: @done</pattern></patterns>
      </rule>
    </rules>
  </ruleset>
</patterndb>
"""

# v1 layout: <program> instead of <ruleset>, bare <pattern>/<url> in rules
_PDB_V1 = """<patterndb version='1'>
  <program name='app-c' id='rs-c'>
    <pattern>appc</pattern>
    <rule id='r-c1' class='system' provider='t'>
      <pattern>gamma @NUMBER:g@</pattern>
      <url>http://example.com/kb/1</url>
    </rule>
  </program>
</patterndb>
"""


def _write(tmp_path, rel, content):
    p = tmp_path / rel
    p.parent.mkdir(parents=True, exist_ok=True)
    p.write_text(content)
    return str(p)


def test_merge_roundtrip_equals_loading_parts(tmp_path):
    # merge then load == loading each source document
    from tools.pdbtool import merge_pdb_dir

    _write(tmp_path, "a.pdb", _PDB_A)
    _write(tmp_path, "b.pdb", _PDB_B)
    merged = merge_pdb_dir(str(tmp_path), sort=True, pub_date="2025-01-01")
    got = load_pdb_xml(merged)
    parts = load_pdb_xml(_PDB_A) + load_pdb_xml(_PDB_B)
    assert [rs.name for rs in got] == [rs.name for rs in parts]
    for g, p in zip(got, parts):
        assert g.ruleset_id == p.ruleset_id
        assert g.programs == p.programs
        assert [r.rule_id for r in g.rules] == [r.rule_id for r in p.rules]
        assert [r.patterns for r in g.rules] == [r.patterns for r in p.rules]
    # merged document is stamped v6 with the requested pub_date
    assert '<patterndb version="6" pub_date="2025-01-01">' in merged


def test_merge_upconverts_v1_program_layout(tmp_path):
    from tools.pdbtool import merge_pdb_dir

    _write(tmp_path, "c.pdb", _PDB_V1)
    got = load_pdb_xml(merge_pdb_dir(str(tmp_path), pub_date="2025-01-01"))
    assert [rs.name for rs in got] == ["app-c"]
    assert got[0].programs == ("appc",)
    assert [r.rule_id for r in got[0].rules] == ["r-c1"]
    assert got[0].rules[0].patterns == ("gamma @NUMBER:g@",)


def test_merge_glob_and_recursion(tmp_path):
    from tools.pdbtool import merge_pdb_dir

    _write(tmp_path, "a.pdb", _PDB_A)
    _write(tmp_path, "sub/b.pdb", _PDB_B)
    # non-recursive: subdirectory skipped (pdb-file.c:183)
    names = [rs.name for rs in load_pdb_xml(
        merge_pdb_dir(str(tmp_path), pub_date="2025-01-01"))]
    assert names == ["app-a"]
    # recursive + glob on the full path (g_pattern_match_simple)
    names = [rs.name for rs in load_pdb_xml(merge_pdb_dir(
        str(tmp_path), recursive=True, glob="*b.pdb", pub_date="2025-01-01"))]
    assert names == ["app-b"]


def test_merge_sort_is_depth_then_name(tmp_path):
    # pdbtool_path_compare: shallower paths first, then strcmp
    from tools.pdbtool import _merge_sort_key

    paths = ["d/sub/x.pdb", "d/a.pdb", "a/z.pdb", "top.pdb"]
    assert sorted(paths, key=_merge_sort_key) == [
        "top.pdb", "a/z.pdb", "d/a.pdb", "d/sub/x.pdb"]


def test_merge_cli_writes_file(tmp_path, capsys):
    import tools.pdbtool as pt

    _write(tmp_path, "a.pdb", _PDB_A)
    out = tmp_path / "merged.pdb"
    rc = pt.main(["merge", "-D", str(tmp_path / ""), "-p", str(out),
                  "--pub-date", "2025-01-01"])
    assert rc == 0
    assert load_pdb_xml(str(out))[0].name == "app-a"


def test_dictionary_verb(tmp_path, capsys):
    # pdbtool dictionary: parser handles + <value> names; -T for tags
    import tools.pdbtool as pt

    doc = """<patterndb version='6' pub_date='2024-01-01'>
      <ruleset name='d' id='rs-d'>
        <patterns><pattern>appd</pattern></patterns>
        <rules>
          <rule id='r-d1' class='system' provider='t'>
            <patterns><pattern>delta @NUMBER:num@ @ESTRING:word: @</pattern></patterns>
            <tags><tag>t1</tag><tag>t2</tag></tags>
            <values><value name='alert.score'>9</value></values>
          </rule>
        </rules>
      </ruleset>
    </patterndb>
    """
    p = _write(tmp_path, "d.pdb", doc)
    assert pt.main(["dictionary", "-p", p]) == 0
    out = capsys.readouterr().out.splitlines()
    assert out == ["num", "word", "alert.score"]
    assert pt.main(["dictionary", "-p", p, "-T"]) == 0
    assert capsys.readouterr().out.splitlines() == ["t1", "t2"]
    # program filter: 'appd' matches, 'other' does not
    assert pt.main(["dictionary", "-p", p, "-P", "other"]) == 0
    assert capsys.readouterr().out == ""
    assert pt.main(["dictionary", "-p", p, "-P", "appd"]) == 0
    assert len(capsys.readouterr().out.splitlines()) == 3


CONTEXT_GREP_XML = """\
<patterndb version='5' pub_date='2024-01-01'>
  <ruleset name='jobs' id='rs-ctx2'>
    <rules>
      <rule id='r-job2' class='system' provider='t'
            context-id='job-${jid}' context-timeout='60'>
        <patterns><pattern>job @NUMBER:jid@ @ESTRING:verb:@</pattern></patterns>
        <actions>
          <action trigger='timeout'>
            <message>
              <values>
                <value name='verbs'>$(context-values ${verb})</value>
                <value name='starts'>$(grep ('${verb}' eq 'start') ${jid})</value>
              </values>
            </message>
          </action>
        </actions>
      </rule>
    </rules>
  </ruleset>
</patterndb>
"""


def test_context_funcs_in_pdb_actions(spark):
    """$(context-values)/$(grep) inside a timeout action iterate the
    closed context's message list (context-funcs.c batch analog) —
    entries ride the close aggregation as one collect_list, no second
    shuffle."""
    from axosyslog_spark.operators.grouping import correlate_pdb

    [rs] = load_pdb_xml(CONTEXT_GREP_XML)
    rows = [
        (0, "job 7 start", "2024-01-01 00:00:00"),
        (1, "job 7 run",   "2024-01-01 00:00:30"),
        (2, "job 9 start", "2024-01-01 00:00:10"),
    ]
    df = spark.createDataFrame(rows, "id int, text string, ts_s string").select(
        "id", "text", F.to_timestamp("ts_s").alias("ts")
    )
    matched = rs.pattern_db().apply(df)
    synth = {r["context_key"]: r for r in correlate_pdb(matched, rs.rules).collect()}
    # time-ordered context iteration: start before run
    assert synth["job-7"]["verbs"] == "start,run"
    assert synth["job-7"]["starts"] == "7"
    assert synth["job-9"]["verbs"] == "start"
    assert synth["job-9"]["starts"] == "9"


def test_reference_windowseventlog_pdb_replays(spark):
    """Parity against the reference's OWN shipped ruleset: scl/
    windowseventlog/windowseventlog.xml (the windows-eventlog-parser
    block is db-parser over this document) loads through our pdb
    loader and every <example> classifies to its rule with its
    expected values — multi-line NLSTRING patterns included. Read
    from the reference tree at test time (never copied)."""
    import os

    from axosyslog_spark.operators.pdb_load import check_examples, load_pdb_xml

    path = "/root/reference/scl/windowseventlog/windowseventlog.xml"
    if not os.path.exists(path):
        import pytest as _pytest

        _pytest.skip("reference tree not present")
    rulesets = load_pdb_xml(path)
    assert rulesets, "no rulesets parsed"
    n_examples = sum(len(rs.examples) for rs in rulesets)
    assert n_examples > 0, "reference document ships examples"
    problems = [p for rs in rulesets for p in check_examples(spark, rs)]
    assert problems == [], problems
