"""The parser-class truth table from
modules/correlation/tests/test_parsers_e2e.c: every (parser pattern,
message, match?) row runs end-to-end through the XML ruleset loader
(entity escapes included) and PatternDB.apply — full-match semantics,
one DataFrame per batch of rows."""

from __future__ import annotations

import pytest

from axosyslog_spark.operators.pdb_load import load_pdb_xml

# (pattern-xml, message, should_match) — verbatim from the C table
E2E_ROWS = [
    ("@ANYSTRING:TEST@", "ab ba ab", True),
    ("@ANYSTRING:TEST@", "1234ab", True),
    ("@ANYSTRING:TEST@", "ab1234", True),
    ("@ANYSTRING:TEST@", "1.2.3.4", True),
    ("@ANYSTRING:TEST@", "ab  1234  ba", True),
    ("@ANYSTRING:TEST@", "&lt;ab ba&gt;", True),
    ("@DOUBLE:TEST@", "1234", True),
    ("@DOUBLE:TEST@", "1234.567", True),
    ("@DOUBLE:TEST@", "1.2.3.4", True),
    ("@DOUBLE:TEST@", "1234ab", True),
    ("@DOUBLE:TEST@", "ab1234", False),
    ("@ESTRING:TEST:endmark@", "ab ba endmark", True),
    ("@ESTRING:TEST:endmark@", "ab ba", False),
    ("@ESTRING:TEST:&gt;@", "ab ba > ab", True),
    ("@ESTRING:TEST:&gt;@", "ab ba", False),
    ("@ESTRING:TEST:&amp;@", "ab ba & ab", True),
    ("@ESTRING:TEST:&amp;@", "ab ba", False),
    ("@FLOAT:TEST@", "1234", True),
    ("@FLOAT:TEST@", "1234.567", True),
    ("@FLOAT:TEST@", "1.2.3.4", True),
    ("@FLOAT:TEST@", "1234ab", True),
    ("@FLOAT:TEST@", "ab1234", False),
    ("@SET:TEST: \t@", " a ", True),
    ("@SET:TEST: \t@", "  a ", True),
    ("@SET:TEST: \t@", " \ta ", True),
    ("@SET:TEST: \t@", " \t a ", True),
    ("@SET:TEST: \t@", "ab1234", False),
    ("@OPTIONALSET:TEST: \t@", " a ", True),
    ("@OPTIONALSET:TEST: \t@", "  a ", True),
    ("@OPTIONALSET:TEST: \t@", " \ta ", True),
    ("@OPTIONALSET:TEST: \t@", " \t a ", True),
    ("@OPTIONALSET:TEST: \t@", "ab1234", True),
    ("@IPv4:TEST@", "1.2.3.4", True),
    ("@IPv4:TEST@", "0.0.0.0", True),
    ("@IPv4:TEST@", "255.255.255.255", True),
    ("@IPv4:TEST@", "256.256.256.256", False),
    ("@IPv4:TEST@", "1234", False),
    ("@IPv4:TEST@", "ab1234", False),
    ("@IPv4:TEST@", "ab1.2.3.4", False),
    ("@IPv4:TEST@", "1,2,3,4", False),
    ("@IPv6:TEST@", "2001:0db8:0000:0000:0000:0000:1428:57ab", True),
    ("@IPv6:TEST@", "2001:0db8:0000:0000:0000::1428:57ab", True),
    ("@IPv6:TEST@", "2001:0db8:0:0:0:0:1428:57ab", True),
    ("@IPv6:TEST@", "2001:0db8:0:0::1428:57ab", True),
    ("@IPv6:TEST@", "2001:0db8::1428:57ab", True),
    ("@IPv6:TEST@", "2001:db8::1428:57ab", True),
    ("@IPv6:TEST@", "2001:0db8::34d2::1428:57ab", False),
    ("@NUMBER:TEST@", "1234", True),
    ("@NUMBER:TEST@", "1.2", True),
    ("@NUMBER:TEST@", "1.2.3.4", True),
    ("@NUMBER:TEST@", "1234ab", True),
    ("@NUMBER:TEST@", "ab1234", False),
    ("@QSTRING:TEST:&lt;&gt;@", "<aa bb>", True),
    ("@QSTRING:TEST:&lt;&gt;@", "< aabb >", True),
    ("@QSTRING:TEST:&lt;&gt;@", "aabb>", False),
    ("@QSTRING:TEST:&lt;&gt;@", "<aabb", False),
    ("@QSTRING:TEST:&quot;@", '"aa bb"', True),
    ("@QSTRING:TEST:&quot;@", 'aa bb"', False),
    ("@QSTRING:TEST:&apos;@", "'aa bb'", True),
    ("@QSTRING:TEST:&apos;@", "'aa bb", False),
    ("@STRING:TEST@", "aabb", True),
    ("@STRING:TEST@", "aa bb", True),
    ("@STRING:TEST@", "1234", True),
    ("@STRING:TEST@", "ab1234", True),
    ("@STRING:TEST@", "1234bb", True),
    ("@STRING:TEST@", "1.2.3.4", True),
    (
        "Accepted @STRING:SSH_AUTH_METHOD:-_@ for "
        "@STRING:SSH_USERNAME:._-@ from @IPvANY:SSH_CLIENT_ADDRESS@ "
        "port @NUMBER:SSH_PORT_NUMBER@ ssh2",
        "Accepted password for sampleuser from 10.50.0.247 port 42156 ssh2",
        True,
    ),
]


def _pdb_xml(pattern_xml: str) -> str:
    return f"""<?xml version='1.0' encoding='UTF-8'?>
    <patterndb version='4' pub_date='2010-02-22'>
      <ruleset name='test' id='480de478'>
        <patterns><pattern>test</pattern></patterns>
        <rules>
          <rule id='1' class='test1' provider='my'>
            <patterns><pattern>{pattern_xml}</pattern></patterns>
          </rule>
        </rules>
      </ruleset>
    </patterndb>"""


@pytest.mark.parametrize("chunk", range(0, len(E2E_ROWS), 10))
def test_parsers_e2e_truth_table(spark, chunk):
    rows = E2E_ROWS[chunk : chunk + 10]
    import html

    for pattern_xml, message, should_match in rows:
        [rs] = load_pdb_xml(_pdb_xml(pattern_xml))
        pdb = rs.pattern_db()
        df = spark.createDataFrame([(0, message)], "id int, text string")
        out = pdb.apply(df, with_class=True).first()
        matched = out["rule_id"] is not None and out["rule_class"] == "test1"
        assert matched == should_match, (
            html.unescape(pattern_xml), message, out["rule_id"],
        )
