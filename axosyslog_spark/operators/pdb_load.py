"""PatternDB XML ruleset loader + example self-check.

Reference: modules/correlation/pdb-load.c:1-1251 parses the pdb XML
(versions 1-6) into rulesets/rules; modules/correlation/tests/
test_patterndb.c exercises the same document shape, including the
<examples> self-test blocks this loader can replay.

Supported document shape (the pdb v4/v5 core — correlation <actions>
compile to grouping-stage constructs and are surfaced raw):

    <patterndb version='4' pub_date='...'>
      <ruleset name='...' id='...'>
        <description>...</description>
        <patterns><pattern>PROGRAM-GLOB</pattern>...</patterns>
        <rules>
          <rule id='...' class='...' provider='...'>
            <patterns><pattern>MSG PATTERN</pattern>...</patterns>
            <tags><tag>...</tag>...</tags>
            <values><value name='n'>template</value>...</values>
            <examples>
              <example>
                <test_message program='prog'>msg</test_message>
                <test_values><test_value name='n'>v</test_value>...</test_values>
              </example>
            </examples>
          </rule>
        </rules>
      </ruleset>
    </patterndb>

Loading is a DRIVER-SIDE, config-time step (pdb-load happens once at
startup in the reference too); the result is a PatternDB whose
evaluation is pure column algebra.
"""

from __future__ import annotations

import xml.etree.ElementTree as ET
from dataclasses import dataclass, field

from axosyslog_spark.operators.patterndb import (
    PatternDB,
    PdbAction,
    PdbRule,
    parse_action_rate,
)


@dataclass(frozen=True)
class PdbExample:
    rule_id: str
    program: str
    message: str
    expected_values: tuple[tuple[str, str], ...]


@dataclass
class PdbRuleSet:
    name: str
    ruleset_id: str
    programs: tuple[str, ...]        # program selector patterns
    rules: list[PdbRule] = field(default_factory=list)
    examples: list[PdbExample] = field(default_factory=list)
    pub_date: str = ""
    version: str = "4"

    def pattern_db(self, with_programs: bool = False) -> PatternDB:
        """Compile; pass with_programs=True to scope classification to
        this ruleset's program selectors (apply(program_col=...))."""
        return PatternDB(
            self.rules, programs=self.programs if with_programs else ()
        )


def _text(el) -> str:
    return (el.text or "") if el is not None else ""


def load_pdb_xml(source: str) -> list[PdbRuleSet]:
    """Parse a pdb XML document (path or literal XML string)."""
    root = (
        ET.fromstring(source)
        if source.lstrip().startswith("<")
        else ET.parse(source).getroot()
    )
    if root.tag != "patterndb":
        raise ValueError(f"expected <patterndb> root, got <{root.tag}>")
    version = root.get("version", "4")
    pub_date = root.get("pub_date", "")
    rulesets: list[PdbRuleSet] = []
    for rs_el in root.findall("ruleset"):
        programs = tuple(
            _text(p) for p in rs_el.findall("./patterns/pattern")
        ) or tuple(_text(p) for p in rs_el.findall("./pattern"))
        rs = PdbRuleSet(
            name=rs_el.get("name", ""),
            ruleset_id=rs_el.get("id", ""),
            programs=programs,
            pub_date=pub_date,
            version=version,
        )
        for r_el in rs_el.findall("./rules/rule"):
            rule_id = r_el.get("id", "")
            patterns = tuple(
                _text(p) for p in r_el.findall("./patterns/pattern")
            )
            if not patterns:
                raise ValueError(f"rule {rule_id!r} has no <pattern>")
            tags = tuple(_text(t) for t in r_el.findall("./tags/tag"))
            values = tuple(
                (v.get("name", ""), _text(v))
                for v in r_el.findall("./values/value")
            )
            actions: list[PdbAction] = []
            for a_el in r_el.findall("./actions/action"):
                msg = a_el.find("message")
                rate, rate_quantum = parse_action_rate(a_el.get("rate"))
                actions.append(
                    PdbAction(
                        rate=rate,
                        rate_quantum=rate_quantum,
                        trigger=a_el.get("trigger", "match"),
                        condition=a_el.get("condition"),
                        values=tuple(
                            (v.get("name", ""), _text(v))
                            for v in (msg.findall("./values/value") if msg is not None else [])
                        ),
                        tags=tuple(
                            _text(t)
                            for t in (msg.findall("./tags/tag") if msg is not None else [])
                        ),
                        inherit_properties=(
                            (msg.get("inherit-properties", "TRUE") if msg is not None else "TRUE")
                            .lower() not in ("false", "0", "none")
                        ),
                    )
                )
            rs.rules.append(
                PdbRule(
                    rule_id=rule_id,
                    pattern=patterns if len(patterns) > 1 else patterns[0],
                    rule_class=r_el.get("class", ""),
                    tags=tags,
                    values=values,
                    actions=tuple(actions),
                    context_id=r_el.get("context-id"),
                    context_timeout=int(r_el.get("context-timeout", "0")),
                    context_scope=r_el.get("context-scope", "process"),
                )
            )
            for ex_el in r_el.findall("./examples/example"):
                tm = ex_el.find("test_message")
                rs.examples.append(
                    PdbExample(
                        rule_id=rule_id,
                        program=tm.get("program", "") if tm is not None else "",
                        message=_text(tm),
                        expected_values=tuple(
                            (tv.get("name", ""), _text(tv))
                            for tv in ex_el.findall("./test_values/test_value")
                        ),
                    )
                )
        rulesets.append(rs)
    return rulesets


def check_examples(spark, ruleset: PdbRuleSet) -> list[str]:
    """Replay the ruleset's <examples> through PatternDB.apply and
    return a list of mismatch descriptions (empty = all green) — the
    self-check pdb-load's test harness performs via pdbtool/test_
    patterndb.c example blocks."""
    if not ruleset.examples:
        return []
    pdb = ruleset.pattern_db()
    df = spark.createDataFrame(
        [(i, ex.message) for i, ex in enumerate(ruleset.examples)],
        "ex_id int, text string",
    )
    rows = {r["ex_id"]: r.asDict() for r in pdb.apply(df).collect()}
    problems: list[str] = []
    for i, ex in enumerate(ruleset.examples):
        got = rows[i]
        if got["rule_id"] != ex.rule_id:
            problems.append(
                f"example {i}: message {ex.message!r} classified as "
                f"{got['rule_id']!r}, expected {ex.rule_id!r}"
            )
            continue
        for name, want in ex.expected_values:
            have = got.get(name)
            if have is None or str(have) != want:
                problems.append(
                    f"example {i} ({ex.rule_id}): value {name!r} = "
                    f"{have!r}, expected {want!r}"
                )
    return problems


def load_fixture(name: str = "transcripts.pdb") -> list[PdbRuleSet]:
    """Load a ruleset shipped inside the package (works from the
    spark-submit --py-files zip via importlib.resources)."""
    from importlib import resources

    xml = (resources.files("axosyslog_spark") / "fixtures" / name).read_text()
    return load_pdb_xml(xml)


def load_checked(spark, source: str) -> list[PdbRuleSet]:
    """Load + replay examples, raising on any mismatch (strict mode)."""
    rulesets = load_pdb_xml(source)
    problems = [p for rs in rulesets for p in check_examples(spark, rs)]
    if problems:
        raise ValueError("pdb example self-check failed:\n" + "\n".join(problems))
    return rulesets
