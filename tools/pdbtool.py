"""pdbtool analog: test and match PatternDB XML rulesets from the CLI.

Reference: the pdbtool utility (modules/correlation/pdbtool.c) offers
`pdbtool match -p ruleset.pdb -M message` and `pdbtool test` (replay
the <examples> blocks). Same verbs here, running on a tiny local
SparkSession:

    python tools/pdbtool.py test  --ruleset axosyslog_spark/fixtures/transcripts.pdb
    python tools/pdbtool.py match --ruleset axosyslog_spark/fixtures/transcripts.pdb \\
        --message "status=ok latency_ms=117 path=/v1/run retry=2"
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _spark():
    from axosyslog_spark.session import get_spark

    return get_spark("pdbtool", cores=2, shuffle_partitions=2)


def cmd_test(args) -> int:
    from axosyslog_spark.operators.pdb_load import check_examples, load_pdb_xml

    rulesets = load_pdb_xml(args.ruleset)
    spark = _spark()
    failures = 0
    for rs in rulesets:
        problems = check_examples(spark, rs)
        n = len(rs.examples)
        if problems:
            failures += len(problems)
            print(f"ruleset {rs.name!r}: {len(problems)}/{n} example(s) FAILED")
            for p in problems:
                print(f"  {p}")
        else:
            print(f"ruleset {rs.name!r}: {n} example(s) OK")
    return 1 if failures else 0


def cmd_match(args) -> int:
    from axosyslog_spark.operators.pdb_load import load_pdb_xml

    rulesets = load_pdb_xml(args.ruleset)
    spark = _spark()
    rc = 1
    for rs in rulesets:
        pdb = rs.pattern_db(with_programs=bool(args.program))
        df = spark.createDataFrame(
            [(args.message, args.program or "")], "text string, program string"
        )
        out = pdb.apply(
            df, with_class=True, with_tags=True,
            program_col="program" if args.program else None,
        )
        row = out.collect()[0].asDict()
        if row.get("rule_id") is None:
            print(f"ruleset {rs.name!r}: no match")
            continue
        rc = 0
        print(f"ruleset {rs.name!r}: rule={row['rule_id']} class={row.get('rule_class')}")
        for k in sorted(row):
            if k in ("text", "program", "rule_id", "rule_class") or row[k] is None:
                continue
            print(f"  {k}={row[k]!r}")
    return rc


def main(argv=None) -> int:
    p = argparse.ArgumentParser(description=__doc__)
    sub = p.add_subparsers(dest="cmd", required=True)
    t = sub.add_parser("test", help="replay the ruleset's <examples>")
    t.add_argument("--ruleset", required=True)
    m = sub.add_parser("match", help="classify one message")
    m.add_argument("--ruleset", required=True)
    m.add_argument("--message", required=True)
    m.add_argument("--program", default=None)
    args = p.parse_args(argv)
    return cmd_test(args) if args.cmd == "test" else cmd_match(args)


if __name__ == "__main__":
    sys.exit(main())
