"""Dump .explain('formatted') for the round-6-touched queries.

Usage: python tools/dump_plans_r06.py <repo_root> <out_dir> <suffix>
(run once against the round-start worktree for *_before.txt and once
against HEAD for *_after.txt).
"""
from __future__ import annotations

import contextlib
import io
import os
import sys


def main():
    repo, out_dir, suffix = sys.argv[1], sys.argv[2], sys.argv[3]
    sys.path.insert(0, repo)
    os.makedirs(out_dir, exist_ok=True)

    from pyspark.sql import functions as F

    from axosyslog_spark.operators.parse import parse_header
    from axosyslog_spark.operators.patterndb import PatternDB, PdbRule
    from axosyslog_spark.operators.pdb_load import load_fixture
    from axosyslog_spark.operators.textstats import unigram_rarity_buckets
    from axosyslog_spark.plans.pipeline import run_pipeline
    from axosyslog_spark.session import get_spark
    from axosyslog_spark.sources.transcripts import (
        generate_transcripts,
        synthesize_transcripts,
    )

    spark = get_spark("plans_r06", cores=4, shuffle_partitions=8)
    spark.conf.set("spark.sql.session.timeZone", "UTC")

    gen = generate_transcripts(spark, 1000, 10, partitions=4)
    [rs] = load_fixture()
    pdb = rs.pattern_db()
    extra = [
        PdbRule(
            f"syn{i:02d}",
            f"svc-{i:02d} op=@ESTRING:op: @code=@NUMBER:code@ "
            "detail=@ANYSTRING:detail@",
        )
        for i in range(46)
    ]
    pdb50 = PatternDB(list(rs.rules) + extra)
    t_sf = synthesize_transcripts(spark, "/root/testdata/sf0.001")
    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")

    targets = {
        "gen5m_patterndb": pdb.apply(
            parse_header(gen), text_col="body", with_class=True
        ),
        "gen5m_patterndb50": pdb50.apply(
            parse_header(gen), text_col="body", with_class=True
        ),
        "gen5m_pipeline": run_pipeline(spark, gen).routed,
        "pipe_full": run_pipeline(spark, t_sf).routed,
        "doc_rarity_buckets": unigram_rarity_buckets(
            docs.select(F.col("doc_id"), "text")
        ),
    }
    for name, df in targets.items():
        buf = io.StringIO()
        with contextlib.redirect_stdout(buf):
            df.explain("formatted")
        with open(os.path.join(out_dir, f"{name}_{suffix}.txt"), "w") as f:
            f.write(buf.getvalue())
        print("wrote", name, suffix, flush=True)


if __name__ == "__main__":
    main()
