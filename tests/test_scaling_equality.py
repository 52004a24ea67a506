"""North-rule equality clause: the flagship pipeline must produce
IDENTICAL routed rows and per-sink counts at two parallelism levels
(the sandbox proxy for N vs 4N executors). Each level runs in its own
process (one SparkContext per process); equality is compared on an
order-insensitive content hash plus the exact per-sink count map."""

from __future__ import annotations

import json
import subprocess
import sys
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent

_SNIPPET = """
import json, sys
sys.path.insert(0, {repo!r})
from pyspark.sql import functions as F
from axosyslog_spark.session import get_spark
from axosyslog_spark.plans.pipeline import run_pipeline
from axosyslog_spark.sources.transcripts import synthesize_transcripts

spark = get_spark("eq", cores={cores})
spark.conf.set("spark.sql.session.timeZone", "UTC")
res = run_pipeline(spark, synthesize_transcripts(spark, "/root/testdata/sf0.001"))
content = res.routed.select(
    F.xxhash64(*sorted(res.routed.columns)).alias("rh")
).agg(
    F.expr("bit_xor(rh)").alias("h"), F.count(F.lit(1)).alias("n")
).collect()[0]
counts = {{r.sink: r.n for r in res.counts.collect()}}
print("EQ" + json.dumps({{"h": content.h, "n": content.n, "counts": counts}}))
"""


def _run(cores: int) -> dict:
    res = subprocess.run(
        [sys.executable, "-c", _SNIPPET.format(repo=str(REPO), cores=cores)],
        capture_output=True, text=True, timeout=600,
    )
    assert res.returncode == 0, res.stderr[-2000:]
    line = [ln for ln in res.stdout.splitlines() if ln.startswith("EQ")][-1]
    return json.loads(line[2:])


def test_pipeline_identical_across_parallelism():
    small = _run(2)
    big = _run(8)
    assert small["n"] == big["n"] > 0
    assert small["h"] == big["h"]          # routed-row equality
    assert small["counts"] == big["counts"]  # exact per-sink counts
    assert len(small["counts"]) >= 4
