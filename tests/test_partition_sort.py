"""Stable-order contract: repartition(conv_id) + sortWithinPartitions
keeps every conversation's turns contiguous and ordered inside one
partition."""

from __future__ import annotations

from axosyslog_spark.plans.pipeline import partition_and_sort
from axosyslog_spark.sources.transcripts import synthesize_transcripts

SF = "/root/testdata/sf0.001"


def test_partition_and_sort_contract(spark):
    t = partition_and_sort(synthesize_transcripts(spark, SF), n_partitions=8)

    def check(it):
        rows = list(it)
        seen = {}
        prev = None
        for r in rows:
            if prev is not None and r.conv_id == prev.conv_id:
                assert r.turn_idx == prev.turn_idx + 1  # ordered + contiguous
            else:
                # a conversation must not restart inside the partition
                assert r.conv_id not in seen
                seen[r.conv_id] = True
            prev = r
        return [(r.conv_id,) for r in rows]

    # run the per-partition check distributed; also assert no conv
    # spans two partitions
    per_part = t.rdd.mapPartitions(lambda it: [sorted({r.conv_id for r in it})]).collect()
    all_convs = [c for part in per_part for c in part]
    assert len(all_convs) == len(set(all_convs))  # each conv in exactly one partition
    # and ordering within one partition
    first = t.rdd.mapPartitions(lambda it: [check(it) is not None]).collect()
    assert all(first)
