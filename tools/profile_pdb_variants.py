"""Same-process A/B for the PatternDB tier merge (round 6).

Variants, each timed min-of-N with the noop sink over the same
persisted 5M-row generated input (one process — cross-process numbers
on this box are steal-noise):

  merged   ONE alternation regex carrying both tiers (complete
           \\z-anchored alternatives first, then the same bodies
           unanchored) — one regexp_replace per row, but a 2N-block
           replacement template Java re-parses per matching row.
  twopass  a complete-tier regexp_replace on every row, then a
           partial-tier regexp_replace for rows the complete tier
           missed (~20% of the bench distribution) — up to two regex
           executions per row, single-tier N-block frame.

Both run on the FLAT global frame (no dispatch tree) so the A/B
isolates the tier structure itself. Measured outcome this round:
twopass wins on the flat path (the doubled template loses to the
gated second execution — 1.6x at 50 rules), merged wins inside
dispatch-tree leaves where the member count bounds the template — so
the shipped engine is two-pass flat + merged-per-leaf, and
``apply_full(tree)`` below times the shipped hybrid.

Both variants are also checked for agreement on the winning ordinal
(the two-pass partial index is offset by N to the merged encoding)
before timing, and the harness runs at 4 rules (the bench fixture)
and 50 rules (fixture + 46 distinct-prefix synthetics, the bench's
gen5m_patterndb50 set).

Usage: python tools/profile_pdb_variants.py [rows]
"""
from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from axosyslog_spark.operators.parse import parse_header  # noqa: E402
from axosyslog_spark.operators.patterndb import (  # noqa: E402
    _BLOCK_SEP,
    _HIT,
    _MARK,
    PatternDB,
    PdbRule,
    _strip_framing_bytes,
)
from axosyslog_spark.operators.pdb_load import load_fixture  # noqa: E402
from axosyslog_spark.session import get_spark  # noqa: E402
from axosyslog_spark.sources.transcripts import generate_transcripts  # noqa: E402


def noop(df):
    df.write.format("noop").mode("overwrite").save()


def _tier_re(patterns, anchored: bool) -> tuple[str, str]:
    """(regex, replacement) for ONE tier over the flat global frame —
    the round-5 per-tier structure rebuilt from the current compiled
    patterns (sentinel-framed alternation, header + per-alt blocks)."""
    alts, header, blocks = [], [], []
    g = 0
    for c in patterns:
        g += 1
        header.append(f"${g}{_BLOCK_SEP}")
        blocks.append(
            "".join(f"${g + j + 1}\x04" for j in range(len(c.fields)))
            + _BLOCK_SEP
        )
        g += len(c.fields)
        body = f"(?:({_MARK}){c.body}\\z)" if anchored else f"(?:({_MARK}){c.body})"
        alts.append(body)
    return f"^(?:{'|'.join(alts)})", _HIT + "".join(header) + "".join(blocks)


def two_pass_idx(pdb: PatternDB, text):
    """Winning global ordinal via the round-5 two-pass shape: complete
    tier on every row, partial tier only where the complete tier
    missed (encoded +N, like the merged engine)."""
    n = len(pdb.patterns)
    c_re, c_repl = _tier_re(pdb.patterns, True)
    p_re, p_repl = _tier_re(pdb.patterns, False)
    t = _strip_framing_bytes(text)
    marked = F.concat(F.lit(_MARK), t)
    rc = F.regexp_replace(marked, c_re, c_repl)
    idx_c = F.when(rc.startswith(_HIT), F.instr(rc, _MARK) - 2)
    rp = F.regexp_replace(marked, p_re, p_repl)
    idx_p = F.when(rp.startswith(_HIT), F.instr(rp, _MARK) - 2 + n)
    return F.coalesce(idx_c, idx_p).cast("int")


def _merged_frame(patterns) -> tuple[str, str]:
    """The 2N-alternative single-execution frame (the round-6
    experiment that the tree path kept and the flat path reverted):
    complete \\z-anchored alternatives first, then the same bodies
    unanchored, one shared 2N-block replacement."""
    alts, header, blocks = [], [], []
    g = 0
    for c, anchored in [(c, True) for c in patterns] + [
        (c, False) for c in patterns
    ]:
        g += 1
        header.append(f"${g}{_BLOCK_SEP}")
        blocks.append(
            "".join(f"${g + j + 1}\x04" for j in range(len(c.fields)))
            + _BLOCK_SEP
        )
        g += len(c.fields)
        alts.append(
            f"(?:({_MARK}){c.body}\\z)" if anchored else f"(?:({_MARK}){c.body})"
        )
    return f"^(?:{'|'.join(alts)})", _HIT + "".join(header) + "".join(blocks)


def merged_flat_idx(pdb: PatternDB, text):
    """Merged-alternation ordinal on the FLAT path (no dispatch tree),
    so the A/B isolates the tier merge itself."""
    m_re, m_repl = _merged_frame(pdb.patterns)
    t = _strip_framing_bytes(text)
    marked = F.concat(F.lit(_MARK), t)
    r = F.regexp_replace(marked, m_re, m_repl)
    return F.when(r.startswith(_HIT), F.instr(r, _MARK) - 2).cast("int")


def main():
    rows = int(sys.argv[1]) if len(sys.argv) > 1 else 5_000_000
    spark = get_spark("profile_pdb_variants", cores=32)
    spark.conf.set("spark.sql.session.timeZone", "UTC")

    gen = generate_transcripts(spark, rows, max(rows // 200, 1),
                               skew_hot_convs=5, partitions=128)
    gen.persist().count()
    ph = parse_header(gen)
    ph_cached = ph  # lazy; parse cost is identical across variants

    [rs] = load_fixture()
    rules4 = list(rs.rules)
    extra = [
        PdbRule(
            f"syn{i:02d}",
            f"svc-{i:02d} op=@ESTRING:op: @code=@NUMBER:code@ "
            f"detail=@ANYSTRING:detail@",
        )
        for i in range(46)
    ]
    for label, rules in [("4-rule", rules4), ("50-rule", rules4 + extra)]:
        pdb = PatternDB(rules)

        # agreement check: merged == two-pass on the winning ordinal
        chk = ph_cached.select(
            merged_flat_idx(pdb, F.col("body")).alias("m"),
            two_pass_idx(pdb, F.col("body")).alias("t"),
        ).filter(~F.col("m").eqNullSafe(F.col("t")))
        bad = chk.count()
        print(f"{label}: ordinal disagreement rows = {bad}")
        assert bad == 0

        def t_merged():
            noop(ph_cached.select(merged_flat_idx(pdb, F.col("body")).alias("i")))

        def t_twopass():
            noop(ph_cached.select(two_pass_idx(pdb, F.col("body")).alias("i")))

        def t_apply():
            noop(pdb.apply(ph_cached, text_col="body", with_class=True))

        for name, fn in [("merged_flat", t_merged),
                         ("twopass_flat", t_twopass),
                         ("apply_full(tree)", t_apply)]:
            best = float("inf")
            for _ in range(3):
                t0 = time.perf_counter()
                fn()
                best = min(best, time.perf_counter() - t0)
            print(f"{label} {name}: {best:.2f}s")

    gen.unpersist()


if __name__ == "__main__":
    main()
