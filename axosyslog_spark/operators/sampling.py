"""Deterministic corpus sampling: source-mixing weights and
train/val/test splits.

The two stages between cleaning and training: re-weight the corpus
mix per source (the Pile/DoReMi-style "sample source s at rate w_s")
and carve reproducible splits. Both are pure column algebra over an
md5 hash of the document id — no RNG, no state, rerunning on any
subset of the data gives the same verdict per document (the property
that makes the sample resumable and the oracle hashable).

Mechanics: u = the first 6 hex chars of md5(id || '#' || salt) is a
uniform 24-bit value; comparing the STRING against a zero-padded hex
threshold equals the numeric comparison (fixed-width hex is ordered),
so both engines stay in plain string ops. Granularity is 1/16^6
(~6e-8), plenty for corpus weights.

Scale shape: one shuffle-free projection per op; the weights/fractions
are plan-time literals (a when-chain), never a join.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

_HEX_SPAN = 16 ** 6


def _hex_threshold(fraction: float) -> str:
    """fraction in [0,1] -> 6-char zero-padded lowercase hex bound."""
    n = min(max(int(round(fraction * _HEX_SPAN)), 0), _HEX_SPAN)
    # n == 16^6 (fraction 1.0) needs a bound above every 6-char hex
    # string; 'g' sorts after 'f' in ASCII
    return "g" if n >= _HEX_SPAN else format(n, "06x")


def _u6(id_col: Column, salt: str) -> Column:
    return F.substring(
        F.md5(F.concat(id_col.cast("string"), F.lit("#" + salt)).cast("binary")),
        1, 6,
    )


def source_mix(
    df: DataFrame,
    weights: dict[str, float],
    default_weight: float = 1.0,
    id_col: str = "doc_id",
    source_col: str = "source",
    salt: str = "mix",
) -> DataFrame:
    """Down-sample each source to its target weight: keep a document
    iff its uniform hash value falls under the source's fraction.
    Returns the kept rows with the hash value (`u6`) that admitted
    them, so the decision is auditable per document."""
    u = _u6(F.col(id_col), salt)
    bound: Column = F.lit(_hex_threshold(default_weight))
    for src, w in sorted(weights.items()):
        bound = F.when(
            F.col(source_col) == src, F.lit(_hex_threshold(w))
        ).otherwise(bound)
    return (
        df.withColumn("u6", u)
        .filter(F.col("u6") < bound)
        .select(id_col, source_col, "u6")
    )


def hash_split(
    df: DataFrame,
    fractions: dict[str, float] | None = None,
    id_col: str = "doc_id",
    salt: str = "split",
) -> DataFrame:
    """Reproducible train/val/test assignment: cumulative hex bounds
    over the uniform hash value. Fraction dict order is the assignment
    order (first bucket gets [0, f1), next [f1, f1+f2), ...); the last
    bucket absorbs the remainder so every document lands somewhere."""
    fractions = fractions or {"train": 0.8, "val": 0.1, "test": 0.1}
    u = _u6(F.col(id_col), salt)
    names = list(fractions)
    cum = 0.0
    expr: Column | None = None
    for name in names[:-1]:
        cum += fractions[name]
        b = F.lit(_hex_threshold(cum))
        expr = (
            F.when(u < b, F.lit(name))
            if expr is None
            else expr.when(u < b, F.lit(name))
        )
    split = F.lit(names[-1]) if expr is None else expr.otherwise(
        F.lit(names[-1])
    )
    return df.select(
        F.col(id_col), u.alias("u6"), split.alias("split")
    )
