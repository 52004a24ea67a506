"""Similarity search over embedding columns (array<float>).

Two paths, mirroring how ANN systems scale:
  - brute-force cosine top-k: exact baseline; cross join of the query
    set (broadcast — it is small by definition) against the corpus,
    cost O(|Q| * N * d) and embarrassingly parallel.
  - LSH-bucketed (random hyperplane signs): each vector gets a
    signature; candidates share a signature bucket -> equi-join, then
    exact re-rank inside buckets. The 100 TB path: no cross join.

All arithmetic is quantized to int64 (round(x * 10000)) before dot
products: integer sums are associative, so results are bit-identical
regardless of aggregation order — reproducible across engines and
cluster sizes (and DuckDB-verifiable, which the oracle gate uses).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

QUANT = 10_000


def quantize(vec: Column) -> Column:
    # floor(x*Q + 0.5): half-up quantization written as floor so every
    # engine computes the identical bigint (round() half-mode varies)
    return F.transform(
        vec, lambda x: F.floor(x.cast("double") * QUANT + 0.5).cast("bigint")
    )


def dot_q(a: Column, b: Column) -> Column:
    """Exact int64 dot product of two quantized vectors."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y), F.lit(0).cast("bigint"), lambda acc, v: acc + v
    )


def norm_sq_q(a: Column) -> Column:
    return dot_q(a, a)


def cosine_q(a: Column, b: Column) -> Column:
    """Cosine from exact integer dot/norms; the only float ops are
    sqrt+divide on exact ints -> bit-identical everywhere."""
    return dot_q(a, b) / (F.sqrt(norm_sq_q(a).cast("double")) * F.sqrt(norm_sq_q(b).cast("double")))


def brute_force_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Exact top-k neighbors per query vector (self-matches excluded).

    The query side is broadcast: the join is a broadcast nested loop,
    no shuffle of the corpus. Returns (query_id, rank, neighbor_id,
    cosine) with deterministic ties (id ascending).
    """
    from pyspark.sql.window import Window

    c = corpus.select(
        F.col(id_col).alias("nid"), quantize(F.col(vec_col)).alias("nvec")
    )
    q = queries.select(
        F.col(id_col).alias("qid"), quantize(F.col(vec_col)).alias("qvec")
    )
    pairs = c.join(F.broadcast(q), F.col("nid") != F.col("qid")).withColumn(
        "cosine", cosine_q(F.col("qvec"), F.col("nvec"))
    )
    w = Window.partitionBy("qid").orderBy(F.desc("cosine"), F.asc("nid"))
    return (
        pairs.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(
            F.col("qid").alias("query_id"),
            "rank",
            F.col("nid").alias("neighbor_id"),
            F.floor(F.col("cosine") * 1_000_000).cast("bigint").alias("cos_e6"),
        )
    )


# ---------------------------------------------------------------------------
# LSH-bucketed ANN (random hyperplane signs)
# ---------------------------------------------------------------------------

def _hyperplane(dim: int, h: int) -> list[float]:
    """Deterministic pseudo-random unit-ish hyperplane h (no RNG state:
    pure function of (h, i) via integer hashing)."""
    vals = []
    for i in range(dim):
        x = (h * 1_000_003 + i * 7919 + 12345) % 104729
        vals.append((x / 104729.0) * 2.0 - 1.0)
    return vals


def lsh_signature(vec: Column, dim: int, n_planes: int = 8) -> Column:
    """Sign-bit signature: bit h = (vec . plane_h) >= 0."""
    sig = F.lit(0).cast("int")
    for h in range(n_planes):
        plane = _hyperplane(dim, h)
        dot = None
        for i, w in enumerate(plane):
            term = F.element_at(vec, i + 1).cast("double") * F.lit(w)
            dot = term if dot is None else dot + term
        sig = sig + F.when(dot >= 0, F.lit(1 << h)).otherwise(F.lit(0))
    return sig


def lsh_topk(
    corpus: DataFrame,
    queries: DataFrame,
    dim: int,
    k: int = 5,
    n_planes: int = 8,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Approximate top-k: candidates = same LSH bucket (equi-join on
    the signature), exact cosine re-rank inside the bucket. Recall
    grows with fewer planes / multiple tables; this single-table
    variant is the skeleton the scale path hangs off."""
    from pyspark.sql.window import Window

    c = corpus.select(
        F.col(id_col).alias("nid"),
        quantize(F.col(vec_col)).alias("nvec"),
        lsh_signature(F.col(vec_col), dim, n_planes).alias("sig"),
    )
    q = queries.select(
        F.col(id_col).alias("qid"),
        quantize(F.col(vec_col)).alias("qvec"),
        lsh_signature(F.col(vec_col), dim, n_planes).alias("sig"),
    )
    pairs = c.join(F.broadcast(q), "sig").filter(F.col("nid") != F.col("qid"))
    pairs = pairs.withColumn("cosine", cosine_q(F.col("qvec"), F.col("nvec")))
    w = Window.partitionBy("qid").orderBy(F.desc("cosine"), F.asc("nid"))
    return (
        pairs.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(
            F.col("qid").alias("query_id"),
            "rank",
            F.col("nid").alias("neighbor_id"),
            F.floor(F.col("cosine") * 1_000_000).cast("bigint").alias("cos_e6"),
        )
    )


def embedding_near_dups(
    df: DataFrame,
    threshold: float = 0.95,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Embedding-cosine near-duplicate pairs (exact all-pairs; use the
    LSH bucket join instead beyond ~10^5 vectors)."""
    v = df.select(F.col(id_col).alias("id"), quantize(F.col(vec_col)).alias("vec"))
    a, b = v.alias("a"), v.alias("b")
    pairs = a.join(b, F.col("a.id") < F.col("b.id")).select(
        F.col("a.id").alias("id1"),
        F.col("b.id").alias("id2"),
        F.floor(cosine_q(F.col("a.vec"), F.col("b.vec")) * 1_000_000)
        .cast("bigint")
        .alias("cos_e6"),
    )
    return pairs.filter(F.col("cos_e6") >= int(threshold * 1_000_000))
