"""Text analysis for training-data pipelines: language ID, quality
scoring, token counting, document fingerprinting.

These extend the engine beyond the reference's operator set (SURVEY.md
§2.10 notes the reference has no analytics surface) — they are the
operations a 100 TB web-scale corpus pipeline runs between ingest and
training. All pure column algebra: per-document cost is O(len), no
shuffle, trivially linear at any scale.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

# tiny embedded English stopword list (heuristic language ID)
EN_STOPWORDS = (
    "the", "a", "an", "and", "or", "of", "to", "in", "is", "it",
    "for", "on", "with", "as", "at", "by", "from", "that", "this",
)


def tokens(text: Column) -> Column:
    """Whitespace tokenization (the `$(explode)` analog)."""
    return F.split(F.trim(text), r"\s+")


def token_count(text: Column) -> Column:
    return F.size(tokens(text))


def bpe_ish_token_count(text: Column) -> Column:
    """BPE-flavored token estimate: word pieces + digits + punctuation
    counted separately (a regex proxy for subword tokenizers)."""
    return F.size(
        F.regexp_extract_all(text, F.lit(r"[A-Za-z]+|[0-9]|[^A-Za-z0-9\s]"), 0)
    )


def stopword_ratio(text: Column) -> Column:
    toks = tokens(F.lower(text))
    hits = F.size(F.filter(toks, lambda t: t.isin(*EN_STOPWORDS)))
    return hits / F.greatest(F.size(toks), F.lit(1))


def langid(text: Column, threshold: float = 0.03) -> Column:
    """n-gram/stopword heuristic language ID: 'en' when enough English
    stopwords appear, else 'unknown'. (A real model plugs in the same
    column slot.)"""
    return F.when(stopword_ratio(text) >= threshold, F.lit("en")).otherwise(
        F.lit("unknown")
    )


def punct_ratio(text: Column) -> Column:
    stripped = F.regexp_replace(text, r"[^\s\w]", "")
    return (F.length(text) - F.length(stripped)) / F.greatest(
        F.length(text), F.lit(1)
    )


def mean_token_len(text: Column) -> Column:
    toks = tokens(text)
    return F.length(F.regexp_replace(text, r"\s+", "")) / F.greatest(
        F.size(toks), F.lit(1)
    )


def quality_score(text: Column) -> Column:
    """Composite quality heuristic in [0,1]: length band + low punct +
    sane token length + some stopwords (Gopher-rules flavored)."""
    n_tok = token_count(text)
    len_ok = (n_tok >= 5) & (n_tok <= 100_000)
    mtl = mean_token_len(text)
    mtl_ok = (mtl >= 2.0) & (mtl <= 12.0)
    punct_ok = punct_ratio(text) <= 0.3
    stop_ok = stopword_ratio(text) >= 0.01
    score = (
        len_ok.cast("int") + mtl_ok.cast("int")
        + punct_ok.cast("int") + stop_ok.cast("int")
    )
    return (score / F.lit(4.0)).alias("quality")


def normalize_text(text: Column) -> Column:
    """Canonical form for fingerprinting: lowercase, strip punctuation,
    collapse whitespace."""
    t = F.lower(text)
    t = F.regexp_replace(t, r"[^a-z0-9\s]", "")
    t = F.trim(F.regexp_replace(t, r"\s+", " "))
    return t


def fingerprint(text: Column) -> Column:
    """Document fingerprint: md5 of the normalized text (the rolling-
    hash analog, stable across whitespace/punct variants)."""
    return F.md5(normalize_text(text).cast("binary"))


def text_profile(df: DataFrame, text_col: str = "text") -> DataFrame:
    """One call adding the full analysis column set."""
    t = F.col(text_col)
    return df.withColumns(
        {
            "n_tokens": token_count(t),
            "n_tokens_bpe": bpe_ish_token_count(t),
            "stopword_ratio": stopword_ratio(t),
            "punct_ratio": punct_ratio(t),
            "mean_token_len": mean_token_len(t),
            "lang_guess": langid(t),
            "quality": quality_score(t),
            "fingerprint": fingerprint(t),
        }
    )


def _word_ngrams(toks: Column, n: int) -> Column:
    """NON-distinct word n-grams (zip_with over shifted slices — same
    per-row-linear shape as dedup.shingles_from_tokens, which wraps
    this idea with array_distinct for set semantics)."""
    k = F.size(toks) - (n - 1)
    parts = [F.slice(toks, j + 1, F.greatest(k, F.lit(0))) for j in range(n)]
    grams = parts[0]
    for p in parts[1:]:
        grams = F.zip_with(grams, p, lambda a, b: F.concat(a, F.lit(" "), b))
    return F.when(k >= 1, grams).otherwise(F.array().cast("array<string>"))


def gopher_repetition(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 2,
) -> DataFrame:
    """Gopher-style repetition signals (the repetition-filter family a
    training-data pipeline runs alongside quality scoring):

      - dup_line_e6:       fraction of lines that are repeats of an
                           earlier identical line
      - dup_line_char_e6:  fraction of line characters in those
                           repeated occurrences
      - top_gram / top_gram_count / top_gram_char_e6: the most
        frequent word n-gram (count desc, gram asc tiebreak) and the
        character share its occurrences cover in the normalized text

    Scalable shape: lines and n-grams EXPLODE into (id, item) rows
    and aggregate — per-doc work is linear, the heavy lifting is two
    hash aggregations; no per-row quadratic scans and no collect."""
    base = df.select(
        F.col(id_col).alias("id"),
        F.col(text_col).alias("text"),
        tokens(normalize_text(F.col(text_col))).alias("__toks"),
        F.length(normalize_text(F.col(text_col))).alias("__nlen"),
    )

    lines = base.select(
        "id", F.explode(F.split(F.col("text"), "\n")).alias("line")
    )
    per_line = lines.groupBy("id", "line").agg(F.count(F.lit(1)).alias("cnt"))
    line_stats = per_line.groupBy("id").agg(
        F.sum("cnt").alias("n_lines"),
        F.count(F.lit(1)).alias("n_distinct"),
        F.sum(F.col("cnt") * F.length("line")).alias("chars_all"),
        F.sum(F.length("line")).alias("chars_distinct"),
    )

    grams = base.select(
        "id", "__nlen", F.explode(_word_ngrams(F.col("__toks"), n)).alias("gram")
    )
    per_gram = grams.groupBy("id", "__nlen", "gram").agg(
        F.count(F.lit(1)).alias("cnt")
    )
    w = Window.partitionBy("id").orderBy(F.desc("cnt"), F.asc("gram"))
    top = (
        per_gram.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .select(
            "id",
            F.col("gram").alias("top_gram"),
            F.col("cnt").alias("top_gram_count"),
            F.floor(
                F.col("cnt") * F.length("gram") * 1_000_000
                / F.greatest(F.col("__nlen"), F.lit(1))
            ).alias("top_gram_char_e6"),
        )
    )

    e6 = lambda num, den: F.floor(  # noqa: E731
        num * 1_000_000 / F.greatest(den, F.lit(1))
    )
    return (
        line_stats.withColumns(
            {
                "dup_line_e6": e6(
                    F.col("n_lines") - F.col("n_distinct"), F.col("n_lines")
                ),
                "dup_line_char_e6": e6(
                    F.col("chars_all") - F.col("chars_distinct"),
                    F.col("chars_all"),
                ),
            }
        )
        .join(top, "id", "left")
        .select(
            F.col("id").alias(id_col),
            "dup_line_e6", "dup_line_char_e6",
            "top_gram", "top_gram_count", "top_gram_char_e6",
        )
    )
