"""pdbtool patternize: SLCT log-pattern discovery, Spark-first.

Reference: modules/correlation/patternize.c (ptz_find_frequent_words,
ptz_find_clusters_slct, ptz_find_clusters PTZ_ITERATE_OUTLIERS loop,
ptz_print_patterndb_rule) + modules/correlation/pdbtool/pdbtool.c:1144
(default delimiter set, percentage support). Unit expectations ported
from modules/correlation/tests/test_patternize.c.

Algorithm (SLCT):
  1. split each message on the delimiter set (empty tokens from
     consecutive delimiters count, like g_strsplit_set);
  2. (position, word) pairs with >= support occurrences are
     "frequent";
  3. each line maps to a cluster key: per position the frequent word
     itself or a parser marker, plus the line's in-order delimiter
     sequence (so identical word skeletons with different separators
     stay distinct clusters);
  4. clusters with >= support lines survive; every infrequent
     position renders as @ESTRING::<delim>@ (dropped when it is the
     trailing token — the reference's "syslog-ng won't handle a last
     ESTRING well" rule), frequent words render literally with ``@``
     doubled.

Scale shape: one shuffle to count (position, word) pairs, one
broadcast join of the (small, support-pruned) frequent set back onto
the token stream, one shuffle to regroup lines into cluster keys.
Nothing is collected except the final cluster table, which support
pruning keeps tiny relative to the input. The iterate-outliers mode
re-runs the same plan on the anti-joined remainder with the support
recomputed per round (patternize.c:352-400).

Deviation (documented): cluster sample messages are the
lexicographically first ``num_samples`` of the cluster rather than
the first-encountered ones — encounter order is not deterministic on
a distributed input.
"""

from __future__ import annotations

import re

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# pdbtool.c:1144 — the default patternize delimiter set
DEFAULT_DELIMITERS = " :&~?![]=,;()'\""

_SEP = "\x1e"     # PTZ_SEPARATOR_CHAR
_MARKER = "\x1a"  # PTZ_PARSER_MARKER_CHAR


def _delim_class(delimiters: str) -> str:
    return "[" + re.escape(delimiters) + "]"


def _line_features(
    df: DataFrame, msg_col: str, delimiters: str
) -> DataFrame:
    """Adds __pz_id, __pz_words (split tokens) and __pz_delims (the
    in-order delimiter characters of the line, ptz_find_delimiters)."""
    cls = _delim_class(delimiters)
    return df.withColumns(
        {
            "__pz_id": F.monotonically_increasing_id(),
            "__pz_words": F.split(F.col(msg_col), cls),
            "__pz_delims": F.regexp_replace(
                F.col(msg_col), "[^" + re.escape(delimiters) + "]", ""
            ),
        }
    )


def frequent_words(
    df: DataFrame,
    msg_col: str = "text",
    support: int = 1,
    delimiters: str = DEFAULT_DELIMITERS,
) -> DataFrame:
    """ptz_find_frequent_words: (pos, word) pairs occurring >= support
    times. (The reference's optional two-pass hash pre-filter is a
    memory optimization for its in-core hash table; the groupBy below
    spills instead, so one pass is exact.) Returns (pos, word, n)."""
    lines = _line_features(df, msg_col, delimiters)
    tokens = lines.select(
        F.posexplode("__pz_words").alias("pos", "word")
    )
    return (
        tokens.groupBy("pos", "word")
        .agg(F.count(F.lit(1)).alias("n"))
        .filter(F.col("n") >= F.lit(support))
    )


def _clustered_lines(
    df: DataFrame, msg_col: str, support: int, delimiters: str
) -> DataFrame:
    """Lines annotated with __pz_key (cluster key) and __pz_candidate
    (has at least one frequent word)."""
    lines = _line_features(df, msg_col, delimiters)
    freq = frequent_words(df, msg_col, support, delimiters).drop("n")
    tokens = lines.select(
        "__pz_id", F.posexplode("__pz_words").alias("pos", "word")
    )
    marked = tokens.join(
        F.broadcast(freq.withColumn("__pz_freq", F.lit(True))),
        ["pos", "word"],
        "left",
    )
    piece = F.when(
        F.col("__pz_freq"),
        F.format_string("%d %s", F.col("pos"), F.col("word")),
    ).otherwise(F.format_string("%d " + _MARKER, F.col("pos")))
    per_line = marked.groupBy("__pz_id").agg(
        F.array_join(
            F.transform(
                F.array_sort(
                    F.collect_list(F.struct(F.col("pos"), piece.alias("piece")))
                ),
                lambda s: s["piece"],
            ),
            _SEP,
        ).alias("__pz_pieces"),
        F.max(F.coalesce("__pz_freq", F.lit(False))).alias("__pz_candidate"),
    )
    return lines.join(per_line, "__pz_id").withColumn(
        "__pz_key",
        F.concat_ws(_SEP, F.col("__pz_pieces"), F.col("__pz_delims")),
    )


def render_pattern(key: Column) -> Column:
    """Cluster key -> db-parser pattern string
    (ptz_print_patterndb_rule): literal frequent words with '@'
    doubled and their trailing delimiter appended; parser-marker
    positions become @ESTRING::<delim>@ except at the end of the
    pattern, where the reference emits nothing."""
    parts = F.split(key, _SEP)
    n = F.size(parts)
    delims = F.element_at(parts, n)
    words = F.slice(parts, 1, n - 1)

    def render(w: Column, i: Column) -> Column:
        word = F.element_at(F.split(w, " ", 2), 2)
        delim = F.substring(delims, i + 1, 1)
        is_last = i == F.size(words) - 1
        return (
            F.when(word == _MARKER,
                   F.when(is_last, F.lit(""))
                   .otherwise(F.concat(F.lit("@ESTRING::"), delim, F.lit("@"))))
            .otherwise(
                F.concat(
                    F.replace(word, F.lit("@"), F.lit("@@")),
                    F.when(is_last, F.lit("")).otherwise(delim),
                )
            )
        )

    return F.array_join(F.transform(words, render), "")


def patternize(
    df: DataFrame,
    msg_col: str = "text",
    support: float = 4.0,
    absolute_support: int | None = None,
    delimiters: str = DEFAULT_DELIMITERS,
    num_samples: int = 3,
    iterate_outliers: bool = False,
) -> DataFrame:
    """pdbtool patternize verb: discover db-parser rule patterns.

    support is a percentage of input lines (pdbtool --support,
    default 4.0); pass absolute_support to pin the line count
    directly (the algorithm-level unit in patternize.h). Returns
    (pattern string, support count, samples array<string>).

    iterate_outliers re-runs discovery on lines not claimed by any
    surviving cluster, with the support recomputed as the same
    percentage of the remainder each round (PTZ_ITERATE_OUTLIERS)."""
    if absolute_support is not None:
        sup = absolute_support
    else:
        sup = int(df.count() * support / 100.0)

    def step(frame: DataFrame, sup_abs: int):
        lines = _clustered_lines(frame, msg_col, sup_abs, delimiters)
        clusters = (
            lines.filter("__pz_candidate")
            .groupBy("__pz_key")
            .agg(
                F.count(F.lit(1)).alias("support"),
                F.slice(
                    F.array_sort(F.collect_list(F.col(msg_col))),
                    1,
                    num_samples,
                ).alias("samples"),
            )
            .filter(F.col("support") >= F.lit(sup_abs))
        )
        return lines, clusters

    def finish(clusters: DataFrame) -> DataFrame:
        return clusters.select(
            render_pattern(F.col("__pz_key")).alias("pattern"),
            F.col("support").cast("bigint").alias("support"),
            "samples",
        )

    if not iterate_outliers:
        _, clusters = step(df, sup)
        return finish(clusters)

    spark = df.sparkSession
    collected: DataFrame | None = None
    remaining = df
    prev_cached: DataFrame | None = None
    while True:
        lines, clusters = step(remaining, sup)
        clusters = clusters.persist()
        if clusters.isEmpty():
            clusters.unpersist()
            break
        collected = (
            clusters if collected is None else collected.unionByName(clusters)
        )
        remaining = (
            lines.join(
                clusters.select("__pz_key"), "__pz_key", "left_anti"
            )
            .drop("__pz_id", "__pz_words", "__pz_delims", "__pz_pieces",
                  "__pz_candidate", "__pz_key")
            # cache the outlier set: the count below materializes it,
            # and the next round's step() then reads the cached rows
            # instead of re-scanning the whole anti-join lineage —
            # one scan per round instead of two (round-3 verdict)
            .persist()
        )
        sup = int(remaining.count() * support / 100.0)
        if prev_cached is not None:
            prev_cached.unpersist()
        prev_cached = remaining
    if prev_cached is not None:
        prev_cached.unpersist()
    if collected is None:
        schema = "pattern string, support bigint, samples array<string>"
        return spark.createDataFrame([], schema)
    return finish(collected)
