"""Multi-line assembly: join continuation lines into one message.

Reference: lib/multi-line/ — indented-multi-line.c (a line starting
with whitespace continues the previous), regexp-multi-line.c
(prefix/garbage patterns mark message starts), smart-multi-line.c
(FSM; approximated here by the regexp variant with a stack-trace-ish
default pattern).

Spark mapping: per-key event order, `is_start` boolean → running
`sum()` window assigns a segment id, then group-concat within
(key, segment). Two shuffles worst case (window + groupBy), both on
the same key so AQE/bucketing co-locates them.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def assemble(
    df: DataFrame,
    is_start: Column,
    key: str = "conv_id",
    order: str = "turn_idx",
    text_col: str = "text",
    sep: str = "\n",
) -> DataFrame:
    """Generic assembler: rows where ``is_start`` is true begin a new
    message; every other row continues the previous one."""
    w = Window.partitionBy(key).orderBy(order)
    seg = F.sum(F.when(is_start, 1).otherwise(0)).over(
        w.rowsBetween(Window.unboundedPreceding, 0)
    )
    out = df.withColumn("__seg", seg)
    return (
        out.groupBy(key, "__seg")
        .agg(
            F.min(order).alias(order),
            F.array_join(
                F.transform(
                    F.array_sort(F.collect_list(F.struct(order, text_col))),
                    lambda x: x[text_col],
                ),
                sep,
            ).alias("assembled"),
            F.count(F.lit(1)).alias("n_lines"),
        )
        .withColumnRenamed("__seg", "segment_id")
    )


def indented(
    df: DataFrame, key: str = "conv_id", order: str = "turn_idx",
    text_col: str = "text", sep: str = "\n",
) -> DataFrame:
    """indented-multi-line: whitespace-led lines continue the message."""
    return assemble(
        df, ~F.col(text_col).rlike(r"^[ \t]"), key, order, text_col, sep
    )


def regexp_prefix(
    df: DataFrame, prefix_re: str, key: str = "conv_id", order: str = "turn_idx",
    text_col: str = "text", sep: str = "\n",
) -> DataFrame:
    """regexp-multi-line(prefix): lines matching the prefix start a new
    message; the rest are continuations."""
    return assemble(
        df, F.col(text_col).rlike(prefix_re), key, order, text_col, sep
    )
