"""csv-parser(): delimited split into named, typed columns.

Reference: modules/csvparser/csvparser.c + lib/scanner/csv-scanner/
csv-scanner.c. Options mirrored: columns (names + type hints,
csvparser.h:30-41), delimiters, quote pairs, null-value, greedy
(last column swallows the rest), strip-whitespace, drop-invalid
(row must fill every column unless greedy).

Spark mapping: `from_csv` where the dialect allows (quoted fields),
else a bounded `split` — both single-pass projections.
"""

from __future__ import annotations

from dataclasses import dataclass, field

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


@dataclass(frozen=True)
class CsvColumn:
    name: str
    cast: str | None = None  # spark type name (type hints, csvparser.h:30-41)


@dataclass(frozen=True)
class CsvSpec:
    columns: tuple[CsvColumn, ...]
    delimiter: str = ","
    quote: str | None = '"'
    null_value: str | None = None
    greedy: bool = False          # last column takes the rest of the line
    strip: bool = False           # strip whitespace around fields
    drop_invalid: bool = True     # parse_ok=False when column count short
    prefix: str = ""
    # dialect (csv-scanner.c CSVScannerDialect): the in-quote escape
    # character. None keeps the scanner's backslash default
    # (escape-backslash); pass the quote char itself for the
    # escape-double-char dialect (doubled quotes inside a quoted field).
    escape: str | None = None


def csv_parse(df: DataFrame, spec: CsvSpec, src_col: str = "text") -> DataFrame:
    """Apply the csv spec; adds one column per spec column plus
    ``csv_ok`` (the drop-invalid signal — filter on it to drop)."""
    src = F.col(src_col)
    n = len(spec.columns)

    if spec.quote and not spec.greedy:
        # quoted dialect -> from_csv handles embedded delimiters
        schema = ", ".join(f"`{c.name}` STRING" for c in spec.columns)
        opts = {"sep": spec.delimiter, "quote": spec.quote or '"'}
        if spec.escape is not None:
            opts["escape"] = spec.escape
        if spec.null_value is not None:
            opts["nullValue"] = spec.null_value
        parsed = F.from_csv(src, F.lit(schema), opts)
        ok = F.lit(True)
        for i, c in enumerate(spec.columns):
            val = parsed[c.name]
            if i < n - 1 or spec.drop_invalid:
                ok = ok & val.isNotNull()
            df = df.withColumn(spec.prefix + c.name, _post(val, c, spec))
        return df.withColumn("csv_ok", ok if spec.drop_invalid else F.lit(True))

    # plain split dialect (optionally greedy)
    limit = n if spec.greedy else -1
    parts = F.split(src, _escape(spec.delimiter), limit)
    ok = F.size(parts) >= n if spec.drop_invalid else F.lit(True)
    for i, c in enumerate(spec.columns):
        val = F.when(F.size(parts) > i, F.element_at(parts, i + 1))
        df = df.withColumn(spec.prefix + c.name, _post(val, c, spec))
    return df.withColumn("csv_ok", ok)


def _escape(delim: str) -> str:
    import re

    return re.escape(delim)


def _post(val: Column, c: CsvColumn, spec: CsvSpec) -> Column:
    if spec.strip:
        val = F.trim(val)
    if spec.null_value is not None:
        val = F.nullif(val, F.lit(spec.null_value))
    if c.cast:
        val = val.cast(c.cast)
    return val
