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
    drop_invalid: bool = True     # parse_ok=False when the column count
    # mismatches (short OR long, like the scanner) or a type hint fails
    prefix: str = ""
    # dialect (csv-scanner.c CSVScannerDialect): the in-quote escape
    # character. None keeps the scanner's backslash default
    # (escape-backslash); pass the quote char itself for the
    # escape-double-char dialect (doubled quotes inside a quoted field).
    escape: str | None = None
    # csv-scanner quoting breadth (functional-suite options):
    #   quotes("~^")      — a SET of symmetric quote characters
    #   quote-pairs("><") — consecutive (open, close) character pairs
    # Fields wrapped in a configured pair are unwrapped and their
    # escape dialect decoded. (Embedded delimiters inside such quotes
    # need the from_csv fast path — the default '"' dialect; the pair
    # path is the split dialect, documented bounded parity.)
    quotes: str | None = None
    quote_pairs: str | None = None
    # delimiters(strings("^^^", "~~~")) — multi-character delimiter
    # alternatives (any of them splits)
    delimiter_strings: tuple[str, ...] = ()
    # escape-none | escape-backslash | escape-backslash-with-sequences
    # | escape-double-char (csv-scanner.c dialect enum) — applied to
    # quoted fields on the split path
    dialect: str = "escape-backslash"


def csv_parse(df: DataFrame, spec: CsvSpec, src_col: str = "text") -> DataFrame:
    """Apply the csv spec; adds one column per spec column plus
    ``csv_ok`` (the drop-invalid signal — filter on it to drop)."""
    src = F.col(src_col)
    n = len(spec.columns)

    custom = bool(spec.quotes or spec.quote_pairs or spec.delimiter_strings)
    if spec.quote and not spec.greedy and not custom:
        # quoted dialect -> from_csv handles embedded delimiters
        schema = ", ".join(f"`{c.name}` STRING" for c in spec.columns)
        opts = {"sep": spec.delimiter, "quote": spec.quote or '"'}
        if spec.escape is not None:
            opts["escape"] = spec.escape
        # null-value handling stays in _post (nullif): a field that
        # carries the null TOKEN is a legal row — only a truly missing
        # column may fail the drop-invalid check below
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
    if spec.delimiter_strings:
        sep = "|".join(_escape(s) for s in spec.delimiter_strings)
    else:
        sep = _escape(spec.delimiter)
    if spec.dialect == "escape-unquoted-delimiter":
        # csv-scanner.c CSV_SCANNER_ESCAPE_UNQUOTED_DELIMITER: a
        # backslash protects ONLY the delimiter in unquoted fields
        # ('\|' is a literal '|', '\z' stays '\z'). Split at
        # unescaped delimiters, unescape inside each field. (An
        # escaped backslash directly before a delimiter would need an
        # even-backslash-count guard Java's bounded lookbehind cannot
        # express — documented drift for that corner.)
        sep = r"(?<!\\)(?:" + sep + ")"
    parts = F.split(src, sep, limit)
    if spec.dialect == "escape-unquoted-delimiter":
        unesc = F.lit("\\" + spec.delimiter)
        parts = F.transform(
            parts, lambda p: F.replace(p, unesc, F.lit(spec.delimiter))
        )
    # the scanner discards BOTH short and long rows (greedy's limit
    # already caps size at n, so == is the one check for both modes)
    ok = F.size(parts) == n if spec.drop_invalid else F.lit(True)
    for i, c in enumerate(spec.columns):
        val = F.when(F.size(parts) > i, F.element_at(parts, i + 1))
        val = _unquote(val, spec)
        posted = _post(val, c, spec)
        if spec.drop_invalid and c.cast:
            # type-hint mismatch discards the row (on-type-error(drop))
            ok = ok & (val.isNull() | posted.isNotNull())
        df = df.withColumn(spec.prefix + c.name, posted)
    return df.withColumn("csv_ok", ok)


def _quote_pairs(spec: CsvSpec) -> list[tuple[str, str]]:
    pairs: list[tuple[str, str]] = []
    if spec.quotes:
        pairs += [(q, q) for q in spec.quotes]
    if spec.quote_pairs:
        qp = spec.quote_pairs
        if len(qp) % 2:
            raise ValueError("quote-pairs needs an even-length string")
        pairs += [(qp[i], qp[i + 1]) for i in range(0, len(qp), 2)]
    if not pairs and spec.quote:
        pairs = [(spec.quote, spec.quote)]
    return pairs


def _decode_escapes(inner: Column, close: str, dialect: str) -> Column:
    if dialect == "escape-none":
        return inner
    if dialect == "escape-double-char":
        return F.replace(inner, F.lit(close * 2), F.lit(close))
    if dialect == "escape-backslash-with-sequences":
        # csv-scanner.c: \xNN hex bytes decode first (an invalid hex
        # pair just drops its backslash via the generic rule below),
        # then the named C sequences, then anything else drops its
        # backslash
        hex_head = r"\\x[0-9A-Fa-f]{2}"
        segs = F.split(inner, r"(?<!\\)(?=" + hex_head + ")")
        inner = F.array_join(
            F.transform(
                segs,
                lambda p: F.when(
                    p.rlike("^" + hex_head),
                    F.concat(
                        F.decode(F.unhex(F.substring(p, 3, 2)), "UTF-8"),
                        F.substr(p, F.lit(5)),
                    ),
                ).otherwise(p),
            ),
            "",
        )
        for ch, rep in (
            ("a", "\a"), ("b", "\b"), ("f", "\f"), ("n", "\n"),
            ("r", "\r"), ("t", "\t"), ("v", "\v"),
        ):
            inner = F.regexp_replace(inner, r"(?<!\\)\\" + ch, rep)
        return F.regexp_replace(inner, r"\\(.)", "$1")
    # escape-backslash: backslash quotes the next char verbatim
    return F.regexp_replace(inner, r"\\(.)", "$1")


def _unquote(val: Column, spec: CsvSpec) -> Column:
    """Strip a configured quote pair off a field and decode the
    dialect's escapes (split path; from_csv handles the default '"'
    dialect natively)."""
    pairs = _quote_pairs(spec) if (spec.quotes or spec.quote_pairs or spec.quote) else []
    if not pairs:
        return val
    out = val
    inner = F.substring(val, 2, F.length(val) - 2)
    for o, c in reversed(pairs):
        quoted = (
            (F.length(val) >= 2)
            & val.startswith(o)
            & val.endswith(c)
        )
        out = F.when(quoted, _decode_escapes(inner, c, spec.dialect)).otherwise(out)
    return out


def _escape(delim: str) -> str:
    import re

    return re.escape(delim)


def _post(val: Column, c: CsvColumn, spec: CsvSpec) -> Column:
    if spec.strip:
        val = F.trim(val)
    if spec.null_value is not None:
        val = F.nullif(val, F.lit(spec.null_value))
    if c.cast:
        # try_cast: a type-hint mismatch is data, not a crash — it
        # nulls (on-type-error(drop-property)) and, under drop_invalid,
        # discards the row (csv_parse folds it into csv_ok)
        val = val.try_cast(c.cast)
    return val
