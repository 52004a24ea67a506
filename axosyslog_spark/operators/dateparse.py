"""date-parser(): strptime with multiple candidate formats + timezone.

Reference: modules/timestamp/date-parser.c (format list tried in
order, first hit wins; optional explicit timezone). Spark mapping:
``coalesce(try_to_timestamp(fmt1), try_to_timestamp(fmt2), ...)`` —
one projection, no UDF; the format list compiles into the plan.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# common syslog-world formats (date-parser defaults + RFC flavors).
# Fractional variants FIRST (a shorter pattern would truncate-match
# never — try_to_timestamp is anchored — but explicit order keeps the
# intent obvious); ',SSS' is the log4j/java.util.logging millis form
# (test_date.c date_with_multiple_formats).
DEFAULT_FORMATS = (
    "yyyy-MM-dd'T'HH:mm:ss.SSSXXX",  # ISO with millis + offset
    "yyyy-MM-dd'T'HH:mm:ssXXX",
    "yyyy-MM-dd'T'HH:mm:ss.SSS",
    "yyyy-MM-dd'T'HH:mm:ss",        # RFC5424 (no frac/offset)
    "yyyy-MM-dd HH:mm:ss,SSS",      # log4j comma-millis
    "yyyy-MM-dd HH:mm:ss.SSS",
    "yyyy-MM-dd HH:mm:ss",
    "MMM d HH:mm:ss",               # RFC3164 (no year)
    "yyyy/MM/dd HH:mm:ss",
    "dd/MMM/yyyy:HH:mm:ss Z",       # CLF with offset (%d/%b/%Y:%T %z)
    "dd/MMM/yyyy:HH:mm:ss",         # CLF
    "yyyy-MM-dd",
)

# sentinel format: '%s' — seconds since epoch (optionally '%s %z',
# where the offset only re-labels the wall clock; the instant is the
# same). date-parser.c supports it via strptime's %s.
UNIX_FMT = "unix"


def parse_date(
    src: Column,
    formats: tuple[str, ...] = DEFAULT_FORMATS,
    timezone: str | None = None,
) -> Column:
    """First-match timestamp across the format list (NULL if none)."""
    candidates = [
        F.timestamp_seconds(src.try_cast("bigint"))
        if fmt == UNIX_FMT
        else F.try_to_timestamp(src, F.lit(fmt))
        for fmt in formats
    ]
    ts = F.coalesce(*candidates)
    if timezone:
        ts = F.to_utc_timestamp(ts, timezone)
    return ts


def date_parser(
    df: DataFrame,
    src_col: str,
    out_col: str = "parsed_ts",
    formats: tuple[str, ...] = DEFAULT_FORMATS,
    timezone: str | None = None,
) -> DataFrame:
    return df.withColumn(out_col, parse_date(F.col(src_col), formats, timezone))
