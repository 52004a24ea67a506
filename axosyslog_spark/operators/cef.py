"""CEF / LEEF event-format parsers.

Reference: modules/cef/filterx-func-parse-cef.c + event-format-parser.c
(header fields split on a dialect separator with \\-escapes, then an
extension section of key=value pairs).

CEF:  CEF:version|vendor|product|device_version|event_class|name|severity|ext
LEEF: LEEF:version|vendor|product|firmware|event_id|ext(tab- or |-separated)

Spark mapping: bounded split for the header (7 fields + greedy
extension), str_to_map for extensions — single projection.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

CEF_HEADER_FIELDS = (
    "cef_version", "vendor", "product", "device_version",
    "event_class", "event_name", "cef_severity",
)


def parse_cef(df: DataFrame, src_col: str = "text", prefix: str = "") -> DataFrame:
    """Parse CEF lines; non-CEF rows get nulls + cef_ok=false."""
    src = F.col(src_col)
    is_cef = src.startswith("CEF:")
    parts = F.split(F.regexp_replace(src, "^CEF:", ""), r"(?<!\\)\|", 8)
    out = df.withColumn(f"{prefix}cef_ok", is_cef & (F.size(parts) >= 8))
    for i, name in enumerate(CEF_HEADER_FIELDS):
        val = F.when(F.col(f"{prefix}cef_ok"), F.element_at(parts, i + 1))
        out = out.withColumn(prefix + name, F.regexp_replace(val, r"\\([|\\])", "$1"))
    ext = F.when(F.col(f"{prefix}cef_ok"), F.element_at(parts, 8))
    return out.withColumn(f"{prefix}cef_ext", F.str_to_map(ext, F.lit(" "), F.lit("=")))


def parse_leef(df: DataFrame, src_col: str = "text", prefix: str = "") -> DataFrame:
    """Parse LEEF 1.0/2.0 lines (tab-separated extension)."""
    src = F.col(src_col)
    is_leef = src.startswith("LEEF:")
    parts = F.split(F.regexp_replace(src, "^LEEF:", ""), r"(?<!\\)\|", 6)
    out = df.withColumn(f"{prefix}leef_ok", is_leef & (F.size(parts) >= 6))
    for i, name in enumerate(("leef_version", "vendor", "product", "firmware", "event_id")):
        val = F.when(F.col(f"{prefix}leef_ok"), F.element_at(parts, i + 1))
        out = out.withColumn(prefix + name, val)
    ext = F.when(F.col(f"{prefix}leef_ok"), F.element_at(parts, 6))
    return out.withColumn(f"{prefix}leef_ext", F.str_to_map(ext, F.lit("\t"), F.lit("=")))
