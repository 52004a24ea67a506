"""CEF / LEEF event-format parsers.

Reference: modules/cef/filterx-func-parse-cef.c + event-format-parser.c
(header fields split on a dialect separator with \\-escapes, then an
extension section of key=value pairs).

CEF:  CEF:version|vendor|product|device_version|event_class|name|severity|ext
LEEF: LEEF:version|vendor|product|firmware|event_id|ext(tab- or |-separated)

Spark mapping: bounded split for the header (7 fields + greedy
extension), a dup-safe split+fold for extensions — single projection.
(str_to_map / map_from_entries / map_concat all abort the job on a
duplicate key under Spark's default mapKeyDedupPolicy=EXCEPTION; the
reference parser overwrites — last occurrence wins.)
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from axosyslog_spark.operators.kvscan import entries_to_map


def _ext_entries(ext: Column, pair_re: Column) -> Column:
    """Extension section -> array<struct<key,value>>: split on the
    pair delimiter regex, first '=' separates key from value (no '='
    -> NULL value, like str_to_map), empty tokens dropped."""
    toks = F.filter(F.split(ext, pair_re), lambda t: t != "")
    return F.transform(
        toks,
        lambda t: F.struct(
            F.substring_index(t, "=", 1).alias("key"),
            F.when(
                t.contains("="),
                F.substring(
                    t,
                    F.length(F.substring_index(t, "=", 1)) + 2,
                    F.lit(2_000_000_000),
                ),
            ).alias("value"),
        ),
    )

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
    return out.withColumn(
        f"{prefix}cef_ext", entries_to_map(_ext_entries(ext, F.lit(" ")))
    )


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
    return out.withColumn(
        f"{prefix}leef_ext", entries_to_map(_ext_entries(ext, F.lit("\t")))
    )


# ---------------------------------------------------------------------------
# FilterX builtin shapes: Column -> map<string,string> / inverse
# (modules/cef/filterx-func-parse-cef.c, filterx-func-parse-leef.c,
#  filterx-func-format-cef.c, filterx-func-format-leef.c)
# ---------------------------------------------------------------------------

# dict keys the filterx parse_cef()/parse_leef() builtins emit
# (cef_fields[] filterx-func-parse-cef.c:30-39,
#  leef_fields[] filterx-func-parse-leef.c:171-176)
CEF_FX_FIELDS = (
    "cef_version", "device_vendor", "device_product", "device_version",
    "device_event_class_id", "event_name", "agent_severity",
)
LEEF_FX_FIELDS = (
    "leef_version", "vendor_name", "product_name", "product_version",
    "event_id",
)


def _unescape_hdr(c: Column) -> Column:
    return F.regexp_replace(c, r"\\([|\\])", "$1")


def parse_cef_fx(src: Column) -> Column:
    """filterx parse_cef(): one map<string,string> of the 7 header
    fields + the space-separated extension k=v pairs (values absorb
    following words without '=', per the kv-scanner config in
    filterx-func-parse-cef.c cef_cfg). NULL when not a CEF line."""
    from axosyslog_spark.operators.kvscan import kv_scan

    is_cef = src.startswith("CEF:")
    parts = F.split(F.regexp_replace(src, "^CEF:", ""), r"(?<!\\)\|", 8)
    hdr = F.array(
        *[
            F.struct(
                F.lit(n).alias("key"),
                _unescape_hdr(F.element_at(parts, i + 1)).alias("value"),
            )
            for i, n in enumerate(CEF_FX_FIELDS)
        ]
    )
    pairs = kv_scan(F.element_at(parts, 8))
    ext = F.transform(
        pairs,
        lambda p: F.struct(p["key"].alias("key"), p["value"].alias("value")),
    )
    # single last-wins fold over header+extension entries: an
    # extension key that collides with a header name overwrites it
    # (dict-insert order in the filterx builtin), and duplicate
    # extension keys don't abort the job
    return F.when(
        is_cef & (F.size(parts) >= 8), entries_to_map(F.concat(hdr, ext))
    )


def parse_leef_fx(src: Column) -> Column:
    """filterx parse_leef(): LEEF 1.0 (tab-separated extensions) and
    2.0 (explicit delimiter header field — literal char, 'x26' or
    '0x26' hex forms, filterx-func-parse-leef.c:43-76). NULL when not
    a LEEF line."""
    is_leef = src.startswith("LEEF:")
    body = F.regexp_replace(src, "^LEEF:", "")
    p1 = F.split(body, r"(?<!\\)\|", 6)  # 1.0: ext is field 6
    p2 = F.split(body, r"(?<!\\)\|", 7)  # 2.0: delim field 6, ext 7
    ver = F.element_at(p1, 1)
    is20 = ver.startswith("2.")
    delim_raw = F.element_at(p2, 6)
    hexpart = F.regexp_extract(delim_raw, r"^(?:0[xX]|[xX])([0-9A-Fa-f]{2})$", 1)
    delim = (
        F.when(delim_raw == "", F.lit("\t"))
        .when(hexpart != "", F.char(F.conv(hexpart, 16, 10).cast("int")))
        .when(F.length(delim_raw) == 1, delim_raw)
    )
    ext_raw = F.when(is20, F.element_at(p2, 7)).otherwise(F.element_at(p1, 6))
    pair_re = F.when(is20, F.concat(F.lit(r"\Q"), delim, F.lit(r"\E"))).otherwise(
        F.lit("\t")
    )
    hdr = F.array(
        *[
            F.struct(
                F.lit(n).alias("key"),
                _unescape_hdr(F.element_at(p2, i + 1)).alias("value"),
            )
            for i, n in enumerate(LEEF_FX_FIELDS)
        ]
    )
    ok = is_leef & (
        (is20 & (F.size(p2) >= 7) & delim.isNotNull())
        | (~is20 & (F.size(p1) >= 6))
    )
    return F.when(
        ok, entries_to_map(F.concat(hdr, _ext_entries(ext_raw, pair_re)))
    )


def _escape_hdr(c: Column) -> Column:
    return F.regexp_replace(c.cast("string"), r"([|\\])", r"\\$1")


def _format_event_fx(m: Column, sig: str, fields: tuple, ext_sep: str) -> Column:
    hdr = F.concat_ws(
        "|", *[_escape_hdr(F.coalesce(F.element_at(m, f), F.lit(""))) for f in fields]
    )
    ext_entries = F.filter(
        F.map_entries(m), lambda e: ~e["key"].isin(*fields)
    )
    ext = F.array_join(
        F.transform(
            ext_entries,
            lambda e: F.concat(
                e["key"], F.lit("="),
                F.regexp_replace(e["value"], r"([=\\])", r"\\$1"),
            ),
        ),
        ext_sep,
    )
    return F.concat(F.lit(sig), hdr, F.lit("|"), ext)


def format_cef_fx(m: Column) -> Column:
    """filterx format_cef(dict): inverse of parse_cef_fx — named header
    keys (| and \\ escaped) then the remaining keys as space-separated
    k=v extensions in map order (event-format-formatter.c)."""
    return _format_event_fx(m, "CEF:", CEF_FX_FIELDS, " ")


def format_leef_fx(m: Column) -> Column:
    """filterx format_leef(dict): LEEF 1.0 form, tab-separated
    extensions."""
    return _format_event_fx(m, "LEEF:", LEEF_FX_FIELDS, "\t")
