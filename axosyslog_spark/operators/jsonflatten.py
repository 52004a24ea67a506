"""Generic JSON flatten: arbitrary JSON -> dotted-key NV map.

Reference: modules/json/json-parser.c:1-421 —
  - nested objects recurse with ``prefix + key + key_delimiter``
  - arrays whose elements are ALL strings become a comma-joined list
    value; any other array is stored as its raw JSON text (LM_VT_JSON)
  - scalars store their token text (true/false, decimal ints, strings)
  - ``prefix()`` namespaces every key; ``extract-prefix()`` descends
    into a subobject first; ``marker()`` requires (and strips) a
    leading marker like '@cee:'

Spark-first: recursion becomes ``max_depth`` bounded rounds of pure
column algebra — from_json to ``map<string,string>`` (Spark returns
nested objects as their raw JSON text), one flatten round per depth
level, each materialized in its own projection so the expression tree
stays linear in depth. No Python per row; a vectorized UDF is NOT
needed because real-world nesting depth is small and the bound is
explicit (raise it per call for deeper documents).

Deviation noted: the reference renders doubles via printf %f (3.14 ->
"3.140000"); we keep the raw JSON token ("3.14"), which is lossless.
Array elements containing commas are str_repr-quoted by the
reference; we join raw (flag day documented here).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

_MAP_SS = "map<string,string>"
# a JSON array whose elements are all strings (spaces between tokens ok)
_ALL_STRING_ARRAY_RE = r'^\[\s*(?:"(?:\\.|[^"\\])*"\s*(?:,\s*"(?:\\.|[^"\\])*"\s*)*)?\]$'


def _entries_to_map_last_wins(entries: Column) -> Column:
    """array<struct<key,value>> -> map, LAST duplicate key wins
    (repeated NV sets overwrite in the reference; map_from_entries
    would throw under the default EXCEPTION dedup policy)."""
    return F.aggregate(
        F.reverse(entries),
        F.expr("map()").cast(_MAP_SS),
        lambda acc, e: F.when(F.map_contains_key(acc, e["key"]), acc).otherwise(
            F.map_concat(acc, F.create_map(e["key"], e["value"]))
        ),
    )


def _looks_like_object(v: Column) -> Column:
    return v.isNotNull() & v.startswith("{")


def flatten_json_column(
    src: Column, key_delimiter: str = ".", max_depth: int = 3
) -> Column:
    """Column-level dotted-key flatten of a JSON-object string (the
    filterx flatten() builtin): map<string,string> or NULL when the
    input isn't a JSON object. Unlike json_flatten (which splits each
    nesting round into its own projection), the rounds nest inside one
    expression here, so max_depth stays small — use the DataFrame
    operator for deep documents."""
    top = F.from_json(src.cast("string"), _MAP_SS)
    entries = F.map_entries(top)
    for _ in range(max_depth):
        entries = F.flatten(
            F.transform(
                entries,
                lambda e: F.when(
                    _looks_like_object(e["value"])
                    & F.from_json(e["value"], _MAP_SS).isNotNull(),
                    F.transform(
                        F.map_entries(F.from_json(e["value"], _MAP_SS)),
                        lambda c: F.struct(
                            F.concat(
                                e["key"], F.lit(key_delimiter), c["key"]
                            ).alias("key"),
                            c["value"].alias("value"),
                        ),
                    ),
                ).otherwise(F.array(e)),
            )
        )
    return F.when(top.isNotNull(), _entries_to_map_last_wins(entries))


def json_flatten(
    df: DataFrame,
    src_col: str = "text",
    out_col: str = "jsonf",
    prefix: str = "",
    key_delimiter: str = ".",
    max_depth: int = 8,
    extract_prefix: str | None = None,
    marker: str | None = None,
) -> DataFrame:
    """Adds ``out_col``: map<string,string> of dotted-key pairs (NULL
    when the input isn't a JSON object / marker doesn't match) and
    ``<out_col>_ok`` (parse success -> drop-invalid composes as a
    filter on it)."""
    src = F.col(src_col)
    if marker:
        src = F.when(src.startswith(marker), F.substring(src, len(marker) + 1, 2_000_000_000))
    if extract_prefix:
        src = F.get_json_object(src, f"$.{extract_prefix}")

    work = f"__jf_entries_{out_col}"
    top = F.from_json(src, _MAP_SS)
    df = df.withColumn(
        work,
        F.when(
            top.isNotNull(),
            F.transform(
                F.map_entries(top),
                lambda e: F.struct(
                    F.concat(F.lit(prefix), e["key"]).alias("key"),
                    e["value"].alias("value"),
                ),
            ),
        ),
    )

    # one flatten round per nesting level, each its own projection so
    # whole-stage codegen sees a linear chain, not a 2^depth tree
    for _ in range(max_depth):
        entries = F.col(work)
        expanded = F.flatten(
            F.transform(
                entries,
                lambda e: F.when(
                    _looks_like_object(e["value"])
                    & F.from_json(e["value"], _MAP_SS).isNotNull(),
                    F.transform(
                        F.map_entries(F.from_json(e["value"], _MAP_SS)),
                        lambda c: F.struct(
                            F.concat(
                                e["key"], F.lit(key_delimiter), c["key"]
                            ).alias("key"),
                            c["value"].alias("value"),
                        ),
                    ),
                ).otherwise(F.array(e)),
            )
        )
        df = df.withColumn(work, expanded)

    # array handling (json-parser.c extract_values_from_complex):
    # all-string arrays -> comma list; other arrays stay raw JSON
    def finalize(e: Column) -> Column:
        v = e["value"]
        is_str_arr = v.isNotNull() & v.rlike(_ALL_STRING_ARRAY_RE)
        value = F.when(
            is_str_arr, F.array_join(F.from_json(v, "array<string>"), ",")
        ).otherwise(v)
        return F.struct(e["key"].alias("key"), value.alias("value"))

    entries = F.transform(F.col(work), finalize)
    return (
        df.withColumn(
            out_col,
            F.when(entries.isNotNull(), _entries_to_map_last_wins(entries)),
        )
        .withColumn(f"{out_col}_ok", F.col(out_col).isNotNull())
        .drop(work)
    )
