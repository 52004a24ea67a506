"""DuckDB oracle SQL mirroring the Spark pipeline, stage by stage.

The driver's correctness gate runs each __spark_entry__.queries()
entry AND the matching SQL here against the same parquet tables and
compares row counts, schemas and value hashes. These strings therefore
encode the reference semantics a second, independent time (ANSI SQL)
— the same role the pure-Python oracle plays in the reference's light
framework (tests/light/README.md).

Parity rules observed throughout:
  - timestamps are emitted as formatted UTC strings (Spark session TZ
    is pinned UTC; DuckDB parquet timestamps are naive UTC)
  - doubles are never emitted raw from aggregations; integer math only
  - every computed column is aliased identically on both sides
"""

from __future__ import annotations

from axosyslog_spark.operators.enrich import tool_lookup_values_sql
from axosyslog_spark.sources.transcripts import TRANSCRIPTS_ORACLE_CTE

RFC5424_RE_SQL = "^<([0-9]{1,3})>([0-9]) ([^ ]+) ([^ ]+) ([^ ]+) ([^ ]+) ([^ ]+) ([^ ]+) (.*)$"


def with_transcripts(body: str) -> str:
    return f"WITH {TRANSCRIPTS_ORACLE_CTE.strip()}\n{body}"


# parsed stage: kind classification + header split + kv/json promotion
PARSED_CTE = f"""
parsed AS (
  SELECT
    conv_id, turn_idx, role, tool, ts, text,
    CASE WHEN regexp_matches(text, '{RFC5424_RE_SQL}') THEN 'syslog'
         WHEN text LIKE '{{%' THEN 'json'
         WHEN regexp_matches(text, '^status=') THEN 'kv'
         ELSE 'free' END AS kind
  FROM transcripts
),
parsed2 AS (
  SELECT *,
    (kind <> 'free') AS parse_ok,
    CASE WHEN kind = 'syslog'
         THEN CAST(regexp_extract(text, '{RFC5424_RE_SQL}', 1) AS INT)
         ELSE 13 END AS pri,
    CASE WHEN kind = 'syslog' THEN regexp_extract(text, '{RFC5424_RE_SQL}', 4) END AS host,
    CASE WHEN kind = 'syslog' THEN regexp_extract(text, '{RFC5424_RE_SQL}', 5) END AS appname,
    CASE WHEN kind = 'syslog' THEN regexp_extract(text, '{RFC5424_RE_SQL}', 6) END AS procid,
    CASE WHEN kind = 'syslog' THEN regexp_extract(text, '{RFC5424_RE_SQL}', 9) ELSE text END AS body
  FROM parsed
),
parsed3 AS (
  SELECT *,
    CAST(pri % 8 AS INT) AS severity,
    CAST((pri - pri % 8) / 8 AS INT) AS facility,
    nullif(regexp_extract(body, 'status=([a-z]+)', 1), '') AS status,
    coalesce(
      CAST(nullif(regexp_extract(body, 'latency_ms=([0-9]+)', 1), '') AS BIGINT),
      CASE WHEN kind = 'json' THEN CAST(json_extract_string(text, '$.latency_ms') AS BIGINT) END
    ) AS latency_ms,
    nullif(regexp_extract(body, 'path=([^ ]+)', 1), '') AS path,
    CAST(nullif(regexp_extract(body, 'retry=([0-9]+)', 1), '') AS INT) AS retry,
    CASE WHEN kind = 'json' THEN CAST(json_extract_string(text, '$.k') AS BIGINT) END AS json_k,
    CASE WHEN kind = 'json' THEN json_extract_string(text, '$.event') END AS json_event
  FROM parsed2
)
"""

ENRICHED_CTE = f"""
enriched AS (
  SELECT p.*,
    coalesce(tl.tool_category, 'unknown') AS tool_category,
    coalesce(tl.risk_level, 'medium') AS risk_level,
    coalesce(tl.owner, 'team-default') AS owner
  FROM parsed3 p
  LEFT JOIN {tool_lookup_values_sql("tl")} ON p.tool = tl.tool
)
"""

# route semantics (F3): m1..m4 raw predicates; r2 is `final`, r5 fallback.
ROUTED_CTE = """
flags AS (
  SELECT *,
    (severity <= 3) AS m1,
    (role = 'tool' AND risk_level = 'high') AS m2,
    (tool_category = 'retrieval') AS m3,
    (NOT parse_ok) AS m4
  FROM enriched
),
routed AS (
  SELECT 'sink_errors' AS sink, * FROM flags WHERE m1
  UNION ALL SELECT 'sink_high_risk', * FROM flags WHERE m2
  UNION ALL SELECT 'sink_retrieval', * FROM flags WHERE m3 AND NOT m2
  UNION ALL SELECT 'sink_unparsed', * FROM flags WHERE m4 AND NOT m2
  UNION ALL SELECT 'sink_default', * FROM flags WHERE NOT (m1 OR m2 OR m3 OR m4)
)
"""


def _sql_str(s: str) -> str:
    return "'" + s.replace("'", "''") + "'"


def patterndb_select_sql(pdb, src_col: str, from_clause: str, keys: str) -> str:
    """Generate the DuckDB mirror of PatternDB.apply: the same compiled
    regexes, evaluated in the same precedence order (the compiled rule
    list is already longest-literal-prefix-first)."""
    whens = []
    for c in pdb.rules:
        guard = f"regexp_matches({src_col}, {_sql_str(c.regex)})"
        if c.literal_prefix:
            guard = f"starts_with({src_col}, {_sql_str(c.literal_prefix)}) AND {guard}"
        whens.append(f"WHEN {guard} THEN '{c.rule_id}'")
    rule_id = "CASE " + " ".join(whens) + " ELSE NULL END"
    cols = [f"{rule_id} AS rule_id"]
    for name in pdb.field_names:
        field_whens = []
        for c in pdb.rules:
            gi = next((i + 1 for i, f in enumerate(c.fields) if f.name == name), None)
            if gi is not None:
                field_whens.append(
                    f"WHEN rule_id = '{c.rule_id}' THEN "
                    f"regexp_extract({src_col}, {_sql_str(c.regex)}, {gi})"
                )
        expr = "CASE " + " ".join(field_whens) + " ELSE NULL END"
        cast = pdb._casts.get(name)
        if cast:
            duck_t = {"bigint": "BIGINT", "double": "DOUBLE", "int": "INT"}[cast]
            expr = f"CAST(nullif({expr}, '') AS {duck_t})"
        cols.append(f"{expr} AS {name}")
    inner = f"SELECT {keys}, {src_col}, {rule_id} AS rule_id {from_clause}"
    outer_cols = [keys, "rule_id"] + cols[1:]
    return f"SELECT {', '.join(outer_cols)} FROM ({inner})"


def pipeline_prefix() -> str:
    """WITH clause chaining transcripts → parsed → enriched → routed."""
    return (
        "WITH "
        + TRANSCRIPTS_ORACLE_CTE.strip().rstrip()
        + ",\n"
        + PARSED_CTE.strip()
        + ",\n"
        + ENRICHED_CTE.strip()
        + ",\n"
        + ROUTED_CTE.strip()
        + "\n"
    )
