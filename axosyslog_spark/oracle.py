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
              AND TRY_CAST(regexp_extract(text, '{RFC5424_RE_SQL}', 1) AS INT) <= 191
         THEN TRY_CAST(regexp_extract(text, '{RFC5424_RE_SQL}', 1) AS INT)
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


# ---------------------------------------------------------------------------
# HAND-WRITTEN patterndb fixture mirror (gate independence)
# ---------------------------------------------------------------------------
# These regexes mirror fixtures/transcripts.pdb (== __spark_entry__.
# PDB_RULES) and were derived BY HAND from the parser-class semantics in
# modules/correlation/radix.c — NOT generated from compile_pattern — so
# a Spark-side pattern-compiler bug cannot produce identically-wrong
# answers on both sides of the gate (round-2 verdict item 2).
#   ESTRING:x:' '  ->  ([^ ]*) then a literal ' '   (radix.c r_parser_estring)
#   ESTRING:x:     ->  (.*)            rest of line (empty terminator)
#   STRING:x       ->  ([^ \t\r\n]+)   one whitespace-delimited word
#   NUMBER:x       ->  (-?[0-9]+)      integer, cast BIGINT
# Precedence = longest-literal-prefix first ('turn about ' = 11 chars,
# then the three 7-char prefixes in declaration order), complete tier
# (RE2 '$' = end of text = Java \z) before partial tier (prefix match,
# remainder ignored) — radix.c _find_node_with_state two-pass.
# Entries: (rule_id, rule_class, complete_regex, [(field, cast|None)])
# in precedence order; ordinal = position; partial ordinal = +N.
PDB_FIXTURE_RULES: list[tuple[str, str, str, list[tuple[str, str | None]]]] = [
    ("free", "unknown",
     "^turn about ([^ ]*) with no structure$",
     [("topic", None)]),
    ("kv_retry", "system",
     "^status=([^ ]*) latency_ms=(-?[0-9]+) path=([^ ]*) retry=(-?[0-9]+)$",
     [("status", None), ("latency_ms", "BIGINT"), ("path", None), ("retry", "BIGINT")]),
    ("kv_plain", "system",
     "^status=([^ ]*) latency_ms=(-?[0-9]+) path=(.*)$",
     [("status", None), ("latency_ms", "BIGINT"), ("path", None)]),
    ("badhdr", "violation",
     "^BADHDR ([^ \t\r\n]+) ([^ \t\r\n]+) status=([^ ]*) latency_ms=(-?[0-9]+)$",
     [("bts", None), ("bhost", None), ("status", None), ("latency_ms", "BIGINT")]),
]

# every field the fixture can emit, for a stable output column order
PDB_FIXTURE_FIELDS = [
    "status", "latency_ms", "path", "retry", "topic", "bts", "bhost",
]


def patterndb_fixture_sql(
    src_col: str, from_clause: str, keys: str, with_class: bool = False
) -> str:
    """DuckDB SELECT classifying `src_col` with the hand-written fixture
    regexes above (see the block comment: gate independence)."""
    n = len(PDB_FIXTURE_RULES)
    whens = []
    for i, (_, _, rx, _) in enumerate(PDB_FIXTURE_RULES):  # complete tier
        whens.append(f"WHEN regexp_matches({src_col}, {_sql_str(rx)}) THEN {i}")
    for i, (_, _, rx, _) in enumerate(PDB_FIXTURE_RULES):  # partial tier
        part = rx[:-1]  # strip the trailing '$'
        whens.append(f"WHEN regexp_matches({src_col}, {_sql_str(part)}) THEN {i + n}")
    pat_idx = "CASE " + " ".join(whens) + " ELSE NULL END"

    rid = "CASE " + " ".join(
        f"WHEN pat_idx IN ({i}, {i + n}) THEN '{rule_id}'"
        for i, (rule_id, _, _, _) in enumerate(PDB_FIXTURE_RULES)
    ) + " ELSE NULL END"
    cols = [f"{rid} AS rule_id"]
    if with_class:
        cols.append("CASE " + " ".join(
            f"WHEN pat_idx IN ({i}, {i + n}) THEN '{cls}'"
            for i, (_, cls, _, _) in enumerate(PDB_FIXTURE_RULES)
        ) + " ELSE NULL END AS rule_class")
    for name in PDB_FIXTURE_FIELDS:
        field_whens = []
        cast = None
        for i, (_, _, rx, fields) in enumerate(PDB_FIXTURE_RULES):
            gi = next((j + 1 for j, (f, _) in enumerate(fields) if f == name), None)
            if gi is None:
                continue
            cast = cast or dict(fields)[name]
            field_whens.append(
                f"WHEN pat_idx = {i} THEN "
                f"regexp_extract({src_col}, {_sql_str(rx)}, {gi}) "
                f"WHEN pat_idx = {i + n} THEN "
                f"regexp_extract({src_col}, {_sql_str(rx[:-1])}, {gi})"
            )
        expr = "CASE " + " ".join(field_whens) + " ELSE NULL END"
        if cast:
            expr = f"TRY_CAST(nullif({expr}, '') AS {cast})"
        cols.append(f"{expr} AS {name}")
    inner = f"SELECT {keys}, {src_col}, {pat_idx} AS pat_idx {from_clause}"
    return f"SELECT {keys}, {', '.join(cols)} FROM ({inner})"


def patterndb_select_sql(pdb, src_col: str, from_clause: str, keys: str) -> str:
    """Generate the DuckDB mirror of PatternDB.apply: the same compiled
    regexes, evaluated in the same precedence order (longest-literal-
    prefix-first, complete-match tier before partial-match tier —
    radix.c _find_node_with_state).

    Caveat: DuckDB's RE2 has no lookaround, so patterns using NLSTRING
    or multi-char ESTRING terminators can't be oracle-mirrored — keep
    those to unit tests. Rendered <value> columns are the caller's job
    (wrap the generated select and CASE on rule_id).
    """
    n = len(pdb.patterns)
    whens = []
    for c in pdb.patterns:  # complete-match tier
        guard = f"regexp_matches({src_col}, {_sql_str('^' + c.body + '$')})"
        if c.literal_prefix:
            guard = f"starts_with({src_col}, {_sql_str(c.literal_prefix)}) AND {guard}"
        whens.append(f"WHEN {guard} THEN {c.ordinal}")
    for c in pdb.patterns:  # partial-match tier
        guard = f"regexp_matches({src_col}, {_sql_str('^' + c.body)})"
        if c.literal_prefix:
            guard = f"starts_with({src_col}, {_sql_str(c.literal_prefix)}) AND {guard}"
        whens.append(f"WHEN {guard} THEN {c.ordinal + n}")
    pat_idx = "CASE " + " ".join(whens) + " ELSE NULL END"

    rid_whens = [
        f"WHEN pat_idx IN ({c.ordinal}, {c.ordinal + n}) THEN '{c.rule.rule_id}'"
        for c in pdb.patterns
    ]
    rule_id = "CASE " + " ".join(rid_whens) + " ELSE NULL END"

    cols = [f"{rule_id} AS rule_id"]
    cls_whens = [
        f"WHEN pat_idx IN ({c.ordinal}, {c.ordinal + n}) THEN '{c.rule.rule_class}'"
        for c in pdb.patterns
        if c.rule.rule_class
    ]
    if cls_whens:
        cols.append("CASE " + " ".join(cls_whens) + " ELSE NULL END AS rule_class")
    for name in pdb.field_names:
        field_whens = []
        for c in pdb.patterns:
            gi = next((i + 1 for i, f in enumerate(c.fields) if f.name == name), None)
            if gi is not None:
                field_whens.append(
                    f"WHEN pat_idx = {c.ordinal} THEN "
                    f"regexp_extract({src_col}, {_sql_str('^' + c.body + '$')}, {gi}) "
                    f"WHEN pat_idx = {c.ordinal + n} THEN "
                    f"regexp_extract({src_col}, {_sql_str('^' + c.body)}, {gi})"
                )
        expr = "CASE " + " ".join(field_whens) + " ELSE NULL END"
        cast = pdb._casts.get(name)
        if cast:
            duck_t = {"bigint": "BIGINT", "double": "DOUBLE", "int": "INT"}[cast]
            expr = f"TRY_CAST(nullif({expr}, '') AS {duck_t})"
        cols.append(f"{expr} AS {name}")
    inner = f"SELECT {keys}, {src_col}, {pat_idx} AS pat_idx {from_clause}"
    outer_cols = [keys] + cols
    return f"SELECT {', '.join(outer_cols)} FROM ({inner})"


# ---------------------------------------------------------------------------
# training-data ops oracles (documents / embeddings tables)
# ---------------------------------------------------------------------------

_STOPWORDS_SQL = "['the','a','an','and','or','of','to','in','is','it','for','on','with','as','at','by','from','that','this']"

# normalized text + shingle CTEs shared by the dedup oracles
DOC_SHINGLES_CTE = """
norm AS (
  SELECT doc_id,
         trim(regexp_replace(regexp_replace(lower(text), '[^a-z0-9\\s]', '', 'g'), '\\s+', ' ', 'g')) AS nt
  FROM documents
),
toks AS (SELECT doc_id, string_split(nt, ' ') AS t FROM norm),
sh AS (
  SELECT doc_id,
         list_distinct(list_transform(range(1, greatest(len(t) - 2, 0) + 1),
                       i -> t[i] || ' ' || t[i+1] || ' ' || t[i+2])) AS s
  FROM toks
),
inv AS (SELECT doc_id, len(s) AS n_sh, unnest(s) AS g FROM sh),
jpairs AS (
  SELECT a.doc_id AS id1, b.doc_id AS id2, a.n_sh AS n1, b.n_sh AS n2,
         count(*) AS inter
  FROM inv a JOIN inv b ON a.g = b.g AND a.doc_id < b.doc_id
  GROUP BY 1, 2, 3, 4
),
jacc AS (
  SELECT id1, id2,
         CAST(floor(CAST(inter * 1000000 AS DOUBLE) / (n1 + n2 - inter)) AS BIGINT) AS jaccard_e6
  FROM jpairs
)
"""


def doc_text_profile_sql() -> str:
    return f"""
    WITH base AS (
      SELECT doc_id, text,
             regexp_split_to_array(trim(text), '\\s+') AS toks,
             trim(regexp_replace(regexp_replace(lower(text), '[^a-z0-9\\s]', '', 'g'), '\\s+', ' ', 'g')) AS nt
      FROM documents
    ), feat AS (
      SELECT doc_id,
        len(toks) AS n_tokens,
        len(regexp_extract_all(text, '[A-Za-z]+|[0-9]|[^A-Za-z0-9\\s]')) AS n_tokens_bpe,
        CAST(len(list_filter(regexp_split_to_array(trim(lower(text)), '\\s+'),
             x -> list_contains({_STOPWORDS_SQL}, x))) AS DOUBLE)
          / greatest(len(regexp_split_to_array(trim(lower(text)), '\\s+')), 1) AS swr,
        CAST(length(text) - length(regexp_replace(text, '[^\\s\\w]', '', 'g')) AS DOUBLE)
          / greatest(length(text), 1) AS pr,
        CAST(length(regexp_replace(text, '\\s+', '', 'g')) AS DOUBLE)
          / greatest(len(toks), 1) AS mtl,
        md5(nt) AS fingerprint
      FROM base
    )
    SELECT doc_id, n_tokens, n_tokens_bpe,
      CAST(floor(swr * 1000000) AS BIGINT) AS stopword_e6,
      CAST(floor(pr * 1000000) AS BIGINT) AS punct_e6,
      CASE WHEN swr >= 0.03 THEN 'en' ELSE 'unknown' END AS lang_guess,
      CAST((CASE WHEN n_tokens BETWEEN 5 AND 100000 THEN 1 ELSE 0 END)
         + (CASE WHEN mtl BETWEEN 2.0 AND 12.0 THEN 1 ELSE 0 END)
         + (CASE WHEN pr <= 0.3 THEN 1 ELSE 0 END)
         + (CASE WHEN swr >= 0.01 THEN 1 ELSE 0 END) AS BIGINT) AS quality_x4,
      fingerprint
    FROM feat
    """


def doc_exact_dedup_sql() -> str:
    return """
    SELECT md5(trim(regexp_replace(regexp_replace(lower(text), '[^a-z0-9\\s]', '', 'g'), '\\s+', ' ', 'g'))) AS digest,
           min(doc_id) AS canonical_id, count(*) AS n_dups
    FROM documents GROUP BY 1
    """


def doc_jaccard_pairs_sql(threshold_e6: int) -> str:
    return (
        "WITH "
        + DOC_SHINGLES_CTE.strip()
        + f"\nSELECT id1, id2, jaccard_e6 FROM jacc WHERE jaccard_e6 >= {threshold_e6}"
    )


def doc_minhash_sql(pdb_k: int, bands: int) -> str:
    """Per-doc minhash signature digest + band digests."""
    rpb = pdb_k // bands
    comps = ", ".join(
        f"list_min(list_transform(s, g -> md5(g || '#{j}'))) AS sig_{j}"
        for j in range(pdb_k)
    )
    band_cols = ", ".join(
        "md5(" + " || '|' || ".join(f"sig_{b * rpb + j}" for j in range(rpb)) + f") AS band_{b}"
        for b in range(bands)
    )
    return (
        "WITH "
        + DOC_SHINGLES_CTE.strip()
        + f""",
        sigs AS (SELECT doc_id, {comps} FROM sh WHERE len(s) > 0)
        SELECT doc_id, {band_cols} FROM sigs
        """
    )


def doc_minhash_pairs_sql(pdb_k: int, bands: int, threshold_e6: int) -> str:
    rpb = pdb_k // bands
    comps = ", ".join(
        f"list_min(list_transform(s, g -> md5(g || '#{j}'))) AS sig_{j}"
        for j in range(pdb_k)
    )
    band_exprs = ", ".join(
        "md5(" + " || '|' || ".join(f"sig_{b * rpb + j}" for j in range(rpb)) + ")"
        for b in range(bands)
    )
    return (
        "WITH "
        + DOC_SHINGLES_CTE.strip()
        + f""",
        sigs AS (SELECT doc_id, {comps} FROM sh WHERE len(s) > 0),
        banded AS (
          SELECT doc_id, unnest(generate_series(0, {bands - 1})) AS band_idx,
                 unnest([{band_exprs}]) AS digest
          FROM sigs
        ),
        cand AS (
          SELECT DISTINCT a.doc_id AS id1, b.doc_id AS id2
          FROM banded a JOIN banded b
            ON a.band_idx = b.band_idx AND a.digest = b.digest AND a.doc_id < b.doc_id
        )
        SELECT c.id1, c.id2, j.jaccard_e6
        FROM cand c JOIN jacc j ON c.id1 = j.id1 AND c.id2 = j.id2
        WHERE j.jaccard_e6 >= {threshold_e6}
        """
    )


EMB_QUANT_CTE = """
qv AS (
  SELECT vec_id,
         list_transform(embedding, x -> CAST(floor(CAST(x AS DOUBLE) * 10000 + 0.5) AS BIGINT)) AS v
  FROM embeddings
),
norms AS (
  SELECT vec_id, v,
         CAST(list_sum(list_transform(v, x -> x * x)) AS BIGINT) AS nsq
  FROM qv
)
"""


def emb_topk_sql(k: int, n_queries: int) -> str:
    return (
        "WITH "
        + EMB_QUANT_CTE.strip()
        + f""",
        pairs AS (
          SELECT q.vec_id AS qid, c.vec_id AS nid,
                 CAST(list_sum(list_transform(range(1, len(q.v) + 1), i -> q.v[i] * c.v[i])) AS BIGINT)
                   / (sqrt(CAST(q.nsq AS DOUBLE)) * sqrt(CAST(c.nsq AS DOUBLE))) AS cosine
          FROM norms q JOIN norms c ON q.vec_id <> c.vec_id
          WHERE q.vec_id < {n_queries}
        ),
        ranked AS (
          SELECT qid, nid, cosine,
                 row_number() OVER (PARTITION BY qid ORDER BY cosine DESC, nid ASC) AS rank
          FROM pairs
        )
        SELECT qid AS query_id, CAST(rank AS INT) AS rank, nid AS neighbor_id,
               CAST(floor(cosine * 1000000) AS BIGINT) AS cos_e6
        FROM ranked WHERE rank <= {k}
        """
    )


def emb_ivf_topk_sql(
    k: int, n_queries: int, n_lists: int, nprobe: int
) -> str:
    """Full IVF mirror: md5-sampled centroids, argmax assignment,
    nprobe probing, equi-join candidates, exact re-rank — the same
    pipeline similarity.ivf_topk runs, derived independently in SQL."""
    return (
        "WITH "
        + EMB_QUANT_CTE.strip()
        + f""",
        cent AS (
          SELECT vec_id AS cid, v AS cvec, nsq AS cnsq
          FROM norms ORDER BY md5(CAST(vec_id AS VARCHAR)), vec_id
          LIMIT {n_lists}
        ),
        cscore AS (
          SELECT n.vec_id, n.v, n.nsq, c.cid,
                 CAST(list_sum(list_transform(range(1, len(n.v) + 1), i -> n.v[i] * c.cvec[i])) AS BIGINT)
                   / (sqrt(CAST(n.nsq AS DOUBLE)) * sqrt(CAST(c.cnsq AS DOUBLE))) AS cos,
                 row_number() OVER (
                   PARTITION BY n.vec_id ORDER BY
                     CAST(list_sum(list_transform(range(1, len(n.v) + 1), i -> n.v[i] * c.cvec[i])) AS BIGINT)
                       / (sqrt(CAST(n.nsq AS DOUBLE)) * sqrt(CAST(c.cnsq AS DOUBLE))) DESC,
                     c.cid ASC) AS rn
          FROM norms n CROSS JOIN cent c
        ),
        assign AS (
          SELECT vec_id, v, nsq, cid AS list_id FROM cscore WHERE rn = 1
        ),
        probes AS (
          SELECT vec_id AS qid, v AS qv, nsq AS qnsq, cid AS list_id
          FROM cscore WHERE vec_id < {n_queries} AND rn <= {nprobe}
        ),
        pairs AS (
          SELECT p.qid, a.vec_id AS nid,
                 CAST(list_sum(list_transform(range(1, len(p.qv) + 1), i -> p.qv[i] * a.v[i])) AS BIGINT)
                   / (sqrt(CAST(p.qnsq AS DOUBLE)) * sqrt(CAST(a.nsq AS DOUBLE))) AS cosine
          FROM probes p JOIN assign a ON a.list_id = p.list_id AND a.vec_id <> p.qid
        ),
        ranked AS (
          SELECT qid, nid, cosine,
                 row_number() OVER (PARTITION BY qid ORDER BY cosine DESC, nid ASC) AS rank
          FROM pairs
        )
        SELECT qid AS query_id, CAST(rank AS INT) AS rank, nid AS neighbor_id,
               CAST(floor(cosine * 1000000) AS BIGINT) AS cos_e6
        FROM ranked WHERE rank <= {k}
        """
    )


def emb_near_dups_sql(threshold_e6: int) -> str:
    return (
        "WITH "
        + EMB_QUANT_CTE.strip()
        + f""",
        pairs AS (
          SELECT a.vec_id AS id1, b.vec_id AS id2,
                 CAST(list_sum(list_transform(range(1, len(a.v) + 1), i -> a.v[i] * b.v[i])) AS BIGINT)
                   / (sqrt(CAST(a.nsq AS DOUBLE)) * sqrt(CAST(b.nsq AS DOUBLE))) AS cosine
          FROM norms a JOIN norms b ON a.vec_id < b.vec_id
        )
        SELECT id1, id2, CAST(floor(cosine * 1000000) AS BIGINT) AS cos_e6
        FROM pairs WHERE CAST(floor(cosine * 1000000) AS BIGINT) >= {threshold_e6}
        """
    )


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


def _ngram_cte(n: int, src: str = "documents", where: str = "") -> str:
    """norm/toks/gram-list CTE body fragment for word n-grams of the
    normalized text (non-distinct list in `gl`, distinct set in `gs`)."""
    gram = " || ' ' || ".join(f"t[i+{j}]" if j else "t[i]" for j in range(n))
    return f"""
norm{n} AS (
  SELECT doc_id,
         trim(regexp_replace(regexp_replace(lower(text), '[^a-z0-9\\s]', '', 'g'), '\\s+', ' ', 'g')) AS nt
  FROM {src} {where}
),
toks{n} AS (SELECT doc_id, nt, string_split(nt, ' ') AS t FROM norm{n}),
gl{n} AS (
  SELECT doc_id, length(nt) AS nlen,
         list_transform(range(1, greatest(len(t) - {n - 1}, 0) + 1),
                        i -> {gram}) AS gl
  FROM toks{n}
),
gs{n} AS (SELECT doc_id, list_distinct(gl) AS gs FROM gl{n})
"""


def doc_contamination_sql(n: int, bench_mod: int) -> str:
    """Docs (doc_id % bench_mod != 0) sharing any word n-gram with the
    benchmark slice (doc_id % bench_mod == 0)."""
    return (
        "WITH "
        + _ngram_cte(n).strip()
        + f""",
        bench AS (
          SELECT DISTINCT unnest(gs) AS gram FROM gs{n}
          WHERE doc_id % {bench_mod} = 0
        ),
        corpus AS (
          SELECT doc_id, unnest(gs) AS gram FROM gs{n}
          WHERE doc_id % {bench_mod} <> 0
        )
        SELECT c.doc_id, count(*) AS contaminated_grams,
               min(c.gram) AS sample_gram
        FROM corpus c JOIN bench b ON c.gram = b.gram
        GROUP BY c.doc_id
        """
    )


def doc_dup_clusters_sql(pdb_k: int, bands: int, threshold_e6: int) -> str:
    """Connected components over the minhash near-dup pairs via a
    recursive reachability CTE: cluster = min reachable doc id."""
    inner = doc_minhash_pairs_sql(pdb_k, bands, threshold_e6)
    return f"""
    WITH RECURSIVE pairs AS MATERIALIZED ({inner}),
    edges AS (
      SELECT id1 AS a, id2 AS b FROM pairs
      UNION
      SELECT id2, id1 FROM pairs
    ),
    comp(id, lbl) AS (
        SELECT doc_id, doc_id FROM documents
      UNION
        SELECT e.a, c.lbl FROM edges e JOIN comp c ON c.id = e.b
    )
    SELECT id AS doc_id, min(lbl) AS cluster,
           (min(lbl) = id) AS canonical
    FROM comp GROUP BY id
    """


def doc_gopher_sql(n: int = 2) -> str:
    """Duplicate-line fractions + top word n-gram stats."""
    return (
        "WITH "
        + _ngram_cte(n).strip()
        + f""",
        lines AS (
          SELECT doc_id, unnest(string_split(text, chr(10))) AS line
          FROM documents
        ),
        per_line AS (
          SELECT doc_id, line, count(*) AS cnt FROM lines GROUP BY 1, 2
        ),
        ls AS (
          SELECT doc_id, sum(cnt) AS n_lines, count(*) AS n_distinct,
                 sum(cnt * length(line)) AS chars_all,
                 sum(length(line)) AS chars_distinct
          FROM per_line GROUP BY 1
        ),
        grams AS (
          SELECT doc_id, nlen, unnest(gl) AS g FROM gl{n}
        ),
        pg AS (
          SELECT doc_id, nlen, g, count(*) AS cnt
          FROM grams GROUP BY 1, 2, 3
        ),
        top AS (
          SELECT doc_id, g, cnt, nlen,
                 row_number() OVER (
                   PARTITION BY doc_id ORDER BY cnt DESC, g ASC
                 ) AS rn
          FROM pg
        )
        SELECT ls.doc_id,
               CAST(floor((n_lines - n_distinct) * 1000000.0
                          / greatest(n_lines, 1)) AS BIGINT) AS dup_line_e6,
               CAST(floor((chars_all - chars_distinct) * 1000000.0
                          / greatest(chars_all, 1)) AS BIGINT) AS dup_line_char_e6,
               t.g AS top_gram, t.cnt AS top_gram_count,
               CAST(floor(t.cnt * length(t.g) * 1000000.0
                          / greatest(t.nlen, 1)) AS BIGINT) AS top_gram_char_e6
        FROM ls LEFT JOIN (SELECT * FROM top WHERE rn = 1) t
          ON ls.doc_id = t.doc_id
        """
    )


def emb_semantic_dedup_sql(threshold_e6: int) -> str:
    """SemDeDup oracle: the exact cosine near-dup pair set feeding a
    recursive reachability CTE (cluster = min reachable vec_id) — an
    algorithm independent of the engine's pointer-jumped label
    propagation."""
    inner = emb_near_dups_sql(threshold_e6)
    return f"""
    WITH RECURSIVE pairs AS MATERIALIZED ({inner}),
    edges AS (
      SELECT id1 AS a, id2 AS b FROM pairs
      UNION
      SELECT id2, id1 FROM pairs
    ),
    comp(id, lbl) AS (
        SELECT vec_id, vec_id FROM embeddings
      UNION
        SELECT e.a, c.lbl FROM edges e JOIN comp c ON c.id = e.b
    )
    SELECT id AS vec_id, min(lbl) AS cluster,
           (min(lbl) = id) AS canonical
    FROM comp GROUP BY id
    """


_NORM_SQL = (
    "trim(regexp_replace(regexp_replace(lower(text),"
    " '[^a-z0-9\\s]', '', 'g'), '\\s+', ' ', 'g'))"
)


def doc_tfidf_sql(k: int = 3) -> str:
    """TF-IDF top-k terms per doc with the integer-exact linear idf
    (idf_e6 = floor(1e6 * n_docs / df)) mirroring
    textstats.tfidf_top_terms."""
    return f"""
    WITH norm AS (SELECT doc_id, {_NORM_SQL} AS nt FROM documents),
    base AS (
      SELECT doc_id AS id, unnest(string_split(nt, ' ')) AS term FROM norm
    ),
    tf AS (SELECT id, term, count(*) AS tf FROM base GROUP BY 1, 2),
    dfreq AS (SELECT term, count(*) AS df FROM tf GROUP BY 1),
    nd AS (SELECT count(*) AS n FROM documents),
    scored AS (
      SELECT tf.id, tf.term, tf.tf, dfreq.df,
             CAST(floor(1000000 * nd.n / dfreq.df) AS BIGINT) AS idf_e6
      FROM tf JOIN dfreq USING (term) CROSS JOIN nd
    ),
    ranked AS (
      SELECT id, term, tf, df, tf * idf_e6 AS score_e6,
             row_number() OVER (
               PARTITION BY id ORDER BY tf * idf_e6 DESC, term ASC
             ) AS rn
      FROM scored
    )
    SELECT id AS doc_id, CAST(rn AS INT) AS rank, term, tf, df, score_e6
    FROM ranked WHERE rn <= {k}
    """


def doc_rarity_buckets_sql(n_buckets: int = 3) -> str:
    """CCNet-style head/middle/tail quality buckets over the integer
    unigram-rarity score, mirroring textstats.unigram_rarity_buckets."""
    return f"""
    WITH norm AS (SELECT doc_id, {_NORM_SQL} AS nt FROM documents),
    base AS (
      SELECT doc_id AS id, unnest(string_split(nt, ' ')) AS term FROM norm
    ),
    tc AS (SELECT term, count(*) AS cnt FROM base GROUP BY 1),
    tot AS (SELECT count(*) AS total FROM base),
    per_tok AS (
      SELECT base.id,
             CAST(floor(1000000 * tot.total / tc.cnt) AS BIGINT) AS r
      FROM base JOIN tc USING (term) CROSS JOIN tot
    ),
    per_doc AS (
      SELECT id, count(*) AS n_tokens,
             CAST(floor(sum(r) * 1.0 / count(*)) AS BIGINT) AS rarity_e6
      FROM per_tok GROUP BY 1
    ),
    b AS (
      SELECT *, ntile({n_buckets}) OVER (
        ORDER BY rarity_e6 ASC, id ASC
      ) AS bkt
      FROM per_doc
    )
    SELECT id AS doc_id, n_tokens, rarity_e6,
           CASE WHEN bkt = 1 THEN 'head'
                WHEN bkt = {n_buckets} THEN 'tail'
                ELSE 'middle' END AS bucket
    FROM b
    """


def doc_c4_filter_sql(brace_mod: int, lorem_mod: int) -> str:
    """C4 cleaning-rule verdicts, mirroring textstats.c4_filter over
    the deterministic pseudo-page staging used by the gate query
    (replace ' table ' -> '.' + newline, terminal '.', plus the
    brace/lorem injections keyed on doc_id)."""
    return f"""
    WITH staged AS (
      SELECT doc_id,
             replace(text, ' table ', '.' || chr(10)) || '.'
             || CASE WHEN doc_id % {brace_mod} = 0 THEN ' {{' ELSE '' END
             || CASE WHEN doc_id % {lorem_mod} = 0
                     THEN ' Lorem ipsum' ELSE '' END AS text
      FROM documents
    ),
    split AS (
      SELECT doc_id, text, string_split(text, chr(10)) AS lines FROM staged
    ),
    kept AS (
      SELECT doc_id, text, lines,
             list_filter(
               lines,
               ln -> regexp_matches(trim(ln), '[.!?"]$')
                     AND len(string_split_regex(trim(ln), '\\s+')) >= 3
                     AND NOT contains(lower(ln), 'javascript')
             ) AS kl
      FROM split
    ),
    agg AS (
      SELECT doc_id, text,
             CAST(len(lines) AS BIGINT) AS n_lines,
             CAST(len(kl) AS BIGINT) AS n_kept_lines,
             coalesce(array_to_string(kl, chr(10)), '') AS cleaned
      FROM kept
    ),
    verdict AS (
      SELECT doc_id, n_lines, n_kept_lines,
             CAST(length(regexp_replace(cleaned, '[^.!?]', '', 'g'))
                  AS BIGINT) AS n_sentences,
             CASE WHEN contains(text, '{{') THEN 'brace'
                  WHEN contains(lower(text), 'lorem ipsum')
                       THEN 'lorem_ipsum'
                  WHEN length(regexp_replace(cleaned, '[^.!?]', '', 'g'))
                       < 5 THEN 'too_few_sentences'
                  ELSE NULL END AS drop_reason,
             md5(cleaned) AS cleaned_md5
      FROM agg
    )
    SELECT doc_id, n_lines, n_kept_lines, n_sentences,
           (drop_reason IS NULL) AS kept, drop_reason, cleaned_md5
    FROM verdict
    """


def doc_pii_redact_sql(
    email_mod: int, ip_mod: int, phone_mod: int, ssn_mod: int
) -> str:
    """PII redaction counts + redacted-text digest, mirroring
    textstats.pii_redact over the gate query's deterministic PII
    injections (RE2 and Java regex agree on this pattern subset; each
    count is taken on the text as it stood when that replace ran)."""
    pats = [
        ("emails", "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}",
         "<EMAIL>"),
        ("ssns", "\\b\\d{3}-\\d{2}-\\d{4}\\b", "<SSN>"),
        ("phones", "\\b\\+?\\d{3}[-. ]\\d{3}[-. ]\\d{4}\\b", "<PHONE>"),
        ("ipv4s", "\\b(?:\\d{1,3}\\.){3}\\d{1,3}\\b", "<IP>"),
    ]
    ctes = [f"""
    staged AS (
      SELECT doc_id,
             text
             || CASE WHEN doc_id % {email_mod} = 0
                     THEN ' reach user' || doc_id || '@example.com now'
                     ELSE '' END
             || CASE WHEN doc_id % {ip_mod} = 0
                     THEN ' from 10.' || (doc_id % 256) || '.0.1'
                     ELSE '' END
             || CASE WHEN doc_id % {phone_mod} = 0
                     THEN ' call 555-867-5309' ELSE '' END
             || CASE WHEN doc_id % {ssn_mod} = 0
                     THEN ' ssn 123-45-6789' ELSE '' END AS t0
      FROM documents
    )"""]
    prev = "t0"
    prev_cte = "staged"
    carried: list[str] = []
    for i, (name, pat, token) in enumerate(pats):
        nxt = f"t{i + 1}"
        carry = ", ".join(carried) + (", " if carried else "")
        ctes.append(f"""
    s{i + 1} AS (
      SELECT doc_id, {carry}
             len(regexp_extract_all({prev}, '{pat}')) AS n_{name},
             regexp_replace({prev}, '{pat}', '{token}', 'g') AS {nxt}
      FROM {prev_cte}
    )""")
        carried.append(f"n_{name}")
        prev, prev_cte = nxt, f"s{i + 1}"
    cols = ", ".join(f"CAST(n_{n} AS BIGINT) AS n_{n}" for n, _, _ in pats)
    return (
        "WITH " + ",".join(ctes)
        + f"""
    SELECT doc_id, {cols}, md5({prev}) AS redacted_md5 FROM {prev_cte}
    """
    )


def _hex_threshold_sql(fraction: float) -> str:
    n = min(max(int(round(fraction * 16 ** 6)), 0), 16 ** 6)
    return "g" if n >= 16 ** 6 else format(n, "06x")


def doc_source_mix_sql(
    weights: dict[str, float], default_weight: float, salt: str
) -> str:
    """Mirror of sampling.source_mix: string-ordered hex-prefix
    threshold per source over md5(doc_id || '#salt')."""
    cases = " ".join(
        f"WHEN source = '{s}' THEN '{_hex_threshold_sql(w)}'"
        for s, w in sorted(weights.items())
    )
    return f"""
    WITH h AS (
      SELECT doc_id, source,
             substr(md5(CAST(doc_id AS VARCHAR) || '#{salt}'), 1, 6) AS u6,
             CASE {cases}
                  ELSE '{_hex_threshold_sql(default_weight)}' END AS bound
      FROM documents
    )
    SELECT doc_id, source, u6 FROM h WHERE u6 < bound
    """


def doc_hash_split_sql(fractions: dict[str, float], salt: str) -> str:
    """Mirror of sampling.hash_split: cumulative hex bounds, last
    bucket absorbs the remainder."""
    names = list(fractions)
    cum = 0.0
    whens = []
    for name in names[:-1]:
        cum += fractions[name]
        whens.append(f"WHEN u6 < '{_hex_threshold_sql(cum)}' THEN '{name}'")
    case = (
        "CASE " + " ".join(whens) + f" ELSE '{names[-1]}' END"
        if whens
        else f"'{names[-1]}'"
    )
    return f"""
    WITH h AS (
      SELECT doc_id,
             substr(md5(CAST(doc_id AS VARCHAR) || '#{salt}'), 1, 6) AS u6
      FROM documents
    )
    SELECT doc_id, u6, {case} AS split FROM h
    """


def doc_substr_spans_sql(k: int, min_tokens: int) -> str:
    """Mirror of dedup.substring_spans: positional k-gram digests,
    cross-document equi-join, gaps-and-islands per (pair, diagonal)."""
    return f"""
    WITH norm AS (SELECT doc_id, {_NORM_SQL} AS nt FROM documents),
    toks AS (SELECT doc_id, string_split(nt, ' ') AS t FROM norm),
    posd AS (
      SELECT doc_id, t,
             unnest(range(1, greatest(len(t) - {k - 1}, 0) + 1)) AS i
      FROM toks
    ),
    grams AS (
      SELECT doc_id, i,
             md5(array_to_string(t[i:i + {k - 1}], ' ')) AS g
      FROM posd
    ),
    hits AS (
      SELECT a.doc_id AS id1, b.doc_id AS id2, a.i AS i,
             b.i - a.i AS diag
      FROM grams a JOIN grams b ON a.g = b.g AND a.doc_id < b.doc_id
    ),
    runs AS (
      SELECT id1, id2, diag, i,
             i - row_number() OVER (
               PARTITION BY id1, id2, diag ORDER BY i
             ) AS island
      FROM hits
    ),
    agg AS (
      SELECT id1, id2, diag, island, count(*) AS run
      FROM runs GROUP BY 1, 2, 3, 4
    )
    SELECT id1, id2,
           CAST(max(run) + {k - 1} AS BIGINT) AS longest_span_tokens,
           CAST(sum(run) AS BIGINT) AS shared_grams
    FROM agg GROUP BY 1, 2
    HAVING max(run) + {k - 1} >= {min_tokens}
    """
