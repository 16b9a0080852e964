"""DuckDB-side CTE fragments that re-derive the memory-domain tables exactly as
sources/tables.py does in Spark.

Every derivation below is arithmetic-only (modulo, concat, interval add) so the
two engines produce bit-identical columns; any drift here breaks the correctness
gate, so keep the two files in lockstep.
"""

MEMORIES_CTE = """
memories_d AS (
  SELECT
    'm' || doc_id::VARCHAR AS memory_id,
    doc_id AS id_num,
    text AS content,
    [lang, source] AS topics,
    lang,
    source AS source_type,
    ['explicit','implicit','terms','none'][doc_id % 4 + 1] AS consent,
    ['none','sensitive','flagged'][doc_id % 3 + 1] AS risk,
    TIMESTAMP '2024-01-01 00:00:00' + doc_id * INTERVAL 1 HOUR AS created_at,
    (doc_id % 17)::DOUBLE AS cache_hit_total,
    (doc_id % 11) / 3.0 AS cache_hit_ema_30d,
    (doc_id % 7) / 2.0 AS cache_confidence_weighted_30d,
    (doc_id % 5)::DOUBLE AS citation_hit_total,
    (doc_id % 9) / 4.0 AS citation_hit_ema_30d,
    (doc_id % 6) / 5.0 AS citation_confidence_weighted_30d,
    'u' || (doc_id % 20)::VARCHAR AS user_id,
    'w' || (doc_id % 8)::VARCHAR AS workspace_id,
    CASE WHEN doc_id % 10 = 7 THEN NULL ELSE 'o' || (doc_id % 3)::VARCHAR END AS organization_id,
    CASE WHEN doc_id % 10 = 7 THEN NULL ELSE 'ns' || (doc_id % 5)::VARCHAR END AS namespace_id,
    ['u' || (doc_id % 20)::VARCHAR, 'u' || ((doc_id + 1) % 20)::VARCHAR] AS user_read_access,
    ['w' || (doc_id % 8)::VARCHAR, 'w' || ((doc_id + 2) % 8)::VARCHAR] AS workspace_read_access,
    ['r' || (doc_id % 4)::VARCHAR] AS role_read_access,
    CASE WHEN doc_id % 10 = 7 THEN [] ELSE ['o' || (doc_id % 3)::VARCHAR] END AS organization_read_access,
    CASE WHEN doc_id % 10 = 7 THEN [] ELSE ['ns' || (doc_id % 5)::VARCHAR] END AS namespace_read_access
  FROM documents
)
"""

CHUNKS_CTE = """
chunks_d AS (
  SELECT
    'm' || vec_id::VARCHAR || '_0' AS chunk_id,
    'm' || vec_id::VARCHAR AS memory_id,
    vec_id AS id_num,
    embedding,
    label,
    TIMESTAMP '2024-01-01 00:00:00' + vec_id * INTERVAL 1 HOUR AS created_at,
    'u' || (vec_id % 20)::VARCHAR AS user_id,
    'w' || (vec_id % 8)::VARCHAR AS workspace_id,
    CASE WHEN vec_id % 10 = 7 THEN NULL ELSE 'o' || (vec_id % 3)::VARCHAR END AS organization_id,
    CASE WHEN vec_id % 10 = 7 THEN NULL ELSE 'ns' || (vec_id % 5)::VARCHAR END AS namespace_id,
    ['u' || (vec_id % 20)::VARCHAR, 'u' || ((vec_id + 1) % 20)::VARCHAR] AS user_read_access,
    ['w' || (vec_id % 8)::VARCHAR, 'w' || ((vec_id + 2) % 8)::VARCHAR] AS workspace_read_access,
    ['r' || (vec_id % 4)::VARCHAR] AS role_read_access,
    CASE WHEN vec_id % 10 = 7 THEN [] ELSE ['o' || (vec_id % 3)::VARCHAR] END AS organization_read_access,
    CASE WHEN vec_id % 10 = 7 THEN [] ELSE ['ns' || (vec_id % 5)::VARCHAR] END AS namespace_read_access
  FROM embeddings
)
"""

NODES_CTE = """
nodes_d AS (
  SELECT 'c' || c_custkey::VARCHAR AS node_id, 'Customer' AS label,
         c_name AS prop_name, c_mktsegment AS prop_status, c_custkey AS id_num
  FROM customer
  UNION ALL
  SELECT 'n' || n_nationkey::VARCHAR, 'Nation', n_name, 'active', n_nationkey::BIGINT
  FROM nation
  UNION ALL
  SELECT 'r' || r_regionkey::VARCHAR, 'Region', r_name, 'active', r_regionkey::BIGINT
  FROM region
  UNION ALL
  SELECT 's' || s_suppkey::VARCHAR, 'Supplier', s_name, 'active', s_suppkey
  FROM supplier
)
"""

EDGES_CTE = """
edges_d AS (
  SELECT 'c' || c_custkey::VARCHAR AS src, 'n' || c_nationkey::VARCHAR AS dst,
         'BELONGS_TO' AS rel_type
  FROM customer
  UNION ALL
  SELECT 'n' || n_nationkey::VARCHAR, 'r' || n_regionkey::VARCHAR, 'BELONGS_TO'
  FROM nation
  UNION ALL
  SELECT 's' || s_suppkey::VARCHAR, 'n' || s_nationkey::VARCHAR, 'WORKS_AT'
  FROM supplier
)
"""


EVENTS_CTE = """
events_us AS (
  -- truncate TIMESTAMP_NS -> microseconds to match Spark's reader (tables.load)
  SELECT event_id, ts::TIMESTAMP AS ts, user_id, event_type, value, props
  FROM events
)
"""


def with_ctes(*ctes: str, body: str) -> str:
    return "WITH " + ",".join(c.strip().rstrip(",") for c in ctes) + "\n" + body
