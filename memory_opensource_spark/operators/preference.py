"""Preference-pair construction (round-13) — the RLHF/DPO data step
between a scored response log and a trainer: group candidate responses by
prompt, pick the best and worst by reward, and emit (prompt, chosen,
rejected, margin) comparison rows (InstructGPT arXiv:2203.02155 §3.2
comparison data; DPO arXiv:2305.18290 trains directly on such pairs).
Reference analog: none (LLM-data-pipeline family, like functions/chat's
SFT rendering).

Selection is the keeper-argmax shape, NOT a per-prompt window:
``max(struct(score, id, response))`` / ``min(...)`` inside a single
combinable groupBy — struct comparison is lexicographic, so ties on the
float reward break deterministically on the id (max side: larger id wins;
min side: smaller id wins), and the aggregation partial-combines map-side
— one shuffle on the prompt key, skew-bounded by responses-per-prompt,
scan-parallel at 100 TB.

Pairs with ``margin <= min_margin`` are dropped (a prompt whose best and
worst rewards tie carries no preference signal — and single-response
prompts always tie with themselves).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def build_preference_pairs(df: DataFrame, prompt_col: str = "prompt_id",
                           response_col: str = "response",
                           score_col: str = "score",
                           id_col: str = "response_id",
                           min_margin: float = 0.0) -> DataFrame:
    """{prompt_col, chosen, rejected, margin} — one row per prompt with a
    strict preference (module docstring).  ``margin`` is rounded to the
    repo's 6-decimal cross-engine grid.

    NULL-scored responses are EXCLUDED before selection (sweep 18): an
    unscored response is not evidence of a bad one, and the engines
    disagree about where NULL sorts (Spark's min-struct would always
    pick it as 'rejected'; DuckDB's ASC ranking puts it last).  NaN
    rewards are the caller's bug — both engines sort NaN greatest, so
    results stay engine-consistent, but a NaN 'chosen' carries no
    signal."""
    df = df.filter(F.col(score_col).isNotNull())
    hi = F.max(F.struct(F.col(score_col).alias("s"),
                        F.col(id_col).alias("i"),
                        F.col(response_col).alias("r"))).alias("_hi")
    lo = F.min(F.struct(F.col(score_col).alias("s"),
                        F.col(id_col).alias("i"),
                        F.col(response_col).alias("r"))).alias("_lo")
    return (df.groupBy(prompt_col)
            .agg(hi, lo)
            .select(F.col(prompt_col),
                    F.col("_hi.r").alias("chosen"),
                    F.col("_lo.r").alias("rejected"),
                    F.round((F.col("_hi.s") - F.col("_lo.s"))
                            .cast("double"), 6).alias("margin"))
            .filter(F.col("margin") > min_margin))


def preference_pairs_sql(table: str, prompt_col: str = "prompt_id",
                         response_col: str = "response",
                         score_col: str = "score",
                         id_col: str = "response_id",
                         min_margin: float = 0.0) -> str:
    """DuckDB twin of :func:`build_preference_pairs` over ``table`` —
    per-prompt best/worst via ranked windows with the SAME
    (score, id) lexicographic tie-break, kept in this module so the two
    cannot drift."""
    return f"""WITH ranked AS (
  SELECT {prompt_col} AS pid, {response_col} AS resp, {score_col} AS s,
         ROW_NUMBER() OVER (PARTITION BY {prompt_col}
                            ORDER BY {score_col} DESC, {id_col} DESC) AS rh,
         ROW_NUMBER() OVER (PARTITION BY {prompt_col}
                            ORDER BY {score_col} ASC, {id_col} ASC) AS rl
  FROM {table}
  WHERE {score_col} IS NOT NULL
),
pair AS (
  SELECT h.pid, h.resp AS chosen, l.resp AS rejected,
         round((h.s - l.s)::DOUBLE, 6) AS margin
  FROM ranked h JOIN ranked l ON h.pid = l.pid AND h.rh = 1 AND l.rl = 1
)
SELECT pid AS {prompt_col}, chosen, rejected, margin
FROM pair WHERE margin > {min_margin!r}"""


def ict_pairs(df: DataFrame, chunk_chars: int = 200,
              id_col: str = "doc_id", text_col: str = "text",
              max_pairs_per_doc: int | None = None) -> DataFrame:
    """Inverse-Cloze-Task positive pairs (r13) — the self-supervised
    retriever-pretraining data of ORQA (Lee et al. arXiv:1906.00300
    §3.2) and DPR warm-starts: a passage chunk is the QUERY, its
    adjacent chunk the POSITIVE; in-batch negatives come free at
    training time.  Deterministic fixed-width variant: documents cut
    into ``chunk_chars`` character chunks (the tokenizer-agnostic
    stand-in for sentence segmentation — swap the chunker, keep the
    pairing), adjacent pairs (i, i+1) emitted as
    {id, pair_idx (0-based), query_text, positive_text}.

    Docs shorter than 2 chunks emit nothing.  ``max_pairs_per_doc``
    caps long-document fan-out (NULL = all pairs).

    Shape: scan-side substring arithmetic + a bounded sequence explode
    — no shuffle, no UDF."""
    if chunk_chars < 1:
        raise ValueError(f"chunk_chars must be >= 1, got {chunk_chars}")
    W = int(chunk_chars)
    n_chunks = F.ceil(F.length(F.col(text_col)) / W).cast("long")
    n_pairs = F.greatest(n_chunks - 1, F.lit(0).cast("long"))
    if max_pairs_per_doc is not None:
        n_pairs = F.least(n_pairs,
                          F.lit(int(max_pairs_per_doc)).cast("long"))
    base = (df.filter(F.col(text_col).isNotNull())
            .select(F.col(id_col), F.col(text_col).alias("_t"),
                    n_pairs.alias("_np"))
            .filter(F.col("_np") > 0))
    sp = base.withColumn("pair_idx",
                         F.explode(F.sequence(F.lit(0).cast("long"),
                                              F.col("_np") - 1)))
    i = F.col("pair_idx")
    q = F.expr(f"substring(_t, cast(pair_idx * {W} + 1 as int), {W})")
    p = F.expr(f"substring(_t, cast((pair_idx + 1) * {W} + 1 as int), {W})")
    return sp.select(F.col(id_col), i,
                     q.alias("query_text"), p.alias("positive_text"))


def ict_pairs_sql(table: str, chunk_chars: int = 200,
                  id_col: str = "doc_id", text_col: str = "text",
                  max_pairs_per_doc: int | None = None) -> str:
    """DuckDB twin of :func:`ict_pairs` over ``table``."""
    W = int(chunk_chars)
    np_expr = f"greatest(ceil(length({text_col}) / {W}.0)::BIGINT - 1, 0)"
    if max_pairs_per_doc is not None:
        np_expr = f"least({np_expr}, {int(max_pairs_per_doc)}::BIGINT)"
    return f"""WITH base AS (
  SELECT {id_col} AS id, {text_col} AS t,
         {np_expr} AS np
  FROM {table} WHERE {text_col} IS NOT NULL
),
sp AS (
  SELECT id, t, unnest(generate_series(0::BIGINT, np - 1)) AS pair_idx
  FROM base WHERE np > 0
)
SELECT id AS {id_col}, pair_idx,
       substr(t, (pair_idx * {W} + 1)::INT, {W}) AS query_text,
       substr(t, ((pair_idx + 1) * {W} + 1)::INT, {W}) AS positive_text
FROM sp"""
