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
