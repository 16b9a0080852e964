"""Span-corruption (denoising) example construction (round-13) — the
T5 pretraining objective's data step (arXiv:1910.10683 §3.1.4: corrupt
~15% of tokens in mean-length-3 spans, replace each span with a
sentinel, train to reconstruct), also the R-denoiser of UL2
(arXiv:2205.05131).  Reference analog: none (LLM-data-pipeline family).

DETERMINISTIC segment-stratified variant (mirrored in the DuckDB twin):
T5 samples span positions with an RNG; a replayable pipeline cannot.
Here a document with n tokens masks

    m = round(noise_density * n)  tokens in
    s = max(1, round(m / mean_span))  non-overlapping spans,

by cutting the doc into s equal segments (segment i covers token
[(i-1)*n//s, i*n//s)) and placing ONE span per segment: length
``l_i = m//s + (i <= m%s)`` (largest-remainder split of m, closed form)
at offset ``h_i % (L_i - l_i + 1)`` inside the segment, where ``h_i``
is the repo's salted-md5 integer of (doc_id, i).  Non-overlap holds BY
CONSTRUCTION (one span per disjoint segment), every quantity is int64
arithmetic, and the mask moves only if the salt does.  The trade vs
T5's sampler is documented, not hidden: span STARTS are
segment-stratified (more evenly spread than iid sampling), lengths are
deterministic near-mean rather than geometric.

Emits one row per span: {id, span_idx (1-based), start, end (half-open
token offsets), sentinel} — ``sentinel = span_idx - 1`` matches the
<extra_id_K> numbering.  The trainer slices inputs/targets from the
offsets; like chat.render_chat_sft, offsets are the tokenizer-agnostic
form.  Documents too short to mask a single token (m = 0) emit nothing.

Scale shape: pure scan-side projection + a bounded ``sequence()``
explode (s <= m <= 0.15 n rows per doc) — no shuffle, no window, no UDF.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def corruption_spans(df: DataFrame, noise_density: float = 0.15,
                     mean_span: float = 3.0, salt: str = "span",
                     id_col: str = "doc_id",
                     tokens_col: str = "n_tokens") -> DataFrame:
    """{id_col, span_idx, start, end, sentinel} per masked span (module
    docstring).  ``noise_density`` in (0, 1), ``mean_span`` >= 1."""
    if not 0.0 < noise_density < 1.0:
        raise ValueError(f"noise_density must be in (0,1), "
                         f"got {noise_density}")
    if mean_span < 1.0:
        raise ValueError(f"mean_span must be >= 1, got {mean_span}")
    n = F.col(tokens_col).cast("long")
    m = F.round(n * F.lit(float(noise_density))).cast("long")
    s = F.greatest(F.lit(1).cast("long"),
                   F.round(m / F.lit(float(mean_span))).cast("long"))
    base = (df.filter(F.col(tokens_col).isNotNull()
                      & (F.col(tokens_col) > 0))
            .select(F.col(id_col), n.alias("_n"), m.alias("_m"),
                    s.alias("_s"))
            .filter(F.col("_m") > 0))
    sp = base.withColumn("span_idx",
                         F.explode(F.sequence(F.lit(1), F.col("_s"))))
    i = F.col("span_idx")
    seg_lo = F.expr("((span_idx - 1) * _n) div _s")
    seg_hi = F.expr("(span_idx * _n) div _s")
    seg_len = seg_hi - seg_lo
    l_i = F.least(
        F.expr("_m div _s") + (i <= F.expr("_m % _s")).cast("long"),
        seg_len)
    h = F.conv(F.substring(
        F.md5(F.concat(F.lit(salt + ":"),
                       F.col(id_col).cast("string"),
                       F.lit(":"), i.cast("string"))),
        1, 8), 16, 10).cast("long")
    off = h % F.greatest(seg_len - l_i + 1, F.lit(1).cast("long"))
    start = seg_lo + off
    return (sp.filter(l_i > 0)
            .select(F.col(id_col), i.alias("span_idx"),
                    start.alias("start"),
                    (start + l_i).alias("end"),
                    (i - 1).alias("sentinel")))


def corruption_spans_sql(table: str, noise_density: float = 0.15,
                         mean_span: float = 3.0, salt: str = "span",
                         id_col: str = "doc_id",
                         tokens_col: str = "n_tokens") -> str:
    """DuckDB twin of :func:`corruption_spans` over ``table`` — same
    closed-form arithmetic, kept in this module so the two cannot
    drift."""
    return f"""WITH base AS (
  SELECT {id_col} AS id, {tokens_col}::BIGINT AS n,
         CAST(round({tokens_col} * {noise_density!r}) AS BIGINT) AS m
  FROM {table}
  WHERE {tokens_col} IS NOT NULL AND {tokens_col} > 0
),
sized AS (
  SELECT *, greatest(1, CAST(round(m / {mean_span!r}) AS BIGINT)) AS s
  FROM base WHERE m > 0
),
sp AS (
  SELECT id, n, m, s,
         unnest(generate_series(1::BIGINT, s)) AS span_idx
  FROM sized
),
geo AS (
  SELECT id, span_idx, n, m, s,
         ((span_idx - 1) * n) // s AS seg_lo,
         (span_idx * n) // s - ((span_idx - 1) * n) // s AS seg_len,
         least(m // s + (CASE WHEN span_idx <= m % s THEN 1 ELSE 0 END),
               (span_idx * n) // s - ((span_idx - 1) * n) // s) AS l
  FROM sp
),
placed AS (
  SELECT id, span_idx, l, seg_lo,
         seg_lo + (('0x' || substr(md5('{salt}:' || id::VARCHAR || ':'
                                       || span_idx::VARCHAR), 1, 8))::BIGINT
                   % greatest(seg_len - l + 1, 1)) AS start
  FROM geo
)
SELECT id AS {id_col}, span_idx::BIGINT AS span_idx,
       start::BIGINT AS start, (start + l)::BIGINT AS "end",
       (span_idx - 1)::BIGINT AS sentinel
FROM placed WHERE l > 0"""
