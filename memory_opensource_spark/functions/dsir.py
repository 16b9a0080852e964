"""DSIR — Data Selection via Importance Resampling (round-13) — the
published target-distribution selection step the big pretraining pipelines
run after dedup/quality filtering: fit cheap bag-of-hashed-ngram models on
a TARGET corpus (the distribution you want — Wikipedia/books in the paper)
and on the RAW pool, weight every raw document by the log-likelihood
ratio, and Gumbel-top-k resample so the selected set is an importance
sample of the target distribution (Xie et al., "Data Selection for
Language Models via Importance Resampling", NeurIPS 2023).  Reference
analog: none (LLM-data-pipeline family, like functions/quality_clf and
functions/langid).

Math (mirrored bit-for-bit in the DuckDB twin):

    tokenize   lower, every char outside [a-z ] -> space, split on runs
               (the quality_clf recipe — pure-ASCII vocabulary, engine-
               identical); grams = unigrams + space-joined bigrams
    bucket(g)  = ('0x' || substr(md5('dsir:' || g), 1, 8)) % m
               (the repo's cross-engine hash recipe; the paper uses
               m = 10k hash buckets — m is a knob here, default 8192;
               the registered correctness row uses m = 64 so bucket
               counts are meaningful at sf0.001)
    fit        t_k = gram occurrences in TARGET docs landing in bucket k
               r_k = gram occurrences in the RAW pool landing in bucket k
               lam_k = round(1e6 * ( ln((t_k+1)/(T+m)) - ln((r_k+1)/(R+m)) ))
               (Laplace-smoothed log-likelihood ratio, MICRO-INTEGER
               weights — the per-document sum is exact int64 and
               order-free, same rationale as quality_clf/langid)
    weight(d)  logw_micro = SUM over d's gram occurrences of lam_bucket
    resample   u_d   = (('0x'||substr(md5(salt || doc_id),1,15)) + 0.5) / 16^15
               g_d   = -ln(-ln(u_d))            (deterministic Gumbel)
               key_d = logw_micro/1e6 + g_d
               keep the top-k by (key DESC, doc_id ASC)
               (Gumbel-max resampling == sampling without replacement
               proportional to exp(logw), made replayable by deriving the
               noise from a salted doc-id hash instead of an RNG)

Cross-engine float note: ln() is evaluated per BUCKET (m values) and per
doc for the Gumbel term — single libm calls on identical doubles, then
round-6 / micro-rounding; unlike per-document float SUMS (order-dependent,
the reason quality_clf precomputes integer weights) there is no
reassociation hazard, and a 1-ulp ln() divergence flips a round-6 grid
only within ~1e-15 of a boundary.  Pinned green at all three SFs.

Spark shape (100 TB): gram explode -> (1) a combinable groupBy on the
m-key bucket column for the fit (map-side partial agg collapses to m rows
per task — the shuffle is m rows/partition regardless of corpus size) and
(2) a broadcast join of the m-row weight table back onto the gram stream
-> one combinable groupBy on doc_id.  Top-k is orderBy().limit() ==
TakeOrderedAndProject (per-partition heaps, no global sort shuffle).  No
UDF, no window, no driver collect.  The gram stream is derived twice (fit
+ score); at real scale persist the exploded grams (or run fit on a
sample — the paper fits on a fraction) instead of re-scanning the corpus.

The resample POOL must be a subset of the RAW pool the model was fitted
on — then every bucket a pooled doc can hit exists in the fitted weight
table and the broadcast join drops nothing (inner join is safe; the code
still left-joins the pool for zero-gram documents, which get logw = 0 —
an empty product in the paper's formulation).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_SIXTEEN_POW_15 = float(16 ** 15)


def _tokens(text_col):
    """lower -> non-[a-z ] to space -> split on space runs -> drop empties."""
    t = F.lower(F.coalesce(text_col, F.lit("")))
    return F.filter(F.split(F.regexp_replace(t, "[^a-z ]", " "), " +"),
                    lambda x: x != "")


def _gram_stream(df: DataFrame, text_col: str, id_col: str,
                 extra_cols: list[str]) -> DataFrame:
    """(id, *extra, gram) — one row per unigram/bigram OCCURRENCE.
    Tokenize once into a column (Catalyst does not CSE across lambda
    scopes — the quality_clf 16x-shingle trap), then bigrams via a
    sequence transform."""
    tokenized = df.select(F.col(id_col), *[F.col(c) for c in extra_cols],
                          _tokens(F.col(text_col)).alias("_tk"))
    tk = F.col("_tk")
    n_t = F.size(tk)
    bi = F.when(n_t >= 2, F.transform(
        F.sequence(F.lit(1), n_t - 1),
        lambda i: F.concat_ws(" ", F.element_at(tk, i),
                              F.element_at(tk, i + 1)))) \
        .otherwise(F.array().cast("array<string>"))
    return (tokenized
            .select(F.col(id_col), *[F.col(c) for c in extra_cols],
                    F.concat(tk, bi).alias("_gs"))
            .select(id_col, *extra_cols, F.explode("_gs").alias("gram")))


def _bucket(gram_col, m: int):
    return (F.conv(F.substring(F.md5(F.concat(F.lit("dsir:"), gram_col)),
                               1, 8), 16, 10).cast("long") % m)


def bucket_counts(df: DataFrame, target_pred, m: int = 8192,
                  text_col: str = "text", id_col: str = "doc_id",
                  use_arrow: bool = False) -> DataFrame:
    """(id, _is_t, bucket, n) — one row per (document, hash bucket) with
    the doc's gram-occurrence count in that bucket.  The shared substrate
    both the fit and the scoring aggregate from (one derivation, not
    two).  ``use_arrow=True`` routes through the mapInPandas kernel —
    row-identical (test-pinned), built for the 600k+ path where the
    interpreted bigram ``transform`` lambda dominates (the
    quality_scores_arrow / lang_id_ngram_arrow pattern)."""
    if use_arrow:
        return _bucket_counts_arrow(df, target_pred, m, text_col, id_col)
    grams = _gram_stream(df.withColumn("_is_t", target_pred),
                         text_col, id_col, ["_is_t"])
    return (grams
            .groupBy(F.col(id_col), F.col("_is_t"),
                     _bucket(F.col("gram"), m).alias("bucket"))
            .agg(F.count("*").alias("n")))


def _bucket_counts_arrow(df: DataFrame, target_pred, m: int,
                         text_col: str, id_col: str) -> DataFrame:
    """mapInPandas twin of the Column :func:`bucket_counts` path: same
    tokenization (lower, non-[a-z ] -> space, split on runs), same
    ``md5('dsir:' || gram)`` buckets (first 4 digest bytes == the Column
    form's first-8-hex-chars conv), md5 evaluated once per DISTINCT gram
    per partition (Zipfian cache — the vocabulary is orders of magnitude
    under the occurrence stream)."""
    import hashlib
    import re
    from collections import Counter

    import pandas as pd

    src = df.select(F.col(id_col), F.col(text_col).alias("_t"),
                    target_pred.alias("_is_t"))
    non_az = re.compile(r"[^a-z ]")

    def gen(batches):
        cache: dict = {}

        def bucket(g: str) -> int:
            b = cache.get(g)
            if b is None:
                # bound the per-partition vocab cache (sweep 18): an
                # adversarial partition with an unbounded bigram
                # vocabulary must not grow driver-of-OOM state
                if len(cache) >= 4_000_000:
                    cache.clear()
                b = int.from_bytes(
                    hashlib.md5(b"dsir:" + g.encode()).digest()[:4],
                    "big") % m
                cache[g] = b
            return b

        for pdf in batches:
            ids, tgts, bks, ns = [], [], [], []
            for i, txt, tgt in zip(pdf[id_col], pdf["_t"], pdf["_is_t"]):
                toks = non_az.sub(" ", (txt or "").lower()).split()
                c: Counter = Counter()
                prev = None
                for w in toks:
                    c[bucket(w)] += 1
                    if prev is not None:
                        c[bucket(prev + " " + w)] += 1
                    prev = w
                t = None if tgt is None or tgt != tgt else bool(tgt)
                for bk, n in c.items():
                    ids.append(i)
                    tgts.append(t)
                    bks.append(bk)
                    ns.append(n)
            yield pd.DataFrame({id_col: ids, "_is_t": tgts,
                                "bucket": bks, "n": ns})

    return src.mapInPandas(
        gen, schema=f"{id_col} long, _is_t boolean, bucket long, n long")


def _fit_from_counts(counts: DataFrame, m: int) -> DataFrame:
    """(bucket, lam_micro) from the shared counts table (module math).

    T/R (corpus-total gram counts) come from an unpartitioned window SUM
    over the per-bucket table instead of a separate agg + crossJoin
    broadcast (r13 opt): the window's single partition holds at most ``m``
    rows — a module constant (8192 default), never data-sized — so the
    shape is scale-safe, and it removes one nested broadcast build (the
    totals subtree re-aggregated the counts stream a second time; the
    before plan scanned the checkpointed counts 6x, the after plan 2x).
    t_k/r_k are exact int64s, so the window sum equals the agg sum
    bit-for-bit."""
    from pyspark.sql import Window

    per_bucket = (counts.groupBy("bucket")
                  .agg(F.sum(F.when(F.col("_is_t"), F.col("n"))
                             .otherwise(0)).alias("t_k"),
                       F.sum("n").alias("r_k")))
    w_all = Window.partitionBy()
    return (per_bucket
            .select("bucket", "t_k", "r_k",
                    F.sum("t_k").over(w_all).alias("T"),
                    F.sum("r_k").over(w_all).alias("R"))
            .select("bucket",
                    F.round(1e6 * (
                        F.log((F.col("t_k") + 1.0)
                              / (F.col("T") + float(m)))
                        - F.log((F.col("r_k") + 1.0)
                                / (F.col("R") + float(m)))))
                    .cast("long").alias("lam_micro")))


def fit_bucket_weights(raw: DataFrame, target_pred, m: int = 8192,
                       text_col: str = "text", id_col: str = "doc_id",
                       use_arrow: bool = False) -> DataFrame:
    """Fit the hashed-ngram importance model: (bucket, lam_micro) with one
    row per bucket that occurs in ``raw``.  ``target_pred`` is a boolean
    Column selecting the TARGET subset of ``raw`` (fit both models in ONE
    pass — t_k via a conditional sum, r_k via the total)."""
    return _fit_from_counts(
        bucket_counts(raw, target_pred, m, text_col, id_col, use_arrow), m)


def importance_weights(pool: DataFrame, weights: DataFrame, m: int = 8192,
                       text_col: str = "text", id_col: str = "doc_id",
                       use_arrow: bool = False) -> DataFrame:
    """(id, logw_micro) for every pool document — exact int64 sum of the
    bucket micro-weights over the doc's gram occurrences.  ``weights``
    must be fitted on a superset of ``pool`` (module docstring); the m-row
    table is broadcast.  Zero-gram docs get logw_micro = 0."""
    counts = bucket_counts(pool, F.lit(False), m, text_col, id_col,
                           use_arrow)
    return _weights_from_counts(pool, counts, weights, id_col)


def _weights_from_counts(pool: DataFrame, counts: DataFrame,
                         weights: DataFrame, id_col: str) -> DataFrame:
    sums = (counts.join(F.broadcast(weights), "bucket")
            .groupBy(id_col)
            .agg(F.sum(F.col("n") * F.col("lam_micro"))
                  .alias("logw_micro")))
    return (pool.select(id_col)
            .join(sums, id_col, "left")
            .select(id_col,
                    F.coalesce(F.col("logw_micro"), F.lit(0))
                     .alias("logw_micro")))


def gumbel_topk(weighted: DataFrame, k: int, salt: str = "dsir-g:",
                id_col: str = "doc_id") -> DataFrame:
    """Deterministic Gumbel-top-k resample over (id, logw_micro):
    {id, logw, gumbel_key} for the k selected docs, keyed by salted-md5
    Gumbel noise (module docstring).  TakeOrderedAndProject — no global
    sort."""
    u = ((F.conv(F.substring(
            F.md5(F.concat(F.lit(salt), F.col(id_col).cast("string"))),
            1, 15), 16, 10).cast("double") + 0.5) / _SIXTEEN_POW_15)
    key = F.col("logw_micro").cast("double") / 1e6 - F.log(-F.log(u))
    return (weighted
            .select(F.col(id_col),
                    F.round(F.col("logw_micro").cast("double") / 1e6, 6)
                     .alias("logw"),
                    F.round(key, 6).cast("double").alias("gumbel_key"))
            .orderBy(F.col("gumbel_key").desc(), F.col(id_col).asc())
            .limit(k))


def importance_resample(raw: DataFrame, target_pred, k: int, m: int = 8192,
                        text_col: str = "text", id_col: str = "doc_id",
                        salt: str = "dsir-g:",
                        use_arrow: bool = False) -> DataFrame:
    """One-call DSIR: fit on ``raw`` (target = ``target_pred`` rows),
    weight every raw doc, Gumbel-top-k resample.  Returns
    {id, logw, gumbel_key} sorted by key DESC.

    The per-(doc, bucket) counts table is derived ONCE and
    localCheckpoint'ed — the fit and the per-doc scoring both read it,
    so the tokenize + bigram work (the expensive part) runs a single
    pass.  ``use_arrow=True`` is the 600k+ path (row-identical kernel;
    PERF.md round-16 probe)."""
    counts = bucket_counts(raw, target_pred, m, text_col, id_col,
                           use_arrow).localCheckpoint(eager=False)
    w = _fit_from_counts(counts, m)
    lw = _weights_from_counts(raw, counts, w, id_col)
    return gumbel_topk(lw, k, salt, id_col)


def dsir_sql(table: str, target_pred_sql: str, k: int, m: int = 8192,
             text_col: str = "text", id_col: str = "doc_id",
             salt: str = "dsir-g:") -> str:
    """The DuckDB twin of :func:`importance_resample` over ``table`` —
    same tokenization, same md5 bucket/Gumbel recipes, same micro-integer
    fit, kept in this module so the two cannot drift."""
    return f"""WITH src AS (
  SELECT {id_col} AS id, ({target_pred_sql}) AS is_t,
         list_filter(regexp_split_to_array(
             regexp_replace(lower(coalesce({text_col}, '')),
                            '[^a-z ]', ' ', 'g'), ' +'),
                     x -> x <> '') AS tk
  FROM {table}
),
base AS (
  SELECT id, is_t,
         list_concat(tk,
           list_transform(range(1, greatest(len(tk), 1)),
                          i -> list_extract(tk, i::INT) || ' ' ||
                               list_extract(tk, (i + 1)::INT))) AS gs
  FROM src
),
gr AS (SELECT id, is_t, unnest(gs) AS g FROM base),
ex AS (
  SELECT id, is_t,
         ('0x' || substr(md5('dsir:' || g), 1, 8))::BIGINT % {m} AS bucket
  FROM gr
),
fit AS (
  SELECT bucket,
         SUM(CASE WHEN is_t THEN 1 ELSE 0 END) AS t_k,
         COUNT(*) AS r_k
  FROM ex GROUP BY bucket
),
tot AS (SELECT SUM(t_k) AS T, SUM(r_k) AS R FROM fit),
w AS (
  SELECT bucket,
         CAST(round(1000000.0 * (
             ln((t_k + 1.0) / (T + {m}.0))
             - ln((r_k + 1.0) / (R + {m}.0)))) AS BIGINT) AS lam_micro
  FROM fit CROSS JOIN tot
),
dw AS (
  SELECT e.id, SUM(w.lam_micro)::BIGINT AS logw_micro
  FROM ex e JOIN w USING (bucket) GROUP BY e.id
),
pool AS (
  SELECT s.id, coalesce(dw.logw_micro, 0) AS logw_micro
  FROM src s LEFT JOIN dw ON dw.id = s.id
),
keyed AS (
  SELECT id, logw_micro,
         logw_micro / 1000000.0
           - ln(-ln(
               ((('0x' || substr(md5('{salt}' || id::VARCHAR), 1, 15))::BIGINT
                 + 0.5) / {_SIXTEEN_POW_15!r})))
           AS key
  FROM pool
)
SELECT id AS {id_col},
       round(logw_micro / 1000000.0, 6)::DOUBLE AS logw,
       round(key, 6)::DOUBLE AS gumbel_key
FROM keyed
ORDER BY key DESC, id ASC
LIMIT {k}"""
