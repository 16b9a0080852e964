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


def fit_bucket_weights(raw: DataFrame, target_pred, m: int = 8192,
                       text_col: str = "text",
                       id_col: str = "doc_id") -> DataFrame:
    """Fit the hashed-ngram importance model: (bucket, lam_micro) with one
    row per bucket that occurs in ``raw``.  ``target_pred`` is a boolean
    Column selecting the TARGET subset of ``raw`` (fit both models in ONE
    pass — t_k via a conditional sum, r_k via count)."""
    grams = _gram_stream(raw.withColumn("_is_t", target_pred),
                         text_col, id_col, ["_is_t"])
    per_bucket = (grams
                  .groupBy(_bucket(F.col("gram"), m).alias("bucket"))
                  .agg(F.sum(F.when(F.col("_is_t"), 1).otherwise(0))
                        .alias("t_k"),
                       F.count("*").alias("r_k")))
    totals = per_bucket.agg(F.sum("t_k").alias("T"), F.sum("r_k").alias("R"))
    return (per_bucket.crossJoin(F.broadcast(totals))
            .select("bucket",
                    F.round(1e6 * (
                        F.log((F.col("t_k") + 1.0)
                              / (F.col("T") + float(m)))
                        - F.log((F.col("r_k") + 1.0)
                                / (F.col("R") + float(m)))))
                    .cast("long").alias("lam_micro")))


def importance_weights(pool: DataFrame, weights: DataFrame, m: int = 8192,
                       text_col: str = "text",
                       id_col: str = "doc_id") -> DataFrame:
    """(id, logw_micro) for every pool document — exact int64 sum of the
    bucket micro-weights over the doc's gram occurrences.  ``weights``
    must be fitted on a superset of ``pool`` (module docstring); the m-row
    table is broadcast.  Zero-gram docs get logw_micro = 0."""
    grams = _gram_stream(pool, text_col, id_col, [])
    sums = (grams.withColumn("bucket", _bucket(F.col("gram"), m))
            .join(F.broadcast(weights), "bucket")
            .groupBy(id_col)
            .agg(F.sum("lam_micro").alias("logw_micro")))
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
                        salt: str = "dsir-g:") -> DataFrame:
    """One-call DSIR: fit on ``raw`` (target = ``target_pred`` rows),
    weight every raw doc, Gumbel-top-k resample.  Returns
    {id, logw, gumbel_key} sorted by key DESC.

    The bucketed gram stream is derived ONCE and localCheckpoint'ed —
    the fit and the per-doc scoring both read it, so the tokenize +
    bigram lambdas (the expensive part) run a single pass."""
    grams = (_gram_stream(raw.withColumn("_is_t", target_pred),
                          text_col, id_col, ["_is_t"])
             .select(id_col, "_is_t",
                     _bucket(F.col("gram"), m).alias("bucket"))
             .localCheckpoint(eager=False))
    per_bucket = (grams.groupBy("bucket")
                  .agg(F.sum(F.when(F.col("_is_t"), 1).otherwise(0))
                        .alias("t_k"),
                       F.count("*").alias("r_k")))
    totals = per_bucket.agg(F.sum("t_k").alias("T"), F.sum("r_k").alias("R"))
    w = (per_bucket.crossJoin(F.broadcast(totals))
         .select("bucket",
                 F.round(1e6 * (
                     F.log((F.col("t_k") + 1.0) / (F.col("T") + float(m)))
                     - F.log((F.col("r_k") + 1.0)
                             / (F.col("R") + float(m)))))
                 .cast("long").alias("lam_micro")))
    sums = (grams.join(F.broadcast(w), "bucket")
            .groupBy(id_col)
            .agg(F.sum("lam_micro").alias("logw_micro")))
    lw = (raw.select(id_col)
          .join(sums, id_col, "left")
          .select(id_col,
                  F.coalesce(F.col("logw_micro"), F.lit(0))
                   .alias("logw_micro")))
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
