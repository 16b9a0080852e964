"""DSIR importance resampling (functions/dsir) — fit/weight/resample
semantics, determinism, and the DuckDB-twin parity the oracle row pins."""

import duckdb
import pytest
from pyspark.sql import functions as F

from memory_opensource_spark.functions import dsir

# Target register: connected prose. Pool chaff: nav/SEO template text.
PROSE = [
    "the committee published its annual report on tuesday and the mayor "
    "thanked the families who rebuilt the old harbor wall",
    "researchers measured the lake temperature every morning and found "
    "the ice melts three weeks earlier than when the study began",
    "she walked along the narrow street toward the bakery where her "
    "grandmother worked and read the plaque beside the door",
]
CHAFF = [
    "home about contact privacy policy terms sitemap login register "
    "subscribe newsletter follow us buy cheap best price discount",
    "click here read more sign up now best casino bonus free spins "
    "cheap flights book now limited offer add to cart checkout",
    "copyright all rights reserved powered by theme footer menu "
    "navigation skip to content search cart wishlist compare",
]


def _corpus(spark):
    rows = []
    for i, t in enumerate(PROSE):
        rows.append((i, t, True))           # target docs
    for i, t in enumerate(PROSE):
        rows.append((100 + i, t + " extra words here", False))  # prose-like pool
    for i, t in enumerate(CHAFF):
        rows.append((200 + i, t, False))    # chaff pool
    return spark.createDataFrame(rows, "doc_id long, text string, is_t boolean")


def test_prose_outweighs_chaff(spark):
    docs = _corpus(spark)
    w = dsir.fit_bucket_weights(docs, F.col("is_t"), m=64)
    lw = {r["doc_id"]: r["logw_micro"]
          for r in dsir.importance_weights(docs, w, m=64).collect()}
    # every prose-like pool doc outweighs every chaff doc
    assert min(lw[100 + i] for i in range(3)) > max(lw[200 + i] for i in range(3))


def test_zero_gram_doc_gets_zero_weight(spark):
    docs = spark.createDataFrame(
        [(1, "the report", True), (2, "1234 !!!", False)],
        "doc_id long, text string, is_t boolean")
    w = dsir.fit_bucket_weights(docs, F.col("is_t"), m=64)
    lw = {r["doc_id"]: r["logw_micro"]
          for r in dsir.importance_weights(docs, w, m=64).collect()}
    assert lw[2] == 0


def test_resample_deterministic_and_topk(spark):
    docs = _corpus(spark)
    a = dsir.importance_resample(docs, F.col("is_t"), k=4, m=64).collect()
    b = dsir.importance_resample(docs, F.col("is_t"), k=4, m=64).collect()
    assert [r["doc_id"] for r in a] == [r["doc_id"] for r in b]
    assert len(a) == 4
    keys = [r["gumbel_key"] for r in a]
    assert keys == sorted(keys, reverse=True)


def test_salt_changes_selection_not_weights(spark):
    docs = _corpus(spark)
    a = dsir.importance_resample(docs, F.col("is_t"), k=9, m=64,
                                 salt="s1:").collect()
    b = dsir.importance_resample(docs, F.col("is_t"), k=9, m=64,
                                 salt="s2:").collect()
    wa = {r["doc_id"]: r["logw"] for r in a}
    wb = {r["doc_id"]: r["logw"] for r in b}
    assert wa == wb                      # k=9 selects everything: same weights
    ka = {r["doc_id"]: r["gumbel_key"] for r in a}
    kb = {r["doc_id"]: r["gumbel_key"] for r in b}
    assert ka != kb                      # but different Gumbel draws


def test_duckdb_twin_parity(spark, tmp_path):
    docs = _corpus(spark)
    pdf = docs.toPandas()
    path = str(tmp_path / "docs.parquet")
    pdf.to_parquet(path)
    con = duckdb.connect()
    con.execute(f"CREATE VIEW docs_v AS SELECT * FROM '{path}'")
    got = con.execute(dsir.dsir_sql("docs_v", "is_t", k=6, m=64)).fetchall()
    want = [(r["doc_id"], r["logw"], r["gumbel_key"])
            for r in dsir.importance_resample(
                docs, F.col("is_t"), k=6, m=64).collect()]
    assert [tuple(r) for r in got] == want
