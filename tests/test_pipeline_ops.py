"""Training-data pipeline ops: repetition quality stats + stratified sampling."""

import pyspark.sql.functions as F

from memory_opensource_spark.queries import QUERIES


def test_repetition_stats_edge_cases(spark, tmp_path):
    import pyarrow as pa
    import pyarrow.parquet as pq

    docs = pa.table({
        "doc_id": [0, 1, 2, 3],
        "text": ["", "word", "a b a b a b", "all distinct words here now"],
        "lang": ["en"] * 4, "source": ["src0"] * 4,
        "n_chars": [0, 4, 11, 27],
    })
    pq.write_table(docs, f"{tmp_path}/documents.parquet")
    out = {r["doc_id"]: r for r in
           QUERIES["text_repetition_stats"](spark, str(tmp_path)).collect()}
    assert out[0]["token_count"] == 0 and out[0]["repeated_bigram_frac"] == 0.0
    assert out[1]["token_count"] == 1 and out[1]["repeated_trigram_frac"] == 0.0
    # "a b a b a b": 5 bigrams, 2 distinct -> repeated 0.6; 4 trigrams, 2 distinct -> 0.5
    assert out[2]["repeated_bigram_frac"] == 0.6
    assert out[2]["repeated_trigram_frac"] == 0.5
    assert out[2]["quality_pass"] == 1
    assert out[3]["distinct_token_ratio"] == 1.0 and out[3]["quality_pass"] == 1


def test_stratified_sample_deterministic_and_rate_bound(spark):
    sf_dir = "/root/testdata/sf0.001"
    a = QUERIES["sample_stratified"](spark, sf_dir)
    b = QUERIES["sample_stratified"](spark, sf_dir)
    assert sorted(r["doc_id"] for r in a.collect()) == \
           sorted(r["doc_id"] for r in b.collect())  # replay-idempotent
    # per-stratum keep fraction converges to the configured rate
    docs_per_source = 25
    kept = {r["source"]: (r["n"], r["rate"]) for r in
            a.groupBy("source", "rate").agg(F.count("*").alias("n")).collect()}
    for source, (n, rate) in kept.items():
        assert n / docs_per_source <= min(1.0, rate + 0.35), (source, n, rate)
