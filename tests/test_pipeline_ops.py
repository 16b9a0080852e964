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


def _write_docs(tmp_path, texts, sources=None):
    import pyarrow as pa
    import pyarrow.parquet as pq

    n = len(texts)
    docs = pa.table({
        "doc_id": list(range(n)), "text": texts,
        "lang": ["en"] * n,
        "source": sources or ["src0"] * n,
        "n_chars": [len(t) for t in texts],
    })
    pq.write_table(docs, f"{tmp_path}/documents.parquet")


def test_pii_redaction_counts_and_bytes(spark, tmp_path):
    import hashlib

    # doc 0 carries a pre-existing email: detection must count the organic
    # match PLUS the deterministic augment suffix (user0@... and admin0@...
    # since 0 % 5 == 0, the ip since 0 % 3 != 2, the phone since 0 % 4 == 0)
    _write_docs(tmp_path, ["reach me at someone@mail.test now", "plain words only"])
    out = {r["doc_id"]: r for r in
           QUERIES["pii_redaction"](spark, str(tmp_path)).collect()}
    assert out[0]["n_emails"] == 3 and out[0]["n_ips"] == 1 and out[0]["n_phones"] == 1
    assert out[1]["n_emails"] == 1 and out[1]["n_ips"] == 1 and out[1]["n_phones"] == 0
    expected0 = ("reach me at <EMAIL> now contact <EMAIL> cc <EMAIL>"
                 " ip <IP> call <PHONE>")
    # the email regex eats the 'user0'/'admin0' prefixes too (they are local-part chars)
    assert out[0]["redacted_md5"] == hashlib.md5(expected0.encode()).hexdigest()
    assert out[0]["redacted_chars"] == len(expected0)


def test_contamination_flags_only_gram_sharers(spark, tmp_path):
    eval_text = "w1 w2 w3 w4 w5 w6 w7 w8 w9 w10"
    texts = [eval_text]  # doc 0: eval slice (0 % 97 == 0)
    texts += ["x1 x2 x3 x4 x5 x6 x7 x8 x9"]          # doc 1: clean
    texts += ["pre w2 w3 w4 w5 w6 w7 w8 w9 post"]     # doc 2: shares one 8-gram
    texts += ["too short to gram"]                    # doc 3: < 8 tokens
    _write_docs(tmp_path, texts)
    out = {r["doc_id"]: r for r in
           QUERIES["contamination_ngram"](spark, str(tmp_path)).collect()}
    assert set(out) == {1, 2, 3}  # eval doc excluded from the train report
    assert out[1]["contaminated"] == 0 and out[1]["n_shared_8grams"] == 0
    assert out[2]["contaminated"] == 1 and out[2]["n_shared_8grams"] == 1
    assert out[3]["contaminated"] == 0


def test_pack_sequences_invariants(spark):
    rows = QUERIES["pack_sequences"](spark, "/root/testdata/sf0.001").collect()
    by_source = {}
    for r in rows:
        by_source.setdefault(r["source"], []).append(r)
    for source, rs in by_source.items():
        rs.sort(key=lambda r: r["doc_id"])
        cum = 0
        for r in rs:
            # start offset == running token total; bins are contiguous fill
            assert r["seq_id"] * 512 + r["seq_offset"] == cum, (source, r)
            assert 0 <= r["seq_offset"] < 512
            cum += r["n_tok"]


def test_prediction_validation_invariants(spark):
    rows = QUERIES["prediction_validation"](spark, "/root/testdata/sf0.001").collect()
    assert rows and all(r["n_predicted"] == 3 for r in rows)
    for r in rows:
        assert 0 <= r["n_hit"] <= 3
        assert abs(r["prediction_hit_rate"] - r["n_hit"] / 3) < 1e-6
        if r["n_hit"] == 0:
            assert r["time_to_first_hit_hours"] == -1.0
        else:
            assert r["time_to_first_hit_hours"] >= 0.0


def test_session_summaries_consistency(spark):
    rows = QUERIES["session_summaries"](spark, "/root/testdata/sf0.001").collect()
    assert rows
    for r in rows:
        assert r["message_count"] >= 3
        # dominant type leads the topics ranking and the medium_term text
        assert r["medium_term"] == "dominant: " + r["topics"].split(",")[0]
        assert r["short_term"].startswith("recent: ")
        assert r["long_term"] == (
            f"total {r['message_count']} events in {r['duration_s']}s")
        assert 1 <= len(r["topics"].split(",")) <= 3
