"""r9 additions: Spark-native Bloom prefilter (operators/bloom.py) and
leakage-safe split assignment (operators/sampling.assign_split_by_group)."""

import pytest
from pyspark.sql import functions as F

from memory_opensource_spark.operators import bloom
from memory_opensource_spark.operators.sampling import assign_split_by_group


def test_bloom_no_false_negatives_and_bounded_fp(spark):
    """Construction guarantee: every inserted value tests positive; FP rate
    on non-members stays near the sizing target (deterministic hashes ->
    deterministic measured rate, pinned with headroom)."""
    members = spark.createDataFrame(
        [(f"gram-{i}",) for i in range(2000)], "g string")
    m, k = bloom.optimal_params(2000, 0.01)
    bits = bloom.bloom_build(members, "g", m, k)
    assert len(bits) == m // 64
    bf = spark.createDataFrame([(bits,)], "bf array<long>")
    probes = spark.createDataFrame(
        [(f"gram-{i}",) for i in range(6000)], "g string")
    hit = {r.g for r in
           probes.crossJoin(F.broadcast(bf))
           .filter(bloom.bloom_might_contain(F.col("bf"), F.col("g"), m, k))
           .collect()}
    truth = {f"gram-{i}" for i in range(2000)}
    assert truth <= hit                              # no false negatives
    fp = len(hit - truth) / 4000
    assert fp < 0.03, fp                             # target 0.01 + headroom


def test_bloom_prefilter_join_is_exact(spark):
    """prefilter -> exact refine returns EXACTLY the unfiltered join's rows
    (the contract the contamination_bloom oracle rides on)."""
    left = spark.createDataFrame(
        [(i, f"k{i % 50}") for i in range(400)], "id long, key string")
    right = spark.createDataFrame(
        [(f"k{i}",) for i in range(0, 50, 3)], "key string")
    m, k = bloom.optimal_params(20, 0.01)
    bits = bloom.bloom_build(right, "key", m, k)
    bf = spark.createDataFrame([(bits,)], "bf array<long>")
    pre = (left.crossJoin(F.broadcast(bf))
           .filter(bloom.bloom_might_contain(F.col("bf"), F.col("key"), m, k))
           .drop("bf"))
    got = sorted((r.id, r.key) for r in pre.join(right, "key").collect())
    want = sorted((r.id, r.key) for r in left.join(right, "key").collect())
    assert got == want


def test_bloom_build_rejects_unaligned_bits(spark):
    df = spark.createDataFrame([("a",)], "g string")
    with pytest.raises(ValueError, match="multiple of 64"):
        bloom.bloom_build(df, "g", 100, 3)


def test_split_assignment_is_group_stable(spark):
    """Every row of a group gets the SAME split (the leakage guarantee),
    regardless of row identity or partition layout."""
    rows = [(i, f"group{i % 37}") for i in range(1000)]
    df = spark.createDataFrame(rows, "doc_id long, canonical_id string") \
              .repartition(16)
    out = assign_split_by_group(df, "canonical_id").collect()
    per_group = {}
    for r in out:
        per_group.setdefault(r.canonical_id, set()).add(r.split)
    assert all(len(s) == 1 for s in per_group.values())
    assert len(out) == 1000                          # drops nothing
    # deterministic across invocations
    again = {(r.doc_id, r.split) for r in
             assign_split_by_group(df, "canonical_id").collect()}
    assert again == {(r.doc_id, r.split) for r in out}


def test_split_fractions_roughly_hold(spark):
    """With many groups the hash buckets approximate the fractions; exact
    proportions are a property of the group-key hash, not row counts."""
    df = spark.createDataFrame(
        [(i, f"g{i}") for i in range(5000)], "doc_id long, k string")
    out = assign_split_by_group(
        df, "k", fractions={"train": 0.8, "val": 0.1, "test": 0.1})
    counts = {r["split"]: r["n"] for r in
              out.groupBy("split").agg(F.count("*").alias("n")).collect()}
    assert set(counts) == {"train", "val", "test"}
    assert abs(counts["train"] / 5000 - 0.8) < 0.05
    assert abs(counts["val"] / 5000 - 0.1) < 0.03
    assert abs(counts["test"] / 5000 - 0.1) < 0.03


def test_split_bad_fractions_raise(spark):
    df = spark.createDataFrame([(1, "a")], "doc_id long, k string")
    with pytest.raises(ValueError, match="sum to 1"):
        assign_split_by_group(df, "k", fractions={"train": 0.5, "val": 0.1})


def test_bloom_sidecar_roundtrip_and_reuse(spark, tmp_path):
    """r12: bloom_save/bloom_load must roundtrip (bits, num_bits, k)
    exactly, and a LOADED bitmap must produce flags identical to the
    in-session bitmap — the cross-job reuse contract."""
    from memory_opensource_spark.operators.bloom import (
        bloom_build, bloom_load, bloom_save, ngram_contamination_flags,
        optimal_params)

    eval_docs = [" ".join(f"w{i+j}" for j in range(8)) for i in range(50)]
    grams = spark.createDataFrame([(g,) for g in eval_docs], "gram string")
    num_bits, k = optimal_params(50, 0.01)
    bits = bloom_build(grams, "gram", num_bits, k)
    path = str(tmp_path / "bloom_sidecar")
    bloom_save(spark, path, bits, num_bits, k)
    bits2, nb2, k2 = bloom_load(spark, path)
    assert (bits2, nb2, k2) == (bits, num_bits, k)

    docs = spark.createDataFrame(
        [(0, " ".join(f"w{j}" for j in range(8)) + " tail"),   # contaminated
         (1, "completely unrelated words only here thanks a lot folks")],
        "doc_id long, text string")
    a = {(r.doc_id, r.n_shared_ngrams, r.contaminated) for r in
         ngram_contamination_flags(docs, grams, bits, num_bits, k).collect()}
    b = {(r.doc_id, r.n_shared_ngrams, r.contaminated) for r in
         ngram_contamination_flags(docs, grams, bits2, nb2, k2).collect()}
    assert a == b
    assert (0, 1, 1) in a and (1, 0, 0) in a


def test_fuzzy_decontamination_cross_table(spark):
    """r14 operators/bloom.fuzzy_contamination_flags: exact eval copies
    flag, unrelated docs do not, the near-copy boundary follows exact
    Jaccard on banded candidates, and fuzzy_decontaminate drops exactly
    the flagged rows; max_bucket caps corpus-side amplification."""
    from pyspark.sql import functions as F

    from memory_opensource_spark.operators.bloom import (
        fuzzy_contamination_flags, fuzzy_decontaminate)

    base = ("the quick brown fox jumps over the lazy dog again and "
            "again with many more words to shingle properly")
    corpus = spark.createDataFrame(
        [(1, base),
         (2, base + " tiny tail"),          # near-copy of eval doc 1
         (3, "completely different content about spark catalyst "
             "optimizer plans and shuffle partitions everywhere"),
         (4, "short doc")],
        "doc_id long, text string")
    ev = spark.createDataFrame([(100, base)], "eval_id long, text string")
    flags = {r.doc_id: r.contaminated
             for r in fuzzy_contamination_flags(
                 corpus, ev, threshold=0.8).collect()}
    assert flags[1] == 1           # exact copy
    assert flags[2] == 1           # near copy above 0.8
    assert flags[3] == 0 and flags[4] == 0
    kept = {r.doc_id for r in fuzzy_decontaminate(
        corpus, ev, threshold=0.8).collect()}
    assert kept == {3, 4}
    # max_bucket=0 disables candidate generation entirely -> nothing flags
    flags0 = {r.doc_id: r.contaminated
              for r in fuzzy_contamination_flags(
                  corpus, ev, threshold=0.8, max_bucket=0).collect()}
    assert set(flags0.values()) == {0}
