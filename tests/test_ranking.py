"""Ranking operator tests: exact-arithmetic goldens for R8/R9/R10 and the
stratified-merge quota semantics (R2)."""

import math

import pytest
from pyspark.sql import functions as F

from memory_opensource_spark.operators import ranking


def test_tier1_formula_golden(spark):
    # hand-computed: cache=(total=3, ema=2, cw=1) cite=(total=4, ema=0.5, cw=2)
    df = spark.createDataFrame(
        [("m1", 3.0, 2.0, 1.0, 4.0, 0.5, 2.0), ("m2", 3.0, 2.0, 1.0, 0.0, 0.0, 0.0)],
        "memory_id string, cache_hit_total double, cache_hit_ema_30d double, "
        "cache_confidence_weighted_30d double, citation_hit_total double, "
        "citation_hit_ema_30d double, citation_confidence_weighted_30d double",
    )
    out = {r.memory_id: r for r in ranking.tier1_ranked(df, 10).collect()}
    cache = 0.5 * math.log1p(3) + 0.3 * 2 + 0.2 * (1 / 2)
    cite = 0.4 * math.log1p(4) + 0.3 * 0.5 + 0.3 * (2 / 1.0)
    assert abs(out["m1"].final_score - (0.7 * cite + 0.3 * cache)) < 1e-12
    assert abs(out["m2"].final_score - cache) < 1e-12  # no citations -> cache only


def test_ema_counters_decay_sum(spark):
    df = spark.createDataFrame(
        [("k", "2024-01-01 00:00:00"), ("k", "2024-01-31 00:00:00")], "k string, ts string"
    ).select("k", F.to_timestamp("ts").alias("ts"))
    out = ranking.ema_counters(df, "k", "ts", ref_ts=F.to_timestamp(F.lit("2024-01-31 00:00:00")),
                               half_life_days=30.0).first()
    assert abs(out.ema - (0.5 + 1.0)) < 1e-9  # 30-day-old hit decayed to 0.5
    assert out.hit_total == 2.0


def test_stratified_merge_quota_and_fill(spark):
    vec = spark.createDataFrame(
        [(f"v{i}", 1.0 - i / 100.0) for i in range(10)], "id string, score double"
    )
    neo = spark.createDataFrame([(f"n{i}", None) for i in range(3)], "id string, score double")
    out = ranking.stratified_merge({"vector": vec, "neo": neo}, top_k=8).collect()
    by_src = {}
    for r in out:
        by_src.setdefault(r.source, []).append(r)
    # quota = max(8//2, 5) = 5 from vector; neo has only 3 -> fill from vector leftovers
    assert len(out) == 8
    assert len(by_src["neo"]) == 3
    assert len(by_src["vector"]) == 5
    assert all(abs(r.score - 0.7) < 1e-12 for r in by_src["neo"])  # NEO_DEFAULT_SCORE


def test_stratified_merge_dedups_by_id_keeping_best(spark):
    a = spark.createDataFrame([("x", 0.9), ("y", 0.5)], "id string, score double")
    b = spark.createDataFrame([("x", 0.4)], "id string, score double")
    out = ranking.stratified_merge({"a": a, "b": b}, top_k=10).collect()
    got = {r.id: (r.score, r.source) for r in out}
    assert got["x"] == (0.9, "a")
    assert len(out) == 2


def test_windowed_counts_cap_and_cutoff(spark):
    rows = [("m1", "2024-01-10 00:00:00")] * 3 + [("m2", "2024-01-01 00:00:00")]
    df = spark.createDataFrame(rows, "memory_id string, ts string").select(
        "memory_id", F.to_timestamp("ts").alias("ts")
    )
    out = ranking.windowed_counts(df, "memory_id", "ts", 7,
                                  F.to_timestamp(F.lit("2024-01-12 00:00:00"))).collect()
    assert {(r.memory_id, r.retrieval_count) for r in out} == {("m1", 3)}


def test_source_annotation_flags(spark):
    ids = spark.createDataFrame([("a",), ("b",)], "id string")
    qdrant = spark.createDataFrame([("a",)], "id string")
    neo = spark.createDataFrame([("b",)], "id string")
    out = {r.id: (r.in_qdrant, r.in_neo)
           for r in ranking.source_annotation(ids, {"qdrant": qdrant, "neo": neo}).collect()}
    assert out == {"a": (True, False), "b": (False, True)}
