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


# ---------------------------------------------------------------------------
# sample_mixture_temperature (operators/sampling) — shares the DSIR test
# module: both are the training-mixture selection family.
# ---------------------------------------------------------------------------

def _skewed(spark):
    rows = ([(i, "big") for i in range(100)]
            + [(1000 + i, "mid") for i in range(20)]
            + [(2000 + i, "tiny") for i in range(3)])
    return spark.createDataFrame(rows, "doc_id long, source string")


def test_mixture_quotas_sum_to_budget_and_tilt(spark):
    from memory_opensource_spark.operators.sampling import (
        sample_mixture_temperature)
    out = sample_mixture_temperature(_skewed(spark), "source", budget=40,
                                     alpha=0.7).toPandas()
    by = out.groupby("source").size().to_dict()
    assert sum(by.values()) == 40
    # alpha=0.7 upsamples the tail: tiny's share of the sample exceeds its
    # share of the corpus (3/123), and big stays the largest group
    assert by["tiny"] / 40 > 3 / 123
    assert by["big"] > by["mid"] > by["tiny"]


def test_mixture_cap_binds_without_redistribution(spark):
    from memory_opensource_spark.operators.sampling import (
        sample_mixture_temperature)
    # budget 100 over (100, 20, 3): tiny's uncapped quota exceeds 3 at
    # alpha=0.1 (near-uniform apportionment ~33 each) -> cap binds, and
    # the capped seats are NOT redistributed (documented one-round rule)
    out = sample_mixture_temperature(_skewed(spark), "source", budget=100,
                                     alpha=0.1).toPandas()
    by = out.groupby("source").size().to_dict()
    assert by["tiny"] == 3
    assert sum(by.values()) < 100


def test_mixture_alpha_one_is_proportional(spark):
    from memory_opensource_spark.operators.sampling import (
        sample_mixture_temperature)
    # alpha=1: shares are exactly n_g/N -> largest-remainder of
    # 41 * (100,20,3)/123 = (33.33, 6.67, 1.0) -> (33, 7, 1)
    out = sample_mixture_temperature(_skewed(spark), "source", budget=41,
                                     alpha=1.0).toPandas()
    by = out.groupby("source").size().to_dict()
    assert by == {"big": 33, "mid": 7, "tiny": 1}


def test_mixture_deterministic_selection(spark):
    from memory_opensource_spark.operators.sampling import (
        sample_mixture_temperature)
    a = sample_mixture_temperature(_skewed(spark), "source", budget=40,
                                   alpha=0.7).toPandas()
    b = sample_mixture_temperature(_skewed(spark), "source", budget=40,
                                   alpha=0.7).toPandas()
    assert sorted(a["doc_id"]) == sorted(b["doc_id"])


def test_arrow_kernel_row_identical(spark):
    # hostile mix: punctuation, digits, unicode, empty, None text, None flag
    rows = [
        (1, "The  quick-BROWN fox!! jumps 42 times", True),
        (2, "über café naïve — emoji 🚀 text", False),
        (3, "", True),
        (4, None, False),
        (5, "a", None),
        (6, "a a a b b c", True),
    ]
    docs = spark.createDataFrame(rows,
                                 "doc_id long, text string, is_t boolean")
    col = dsir.bucket_counts(docs, F.col("is_t"), m=64).collect()
    arw = dsir.bucket_counts(docs, F.col("is_t"), m=64,
                             use_arrow=True).collect()
    key = lambda r: (r["doc_id"], r["bucket"])
    assert sorted([tuple(r) for r in col], key=lambda t: (t[0], t[2])) == \
           sorted([tuple(r) for r in arw], key=lambda t: (t[0], t[2]))
    # and end-to-end: identical resample through both paths
    a = dsir.importance_resample(docs, F.col("is_t"), k=6, m=64).collect()
    b = dsir.importance_resample(docs, F.col("is_t"), k=6, m=64,
                                 use_arrow=True).collect()
    assert [tuple(r) for r in a] == [tuple(r) for r in b]


def test_unimax_waterfill_redistributes(spark):
    from memory_opensource_spark.operators.sampling import (
        sample_mixture_unimax)
    # capacities (100, 20, 3) at epochs_cap=1; budget 60:
    # tiny saturates (3*3 <= 60), mid saturates (20*2 <= 57)?  20*2=40
    # <= 57 yes -> 20; big gets 60-23=37
    out = sample_mixture_unimax(_skewed(spark), "source", budget=60,
                                epochs_cap=1.0).toPandas()
    by = out.groupby("source").size().to_dict()
    assert by == {"big": 37, "mid": 20, "tiny": 3}
    assert sum(by.values()) == 60


def test_unimax_all_saturated_underuses_budget(spark):
    from memory_opensource_spark.operators.sampling import (
        sample_mixture_unimax)
    # capacities (50, 10, 1) at epochs_cap=0.5; budget 1000 > total 61
    out = sample_mixture_unimax(_skewed(spark), "source", budget=1000,
                                epochs_cap=0.5).toPandas()
    by = out.groupby("source").size().to_dict()
    assert by == {"big": 50, "mid": 10, "tiny": 1}


def test_unimax_extra_seats_by_key_order(spark):
    from memory_opensource_spark.operators.sampling import (
        sample_mixture_unimax)
    # budget 8 over capacities (100, 20, 3): nothing saturates
    # (3*3=9 > 8); fair = 8//3 = 2, extra = 2 -> "big","mid" (key asc)
    # get 3, "tiny" gets 2
    out = sample_mixture_unimax(_skewed(spark), "source", budget=8,
                                epochs_cap=1.0).toPandas()
    by = out.groupby("source").size().to_dict()
    assert by == {"big": 3, "mid": 3, "tiny": 2}


def test_weighted_k_bias_and_exclusions(spark):
    from memory_opensource_spark.operators.sampling import sample_weighted_k
    # 50 heavy (w=1000) + 50 light (w=1) + invalid rows
    rows = ([(i, 1000) for i in range(50)]
            + [(100 + i, 1) for i in range(50)]
            + [(200, 0), (201, -5), (202, None)])
    df = spark.createDataFrame(rows, "doc_id long, w int")
    out = sample_weighted_k(df, k=30, weight_col="w").collect()
    ids = [r["doc_id"] for r in out]
    assert len(ids) == 30
    assert not {200, 201, 202} & set(ids)       # invalid excluded
    heavy = sum(1 for i in ids if i < 50)
    assert heavy >= 25                          # 1000:1 weights dominate
    # deterministic
    again = [r["doc_id"] for r in
             sample_weighted_k(df, k=30, weight_col="w").collect()]
    assert ids == again


def test_mixture_prefilter_identical_to_full_rank(spark):
    """The hash-threshold prefilter is performance-only: selections are
    row-identical with and without it, including deficit-fallback
    groups (the 3-doc group's cushioned threshold covers everything)."""
    from memory_opensource_spark.operators.sampling import (
        sample_mixture_temperature, sample_mixture_unimax)
    df = _skewed(spark)
    for fn, kw in [(sample_mixture_temperature, dict(budget=40, alpha=0.7)),
                   (sample_mixture_unimax,
                    dict(budget=60, epochs_cap=1.0))]:
        a = sorted(r["doc_id"] for r in
                   fn(df, "source", prefilter_margin=1.5, **kw).collect())
        b = sorted(r["doc_id"] for r in
                   fn(df, "source", prefilter_margin=None, **kw).collect())
        assert a == b, fn.__name__
