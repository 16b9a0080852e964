"""PQ index: encode parity vs a numpy reference, exactness of the re-ranked
top-k on the fixture, recall at scale-ish settings, and the plan shape that
makes it cheap (codes scan never reads the vector column; the re-rank join is
a broadcast, not a shuffle)."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from memory_opensource_spark.sources import pq_index, tables
from memory_opensource_spark.operators.similarity import topk_search

SF_DIR = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def emb(spark):
    return tables.load(spark, SF_DIR, "embeddings")


@pytest.fixture(scope="module")
def built(spark, emb, tmp_path_factory):
    path = str(tmp_path_factory.mktemp("pq") / "index")
    books = pq_index.build_pq_index(emb, path, m=16)
    return path, books


def _numpy_codes(mat, books):
    m, k, ds = books.shape
    mat = mat / np.maximum(np.linalg.norm(mat, axis=1, keepdims=True), 1e-12)
    codes = np.empty((len(mat), m), dtype=np.uint8)
    for j in range(m):
        sub = mat[:, j * ds:(j + 1) * ds]
        d = ((sub[:, None, :] - books[j][None, :, :]) ** 2).sum(-1)
        codes[:, j] = d.argmin(1)
    return codes


def test_encode_matches_numpy_reference(spark, emb, built):
    path, books = built
    rows = emb.orderBy("vec_id").collect()
    mat = np.asarray([list(r.embedding) for r in rows], dtype=np.float64)
    expect = _numpy_codes(mat, books)
    got = {r.vec_id: np.frombuffer(r.pq_code, dtype=np.uint8)
           for r in spark.read.parquet(path).collect()}
    for i, r in enumerate(rows):
        assert np.array_equal(got[r.vec_id], expect[i])


def test_codebook_sidecar_roundtrip(spark, built):
    path, books = built
    loaded = pq_index.load_codebooks(spark, path)
    assert loaded.shape == books.shape
    assert np.allclose(loaded, books)


def test_rebuild_is_deterministic(spark, emb, tmp_path):
    p1 = str(tmp_path / "a")
    p2 = str(tmp_path / "b")
    b1 = pq_index.build_pq_index(emb, p1, m=16)
    b2 = pq_index.build_pq_index(emb, p2, m=16)
    assert np.array_equal(b1, b2)
    c1 = sorted((r.vec_id, r.pq_code) for r in spark.read.parquet(p1).collect())
    c2 = sorted((r.vec_id, r.pq_code) for r in spark.read.parquet(p2).collect())
    assert c1 == c2


def test_pq_query_equals_exact_topk(spark, emb, built):
    path, _ = built
    qvec = [float(x) for x in emb.filter(F.col("vec_id") == 0)
            .head().embedding]
    got = pq_query_rows = pq_index.pq_query(
        spark, path, emb, qvec, k=10, rerank=64).collect()
    exact = topk_search(emb, qvec, 10, None, "embedding", "vec_id",
                        score_threshold=None).collect()
    assert [r.vec_id for r in got] == [r.vec_id for r in exact]
    for g, e in zip(pq_query_rows, exact):
        assert abs(g.score - e.score) < 1e-9  # re-rank scores are EXACT


def test_recall_on_uniform_vectors(spark, tmp_path):
    """Uniform-sphere vectors (the ANN worst case): ADC top-2% + exact
    re-rank must hold recall@10 >= 0.9 — the HNSW-parity bar from
    VERDICT r5 / reference memory/memory_graph.py:1036-1057."""
    rng = np.random.default_rng(0)
    n, dim = 4000, 64
    mat = rng.standard_normal((n, dim))
    mat /= np.linalg.norm(mat, axis=1, keepdims=True)
    df = spark.createDataFrame(
        [(i, [float(x) for x in mat[i]]) for i in range(n)],
        "vec_id bigint, embedding array<double>")
    path = str(tmp_path / "pq")
    books = pq_index.build_pq_index(df, path, m=16)
    hits = 0
    q_idx = rng.choice(n, 5, replace=False)
    for qi in q_idx:
        exact = set(np.argsort(-(mat @ mat[qi]))[:10])
        got = pq_index.pq_query(spark, path, df, [float(x) for x in mat[qi]],
                                k=10, rerank=max(10, n // 50),
                                codebooks=books).collect()
        hits += len(exact & {r.vec_id for r in got})
    assert hits / (10 * len(q_idx)) >= 0.9


def test_codes_scan_prunes_vector_column(spark, built):
    """The ADC stage reads ONLY (id, code): 16 B/row instead of 256 B/row —
    the whole point of the index.  The candidate stage's scan must not
    contain the embedding column."""
    path, books = built
    cand = pq_index.pq_candidates(spark, path, [0.1] * 64, 32,
                                  codebooks=books)
    plan = cand._jdf.queryExecution().executedPlan().toString()
    assert "embedding" not in plan
    assert "pq_code" in plan


def test_rerank_join_is_broadcast(spark, emb, built):
    path, books = built
    out = pq_index.pq_query(spark, path, emb, [0.1] * 64, k=5, rerank=32,
                            codebooks=books)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan


def test_dim_not_divisible_raises(spark):
    df = spark.createDataFrame([(0, [0.1, 0.2, 0.3])],
                               "vec_id bigint, embedding array<double>")
    with pytest.raises(ValueError, match="not divisible"):
        pq_index.train_pq_codebooks(df, m=2)


@pytest.fixture(scope="module")
def ivfadc(spark, emb, tmp_path_factory):
    path = str(tmp_path_factory.mktemp("ivfadc") / "index")
    cents = [[float(x) for x in r.embedding]
             for r in emb.filter(F.col("vec_id") < 8).orderBy("vec_id").collect()]
    books = pq_index.build_pq_index(emb, path, m=16, ivf_centroids=cents)
    return path, books, cents


def test_ivfadc_scan_prunes_partitions(spark, ivfadc):
    """nprobe on an IVFADC layout must land in PartitionFilters — file
    skipping before the ADC scan starts, not a post-scan filter."""
    path, books, cents = ivfadc
    qvec = cents[0]
    cand = pq_index.pq_candidates(spark, path, qvec, 16, codebooks=books,
                                  nprobe=2)
    plan = cand._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters: [" in plan
    assert "ivf_bucket" in plan.split("PartitionFilters:")[1][:400]


def test_ivfadc_full_probe_equals_flat_pq(spark, emb, built, ivfadc):
    """Probing ALL coarse buckets recovers exactly the flat-PQ answer —
    the bucketing is a pure layout change, not a scoring change."""
    flat_path, books = built
    ivf_path, books2, cents = ivfadc
    qvec = [float(x) for x in emb.filter(F.col("vec_id") == 3).head().embedding]
    flat = pq_index.pq_query(spark, flat_path, emb, qvec, k=10,
                             rerank=64, codebooks=books).collect()
    full = pq_index.pq_query(spark, ivf_path, emb, qvec, k=10, rerank=64,
                             codebooks=books2, nprobe=len(cents)).collect()
    assert [(r.vec_id, round(r.score, 9)) for r in flat] == \
           [(r.vec_id, round(r.score, 9)) for r in full]


def test_ivfadc_nprobe_without_sidecar_raises(spark, built):
    path, books = built
    with pytest.raises(ValueError, match="no .*ivfcents"):
        pq_index.pq_candidates(spark, path, [0.1] * 64, 8,
                               codebooks=books, nprobe=2)


def test_append_with_mismatched_codebooks_raises(spark, emb, built):
    """ADVICE r6: mode='append' with codebooks that differ from the stored
    sidecar must raise — a silent sidecar overwrite would re-point every
    previously appended code at the wrong codebooks (corrupt ADC scores)."""
    path, books = built
    other = books + 0.5
    with pytest.raises(ValueError, match="codebooks differ"):
        pq_index.build_pq_index(emb.limit(8), path, codebooks=other,
                                m=16, mode="append")


def test_append_with_matching_codebooks_ok(spark, emb, tmp_path):
    path = str(tmp_path / "pq_app")
    books = pq_index.build_pq_index(emb.filter(F.col("vec_id") < 100), path, m=16)
    pq_index.build_pq_index(
        emb.filter((F.col("vec_id") >= 100) & (F.col("vec_id") < 150)),
        path, codebooks=books, m=16, mode="append")
    assert spark.read.parquet(path).count() == 150


def test_append_to_fresh_path_skips_sidecar_check(spark, emb, tmp_path):
    """mode='append' on a brand-new path: no sidecar exists yet, so the
    mismatch guard is skipped (stored=None) and the build proceeds."""
    path = str(tmp_path / "pq_fresh_append")
    books = pq_index.train_pq_codebooks(emb.limit(64), m=16)
    pq_index.build_pq_index(emb.limit(64), path, codebooks=books,
                            m=16, mode="append")
    assert spark.read.parquet(path).count() == 64


def test_append_guard_propagates_non_missing_sidecar_errors(spark, emb, tmp_path):
    """Review r7: a sidecar read failure that is NOT path-missing must
    propagate — treating it as 'no sidecar' would bypass the mismatch guard
    and overwrite the sidecar, the exact silent-corruption mode it guards."""
    import os
    import shutil

    path = str(tmp_path / "pq_broken")
    books = pq_index.build_pq_index(emb.limit(32), path, m=16)
    cb = pq_index._codebook_path(path)
    shutil.rmtree(cb)
    os.makedirs(cb)
    with open(os.path.join(cb, "part-00000.parquet"), "w") as f:
        f.write("this is not parquet")
    with pytest.raises(Exception) as ei:
        pq_index.build_pq_index(emb.limit(8), path, codebooks=books,
                                m=16, mode="append")
    assert "PATH_NOT_FOUND" not in str(ei.value)
