"""Incremental corpus maintenance (plans/corpus.py): verdict parity with the
batch pipeline's keep-rules on a crafted corpus, the documented
first-come-first-kept divergence, and state growth across increments."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from memory_opensource_spark.plans import corpus

EPS = 0.95
JAC = 0.5
DIM = 8


def _tokens(base):
    return [f"t{base}_{j}" for j in range(24)]


def _text(base, extra=None):
    toks = _tokens(base)
    if extra:
        toks = toks + [extra]
    return " ".join(toks)


def _e(k):
    v = np.zeros(DIM)
    v[k] = 1.0
    return v


def _mix(a, wa, b, wb):
    v = wa * _e(a) + wb * _e(b)
    return (v / np.linalg.norm(v)).tolist()


def _vec(k, i):
    rng = np.random.RandomState(1000 + i)
    v = _e(k) + 0.01 * rng.randn(DIM)
    return (v / np.linalg.norm(v)).tolist()


@pytest.fixture(scope="module")
def state(spark, tmp_path_factory):
    """init corpus (ids 0-19) with known structure:
    - 15..19 exact-dup texts of 0..4 (dropped 'exact' within init)
    - 7 is a one-token variant of 3 (dropped 'near_dup')
    - embeddings: cluster k = id % 4; 8 and 9 share 6's direction, so the
      batch SemDeDup kernel prunes within cluster 2
    - 10 sits EXACTLY on centroid 3 (sim 1.0 — the divergence probe below)
    """
    sd = str(tmp_path_factory.mktemp("corpus") / "state")
    rows, vecs = [], []
    for i in range(20):
        base = i % 15
        text = _text(base, extra="zzz" if i == 7 else None)
        rows.append((i, text))
        if i in (8, 9):
            vecs.append((i, _vec(2, 6)))      # same direction as 6
        elif i == 6:
            vecs.append((i, _vec(2, 6)))
        elif i == 10:
            vecs.append((i, _e(3).tolist()))
        else:
            vecs.append((i, _vec(i % 4, i)))
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    emb = spark.createDataFrame(vecs, "doc_id long, embedding array<double>")
    cents = spark.createDataFrame(
        [(k, _e(k).tolist()) for k in range(4)],
        "centroid_id int, embedding array<double>")
    stats = corpus.corpus_init(docs, emb, cents, sd, eps=EPS,
                               jaccard_threshold=JAC)
    return sd, docs, emb, cents, stats


def _batch(spark, rows, vecs):
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    emb = spark.createDataFrame(vecs, "doc_id long, embedding array<double>")
    return docs, emb


def test_init_applies_batch_keep_rules(state):
    sd, docs, emb, cents, stats = state
    assert stats["members"] == 15            # exact survivors: ids 0..14
    # dropped: 7 (near-dup of 3) + one of {8, 9} chains off 6's direction
    assert stats["retained"] < 15


def test_increment_verdicts_per_stage(spark, state):
    sd, *_ = state
    rows = [
        (100, _text(2)),                     # exact dup of init 2
        (101, _text(40)),                    # novel; 102 is its exact twin
        (102, _text(40)),
        (103, _text(5, extra="zzz")),        # near-dup of init 5
        (104, _text(40, extra="yyy")),       # near-dup of batch 101
        (105, _text(41)),                    # semantic dup of init 6
        (106, _text(42)),                    # semantic dup of (dropped) 105
        (110, _text(43)),                    # novel, own cluster
    ]
    vecs = [(100, _vec(0, 100)), (101, _vec(1, 101)), (102, _vec(1, 102)),
            (103, _vec(1, 103)), (104, _vec(0, 104)),
            (105, _vec(2, 6)), (106, _vec(2, 6)),
            (110, _vec(3, 110))]
    docs, emb = _batch(spark, rows, vecs)
    v = {r.doc_id: r.drop_stage
         for r in corpus.corpus_increment(spark, docs, emb, sd, eps=EPS,
                                          jaccard_threshold=JAC,
                                          update_state=False).collect()}
    assert v[100] == "exact"
    assert v[102] == "exact"                 # lower-id batch twin 101
    assert v[101] in ("kept", "semantic")    # novel text; cluster 1 is loose
    assert v[103] == "near_dup"
    assert v[104] == "near_dup"
    assert v[105] == "semantic"
    # the batch kernel compares against ALL earlier members, including ones
    # that are themselves duplicates: 106 must drop against 105 or 6
    assert v[106] == "semantic"
    assert v[110] == "semantic" or v[110] == "kept"
    # 110 shares cluster 3 with init 10 (exactly on the centroid); its noisy
    # vector has cos ~0.999 with e3 >= eps -> semantic
    assert v[110] == "semantic"


def test_first_come_first_kept_divergence_from_batch(spark, state):
    """A new doc whose centroid_sim is LOWER than an existing >=eps
    neighbor: batch-on-union would rank the new doc first and drop the OLD
    one; incrementally history is immutable — the NEW doc drops and the old
    member stays retained."""
    from memory_opensource_spark.operators import dedup

    sd, docs0, emb0, cents, _ = state
    new_vec = _mix(3, 0.8, 1, 0.2)           # sim to e3 ~0.97 < init 10's 1.0
    assert float(np.dot(new_vec, _e(3))) >= EPS
    rows = [(200, _text(60))]
    docs, emb = _batch(spark, rows, [(200, new_vec)])
    v = corpus.corpus_increment(spark, docs, emb, sd, eps=EPS,
                                jaccard_threshold=JAC,
                                update_state=False).collect()[0]
    assert v.drop_stage == "semantic"        # new drops, old untouched
    # batch-on-union genuinely differs: the kernel ranks 200 (sim ~0.97)
    # before 10 (sim 1.0) and marks the OLD doc as the duplicate
    union = emb0.filter(F.col("doc_id") == 10).unionByName(emb)
    got = {r.id: r.is_dup for r in dedup.semantic_cluster_dedup(
        union, cents, EPS, id_col="doc_id").collect()}
    assert got[10] == 1 and got[200] == 0


def test_second_increment_sees_first_batch_state(spark, state):
    sd, *_ = state
    rows1 = [(300, _text(70))]
    docs1, emb1 = _batch(spark, rows1, [(300, _vec(1, 300))])
    corpus.corpus_increment(spark, docs1, emb1, sd, eps=EPS,
                            jaccard_threshold=JAC)
    # batch 2: exact dup + near-dup of batch-1's doc -> both drop via STATE
    rows2 = [(400, _text(70)), (401, _text(70, extra="qqq"))]
    docs2, emb2 = _batch(spark, rows2,
                         [(400, _vec(1, 400)), (401, _vec(1, 401))])
    v = {r.doc_id: r.drop_stage
         for r in corpus.corpus_increment(spark, docs2, emb2, sd, eps=EPS,
                                          jaccard_threshold=JAC,
                                          update_state=False).collect()}
    assert v[400] == "exact"
    assert v[401] == "near_dup"


def test_update_state_false_leaves_state_untouched(spark, state):
    sd, *_ = state
    import os
    members_before = spark.read.parquet(os.path.join(sd, "members")).count()
    docs, emb = _batch(spark, [(500, _text(80))], [(500, _vec(0, 500))])
    corpus.corpus_increment(spark, docs, emb, sd, eps=EPS,
                            jaccard_threshold=JAC, update_state=False)
    assert spark.read.parquet(
        os.path.join(sd, "members")).count() == members_before


def test_exact_and_minhash_match_batch_on_union(spark, state):
    """Where the contract promises exact batch parity (exact + MinHash
    stages, batch ids above init ids), verify it literally: the increment's
    exact/near_dup verdicts equal the batch pipeline's keep-rules run over
    init ∪ batch."""
    from memory_opensource_spark.operators import dedup

    sd, docs0, emb0, cents, _ = state
    rows = [(600, _text(2)), (601, _text(90)), (602, _text(90, extra="x")),
            (603, _text(3, extra="zzz"))]
    vecs = [(i, _vec(i % 4, i)) for i, _ in rows]
    docs, emb = _batch(spark, rows, vecs)
    v = {r.doc_id: r.drop_stage
         for r in corpus.corpus_increment(spark, docs, emb, sd, eps=EPS,
                                          jaccard_threshold=JAC,
                                          update_state=False).collect()}

    union = docs0.unionByName(docs)
    x = corpus._exact_survivors(union, "doc_id", "text")
    exact_dropped = {r.doc_id for r in union.join(
        x.select("doc_id"), "doc_id", "left_anti").collect()}
    pairs = dedup.minhash_near_duplicates(x, id_col="doc_id",
                                          text_col="text", threshold=JAC)
    near_dropped = {r.doc_id for r in corpus._near_drop_ids(pairs).collect()}
    for i, _ in rows:
        if i in exact_dropped:
            assert v[i] == "exact", i
        elif i in near_dropped:
            assert v[i] == "near_dup", i
        else:
            assert v[i] in ("semantic", "kept"), i


def test_increment_with_mismatched_config_raises(spark, state):
    """Hardening: an increment under different parameters than the state was
    built with is silently wrong (md5 bands never equal xxhash64 bands ->
    zero candidates) — it must raise instead."""
    sd, *_ = state
    docs, emb = _batch(spark, [(700, _text(99))], [(700, _vec(0, 700))])
    with pytest.raises(ValueError, match="differs from the state's init"):
        corpus.corpus_increment(spark, docs, emb, sd, eps=EPS,
                                jaccard_threshold=JAC, hash_fn="xxhash64",
                                update_state=False)
    with pytest.raises(ValueError, match="differs from the state's init"):
        corpus.corpus_increment(spark, docs, emb, sd, eps=0.5,
                                jaccard_threshold=JAC, update_state=False)


def test_streaming_corpus_maintenance_accumulates_state(spark, tmp_path):
    """ST twin: two micro-batches through foreachBatch — batch 2's exact dup
    of a batch-1 doc must drop via the state batch 1 appended, proving
    cross-batch dedup under Structured Streaming without a corpus rescan."""
    import os

    from memory_opensource_spark.streaming.pipelines import (
        foreach_batch_corpus_maintenance)

    sd = str(tmp_path / "state")
    init_docs = spark.createDataFrame(
        [(0, _text(0)), (1, _text(1))], "doc_id long, text string")
    init_emb = spark.createDataFrame(
        [(0, _vec(0, 0)), (1, _vec(1, 1))],
        "doc_id long, embedding array<double>")
    cents = spark.createDataFrame(
        [(k, _e(k).tolist()) for k in range(4)],
        "centroid_id int, embedding array<double>")
    corpus.corpus_init(init_docs, init_emb, cents, sd, eps=EPS,
                       jaccard_threshold=JAC)

    d = str(tmp_path / "stream")
    schema = "doc_id long, text string, embedding array<double>"
    b0 = spark.createDataFrame(
        [(800, _text(88), _vec(2, 800)), (801, _text(0), _vec(3, 801))],
        schema)                                  # 801 exact-dups init 0
    b0.coalesce(1).write.parquet(f"{d}/in/b0")
    verdicts = {}

    def on_verdict(v, batch_id):
        for r in v.collect():
            verdicts[r.doc_id] = r.drop_stage

    def run():
        stream = (spark.readStream.schema(schema)
                  .option("maxFilesPerTrigger", "1").parquet(f"{d}/in/*"))
        q = (foreach_batch_corpus_maintenance(
                stream, sd, f"{d}/ckpt", eps=EPS, jaccard_threshold=JAC,
                on_verdict=on_verdict, compact_every=1,
                compact_partitions=1)
             .trigger(availableNow=True).start())
        q.awaitTermination(120)

    run()
    assert verdicts[800] == "kept"
    assert verdicts[801] == "exact"
    # batch 2: exact dup of BATCH-1's kept doc -> drops via appended state
    b1 = spark.createDataFrame(
        [(900, _text(88), _vec(2, 900)), (901, _text(89), _vec(3, 901))],
        schema)                                  # cluster 3 is empty (801
                                                 # never became a member)
    b1.coalesce(1).write.parquet(f"{d}/in/b1")
    run()
    assert verdicts[900] == "exact"
    assert verdicts[901] == "kept"
    members = spark.read.parquet(os.path.join(sd, "members"))
    assert members.count() == 2 + 1 + 1          # init 2 + 800 + 901
    # compact_every=1 fired after batch_id 1: each table rewritten as ONE
    # file (the appends would otherwise leave one file group per batch)
    import glob
    for t in ("members", "bands"):
        files = glob.glob(os.path.join(sd, t, "*.parquet"))
        assert len(files) == 1, (t, files)


def test_replayed_increment_is_idempotent(spark, tmp_path):
    """foreachBatch is at-least-once: re-running an increment whose previous
    attempt already appended state must reproduce the ORIGINAL verdicts (not
    classify everything 'exact' against its own rows) and must not duplicate
    state rows."""
    import os

    sd = str(tmp_path / "state")
    init_docs = spark.createDataFrame(
        [(0, _text(0))], "doc_id long, text string")
    init_emb = spark.createDataFrame(
        [(0, _vec(0, 0))], "doc_id long, embedding array<double>")
    cents = spark.createDataFrame(
        [(k, _e(k).tolist()) for k in range(4)],
        "centroid_id int, embedding array<double>")
    corpus.corpus_init(init_docs, init_emb, cents, sd, eps=EPS,
                       jaccard_threshold=JAC)
    docs, emb = _batch(spark, [(100, _text(50)), (101, _text(0))],
                       [(100, _vec(1, 100)), (101, _vec(2, 101))])
    v1 = {r.doc_id: r.drop_stage
          for r in corpus.corpus_increment(spark, docs, emb, sd, eps=EPS,
                                           jaccard_threshold=JAC).collect()}
    assert v1 == {100: "kept", 101: "exact"}
    # replay the SAME batch (state already holds 100's member/band rows)
    v2 = {r.doc_id: r.drop_stage
          for r in corpus.corpus_increment(spark, docs, emb, sd, eps=EPS,
                                           jaccard_threshold=JAC).collect()}
    assert v2 == v1
    members = spark.read.parquet(os.path.join(sd, "members"))
    assert members.count() == 2                       # init 0 + 100, no dups
    assert members.filter(F.col("doc_id") == 100).count() == 1
    bands = spark.read.parquet(os.path.join(sd, "bands"))
    assert bands.groupBy("doc_id", "band_idx").count() \
                .filter(F.col("count") > 1).count() == 0


def test_misaligned_embeddings_raise(spark, state):
    """A doc with no (or NULL) embedding row must raise, not silently skip
    the semantic stage and store retained=NULL."""
    sd, *_ = state
    docs = spark.createDataFrame([(950, _text(95))], "doc_id long, text string")
    emb_missing = spark.createDataFrame(
        [], "doc_id long, embedding array<double>")
    with pytest.raises(ValueError, match="no .non-NULL. embedding"):
        corpus.corpus_increment(spark, docs, emb_missing, sd, eps=EPS,
                                jaccard_threshold=JAC, update_state=False)
    emb_null = spark.createDataFrame(
        [(950, None)], "doc_id long, embedding array<double>")
    with pytest.raises(ValueError, match="no .non-NULL. embedding"):
        corpus.corpus_increment(spark, docs, emb_null, sd, eps=EPS,
                                jaccard_threshold=JAC, update_state=False)


def test_corpus_compact_preserves_state_and_reduces_files(spark, tmp_path):
    """Maintenance: many increments leave one file group per batch; compaction
    must reduce file count without changing any row, and increments must keep
    working against the compacted state."""
    import glob
    import os

    sd = str(tmp_path / "state")
    init_docs = spark.createDataFrame(
        [(0, _text(0))], "doc_id long, text string")
    init_emb = spark.createDataFrame(
        [(0, _vec(0, 0))], "doc_id long, embedding array<double>")
    cents = spark.createDataFrame(
        [(k, _e(k).tolist()) for k in range(4)],
        "centroid_id int, embedding array<double>")
    corpus.corpus_init(init_docs, init_emb, cents, sd, eps=EPS,
                       jaccard_threshold=JAC)
    for i in range(3):                        # three appends = 4 file groups
        docs, emb = _batch(spark, [(1000 + i, _text(200 + i))],
                           [(1000 + i, _vec(i % 4, 1000 + i))])
        corpus.corpus_increment(spark, docs, emb, sd, eps=EPS,
                                jaccard_threshold=JAC)
    before = spark.read.parquet(os.path.join(sd, "members")).collect()
    files_before = len(glob.glob(os.path.join(sd, "members", "*.parquet")))
    counts = corpus.corpus_compact(spark, sd, target_partitions=1)
    assert counts["members"] == len(before) == 4
    files_after = len(glob.glob(os.path.join(sd, "members", "*.parquet")))
    assert files_after < files_before
    after = spark.read.parquet(os.path.join(sd, "members")).collect()
    assert sorted(r.doc_id for r in after) == sorted(r.doc_id for r in before)
    # an increment against the compacted state still behaves
    docs, emb = _batch(spark, [(2000, _text(0))], [(2000, _vec(1, 2000))])
    v = corpus.corpus_increment(spark, docs, emb, sd, eps=EPS,
                                jaccard_threshold=JAC,
                                update_state=False).collect()[0]
    assert v.drop_stage == "exact"            # dups init 0 through compaction


def _drift_state(spark, tmp_path, with_sem_dup=True):
    """Fresh init: ids 0-9 on dims 0-3 (0.01 noise -> centroid_sim ~0.9999);
    8 and 9 share 6's direction so the batch kernel marks semantic dups in
    cluster 2 (history rows for the recluster-immutability check)."""
    sd = str(tmp_path / "state")
    rows, vecs = [], []
    for i in range(10):
        rows.append((i, _text(i)))
        if with_sem_dup and i in (8, 9):
            vecs.append((i, _vec(2, 6)))
        elif with_sem_dup and i == 6:
            vecs.append((i, _vec(2, 6)))
        else:
            vecs.append((i, _vec(i % 4, i)))
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    emb = spark.createDataFrame(vecs, "doc_id long, embedding array<double>")
    cents = spark.createDataFrame(
        [(k, _e(k).tolist()) for k in range(4)],
        "centroid_id int, embedding array<double>")
    corpus.corpus_init(docs, emb, cents, sd, eps=EPS, jaccard_threshold=JAC)
    return sd


def test_drift_signal_trips_on_domain_shift_and_recluster_resets(
        spark, tmp_path):
    """VERDICT r7 task 4: a domain-shifted batch (directions the codebook has
    never seen) must trip corpus_drift_status; corpus_recluster with a wider
    codebook must remap assignments WITHOUT touching verdict history and
    reset the baseline so the signal clears."""
    import os

    sd = _drift_state(spark, tmp_path)
    # baseline persisted at init
    st0 = corpus.corpus_drift_status(spark, sd)
    assert st0["baseline_mean"] is not None and st0["baseline_mean"] > 0.99
    assert not st0["drifted"]                      # no increments yet

    # domain shift: four docs on dims 4-7 — best sim vs e0..e3 is ~|noise|
    docs, emb = _batch(
        spark, [(100 + d, _text(40 + d)) for d in range(4)],
        [(100 + d, _vec(4 + d, 100 + d)) for d in range(4)])
    v = {r.doc_id: r.drop_stage
         for r in corpus.corpus_increment(spark, docs, emb, sd, eps=EPS,
                                          jaccard_threshold=JAC).collect()}
    assert all(s == "kept" for s in v.values())    # orthogonal -> no dups
    st1 = corpus.corpus_drift_status(spark, sd)
    assert st1["drifted"] and st1["recent_mean"] < 0.2

    # history snapshot before the remap
    pre = {r.doc_id: (r.is_dup, r.retained)
           for r in spark.read.parquet(os.path.join(sd, "members"))
           .select("doc_id", "is_dup", "retained").collect()}
    assert pre[9][0] == 1                          # semantic dup in history

    cents8 = spark.createDataFrame(
        [(k, _e(k).tolist()) for k in range(8)],
        "centroid_id int, embedding array<double>")
    res = corpus.corpus_recluster(spark, sd, cents8)
    assert res["baseline_mean"] > 0.99             # everyone near a centroid

    m = {r.doc_id: r for r in
         spark.read.parquet(os.path.join(sd, "members")).collect()}
    for i, (dup, ret) in pre.items():              # verdicts immutable
        assert (m[i].is_dup, m[i].retained) == (dup, ret)
    for d in range(4):                             # shifted docs remapped
        assert m[100 + d].cluster_id == 4 + d
        assert m[100 + d].centroid_sim > 0.99
    st2 = corpus.corpus_drift_status(spark, sd)
    assert not st2["drifted"] and st2["increments"] == 0

    # retrain path (centroids=None) also runs end to end
    res2 = corpus.corpus_recluster(spark, sd, n_centroids=6)
    assert res2["members"] == res["members"]


def test_post_recluster_increments_agree_with_fresh_init_on_union(
        spark, tmp_path):
    """After a recluster, subsequent increments must agree with a fresh
    corpus_init over the union (same new codebook) wherever existing members
    rank before new ones — the first-come-first-kept caveat carries across
    the remap and is exercised here in its AGREEMENT direction (new docs sit
    exactly on centroids, so they rank after the noisy existing members)."""
    import os

    sd = _drift_state(spark, tmp_path, with_sem_dup=False)
    b1_docs, b1_emb = _batch(
        spark, [(100, _text(40)), (101, _text(41))],
        [(100, _vec(4, 100)), (101, _vec(5, 101))])
    corpus.corpus_increment(spark, b1_docs, b1_emb, sd, eps=EPS,
                            jaccard_threshold=JAC)
    assert corpus.corpus_drift_status(spark, sd)["drifted"]
    cents8 = spark.createDataFrame(
        [(k, _e(k).tolist()) for k in range(8)],
        "centroid_id int, embedding array<double>")
    corpus.corpus_recluster(spark, sd, cents8)

    # B2: 200 ~ duplicate direction of member 100 (sim 1.0 ranks AFTER
    # 100's ~0.9999), 201 likewise vs 101, 202 fresh direction, 203 exact
    # text twin of init doc 3
    b2_docs, b2_emb = _batch(
        spark,
        [(200, _text(50)), (201, _text(51)), (202, _text(52)),
         (203, _text(3))],
        [(200, _e(4).tolist()), (201, _e(5).tolist()),
         (202, _vec(6, 202)), (203, _vec(7, 203))])
    v = {r.doc_id: r.drop_stage
         for r in corpus.corpus_increment(spark, b2_docs, b2_emb, sd,
                                          eps=EPS, jaccard_threshold=JAC,
                                          update_state=False).collect()}
    assert v == {200: "semantic", 201: "semantic", 202: "kept", 203: "exact"}

    # fresh batch init over the union with the SAME new codebook
    union_docs = (spark.read.parquet(os.path.join(sd, "members"))
                  .select("doc_id", "text")
                  .unionByName(b2_docs))
    union_emb = (spark.read.parquet(os.path.join(sd, "members"))
                 .select("doc_id", "embedding")
                 .unionByName(b2_emb))
    sd2 = str(tmp_path / "fresh")
    corpus.corpus_init(union_docs, union_emb, cents8, sd2, eps=EPS,
                       jaccard_threshold=JAC)
    fresh = {r.doc_id: r for r in
             spark.read.parquet(os.path.join(sd2, "members"))
             .filter(F.col("doc_id") >= 200).collect()}

    def stage(i):
        if i not in fresh:
            return "exact"
        r = fresh[i]
        if r.near_ok == 0:
            return "near_dup"
        return "semantic" if r.is_dup == 1 else "kept"

    assert {i: stage(i) for i in (200, 201, 202, 203)} == v


def test_streaming_drift_hook_fires_on_domain_shift(spark, tmp_path):
    """r8: the streaming maintenance sink surfaces the drift signal — a
    domain-shifted micro-batch must invoke on_drift with drifted=True, and
    an in-distribution batch must not."""
    from memory_opensource_spark.streaming.pipelines import (
        foreach_batch_corpus_maintenance)

    sd = str(tmp_path / "state")
    init_docs = spark.createDataFrame(
        [(i, _text(i)) for i in range(6)], "doc_id long, text string")
    init_emb = spark.createDataFrame(
        [(i, _vec(i % 4, i)) for i in range(6)],
        "doc_id long, embedding array<double>")
    cents = spark.createDataFrame(
        [(k, _e(k).tolist()) for k in range(4)],
        "centroid_id int, embedding array<double>")
    corpus.corpus_init(init_docs, init_emb, cents, sd, eps=EPS,
                       jaccard_threshold=JAC)

    d = str(tmp_path / "stream")
    schema = "doc_id long, text string, embedding array<double>"
    # b0 in-distribution (dim 1), b1 domain-shifted (dims 4-7)
    spark.createDataFrame(
        [(700, _text(70), _vec(1, 700))], schema
    ).coalesce(1).write.parquet(f"{d}/in/b0")
    spark.createDataFrame(
        [(710 + k, _text(71 + k), _vec(4 + k, 710 + k)) for k in range(4)],
        schema).coalesce(1).write.parquet(f"{d}/in/b1")
    fired = []

    def on_drift(status, batch_id):
        fired.append((batch_id, status["recent_mean"]))

    stream = (spark.readStream.schema(schema)
              .option("maxFilesPerTrigger", "1").parquet(f"{d}/in/*"))
    q = (foreach_batch_corpus_maintenance(
            stream, sd, f"{d}/ckpt", eps=EPS, jaccard_threshold=JAC,
            on_drift=on_drift, drift_window=1)
         .trigger(availableNow=True).start())
    q.awaitTermination(120)
    # exactly the shifted batch fired; its pooled recent_mean is tiny
    assert len(fired) == 1 and fired[0][1] < 0.2


def test_state_exact_dup_bands_grow_with_members_not_input(spark, tmp_path):
    """r9 (ADVICE medium): a batch doc dropped as an exact dup of an
    EXISTING state member must not persist its band rows — otherwise the
    bands table grows with total input on duplicate-heavy streams (each
    dropped doc duplicating its twin's bands into every future candidate
    join).  Bands doc_ids must stay a subset of members doc_ids."""
    import os

    sd = str(tmp_path / "state")
    init_docs = spark.createDataFrame(
        [(0, _text(0)), (1, _text(1))], "doc_id long, text string")
    init_emb = spark.createDataFrame(
        [(0, _vec(0, 0)), (1, _vec(1, 1))],
        "doc_id long, embedding array<double>")
    cents = spark.createDataFrame(
        [(k, _e(k).tolist()) for k in range(4)],
        "centroid_id int, embedding array<double>")
    corpus.corpus_init(init_docs, init_emb, cents, sd, eps=EPS,
                       jaccard_threshold=JAC)
    bands0 = spark.read.parquet(os.path.join(sd, "bands")).count()
    # increment: 100 = exact dup of state member 0; 101 genuinely new
    docs, emb = _batch(spark, [(100, _text(0)), (101, _text(60))],
                       [(100, _vec(0, 100)), (101, _vec(3, 101))])
    v = {r.doc_id: r.drop_stage
         for r in corpus.corpus_increment(spark, docs, emb, sd, eps=EPS,
                                          jaccard_threshold=JAC).collect()}
    assert v == {100: "exact", 101: "kept"}
    bands = spark.read.parquet(os.path.join(sd, "bands"))
    members = spark.read.parquet(os.path.join(sd, "members"))
    band_ids = {r.doc_id for r in bands.select("doc_id").distinct().collect()}
    member_ids = {r.doc_id for r in members.select("doc_id").collect()}
    assert 100 not in band_ids
    assert band_ids <= member_ids
    # exactly one new doc's bands appended (101)
    per_doc = bands0 // 2
    assert bands.count() == bands0 + per_doc


def test_drift_seq_monotone_and_replay_stable(spark, tmp_path):
    """r9 (ADVICE): drift sidecar seq must come from max(existing seq)+1,
    and a REPLAYED increment must keep its original seq instead of
    re-deriving a duplicate, too-high one from the current file count."""
    import os

    import pyarrow.parquet as pq

    sd = str(tmp_path / "state")
    init_docs = spark.createDataFrame(
        [(0, _text(0))], "doc_id long, text string")
    init_emb = spark.createDataFrame(
        [(0, _vec(0, 0))], "doc_id long, embedding array<double>")
    cents = spark.createDataFrame(
        [(k, _e(k).tolist()) for k in range(4)],
        "centroid_id int, embedding array<double>")
    corpus.corpus_init(init_docs, init_emb, cents, sd, eps=EPS,
                       jaccard_threshold=JAC)

    def inc(i):
        docs, emb = _batch(spark, [(i, _text(i % 15 + 20))],
                           [(i, _vec(i % 4, i))])
        corpus.corpus_increment(spark, docs, emb, sd, eps=EPS,
                                jaccard_threshold=JAC)

    inc(100)      # seq 1
    inc(200)      # seq 2
    inc(100)      # REPLAY of the first increment — must keep seq 1
    drift_dir = os.path.join(sd, "drift")
    files = sorted(f for f in os.listdir(drift_dir) if f.endswith(".parquet"))
    assert len(files) == 2    # replay overwrote, didn't add
    seqs = sorted(
        pq.read_table(os.path.join(drift_dir, f), columns=["seq"])
        .column("seq")[0].as_py() for f in files)
    assert seqs == [1, 2]
    inc(300)      # new increment after the replay -> seq 3, no duplicate
    files = [f for f in os.listdir(drift_dir) if f.endswith(".parquet")]
    seqs = sorted(
        pq.read_table(os.path.join(drift_dir, f), columns=["seq"])
        .column("seq")[0].as_py() for f in files)
    assert seqs == [1, 2, 3]


def test_drift_status_window_skips_empty_increments(spark, tmp_path):
    """r9 (ADVICE): n==0 drift rows (increments with no semantic entrants)
    must not consume window slots — the filter runs BEFORE the limit."""
    import os

    import pyarrow as pa
    import pyarrow.parquet as pq

    sd = str(tmp_path / "state")
    init_docs = spark.createDataFrame(
        [(0, _text(0))], "doc_id long, text string")
    init_emb = spark.createDataFrame(
        [(0, _vec(0, 0))], "doc_id long, embedding array<double>")
    cents = spark.createDataFrame(
        [(k, _e(k).tolist()) for k in range(4)],
        "centroid_id int, embedding array<double>")
    corpus.corpus_init(init_docs, init_emb, cents, sd, eps=EPS,
                       jaccard_threshold=JAC)
    drift_dir = os.path.join(sd, "drift")
    os.makedirs(drift_dir, exist_ok=True)
    rows = [(1, 10, 0.99, 0.98), (2, 0, None, None), (3, 0, None, None)]
    for seq, n, m, p10 in rows:
        pq.write_table(pa.table({
            "seq": pa.array([seq], pa.int64()),
            "n": pa.array([n], pa.int64()),
            "mean_sim": pa.array([m], pa.float64()),
            "p10_sim": pa.array([p10], pa.float64()),
        }), os.path.join(drift_dir, f"drift-{seq:016x}.parquet"))
    out = corpus.corpus_drift_status(spark, sd, window=2)
    # window=2 over informative rows only -> the seq-1 row still pools
    assert out["recent_n"] == 10
    assert out["recent_mean"] == pytest.approx(0.99)


def test_refine_centroids_warm_start(spark):
    """r9 (VERDICT r8 task 4): warm-started Lloyd's — (a) a converged
    codebook is a fixed point (movement stop fires, centroids unchanged up
    to tol); (b) a perturbed init recovers the true blob directions; (c)
    centroid SLOTS are stable (index i refines centroid i)."""
    import numpy as np

    from memory_opensource_spark.sources.ann_index import refine_centroids

    rng = np.random.RandomState(7)
    rows = []
    for i in range(120):
        k = i % 2                          # two blobs: dims 0 and 3
        v = _e(0 if k == 0 else 3) + 0.02 * rng.randn(DIM)
        rows.append((i, (v / np.linalg.norm(v)).tolist()))
    df = spark.createDataFrame(rows, "doc_id long, embedding array<double>")
    true0, true1 = _e(0), _e(3)

    # (a) fixed point
    out = refine_centroids(df, [true0.tolist(), true1.tolist()], tol=1e-3)
    assert float(np.dot(out[0], true0)) > 0.999
    assert float(np.dot(out[1], true1)) > 0.999

    # (b)+(c) perturbed init converges back, slot order preserved
    p0 = true0 + 0.3 * _e(1)
    p1 = true1 + 0.3 * _e(2)
    init = [(p0 / np.linalg.norm(p0)).tolist(),
            (p1 / np.linalg.norm(p1)).tolist()]
    out = refine_centroids(df, init, max_iter=10, tol=1e-5)
    assert float(np.dot(out[0], true0)) > 0.995      # slot 0 -> blob 0
    assert float(np.dot(out[1], true1)) > 0.995      # slot 1 -> blob 3


def test_recluster_warm_start_matches_cold_quality(spark, tmp_path):
    """r9: corpus_recluster's default warm path (same k as the existing
    codebook) must land assignment quality within noise of the cold
    retrain, keep verdict history immutable, and reset drift state —
    the r8 verdict's 'equal assignment quality' done-condition."""
    import os

    def build(tag):
        sd = _drift_state(spark, tmp_path / tag)
        docs, emb = _batch(
            spark, [(100 + d, _text(40 + d)) for d in range(4)],
            [(100 + d, _vec(4 + d, 100 + d)) for d in range(4)])
        corpus.corpus_increment(spark, docs, emb, sd, eps=EPS,
                                jaccard_threshold=JAC)
        return sd

    sd_w, sd_c = build("w"), build("c")
    pre = {r.doc_id: (r.is_dup, r.retained)
           for r in spark.read.parquet(os.path.join(sd_w, "members"))
           .select("doc_id", "is_dup", "retained").collect()}
    res_w = corpus.corpus_recluster(spark, sd_w, n_centroids=4)  # warm (k==4)
    res_c = corpus.corpus_recluster(spark, sd_c, n_centroids=4,
                                    warm_start=False)            # cold
    assert res_w["members"] == res_c["members"]
    assert res_w["reassigned"] == res_c["reassigned"]
    # equal assignment quality within noise
    assert abs(res_w["baseline_mean"] - res_c["baseline_mean"]) < 0.05
    # history immutable under the warm remap
    m = {r.doc_id: r for r in
         spark.read.parquet(os.path.join(sd_w, "members")).collect()}
    for i, (dup, ret) in pre.items():
        assert (m[i].is_dup, m[i].retained) == (dup, ret)
    # drift state reset
    st = corpus.corpus_drift_status(spark, sd_w)
    assert not st["drifted"] and st["increments"] == 0


def _members_df(spark, rows):
    """Minimal members frame for the remap kernel tests:
    (doc_id, near_ok, cluster_id, centroid_sim, embedding, assign_margin)."""
    return spark.createDataFrame(
        rows, "doc_id long, near_ok int, cluster_id int, "
              "centroid_sim double, embedding array<double>, "
              "assign_margin double")


def test_remap_kernel_pruned_matches_full_scoring(spark):
    """r10: the margin-pruned remap must pick the SAME (cluster_id,
    centroid_sim) as full scoring for every member — including a member
    that FLIPS to a big mover, a member that keeps its cluster, a low-margin
    member (full path), a NULL-margin member (full path), and a
    never-semantic passthrough row.  Pruned margins must stay conservative
    (<= the full-scoring margin) so repeated reclusters remain exact."""
    old = [_e(i).tolist() for i in range(8)]
    new = [list(v) for v in old]
    new[5] = (0.8 * _e(1) + 0.6 * _e(5)).tolist()      # big mover
    j = _e(2) + 0.001 * _e(6)
    new[2] = (j / np.linalg.norm(j)).tolist()          # small mover
    flip = (0.8 * _e(1) + 0.6 * _e(5))
    flip = (flip / np.linalg.norm(flip)).tolist()      # flips 1 -> 5
    lowm = (_e(3) + _e(4))
    lowm = (lowm / np.linalg.norm(lowm)).tolist()      # ~tied 3/4
    rows = [
        (1, 1, 1, 1.0, _e(1).tolist(), 1.0),           # pruned, stays 1
        (2, 1, 1, 0.8, flip, 0.2),                     # pruned, flips to 5
        (3, 1, 3, 0.707107, lowm, 0.0),                # margin 0 -> full
        (4, 0, None, None, None, None),                # never-semantic row
        (5, 1, 6, 1.0, _e(6).tolist(), None),          # NULL margin -> full
    ]
    m = _members_df(spark, rows)
    ids = list(range(8))
    pruned = {r.doc_id: r for r in corpus._remap_members(
        m, ids, new, old, big_movers=2).collect()}
    full = {r.doc_id: r for r in corpus._remap_members(
        m.drop("assign_margin"), ids, new, None).collect()}
    assert set(pruned) == set(full) == {1, 2, 3, 4, 5}
    for d in pruned:
        assert pruned[d].cluster_id == full[d].cluster_id, d
        assert pruned[d].centroid_sim == full[d].centroid_sim, d
    assert pruned[2].cluster_id == 5 and pruned[2].centroid_sim == 1.0
    assert pruned[1].cluster_id == 1
    assert pruned[4].cluster_id is None and pruned[4].assign_margin is None
    for d in (1, 2, 3, 5):
        assert pruned[d].assign_margin is not None
        assert pruned[d].assign_margin >= 0.0
        assert pruned[d].assign_margin <= full[d].assign_margin + 1e-12, d


def test_recluster_pruned_end_to_end_matches_full(spark, tmp_path):
    """r10 end-to-end: recluster #1 populates assign_margin (full scoring),
    recluster #2 takes the pruned path (small big_movers) — and must leave
    members identical to a full-scoring twin run on a byte-identical state
    copy (big_movers past k disables pruning)."""
    import os
    import shutil

    sd = _drift_state(spark, tmp_path)
    res1 = corpus.corpus_recluster(spark, sd, n_centroids=4)   # warm + full
    mem1 = spark.read.parquet(os.path.join(sd, "members"))
    assert "assign_margin" in mem1.columns
    n_margins = mem1.filter(F.col("assign_margin").isNotNull()).count()
    assert n_margins == res1["reassigned"] > 0

    sd_full = str(tmp_path / "state_full")
    shutil.copytree(sd, sd_full)
    corpus.corpus_recluster(spark, sd, n_centroids=4, big_movers=2)
    corpus.corpus_recluster(spark, sd_full, n_centroids=4,
                            big_movers=10**6)                  # full twin
    a = {r.doc_id: (r.cluster_id, r.centroid_sim) for r in
         spark.read.parquet(os.path.join(sd, "members")).collect()}
    b = {r.doc_id: (r.cluster_id, r.centroid_sim) for r in
         spark.read.parquet(os.path.join(sd_full, "members")).collect()}
    assert a == b


def test_remap_pruning_randomized_equality(spark):
    """r10 randomized pin for the margin bound: across seeded random
    member sets and codebook perturbations (a few big movers + jittered
    rest — the drift shape), the pruned remap must equal full scoring on
    every (cluster_id, centroid_sim), with margins coming from a REAL
    prior full scoring (old -> old), never synthetic."""
    rng = np.random.RandomState(0)
    k, dim = 8, 6
    for seed in range(5):
        r = np.random.RandomState(100 + seed)
        old = r.randn(k, dim)
        old /= np.linalg.norm(old, axis=1, keepdims=True)
        new = old.copy()
        for j in r.choice(k, 2, replace=False):       # big movers
            v = new[j] + r.randn(dim)
            new[j] = v / np.linalg.norm(v)
        new += 1e-4 * r.randn(k, dim)                 # everyone jitters
        new /= np.linalg.norm(new, axis=1, keepdims=True)
        emb = r.randn(40, dim)
        emb /= np.linalg.norm(emb, axis=1, keepdims=True)
        rows = [(i, 1, None, None, emb[i].tolist(), None)
                for i in range(40)]
        m0 = _members_df(spark, rows)
        ids = list(range(k))
        # real margins: a full scoring against the OLD codebook
        seeded = corpus._remap_members(
            m0, ids, [v.tolist() for v in old], None)
        pruned = {r_.doc_id: r_ for r_ in corpus._remap_members(
            seeded, ids, [v.tolist() for v in new],
            [v.tolist() for v in old], big_movers=2).collect()}
        full = {r_.doc_id: r_ for r_ in corpus._remap_members(
            seeded.drop("assign_margin"), ids,
            [v.tolist() for v in new], None).collect()}
        for d in full:
            assert pruned[d].cluster_id == full[d].cluster_id, (seed, d)
            assert pruned[d].centroid_sim == full[d].centroid_sim, (seed, d)
            assert pruned[d].assign_margin is not None
            assert pruned[d].assign_margin <= full[d].assign_margin + 1e-12


def test_remap_tier1_one_dot_path_exact(spark):
    """r11: when EVERY centroid's movement is tiny (steady-state refine
    noise) and margins are healthy, members take the tier-1 one-dot path
    (margin > d_c + theta_all + slack) — and must still equal full
    scoring exactly on (cluster_id, centroid_sim), with conservative
    margins.  The jitter (1e-4 chord) is far below typical margins, so
    this pins the NEW code path, not the big-mover tier."""
    r = np.random.RandomState(3)
    k, dim, n = 8, 6, 40
    old = r.randn(k, dim)
    old /= np.linalg.norm(old, axis=1, keepdims=True)
    new = old + 1e-4 * r.randn(k, dim)          # everyone jitters, no movers
    new /= np.linalg.norm(new, axis=1, keepdims=True)
    emb = r.randn(n, dim)
    emb /= np.linalg.norm(emb, axis=1, keepdims=True)
    m0 = _members_df(spark, [(i, 1, None, None, emb[i].tolist(), None)
                             for i in range(n)])
    ids = list(range(k))
    seeded = corpus._remap_members(m0, ids, [v.tolist() for v in old], None)
    # sanity: margins from real scoring are >> the movement bound, so the
    # tier-1 condition holds for (almost) every row
    margins = [r_.assign_margin for r_ in seeded.collect()]
    theta_all = float(np.linalg.norm(old - new, axis=1).max())
    n_tier1 = sum(1 for m in margins if m is not None
                  and m > 2 * theta_all + 1e-5)
    assert n_tier1 >= n // 2, (n_tier1, theta_all)
    pruned = {r_.doc_id: r_ for r_ in corpus._remap_members(
        seeded, ids, [v.tolist() for v in new],
        [v.tolist() for v in old], big_movers=2).collect()}
    full = {r_.doc_id: r_ for r_ in corpus._remap_members(
        seeded.drop("assign_margin"), ids,
        [v.tolist() for v in new], None).collect()}
    for d in full:
        assert pruned[d].cluster_id == full[d].cluster_id, d
        assert pruned[d].centroid_sim == full[d].centroid_sim, d
        assert pruned[d].assign_margin <= full[d].assign_margin + 1e-12, d


def test_increment_stores_exact_margins_and_prunes(spark, tmp_path):
    """r12: after a recluster (state carries assign_margin), an
    increment's appended semantic members store the EXACT margin a full
    C-way scoring would (verified against numpy over the state codebook),
    and the NEXT pruned recluster is member-identical to a full-scoring
    twin run on a state copy whose increment margins are NULLed (the old
    full-score default) — increment margins change nothing but the flops."""
    import os
    import shutil

    sd = _drift_state(spark, tmp_path)
    corpus.corpus_recluster(spark, sd, n_centroids=4)    # populate margins

    # fresh-direction batch: unique texts, embeddings near dims 0..3
    docs, emb = _batch(
        spark, [(200 + d, _text(60 + d)) for d in range(6)],
        [(200 + d, _vec(d % 4, 200 + d)) for d in range(6)])
    v = {r.doc_id: r.drop_stage
         for r in corpus.corpus_increment(spark, docs, emb, sd, eps=EPS,
                                          jaccard_threshold=JAC).collect()}
    # unique texts -> never exact/near-dropped; semantic dups of existing
    # members still append as history rows WITH cluster + margin
    assert all(s in ("kept", "semantic") for s in v.values())

    mem = spark.read.parquet(os.path.join(sd, "members"))
    inc = {r.doc_id: r for r in
           mem.filter(F.col("doc_id") >= 200).collect()}
    assert len(inc) == 6
    cb = {r.centroid_id: np.asarray(r.embedding, dtype="float64")
          for r in spark.read.parquet(os.path.join(sd, "codebook"))
          .collect()}
    ids = sorted(cb)
    C = np.stack([cb[i] / np.linalg.norm(cb[i]) for i in ids])
    embs = {r.doc_id: np.asarray(r.embedding, dtype="float64")
            for r in emb.collect()}
    for d, row in inc.items():
        assert row.near_ok == 1 and row.assign_margin is not None, d
        x = embs[d] / np.linalg.norm(embs[d])
        sims = C @ x
        r6 = np.round(sims, 6)
        best = int(np.lexsort((ids, -r6))[0])     # rounded desc, id asc
        assert ids[best] == row.cluster_id, d
        others = np.delete(sims, best)
        exact = float(sims[best] - others.max())
        assert abs(row.assign_margin - exact) < 1e-9, d

    # pruning exactness: NULL the increment margins on a copy, recluster
    # both with a small big-mover set, members must be identical
    sd_null = str(tmp_path / "state_nullmargins")
    shutil.copytree(sd, sd_null)
    mp = os.path.join(sd_null, "members")
    m2 = (spark.read.parquet(mp)
          .withColumn("assign_margin",
                      F.when(F.col("doc_id") >= 200,
                             F.lit(None).cast("double"))
                       .otherwise(F.col("assign_margin")))
          .localCheckpoint(eager=True))
    shutil.rmtree(mp)
    m2.write.parquet(mp)
    corpus.corpus_recluster(spark, sd, n_centroids=4, big_movers=2)
    corpus.corpus_recluster(spark, sd_null, n_centroids=4, big_movers=2)
    a = {r.doc_id: (r.cluster_id, r.centroid_sim) for r in
         spark.read.parquet(os.path.join(sd, "members")).collect()}
    b = {r.doc_id: (r.cluster_id, r.centroid_sim) for r in
         spark.read.parquet(os.path.join(sd_null, "members")).collect()}
    assert a == b and len(a) >= 16
