"""Incremental corpus maintenance: stateful dedup of NEW document batches
against a persisted corpus state.

The batch pipeline (tools/pipeline_probe.py, PERF.md round-7) runs

    exact dedup -> MinHash/LSH near-dup -> SemDeDup

over a whole corpus at once.  A 100 TB training corpus is not rebuilt per
crawl — it GROWS, and re-running the batch pipeline over corpus + batch per
increment is O(corpus) work for O(batch) new data.  This module persists the
state each stage needs (content hashes, LSH band table, SemDeDup codebook +
cluster members) so an increment costs O(batch + candidates touched):

- ``corpus_init``: run the batch stages once, persist state.
- ``corpus_increment``: verdict every new doc (``exact`` / ``near_dup`` /
  ``semantic`` / ``kept``) against state + earlier batch members, then
  append the batch's members to state.  Every join is a band/cluster
  equi-join or a hash semi-join and there is NO driver collect.  What still
  touches state, precisely: the exact stage reads ONE column (content_hash)
  of the members table; the Jaccard refine reads texts only for candidate
  ids (semi-join-bounded); the semantic stage loads (id, sim, embedding) of
  the near_ok members of AFFECTED clusters — a batch spread over every
  cluster reads every member's embedding, but the pairwise kernel computes
  only new-vs-earlier rows, O(batch * cluster_size), never old-vs-old.
  The member read is COLUMN-PRUNED to {doc_id, cluster_id, centroid_sim,
  embedding} of near_ok rows in affected clusters — at 100 TB the embedding
  column dominates, so a batch spread across every cluster reads
  O(members x dim) bytes; that is the semantic stage's honest worst case.
  A per-cluster member cap would bound it but CHANGES verdicts (a new doc
  no longer compares against uncapped history) — deliberately not offered;
  the scale lever is C (more, smaller clusters at init/recluster time),
  which shrinks every cluster the batch touches without semantic drift.

Semantics vs the batch pipeline (documented contract, test-pinned):

- Exact + MinHash verdicts match the batch pipeline run on (corpus ∪
  batch) exactly, provided batch ids sort after corpus ids (the batch
  keep-rules are min-id-canonical / drop-the-greater-id, so "existing
  first" and "lower id first" coincide).
- SemDeDup is FIRST-COME-FIRST-KEPT: history is immutable, so every
  existing cluster member ranks before every new one.  Batch-on-union
  instead ranks ALL members by (centroid_sim ASC, id ASC) and could
  retroactively mark an EXISTING doc as the duplicate of a new one —
  impossible incrementally (the old doc may already be shipped in a
  training shard).  When new members happen to rank after existing ones
  (the common case), the two agree exactly; `test_corpus.py` pins both
  the agreement case and the defined divergence.
- Matching the batch kernel (`dedup.semantic_cluster_dedup`), comparisons
  run against ALL earlier-ranked cluster members — including ones that are
  themselves duplicates — on 6-dp-rounded cosines.

State layout under ``state_dir`` (all parquet, append-friendly):

- ``members``:  one row per exact-surviving doc ever seen —
  {doc_id, text, content_hash, near_ok, cluster_id, centroid_sim,
  is_dup, retained, embedding}.  MinHash-dropped members keep NULL
  cluster columns (they never entered the semantic stage, same as batch).
  After the first ``corpus_recluster`` the table also carries
  ``assign_margin`` (best-sim − second-best-sim from the member's last
  FULL codebook scoring; NULL on increment-appended rows) — the bound the
  margin-pruned incremental remap uses (see :func:`_remap_members`).
- ``bands``:    {doc_id, band_idx, band_hash} for every member (the LSH
  bucket table new batches join against).
- ``codebook``: {centroid_id, embedding} — train-once (the pipeline probe
  measured centroid training at 61% of batch wall; increments reuse it).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators import dedup
from ..semantics import NEAR_DUP_JACCARD


def _paths(state_dir: str) -> dict:
    return {k: os.path.join(state_dir, k)
            for k in ("members", "bands", "codebook", "meta", "drift")}


def _check_meta(spark: SparkSession, p: dict, *, eps, jaccard_threshold,
                hash_fn) -> None:
    """An increment under DIFFERENT parameters than the state was built with
    is silently wrong (an xxhash64 band never equals an md5 band -> zero
    near-dup candidates; a different eps changes which history suppressed
    what).  The init config persists beside the state as a 1-row parquet —
    Spark-IO like every other state table, so the guard works on hdfs://,
    s3a://, etc., not only the driver's local filesystem.  A MISSING meta
    raises too: corpus_init has always written it, so absence means the
    path is not a corpus state (or a partial write)."""
    row = _read_meta_row(spark, p["meta"])
    want = {"eps": float(eps), "jaccard_threshold": float(jaccard_threshold),
            "hash_fn": hash_fn}
    got = {"eps": row.eps, "jaccard_threshold": row.jaccard_threshold,
           "hash_fn": row.hash_fn}
    if got != want:
        raise ValueError(
            f"corpus_increment config {want} differs from the state's init "
            f"config {got} — increments must use the parameters the state "
            "was built with (or rebuild with corpus_init)")


def _read_meta_row(spark: SparkSession, meta_path: str):
    """The 1-row meta parquet, read WITHOUT a Spark job when the state dir is
    driver-local (pyarrow) — the meta check is on every increment's critical
    path and a Spark read costs a serial job + py4j round-trip (~0.3 s of a
    5 s sf0.1 increment).  Non-local schemes (hdfs://, s3a://) keep the
    Spark read; missing paths raise the same ValueError either way."""
    local = None
    if "://" not in meta_path:
        local = meta_path
    elif meta_path.startswith("file://"):
        local = meta_path[len("file://"):]
    if local is not None:
        if not os.path.isdir(local):
            raise ValueError(
                f"{meta_path} is missing — not a corpus_init state "
                "(or a partial/corrupt write); rebuild with corpus_init")
        import types

        import pyarrow.parquet as pq

        d = pq.read_table(local).to_pylist()[0]
        return types.SimpleNamespace(**d)
    try:
        return spark.read.parquet(meta_path).first()
    except Exception as e:
        if "PATH_NOT_FOUND" in str(e) or "Path does not exist" in str(e):
            raise ValueError(
                f"{meta_path} is missing — not a corpus_init state "
                "(or a partial/corrupt write); rebuild with corpus_init"
            ) from e
        raise


def _write_meta(spark: SparkSession, p: dict, *, eps, jaccard_threshold,
                hash_fn, base_n=None, base_mean_sim=None,
                base_p10_sim=None) -> None:
    spark.createDataFrame(
        [(float(eps), float(jaccard_threshold), hash_fn,
          None if base_n is None else int(base_n),
          None if base_mean_sim is None else float(base_mean_sim),
          None if base_p10_sim is None else float(base_p10_sim))],
        "eps double, jaccard_threshold double, hash_fn string, "
        "base_n long, base_mean_sim double, base_p10_sim double",
    ).coalesce(1).write.mode("overwrite").parquet(p["meta"])


def _sim_baseline(members_like: DataFrame):
    """(n, mean, p10) of centroid_sim over rows that entered the semantic
    stage — the codebook-fit distribution new increments are compared to."""
    row = (members_like.filter(F.col("centroid_sim").isNotNull())
           .agg(F.count("*").alias("n"),
                F.avg("centroid_sim").alias("m"),
                F.percentile_approx("centroid_sim", 0.1).alias("p10"))
           .first())
    if not row or not row["n"]:
        return 0, None, None
    return int(row["n"]), float(row["m"]), float(row["p10"])


def _replace_parquet(spark: SparkSession, path: str, df: DataFrame,
                     target_partitions: int | None = None,
                     expect_rows: int | None = None) -> int:
    """Rewrite a state table in place via write-to-sibling + FileSystem
    rename (Hadoop FS API — hdfs:// and s3a:// state dirs work like local
    paths).  NOT transactionally atomic (window between delete and rename;
    single-maintenance-owner contract, see corpus_compact)."""
    jvm = spark._jvm
    conf = spark._jsc.hadoopConfiguration()
    tmp = path + ".compacting"
    out = df.repartition(target_partitions) if target_partitions else df
    out.write.mode("overwrite").parquet(tmp)
    n_after = spark.read.parquet(tmp).count()
    if expect_rows is not None and n_after != expect_rows:
        raise RuntimeError(
            f"_replace_parquet: {path} rewrote {n_after} rows != "
            f"{expect_rows} — aborting before touching the original")
    jpath = jvm.org.apache.hadoop.fs.Path(path)
    jtmp = jvm.org.apache.hadoop.fs.Path(tmp)
    fs = jpath.getFileSystem(conf)
    fs.delete(jpath, True)
    if not fs.rename(jtmp, jpath):
        raise RuntimeError(
            f"_replace_parquet: rename {tmp} -> {path} failed; rewritten "
            "data is intact at the .compacting path — rename manually")
    return n_after


def _read_state(spark: SparkSession, path: str) -> DataFrame:
    """Parquet state read with the footer schema supplied explicitly when
    the dir is driver-local: ``spark.read.parquet()`` runs a schema-inference
    job per call, and corpus_increment opens three state tables on its
    critical path (~0.3 s of SERIAL job floor at sf0.1 for schemas pyarrow
    reads from one footer in microseconds).  Non-local schemes keep the
    plain Spark read."""
    local = None
    if "://" not in path:
        local = path
    elif path.startswith("file://"):
        local = path[len("file://"):]
    if local is not None and os.path.isdir(local):
        try:
            import pyarrow.parquet as pq
            from pyspark.sql.pandas.types import from_arrow_schema

            files = [f for f in os.listdir(local) if f.endswith(".parquet")]
            if files:
                sch = pq.ParquetFile(
                    os.path.join(local, sorted(files)[0])).schema_arrow
                return spark.read.schema(from_arrow_schema(sch)).parquet(path)
        except Exception:
            pass
    return spark.read.parquet(path)


def _check_alignment(docs: DataFrame, emb: DataFrame, id_col: str) -> None:
    """Every doc must have a non-NULL embedding row: a missing/NULL vector
    would silently skip the semantic stage (inner-join drop -> is_dup NULL ->
    verdict 'kept') while the stored member row gets retained=NULL — verdict
    and state disagreeing, and the doc invisible to all future semantic
    comparisons.  Bounded check: take(1) on the anti-join, like the OMO
    archive import's validation."""
    missing = (docs.select(F.col(id_col).alias("doc_id"))
               .join(emb.filter(F.col("embedding").isNotNull())
                     .select(F.col(id_col).alias("doc_id")),
                     "doc_id", "left_anti")
               .take(1))
    if missing:
        raise ValueError(
            f"doc_id {missing[0].doc_id!r} has no (non-NULL) embedding row — "
            "docs and embeddings must align 1:1 on the id column")


def _exact_survivors(docs: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """Min-id-canonical exact dedup within one frame (the
    ``dedup.exact_duplicates`` keep-rule, applied)."""
    hashed = docs.select(F.col(id_col).alias("doc_id"),
                         F.col(text_col).alias("text"),
                         F.md5(F.col(text_col)).alias("content_hash"))
    canon = hashed.groupBy("content_hash").agg(F.min("doc_id").alias("_c"))
    return (hashed.join(canon, "content_hash")
            .filter(F.col("doc_id") == F.col("_c")).drop("_c"))


def _near_drop_ids(pairs: DataFrame) -> DataFrame:
    """The batch keep-rule: drop the greater id of every qualifying pair
    (tools/pipeline_probe.py stage 2)."""
    return pairs.select(
        F.greatest("left_id", "right_id").alias("doc_id")).distinct()


def _semantic_member_schema(members_like: DataFrame):
    from pyspark.sql.types import (DoubleType, IntegerType, StructField,
                                   StructType)

    return StructType([
        StructField("doc_id", members_like.schema["doc_id"].dataType),
        StructField("cluster_id", members_like.schema["cluster_id"].dataType),
        StructField("centroid_sim", DoubleType()),
        StructField("is_dup", IntegerType()),
    ])


def _assign_clusters(new2: DataFrame, emb: DataFrame, codebook: DataFrame,
                     n_centroids_hint: int | None) -> DataFrame:
    """Nearest-centroid assignment with the house determinism rule —
    identical to `semantic_cluster_dedup`'s assignment (6-dp-rounded argmax,
    centroid-id-asc tie-break, self-match allowed).

    Also emits ``assign_margin`` (r12): chosen-centroid raw sim − max raw
    sim over the other kNN candidates.  The global runner-up is inside the
    k=8 candidate set by construction (it is the raw rank-1 or rank-2
    centroid), so this equals the margin a FULL C-way scoring would store
    — increment-appended members become prunable at the next
    ``corpus_recluster`` instead of carrying the NULL-margin full-score
    default (:func:`_remap_members`).  The window is per-doc over k
    candidate rows — bounded, not a content key.  A single-centroid
    codebook stores 2.0 like the remap kernel (pruning is disabled at
    small C anyway)."""
    from pyspark.sql import Window

    from ..operators.similarity import knn_join_auto

    vecs = (new2.select("doc_id")
            .join(emb.select(F.col("doc_id"), F.col("embedding")), "doc_id"))
    cand = knn_join_auto(
        vecs, codebook, 8, left_vec="embedding", right_vec="embedding",
        left_id="doc_id", right_id="centroid_id",
        approx_right_rows=n_centroids_hint, exclude_self=False)
    r6 = F.round(F.col("score"), 6)
    w = Window.partitionBy("left_id").orderBy(r6.desc(),
                                              F.col("right_id").asc())
    ranked = cand.withColumn("_rn", F.row_number().over(w))
    best = ranked.filter(F.col("_rn") == 1).select(
        F.col("left_id").alias("doc_id"),
        F.col("right_id").alias("cluster_id"),
        r6.alias("centroid_sim"),
        F.col("score").alias("_raw"))
    others = (ranked.filter(F.col("_rn") > 1)
              .groupBy(F.col("left_id").alias("doc_id"))
              .agg(F.max("score").alias("_omax")))
    return (best.join(others, "doc_id", "left")
            .select("doc_id", "cluster_id", "centroid_sim",
                    F.when(F.col("_omax").isNull(), F.lit(2.0))
                     .otherwise(F.col("_raw") - F.col("_omax"))
                     .alias("assign_margin")))


def _cap_band_buckets(bands: DataFrame, max_bucket: int,
                      keys=("band_idx", "band_hash")) -> DataFrame:
    """Drop band rows whose (band_idx, band_hash) bucket holds more than
    ``max_bucket`` docs BEFORE candidate pairing — the dedup.py:165
    mega-bucket guard, ported to the corpus band joins (r15: the 600k
    streaming-crawl probe ground to a halt on a wave of boilerplate
    near-identical pages — every doc in the same buckets, a quadratic
    candidate join).  Same recall trade as the batch op: docs whose
    EVERY band is a mega-bucket escape near-dedup (production LSH
    behavior); the bucket-size pass is one combinable groupBy."""
    keys = list(keys)
    ok = (bands.groupBy(*keys).agg(F.count("*").alias("_n"))
          .filter(F.col("_n") <= max_bucket).select(*keys))
    return bands.join(ok, keys, "left_semi")


def corpus_init(docs: DataFrame, emb: DataFrame, centroids: DataFrame,
                state_dir: str, *, eps: float,
                jaccard_threshold: float = NEAR_DUP_JACCARD,
                hash_fn: str = "md5", id_col: str = "doc_id",
                text_col: str = "text",
                max_bucket: int | None = None) -> dict:
    """Run the batch dedup stages over ``docs`` (+ aligned ``emb`` on
    ``doc_id``) and persist the corpus state.  ``centroids`` is the SemDeDup
    codebook {centroid_id, embedding} — train once (e.g.
    ``ann_index.train_centroids``), reuse across increments.

    Returns {"members": n, "retained": n}."""
    p = _paths(state_dir)
    _check_alignment(docs, emb, id_col)
    x = _exact_survivors(docs, id_col, text_col).localCheckpoint()

    # ONE signature pass: candidates self-join the same band table that
    # persists to state (minhash_near_duplicates would recompute the
    # shingle-explode + 16-hash signature stage — the dominant cost — a
    # second time), then the SHARED Jaccard refine keeps parity with the
    # batch op by construction
    bands = dedup.minhash_band_table(
        x, id_col="doc_id", text_col="text",
        hash_fn=hash_fn).localCheckpoint(eager=False)
    cbands = (_cap_band_buckets(bands, max_bucket)
              if max_bucket is not None else bands)
    cand = (cbands.alias("l")
            .join(cbands.alias("r"),
                  (F.col("l.band_idx") == F.col("r.band_idx"))
                  & (F.col("l.band_hash") == F.col("r.band_hash"))
                  & (F.col("l.id") < F.col("r.id")))
            .select(F.col("l.id").alias("left_id"),
                    F.col("r.id").alias("right_id"))
            .distinct())
    pairs = dedup.jaccard_pairs(x, cand, id_col="doc_id", text_col="text",
                                threshold=jaccard_threshold)
    near_drop = _near_drop_ids(pairs)
    docs2 = x.join(near_drop, "doc_id", "left_anti")

    sem = dedup.semantic_cluster_dedup(
        docs2.select("doc_id").join(
            emb.select(F.col(id_col).alias("doc_id"), "embedding"), "doc_id"),
        centroids, eps, id_col="doc_id", vec_col="embedding")

    members = (
        x.join(near_drop.withColumn("_nd", F.lit(1)), "doc_id", "left")
        .withColumn("near_ok", F.when(F.col("_nd").isNull(), 1).otherwise(0)
                    .cast("int")).drop("_nd")
        .join(sem.withColumnRenamed("id", "doc_id"), "doc_id", "left")
        .join(emb.select(F.col(id_col).alias("doc_id"), "embedding"),
              "doc_id", "left")
        .withColumn("retained",
                    ((F.col("near_ok") == 1)
                     & (F.col("is_dup") == 0)).cast("int"))
    )
    members.write.mode("overwrite").parquet(p["members"])
    bands.select(F.col("id").alias("doc_id"), "band_idx", "band_hash") \
         .write.mode("overwrite").parquet(p["bands"])
    centroids.write.mode("overwrite").parquet(p["codebook"])
    spark = docs.sparkSession
    # drift baseline: the codebook-fit distribution at init time — every
    # increment's new-member centroid_sim stats are compared against this
    bn, bm, bp = _sim_baseline(spark.read.parquet(p["members"]))
    _write_meta(spark, p, eps=eps, jaccard_threshold=jaccard_threshold,
                hash_fn=hash_fn, base_n=bn, base_mean_sim=bm, base_p10_sim=bp)

    row = (spark.read.parquet(p["members"])
           .agg(F.count("*").alias("n"),
                F.coalesce(F.sum("retained"), F.lit(0)).alias("r")).first())
    return {"members": row["n"], "retained": int(row["r"])}


def corpus_increment(spark: SparkSession, new_docs: DataFrame,
                     new_emb: DataFrame, state_dir: str, *, eps: float,
                     jaccard_threshold: float = NEAR_DUP_JACCARD,
                     hash_fn: str = "md5", id_col: str = "doc_id",
                     text_col: str = "text",
                     update_state: bool = True,
                     max_bucket: int | None = None) -> DataFrame:
    """Verdict every new doc against the persisted corpus state + earlier
    members of the SAME batch, then (``update_state``) append the batch to
    state.  Returns one row per input doc:

        {doc_id, drop_stage ('exact'|'near_dup'|'semantic'|'kept'),
         retained, cluster_id, centroid_sim}

    cluster columns are NULL for docs dropped before the semantic stage.
    Stage semantics are the batch pipeline's keep-rules with immutable
    history (module docstring)."""
    p = _paths(state_dir)
    _check_meta(spark, p, eps=eps, jaccard_threshold=jaccard_threshold,
                hash_fn=hash_fn)
    # _check_alignment (a take(1) job, ~0.2 s) runs on a lane of the thread
    # pool below instead of blocking the build serially (r11); its result
    # is joined before any verdict is assembled, and the update path's
    # state appends happen far after that barrier, so a misaligned input
    # still raises before anything is written.
    # Lineage cuts on the multiply-consumed frames (new_x x4, new_bands x2,
    # near_drop x3): measured, removing them makes a read-only sf0.1
    # increment 64% SLOWER (6.1 -> 10.0 s) because Catalyst's exchange
    # reuse does not dedupe the column-pruned variants of the shared
    # subtrees and the kNN assignment chain recomputes three times.  `sem`
    # alone is conditional: consumed once when update_state=False.
    #
    # r11 perf archaeology (VERDICT r9 task 3): two one-action variants —
    # lazy .persist() marks, and AQE-off truly-lazy checkpoints — were
    # built and measured SLOWER than the threaded checkpoints (5.3 s and
    # 4.3 s vs 3.3 s warm sf0.1): AQE materializes cached/broadcast stages
    # one at a time, and without AQE every tiny shuffle pays the full
    # static 32-partition task overhead.  What actually cuts the floor is
    # a dependency-true LANE layout of the same checkpoints (below): the
    # alignment take(1) and the assignment chain overlap the band/refine
    # critical path instead of pairing with it.
    _ck = lambda df: df.localCheckpoint(eager=False)
    _ck_sem = _ck if update_state else (lambda df: df)
    # no distinct(): right-side duplicates cannot change an anti-join's
    # result, and the dedup shuffle is a whole extra AQE barrier
    batch_ids = new_docs.select(F.col(id_col).alias("doc_id"))
    # REPLAY SAFETY (the foreachBatch at-least-once contract): exclude THIS
    # batch's doc_ids from every state view, so re-running an increment whose
    # previous attempt already (partially) appended reproduces the original
    # verdicts instead of classifying everything 'exact' against its own
    # half-written rows; the state appends below anti-join for the same
    # reason.  Requires globally unique doc_ids across batches — already the
    # contract (state is keyed on doc_id).
    members = _read_state(spark, p["members"]) \
        .join(batch_ids, "doc_id", "left_anti")
    state_bands = _read_state(spark, p["bands"]) \
        .join(batch_ids, "doc_id", "left_anti")
    codebook = _read_state(spark, p["codebook"])

    # -- exact + MinHash run as PARALLEL branches against state (round-8,
    # VERDICT r7 task 5): bands are computed from the batch-LOCAL exact
    # canonicals (batch_canon) instead of new_x, so the band stage no longer
    # waits on the exact stage's state scan.  Semantics are unchanged:
    # a state-exact-dropped doc's bands equal its state twin's bands (same
    # text), so (a) as a RIGHT partner it is redundant with the twin already
    # in r_old, and (b) as a LEFT doc its refine pairs vanish (no text in
    # right_src) and the verdict precedence marks it 'exact' first anyway;
    # within-batch dropped twins always have a HIGHER id than their keeper,
    # so any pair they could witness is witnessed by the keeper too.
    # Pinned by the batch-parity and replay tests.
    # batch_canon deliberately NOT checkpointed: its two consumers each
    # recompute a batch-LOCAL groupBy (cheap), and skipping the lineage cut
    # removes one serial materialization barrier from the critical path
    batch_canon = _exact_survivors(new_docs, id_col, text_col)
    # ROUND-9: localCheckpoint(eager=False) is NOT free at build time —
    # translating the plan to an RDD finalizes every AQE query stage, so
    # each checkpoint runs its upstream shuffles as jobs DURING construction
    # and consecutive checkpoints serialize (measured: the four checkpoints
    # were ~0.9 s each of the read-only increment's 4.2 s build at sf0.1).
    # Independent checkpoints therefore materialize on driver THREADS.
    # ROUND-11 lane layout (dependency-true, replacing the r9 two-by-two
    # pairs): serial walls measured at sf0.1 are new_x 0.21, new_bands
    # 0.89, near_drop 0.87, assign 0.67, alignment take(1) 0.22 — so the
    # lanes are (alignment) | (new_x -> assign) | (new_bands), with the
    # candidate/refine plan built and near_drop checkpointed on the MAIN
    # thread as soon as new_x and new_bands land; the assignment chain and
    # the alignment check fully overlap the band->refine critical path.
    # At cluster scale the scheduler interleaves all lanes' stages across
    # the same executor pool (no cost); at toy scale this collapses the
    # py4j/AQE-barrier floor the r7-r9 verdicts kept flagging.
    from concurrent.futures import ThreadPoolExecutor

    n_cents_hint = None
    # members.content_hash is UNIQUE by construction (members are exact
    # survivors: init keeps one doc per hash, increments only append hashes
    # the state has never seen) — no distinct, which at scale is a full
    # aggregation shuffle of the state's hash column per increment
    _tp = ThreadPoolExecutor(4)
    try:
        _fal = _tp.submit(_check_alignment, new_docs, new_emb, id_col)
        _fx = _tp.submit(lambda: _ck(
            batch_canon.join(members.select("content_hash"),
                             "content_hash", "left_anti")))
        _fb = _tp.submit(lambda: _ck(dedup.minhash_band_table(
            batch_canon, id_col="doc_id", text_col="text", hash_fn=hash_fn)))
        # assignment lane: blocks on new_x, then checkpoints the kNN
        # assignment — nearest-centroid assignment is a pure per-doc
        # function (r9), so computing it for docs the near-dup stage will
        # drop changes nothing; the anti-join applies after both lanes land
        _fa = _tp.submit(lambda: _ck(_assign_clusters(
            _fx.result().select("doc_id"),
            new_emb.select(F.col(id_col).alias("doc_id"), "embedding"),
            codebook, n_cents_hint)))
        new_x, new_bands = _fx.result(), _fb.result()
    except BaseException:
        _tp.shutdown(wait=True)
        raise
    r_old = state_bands.select("band_idx", "band_hash",
                               F.col("doc_id").alias("r_id"),
                               F.lit(0).alias("r_new"))
    r_new = new_bands.select("band_idx", "band_hash",
                             F.col("id").alias("r_id"),
                             F.lit(1).alias("r_new"))
    r_all = r_old.unionByName(r_new)
    l_bands = new_bands
    if max_bucket is not None:
        # mega-bucket guard (r15): occupancy counted over state ∪ batch —
        # the join's true bucket population; both sides prune to the
        # allowed keys (same recall trade as dedup.minhash_candidate_pairs)
        ok = (r_all.groupBy("band_idx", "band_hash")
              .agg(F.count("*").alias("_n"))
              .filter(F.col("_n") <= max_bucket)
              .select("band_idx", "band_hash"))
        r_all = r_all.join(ok, ["band_idx", "band_hash"], "left_semi")
        l_bands = new_bands.join(ok, ["band_idx", "band_hash"],
                                 "left_semi")
    cand = (l_bands.alias("l")
            .join(r_all.alias("r"),
                  (F.col("l.band_idx") == F.col("r.band_idx"))
                  & (F.col("l.band_hash") == F.col("r.band_hash"))
                  & ((F.col("r.r_new") == 0)
                     | (F.col("r.r_id") < F.col("l.id"))))
            .select(F.col("l.id").alias("left_id"),
                    F.col("r.r_id").alias("right_id"),
                    F.col("r.r_new").alias("r_new"))
            .distinct())
    # Jaccard refine: the SHARED batch refine (dedup.jaccard_pairs — the
    # increment's batch-parity contract depends on the two refines staying
    # bit-identical), fed texts ONLY for candidate ids (semi-join-bounded);
    # every left_id's text is in new_x, which is part of right_src
    right_src = (members.select("doc_id", "text")
                 .join(cand.filter(F.col("r_new") == 0)
                       .select(F.col("right_id").alias("doc_id")).distinct(),
                       "doc_id", "left_semi")
                 .unionByName(new_x.select("doc_id", "text")))
    refined = dedup.jaccard_pairs(
        right_src, cand.select("left_id", "right_id"),
        id_col="doc_id", text_col="text", threshold=jaccard_threshold)

    # -- SemDeDup, first-come-first-kept: new members compare against ALL
    # existing near_ok members of their cluster (even is_dup=1 ones — the
    # batch kernel compares against every earlier-ranked row) and against
    # earlier-ranked batch members; only clusters the batch touches load.
    # no count() action: knn_join_auto routes on parquet plan statistics,
    # and a codebook is broadcast-sized by construction.
    # near_drop checkpoints on the MAIN thread while the assignment lane
    # (checkpointed because assign feeds BOTH `affected` and `new_m` —
    # without the lineage cut the kNN join recomputes per consumer) and
    # the alignment lane run; joining the lanes here keeps the r9
    # contract: the anti-join applies only after both branches land, and
    # no verdict/state work starts before the alignment check passed.
    try:
        near_drop = _ck(
            refined.select(F.col("left_id").alias("doc_id")).distinct())
        try:
            assign_all = _fa.result()
        except Exception:
            # a misaligned batch (doc without embedding) can crash the kNN
            # kernel before the alignment lane reports — surface the
            # contract's ValueError preferentially, else re-raise
            _fal.result()
            raise
        _fal.result()
    finally:
        _tp.shutdown(wait=True)
    assign = assign_all.join(near_drop, "doc_id", "left_anti")
    affected = assign.select("cluster_id").distinct()
    old_m = (members.filter(F.col("near_ok") == 1)
             .join(affected, "cluster_id", "left_semi")
             .select("doc_id", "cluster_id", "centroid_sim", "embedding",
                     F.lit(1).alias("_old")))
    new_m = (assign.join(new_emb.select(F.col(id_col).alias("doc_id"),
                                        "embedding"), "doc_id")
             .select("doc_id", "cluster_id", "centroid_sim", "embedding",
                     F.lit(0).alias("_old")))
    both = old_m.unionByName(new_m)

    import pandas as pd

    def _verdict_cluster(key: tuple, pdf: pd.DataFrame) -> pd.DataFrame:
        import numpy as np

        # history first (order among olds is irrelevant — their verdicts are
        # not re-emitted), then batch rows by the batch kernel's
        # (centroid_sim ASC, id ASC)
        pdf = pdf.sort_values(["_old", "centroid_sim", "doc_id"],
                              kind="mergesort",
                              ascending=[False, True, True]) \
                 .reset_index(drop=True)
        mat = np.asarray([np.asarray(v, dtype="float64")
                          for v in pdf["embedding"]])
        norms = np.linalg.norm(mat, axis=1, keepdims=True)
        norms[norms == 0] = 1.0
        mat = mat / norms
        n = len(pdf)
        n_old = int((pdf["_old"] == 1).sum())
        is_dup = np.zeros(n, dtype="int32")
        slice_rows = max(1, 2_000_000 // max(n, 1))
        for lo in range(n_old, n, slice_rows):
            hi = min(lo + slice_rows, n)
            scores = np.round(mat[lo:hi] @ mat[:hi].T, 6)
            for off in range(hi - lo):
                i = lo + off
                if i > 0 and (scores[off, :i] >= eps).any():
                    is_dup[i] = 1
        keep = pdf["_old"] == 0
        return pd.DataFrame({
            "doc_id": pdf["doc_id"][keep],
            "cluster_id": pdf["cluster_id"][keep],
            "centroid_sim": pdf["centroid_sim"][keep],
            "is_dup": is_dup[keep.to_numpy()],
        })

    sem = _ck_sem(both.groupBy("cluster_id").applyInPandas(
        _verdict_cluster, _semantic_member_schema(both)))

    # -- assemble verdicts over the FULL input batch
    base = new_docs.select(F.col(id_col).alias("doc_id"))
    verdict = (
        base
        .join(new_x.select("doc_id", F.lit(1).alias("_x")), "doc_id", "left")
        .join(near_drop.select("doc_id", F.lit(1).alias("_nd")),
              "doc_id", "left")
        .join(sem, "doc_id", "left")
        .withColumn("drop_stage",
                    F.when(F.col("_x").isNull(), "exact")
                    .when(F.col("_nd") == 1, "near_dup")
                    .when(F.col("is_dup") == 1, "semantic")
                    .otherwise("kept"))
        .withColumn("retained",
                    (F.col("drop_stage") == "kept").cast("int"))
        .select("doc_id", "drop_stage", "retained", "cluster_id",
                "centroid_sim")
    )

    if update_state:
        verdict = verdict.localCheckpoint()  # stamp before state mutates
        # idempotent appends: rows a crashed previous attempt already wrote
        # drop out (paired with the state-view exclusion above, a replayed
        # batch converges to exactly-once state regardless of where the
        # prior attempt died)
        # r9: the members and bands appends target DIFFERENT tables with no
        # cross-dependency — build + materialize + append each on its own
        # driver thread (same rationale as the read-path thread pairs above)
        def _append_members():
            already_m = _read_state(spark, p["members"]).select("doc_id")
            new_members = (
                new_x
                .join(near_drop.withColumn("_nd", F.lit(1)), "doc_id", "left")
                .withColumn("near_ok",
                            F.when(F.col("_nd").isNull(), 1).otherwise(0)
                            .cast("int")).drop("_nd")
                .join(sem, "doc_id", "left")
                .join(new_emb.select(F.col(id_col).alias("doc_id"),
                                     "embedding"), "doc_id", "left")
                .withColumn("retained",
                            ((F.col("near_ok") == 1)
                             & (F.col("is_dup") == 0)).cast("int"))
                .join(already_m, "doc_id", "left_anti")
            )
            # r12: post-recluster states carry assign_margin; the
            # increment's kNN second-best IS the global second-best (the
            # runner-up is inside the k=8 set), so appended members store
            # the exact margin and become prunable at the next recluster
            # instead of full-scoring (near-dropped rows stay NULL —
            # cluster columns are NULL for them anyway).  Pre-recluster
            # states have no margin column and the select below drops it.
            if "assign_margin" in members.columns:
                new_members = new_members.join(
                    assign.select("doc_id", "assign_margin"),
                    "doc_id", "left")
            for f in members.schema.fields:
                if f.name not in new_members.columns:
                    new_members = new_members.withColumn(
                        f.name, F.lit(None).cast(f.dataType))
            new_members = (
                new_members
                .select(*members.columns)
                # materialize BEFORE the append: the frame reads the same
                # path it is about to write, and a lazy plan would scan
                # mid-append
                .localCheckpoint(eager=True)
            )
            new_members.write.mode("append").parquet(p["members"])

        def _append_bands():
            already_b = _read_state(spark, p["bands"]) \
                .select("doc_id").distinct()
            band_rows = (new_bands
                         .select(F.col("id").alias("doc_id"), "band_idx",
                                 "band_hash")
                         # candidate generation runs on batch_canon bands
                         # (the parallel-branch shape), but STATE keeps bands
                         # only for member rows (new_x): a batch doc dropped
                         # as an exact dup of an existing member duplicates
                         # its twin's bands, and persisting those would grow
                         # the bands table with TOTAL input instead of
                         # retained members on duplicate-heavy streams
                         .join(new_x.select("doc_id"), "doc_id", "left_semi")
                         .join(already_b, "doc_id", "left_anti")
                         .localCheckpoint(eager=True))
            band_rows.write.mode("append").parquet(p["bands"])

        with ThreadPoolExecutor(2) as _tp:
            _fm = _tp.submit(_append_members)
            _fb2 = _tp.submit(_append_bands)
            _fm.result(), _fb2.result()
        # drift signal: this increment's codebook-fit stats.  ONE agg over
        # the already-materialized sem checkpoint (0.2 s measured), and the
        # row lands via a DRIVER-SIDE pyarrow write when the state dir is
        # local — a Spark write job for 1 KB pays the full commit protocol
        # and, under the IO pressure a 600k increment generates, measured
        # ~5 s of the increment's wall.  The filename is a batch fingerprint
        # (bit_xor of the semantic entrants' id hashes), so a REPLAYED
        # increment overwrites its own row instead of duplicating drift
        # history — the same idempotence contract as the state appends.
        row = sem.agg(
            F.count(F.when(F.col("centroid_sim").isNotNull(), 1)).alias("n"),
            F.avg("centroid_sim").alias("m"),
            F.percentile_approx("centroid_sim", 0.1).alias("p10"),
            F.expr("bit_xor(xxhash64(cast(doc_id as string)))").alias("fp"),
        ).first()
        n = int(row["n"] or 0)
        m = None if row["m"] is None else float(row["m"])
        p10 = None if row["p10"] is None else float(row["p10"])
        fp = int(row["fp"] or 0) & ((1 << 64) - 1)
        dp = p["drift"]
        local = (dp if "://" not in dp
                 else dp[len("file://"):] if dp.startswith("file://")
                 else None)
        if local is not None:
            import pyarrow as pa
            import pyarrow.parquet as pq

            os.makedirs(local, exist_ok=True)
            fname = os.path.join(local, f"drift-{fp:016x}.parquet")
            # seq must stay unique + monotone under replay: a REPLAYED
            # increment keeps its file's ORIGINAL seq (overwrite-in-place);
            # a new increment takes max(existing seq)+1 — a row-count seq
            # would duplicate and inflate seqs when an old increment
            # re-fires after later ones already wrote
            seq = 1
            try:
                if os.path.exists(fname):
                    seq = int(pq.read_table(fname, columns=["seq"])
                              .column("seq")[0].as_py())
                else:
                    others = [f for f in os.listdir(local)
                              if f.endswith(".parquet")
                              and f != os.path.basename(fname)]
                    if others:
                        prev = pq.ParquetDataset(
                            [os.path.join(local, f) for f in others]
                        ).read(columns=["seq"]).column("seq").to_pylist()
                        seq = max(prev) + 1
            except Exception:
                seq = 1
            pq.write_table(pa.table({
                "seq": pa.array([seq], pa.int64()),
                "n": pa.array([n], pa.int64()),
                "mean_sim": pa.array([m], pa.float64()),
                "p10_sim": pa.array([p10], pa.float64()),
            }), fname)
        else:
            # object-store state dirs: Spark append (replay caveat: a
            # replayed increment appends a duplicate stats row — harmless
            # for the n-weighted window, documented)
            try:
                seq = spark.read.parquet(dp).count() + 1
            except Exception:
                seq = 1
            spark.createDataFrame(
                [(int(seq), n, m, p10)],
                "seq long, n long, mean_sim double, p10_sim double",
            ).coalesce(1).write.mode("append").parquet(dp)
    return verdict


def corpus_drift_status(spark: SparkSession, state_dir: str, *,
                        window: int = 3, mean_drop: float = 0.05,
                        p10_drop: float = 0.08) -> dict:
    """Codebook drift signal for incremental corpus maintenance: the state's
    codebook is trained once, so on a drifting crawl (new languages/domains)
    nearest-centroid assignment degrades SILENTLY — new members land far from
    every centroid and SemDeDup's cluster scoping loses power.  Each
    increment appends its new members' centroid_sim stats to the ``drift``
    state table; this compares the last ``window`` increments (n-weighted
    pool) against the init baseline persisted in meta.

    Returns {drifted, baseline_mean, baseline_p10, recent_mean, recent_p10,
    recent_n, increments}; ``drifted`` is True when the pooled recent mean
    fell more than ``mean_drop`` below baseline OR the pooled p10 fell more
    than ``p10_drop``.  When it trips, retrain and remap with
    :func:`corpus_recluster`."""
    p = _paths(state_dir)
    meta = spark.read.parquet(p["meta"]).first()
    base_mean = getattr(meta, "base_mean_sim", None)
    base_p10 = getattr(meta, "base_p10_sim", None)
    out = {"drifted": False, "baseline_mean": base_mean,
           "baseline_p10": base_p10, "recent_mean": None,
           "recent_p10": None, "recent_n": 0, "increments": 0}
    try:
        drift = spark.read.parquet(p["drift"])
    except Exception:
        return out    # pre-drift-era state or no increments yet
    # n==0 rows (increments with no semantic entrants) are excluded BEFORE
    # the window limit so the pool always spans `window` informative
    # increments; filtering after the limit would silently shrink it
    rows = (drift.filter(F.col("n") > 0)
            .orderBy(F.col("seq").desc()).limit(window)
            .agg(F.sum("n").alias("n"),
                 (F.sum(F.col("mean_sim") * F.col("n")) / F.sum("n"))
                 .alias("m"),
                 (F.sum(F.col("p10_sim") * F.col("n")) / F.sum("n"))
                 .alias("p10")).first())
    out["increments"] = drift.count()
    if not rows or not rows["n"]:
        return out
    out["recent_n"] = int(rows["n"])
    out["recent_mean"] = float(rows["m"])
    out["recent_p10"] = float(rows["p10"])
    if base_mean is not None and out["recent_mean"] < base_mean - mean_drop:
        out["drifted"] = True
    if base_p10 is not None and out["recent_p10"] < base_p10 - p10_drop:
        out["drifted"] = True
    return out


def _remap_members(members: DataFrame, cent_ids: list[int],
                   new_cents: list[list[float]],
                   old_cents: list[list[float]] | None,
                   big_movers: int = 64) -> DataFrame:
    """ONE-pass member remap for :func:`corpus_recluster`: re-derive every
    semantic member's (cluster_id, centroid_sim, assign_margin) under a new
    codebook as a scan-side ``mapInPandas`` kernel — the codebook (C x dim
    doubles, KBs) rides a closure broadcast and the members table never
    shuffles (the previous shape computed assignments via a kNN join and
    paid a doc_id join of two member-sized sides per recluster).

    **Margin-pruned incremental scoring (round-10).**  ``assign_margin`` is
    the gap best-sim − second-best-sim from the member's LAST full scoring.
    With per-slot centroid movement (chord) ``d_i = ||old_i − new_i||``
    (``old_cents`` aligned to ``cent_ids`` positions — the warm-refine path,
    where slots are stable) and the top-``big_movers`` movers M scored
    explicitly, a member of cluster c whose margin exceeds
    ``d_c + θ + slack`` (θ = the largest movement OUTSIDE M) cannot flip to
    any unscored centroid:

        sim(x, m_new) ≤ sim(x, m_old) + d_m ≤ (s − margin) + θ
                      <  s − d_c ≤ sim(x, c_new)      for every m ∉ M ∪ {c}

    so its new assignment is the house argmax over just {c} ∪ M —
    O(|M|·dim) instead of O(C·dim) flops.  **Tier-1 (round-11,
    delta-scoped):** a margin that clears ``d_c + θ_all + slack`` with
    ``θ_all`` the LARGEST movement of any centroid proves no centroid at
    all — big movers included — can beat the member's own, so the row
    refreshes only its own sim (ONE gather dot, O(dim)); its margin
    shrinks by the same conservative rule with θ_all in place of θ.
    Members below the bounds (or with
    NULL margin — states older than this column, and increment-appended
    rows, which never store one) take the full C-way argmax, which also
    refreshes their margin.  ``slack`` (1e-5) absorbs the 6-dp rounding
    grid, so a pruned member's decision NEVER lands on a rounding tie with
    an unscored centroid — pruned and full scoring are test-pinned
    identical.  Pruned rows store a conservatively SHRUNK margin (an
    unscored centroid may now be the true runner-up: second-best ≤
    max(scored second, s − margin + θ)), keeping the bound exact across
    repeated reclusters.

    House rule throughout = ``similarity.best_rounded_match``: rank on the
    6-dp-rounded sim, centroid-id-asc tie-break, store the ROUNDED sim.
    (Rounding here is ``np.round`` — HALF_EVEN — like the semantic verdict
    kernel ``_verdict_cluster``, vs Spark's HALF_UP in the column form; the
    two differ only on exact .5-at-the-7th-decimal cosines, which float64
    dot products of real embeddings do not produce.)
    Rows that never entered the semantic stage (no embedding / near_ok != 1)
    pass through with NULL cluster columns, exactly like the join form.
    ``old_cents`` None (or a k mismatch) disables pruning — every semantic
    row full-scores, which is the first-recluster / legacy-state /
    cold-retrain path (still the no-shuffle kernel)."""
    import numpy as np
    import pandas as pd

    cols = [c for c in members.columns if c != "assign_margin"]
    out_cols = cols + ["assign_margin"]
    if "assign_margin" not in members.columns:
        members = members.withColumn("assign_margin",
                                     F.lit(None).cast("double"))
    members = members.select(*out_cols)
    schema = members.schema

    ids = np.asarray(cent_ids, dtype=np.int64)
    order = np.argsort(ids)
    ids = ids[order]
    C = np.asarray(new_cents, dtype="float64")[order]
    Cn = C / np.maximum(np.linalg.norm(C, axis=1, keepdims=True), 1e-300)
    k = Cn.shape[0]
    SLACK = 1e-5
    if old_cents is not None and len(old_cents) == k and k > big_movers + 1:
        O = np.asarray(old_cents, dtype="float64")[order]
        On = O / np.maximum(np.linalg.norm(O, axis=1, keepdims=True), 1e-300)
        move = np.linalg.norm(On - Cn, axis=1)          # chord distance
        msort = np.argsort(-move)
        big = np.sort(msort[:big_movers])                # positions
        theta = float(move[msort[big_movers]])
        # r11 delta-scoped tier: a margin that clears the LARGEST movement
        # of ANY centroid (+ own + slack) proves no centroid at all —
        # big movers included — can beat the member's own, so its remap is
        # ONE own-dot (sim refresh) instead of the |M|-wide argmax
        theta_all = float(move[msort[0]])
        d_pos = move
    else:
        big = np.arange(k)                               # prune disabled
        theta = float("inf")
        theta_all = float("inf")
        d_pos = np.zeros(k)

    ci = out_cols.index("cluster_id")
    si = out_cols.index("centroid_sim")
    mi = out_cols.index("assign_margin")
    ei = out_cols.index("embedding")
    ni = out_cols.index("near_ok")

    def _house_pick(sims: np.ndarray, ids_mat: np.ndarray):
        """Vectorized house rule over per-row candidate sets: rank on the
        6-dp-ROUNDED sim, centroid-id-asc tie-break.  ``sims`` n x m raw
        sims, ``ids_mat`` n x m candidate ids (duplicate ids allowed — both
        columns denote the same centroid).  Returns (best id, ROUNDED best
        sim, best raw sim, second-best raw sim over OTHER centroids)."""
        r = np.round(sims, 6)
        best_val = r.max(axis=1)
        tie = r == best_val[:, None]
        big_id = np.iinfo(np.int64).max
        best_id = np.where(tie, ids_mat, big_id).min(axis=1)
        chosen = ids_mat == best_id[:, None]
        b_raw = np.where(chosen, sims, -np.inf).max(axis=1)
        second = np.where(chosen, -np.inf, sims).max(axis=1)
        return best_id, best_val, b_raw, second

    def kernel(batches):
        for pdf in batches:
            if len(pdf) == 0:
                continue
            emb_ok = np.fromiter((v is not None for v in pdf.iloc[:, ei]),
                                 dtype=bool, count=len(pdf))
            sem = (pdf.iloc[:, ni].to_numpy(dtype="float64", na_value=0.0)
                   == 1) & emb_ok
            col_ci = pdf.iloc[:, ci].to_numpy(dtype="float64",
                                              na_value=np.nan).copy()
            col_si = pdf.iloc[:, si].to_numpy(dtype="float64",
                                              na_value=np.nan).copy()
            col_mi = pdf.iloc[:, mi].to_numpy(dtype="float64",
                                              na_value=np.nan).copy()
            col_ci[~sem] = np.nan
            col_si[~sem] = np.nan
            col_mi[~sem] = np.nan
            if sem.any():
                X = np.asarray([np.asarray(v, dtype="float64")
                                for v in pdf.iloc[:, ei][sem]])
                nr = np.linalg.norm(X, axis=1, keepdims=True)
                nr[nr == 0] = 1.0
                X = X / nr
                n = X.shape[0]
                old_cid = col_ci[sem]
                old_sim = col_si[sem]
                old_mrg = col_mi[sem]
                have = ~np.isnan(old_cid)
                # old cid -> POSITION in the (sorted) id/matrix space; a cid
                # the new codebook does not know full-scores
                pos = np.searchsorted(
                    ids, np.where(have, old_cid, ids[0]).astype(np.int64))
                pos = np.clip(pos, 0, k - 1)
                have = have & (ids[pos] == np.where(
                    have, old_cid, ids[0]).astype(np.int64))
                full = (~have) | np.isnan(old_mrg) | np.isnan(old_sim) | (
                    old_mrg <= d_pos[pos] + theta + SLACK)
                cid = np.empty(n)
                simv = np.empty(n)
                mrg = np.empty(n)
                if full.any():
                    S = X[full] @ Cn.T
                    ids_mat = np.broadcast_to(ids, S.shape)
                    b_id, b_sim, b_raw, b_sec = _house_pick(S, ids_mat)
                    cid[full], simv[full] = b_id, b_sim
                    mrg[full] = (b_raw - b_sec) if k > 1 else 2.0
                pr = ~full
                # r11 tier-1: margin clears even the largest mover — the
                # member provably keeps its cluster (strictly, beyond the
                # rounding grid: margin − d_c − θ_all > SLACK > 2·5e-7),
                # so only its OWN sim refreshes: one gather dot per row
                t1 = pr & (old_mrg > d_pos[pos] + theta_all + SLACK)
                if t1.any():
                    own_pos = pos[t1]
                    s_own = np.einsum("ij,ij->i", X[t1], Cn[own_pos])
                    cid[t1] = ids[own_pos]
                    simv[t1] = np.round(s_own, 6)
                    # every other centroid is unscored: second-best ≤
                    # s_old(+rounding) − margin + θ_all
                    bound_sec = old_sim[t1] + 5e-7 - old_mrg[t1] + theta_all
                    mrg[t1] = np.maximum(0.0, s_own - bound_sec)
                pr = pr & ~t1
                if pr.any():
                    own_pos = pos[pr]
                    n_pr = int(pr.sum())
                    # candidates per row: the fixed big-mover set + the
                    # row's OWN centroid (one gather dot) — O(|M|·dim) flops
                    S_big = X[pr] @ Cn[big].T
                    s_own = np.einsum("ij,ij->i", X[pr], Cn[own_pos])
                    S = np.concatenate([S_big, s_own[:, None]], axis=1)
                    ids_mat = np.concatenate(
                        [np.broadcast_to(ids[big], (n_pr, len(big))),
                         ids[own_pos][:, None]], axis=1)
                    b_id, b_sim, b_raw, b_sec = _house_pick(S, ids_mat)
                    cid[pr], simv[pr] = b_id, b_sim
                    # an unscored centroid may be the true runner-up:
                    # sim ≤ s_old(+rounding) − margin + θ
                    bound_sec = np.maximum(
                        b_sec, old_sim[pr] + 5e-7 - old_mrg[pr] + theta)
                    mrg[pr] = np.maximum(0.0, b_raw - bound_sec)
                rows = np.nonzero(sem)[0]
                col_ci[rows] = cid
                col_si[rows] = simv
                col_mi[rows] = mrg
            out = pdf.copy()
            out.isetitem(ci, col_ci)
            out.isetitem(si, col_si)
            out.isetitem(mi, col_mi)
            yield out

    return members.mapInPandas(kernel, schema)


def corpus_recluster(spark: SparkSession, state_dir: str,
                     centroids: DataFrame | None = None, *,
                     n_centroids: int | None = None,
                     warm_start: bool = True, big_movers: int = 64) -> dict:
    """Retrain/replace the SemDeDup codebook and remap every member's
    cluster assignment WITHOUT invalidating verdict history — the
    recluster path :func:`corpus_drift_status` points at.

    ``centroids`` is the new codebook {centroid_id, embedding}; when None it
    is retrained from the state's own near_ok member embeddings — by default
    WARM-STARTED from the existing codebook (``ann_index.refine_centroids``:
    seeded Lloyd's with a movement-< tol stop, centroid slots stable), which
    on drifted-but-overlapping corpora converges in a few one-job iterations
    instead of a cold ``train_centroids(n_centroids)`` run; the cold path
    runs when ``warm_start=False``, when ``n_centroids`` differs from the
    existing k, or when no codebook is readable.  Every member that entered
    the semantic stage (near_ok == 1, embedding present) is reassigned by
    the house rule (6-dp-rounded argmax, id-asc tie-break); cluster_id and
    centroid_sim are REWRITTEN, is_dup / retained are NOT — verdicts were
    acted on (docs shipped into training shards), so history stays
    immutable, exactly like the first-come-first-kept contract.  The caveat
    transfers across the remap: a fresh corpus_init on the union under the
    new codebook could verdict differently wherever old members now rank
    AFTER newer ones in their new cluster; subsequent INCREMENTS agree with
    fresh-init wherever existing members rank first (test-pinned both
    ways).  The drift baseline resets to the post-remap distribution and
    the drift history clears.

    **Remap shape (round-10).**  The reassignment is ONE scan-side
    ``mapInPandas`` kernel over members (:func:`_remap_members` — codebook
    broadcast, no doc_id join, no shuffle), margin-pruned on the warm path:
    members whose stored ``assign_margin`` exceeds their centroid's movement
    plus the largest non-``big_movers`` movement provably cannot flip and
    score only {own} ∪ top-``big_movers`` movers instead of all C centroids
    — exact by construction and test-pinned identical to full scoring.  The
    first recluster (or any member with NULL margin) full-scores and
    populates margins."""
    p = _paths(state_dir)
    meta = spark.read.parquet(p["meta"]).first()
    members = spark.read.parquet(p["members"])
    sem_rows = members.filter((F.col("near_ok") == 1)
                              & F.col("embedding").isNotNull())
    old = None
    cents = None
    if centroids is None:
        if not n_centroids:
            raise ValueError("corpus_recluster needs centroids or n_centroids")
        from ..sources.ann_index import refine_centroids, train_centroids

        # r9 (VERDICT r8 task 4): drift means the corpus moved but still
        # overlaps, so the EXISTING codebook is a near-converged init —
        # warm-started Lloyd's replaces the full cold retrain (the 111 s at
        # 600k the r8 verdict flagged).  Cold path kept for k changes and
        # explicit warm_start=False.
        if warm_start:
            try:
                old = [list(map(float, r.embedding)) for r in
                       _read_state(spark, p["codebook"])
                       .orderBy("centroid_id").collect()]
            except Exception:
                old = None
        if old and len(old) == n_centroids:
            cents = refine_centroids(sem_rows, old, vec_col="embedding")
        else:
            old = None        # cold retrain: no slot-stable movement pairing
            cents = train_centroids(sem_rows, n_centroids,
                                    vec_col="embedding")
        centroids = spark.createDataFrame(
            [(i, [float(x) for x in v]) for i, v in enumerate(cents)],
            "centroid_id int, embedding array<double>")
        cent_ids = list(range(len(cents)))
    else:
        rows = centroids.select("centroid_id", "embedding") \
                        .orderBy("centroid_id").collect()
        cent_ids = [int(r.centroid_id) for r in rows]
        cents = [list(map(float, r.embedding)) for r in rows]
    # round-10: the remap is ONE scan-side kernel over members (no doc_id
    # join), margin-pruned when the warm refine gives slot-stable movement
    remapped = _remap_members(members, cent_ids, cents, old,
                              big_movers=big_movers) \
        .localCheckpoint(eager=True)            # reads the path it replaces
    # every count below must come from the CHECKPOINTED frame — after the
    # replace, plans still rooted at the old files fail FILE_NOT_EXIST
    # (one fused agg: r11, was two passes)
    _cnt = remapped.agg(F.count("*").alias("n"),
                        F.count("cluster_id").alias("r")).first()
    n_expect, n_reassigned = int(_cnt.n), int(_cnt.r)
    n = _replace_parquet(spark, p["members"], remapped,
                         expect_rows=n_expect)
    centroids.write.mode("overwrite").parquet(p["codebook"])
    bn, bm, bp = _sim_baseline(spark.read.parquet(p["members"]))
    _write_meta(spark, p, eps=meta.eps,
                jaccard_threshold=meta.jaccard_threshold,
                hash_fn=meta.hash_fn, base_n=bn, base_mean_sim=bm,
                base_p10_sim=bp)
    try:
        spark.createDataFrame(
            [], "seq long, n long, mean_sim double, p10_sim double",
        ).write.mode("overwrite").parquet(p["drift"])
    except Exception:
        pass
    return {"members": n, "reassigned": n_reassigned,
            "baseline_mean": bm, "baseline_p10": bp}


def corpus_compact(spark: SparkSession, state_dir: str,
                   target_partitions: int = 32) -> dict:
    """Append-mode state maintenance: every increment adds one file group to
    ``members`` and ``bands``, so a corpus maintained over thousands of
    batches degrades into the small-files problem (each future increment
    re-opens every file's footer).  Compaction rewrites each table as
    ``target_partitions`` files via write-to-sibling + FileSystem rename
    (the Hadoop FS API, so hdfs:// and s3a:// state dirs work the same as
    local paths).

    NOT transactionally atomic — there is a window between delete and rename
    (the standard parquet OPTIMIZE trade; run from the single maintenance
    owner, never concurrently with an increment).  ``sources/txn.TxnTable``
    is the engine's transactional tier for callers that need real commits.
    Returns per-table row counts (sanity: compaction adds no logical rows)."""
    p = _paths(state_dir)
    counts = {}
    for name in ("members", "bands"):
        df = spark.read.parquet(p[name])
        counts[name] = _replace_parquet(spark, p[name], df,
                                        target_partitions=target_partitions,
                                        expect_rows=df.count())
    return counts
