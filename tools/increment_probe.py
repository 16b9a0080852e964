"""Incremental-corpus probe: is an increment really O(batch), not O(corpus)?

Builds the pipeline-probe corpus (same controlled dup structure), splits it
90/10, runs `corpus_init` on the 90% and `corpus_increment` on the 10%, and
compares the increment wall against re-running the batch dedup stages over
the FULL corpus — the cost a user pays without the stateful op.  Also checks
verdict sanity: the increment must drop the batch's planted exact/near
duplicates and keep the novel tail.

Usage: python tools/increment_probe.py [n_rows]   (default 600000)
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import time

sys.path.insert(0, ".")

SCRATCH = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                       ".scratch")


def main():
    from pyspark.sql import functions as F

    from memory_opensource_spark.operators import dedup
    from memory_opensource_spark.plans import corpus
    from memory_opensource_spark.session import get_spark
    from memory_opensource_spark.sources.ann_index import train_centroids

    n = int(sys.argv[1]) if len(sys.argv) > 1 else 600_000
    dim = 64
    spark = get_spark("increment-probe")
    spark.sparkContext.setLogLevel("ERROR")
    doc_path = os.path.join(SCRATCH, f"pipe_docs_{n}.parquet")
    emb_path = os.path.join(SCRATCH, f"pipe_emb_{n}_{dim}.parquet")
    if not (os.path.exists(doc_path) and os.path.exists(emb_path)):
        print("run tools/pipeline_probe.py first to generate the corpus",
              file=sys.stderr)
        sys.exit(1)
    state = os.path.join(SCRATCH, f"corpus_state_{n}")
    shutil.rmtree(state, ignore_errors=True)

    docs = spark.read.parquet(doc_path)
    emb = spark.read.parquet(emb_path)
    cut = n * 9 // 10
    init_docs = docs.filter(F.col("doc_id") < cut)
    init_emb = emb.filter(F.col("doc_id") < cut)
    new_docs = docs.filter(F.col("doc_id") >= cut)

    # train-once codebook over the init corpus (reused by every increment —
    # the pipeline probe measured training at 61% of batch wall)
    t0 = time.time()
    C = 1200
    cents = train_centroids(
        init_emb.withColumnRenamed("doc_id", "vec_id"), C)
    cents_df = spark.createDataFrame(
        [(i, [float(x) for x in c]) for i, c in enumerate(cents)],
        "centroid_id int, embedding array<double>")
    t_train = time.time() - t0

    t0 = time.time()
    stats = corpus.corpus_init(init_docs, init_emb, cents_df, state,
                               eps=0.96, jaccard_threshold=0.5,
                               hash_fn="xxhash64")
    t_init = time.time() - t0
    print(f"init: {stats} in {t_init:.1f}s (+{t_train:.1f}s codebook train)")

    t0 = time.time()
    verdict = corpus.corpus_increment(spark, new_docs, emb, state,
                                      eps=0.96, jaccard_threshold=0.5,
                                      hash_fn="xxhash64")
    counts = {r.drop_stage: r.n for r in
              verdict.groupBy("drop_stage").agg(F.count("*").alias("n"))
              .collect()}
    t_inc = time.time() - t0
    print(f"increment ({n - cut} docs): {counts} in {t_inc:.1f}s")

    # sanity: the corpus generator aliases 40% of ids onto earlier bases, so
    # most batch docs exact-dup an init doc; ids%7==3 are near variants
    assert counts.get("exact", 0) > 0, "planted exact dups not caught"
    assert counts.get("kept", 0) > 0, "everything dropped — wrong"

    # the alternative without state: re-run the batch stages over the FULL
    # corpus (what the increment's O(batch) claim is measured against)
    t0 = time.time()
    x = corpus._exact_survivors(docs, "doc_id", "text").localCheckpoint()
    pairs = dedup.minhash_near_duplicates(x, id_col="doc_id",
                                          text_col="text", threshold=0.5,
                                          hash_fn="xxhash64")
    near = x.join(corpus._near_drop_ids(pairs), "doc_id", "left_anti")
    sem = dedup.semantic_cluster_dedup(
        near.select("doc_id").join(emb, "doc_id"), cents_df, 0.96,
        id_col="doc_id", vec_col="embedding",
        approx_centroid_rows=C)
    n_keep = sem.filter(F.col("is_dup") == 0).count()
    t_full = time.time() - t0
    print(f"full batch re-run over {n} docs: {t_full:.1f}s "
          f"({n_keep} semantic keeps)")

    print(json.dumps({
        "n": n, "batch": n - cut, "t_codebook_train_s": round(t_train, 1),
        "t_init_s": round(t_init, 1), "t_increment_s": round(t_inc, 1),
        "t_full_rerun_s": round(t_full, 1),
        "speedup_vs_rerun": round(t_full / max(t_inc, 1e-9), 1),
        "verdicts": counts,
    }))


if __name__ == "__main__":
    main()
