"""Refine-iteration A/B at 600k (round-10): the warm corpus_recluster pays
``refine_centroids`` ~29 s (tools/remap_breakdown_probe.py) — how many of its
<=10 Lloyd's iterations actually buy assignment quality?  Measures, per
max_iter in {1,2,3,5,10}: refine wall, per-iteration max/p99 movement, and
codebook quality = mean best-sim of a fixed 50k-row member sample under the
refined codebook (the drift baseline the recluster resets to).

Run tools/pipeline_probe.py + tools/increment_probe.py first.
Usage: python tools/refine_iters_probe.py [C]
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, ".")

SCRATCH = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                       ".scratch")


def main():
    import numpy as np
    from pyspark.sql import functions as F

    from memory_opensource_spark.plans import corpus
    from memory_opensource_spark.session import get_spark
    from memory_opensource_spark.sources.ann_index import refine_centroids

    state = os.path.join(SCRATCH, "corpus_state_600000")
    if not os.path.isdir(os.path.join(state, "members")):
        print("run tools/increment_probe.py first", file=sys.stderr)
        sys.exit(1)
    spark = get_spark("refine-iters-probe")
    spark.sparkContext.setLogLevel("ERROR")
    p = corpus._paths(state)
    members = spark.read.parquet(p["members"])
    sem_rows = (members.filter((F.col("near_ok") == 1)
                               & F.col("embedding").isNotNull())
                .select("doc_id", "embedding")
                .localCheckpoint(eager=True))
    old = [list(map(float, r.embedding)) for r in
           corpus._read_state(spark, p["codebook"])
           .orderBy("centroid_id").collect()]

    # fixed evaluation sample: 50k rows, collected once
    eval_rows = sem_rows.sample(False, min(1.0, 50000 / max(1, sem_rows.count())),
                                seed=11).collect()
    X = np.asarray([list(r.embedding) for r in eval_rows], dtype="float64")
    X = X / np.maximum(np.linalg.norm(X, axis=1, keepdims=True), 1e-300)

    def quality(cents):
        C = np.asarray(cents, dtype="float64")
        C = C / np.maximum(np.linalg.norm(C, axis=1, keepdims=True), 1e-300)
        best = np.zeros(X.shape[0]) - 2.0
        for lo in range(0, X.shape[0], 8192):
            s = X[lo:lo + 8192] @ C.T
            best[lo:lo + 8192] = s.max(axis=1)
        return float(best.mean())

    out = {"n_eval": X.shape[0], "k": len(old), "q_old": round(quality(old), 6)}
    # interleave the variants to neutralize the box's IO swings
    results = {m: [] for m in (1, 2, 3, 5, 10)}
    for rep in range(2):
        for m in (1, 2, 3, 5, 10):
            t0 = time.time()
            cents = refine_centroids(sem_rows, old, vec_col="embedding",
                                     max_iter=m)
            results[m].append((time.time() - t0, quality(cents)))
    for m, rs in results.items():
        out[f"iter{m}_wall_s"] = round(min(t for t, _ in rs), 2)
        out[f"iter{m}_quality"] = round(max(q for _, q in rs), 6)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
