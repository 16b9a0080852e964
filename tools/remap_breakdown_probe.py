"""Stage breakdown of the warm corpus_recluster at 600k (round-10 evidence):
where do the 172 s go — refine, assign, members rewrite, baseline — and what
is the per-centroid movement distribution + the fraction of members whose
assignment actually changes?  This decides whether an incremental remap
(re-score only members of moved clusters) can cut the paid cost.

Run tools/pipeline_probe.py + tools/increment_probe.py first (they build
.scratch/corpus_state_600000).  Usage: python tools/remap_breakdown_probe.py [C]
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
    import numpy as np
    from pyspark.sql import functions as F

    from memory_opensource_spark.plans import corpus
    from memory_opensource_spark.session import get_spark
    from memory_opensource_spark.sources.ann_index import refine_centroids

    C = int(sys.argv[1]) if len(sys.argv) > 1 else 1200
    state = os.path.join(SCRATCH, "corpus_state_600000")
    if not os.path.isdir(os.path.join(state, "members")):
        print("run tools/increment_probe.py first", file=sys.stderr)
        sys.exit(1)
    sd = state + "_breakdown"
    if os.path.isdir(sd):
        shutil.rmtree(sd)
    shutil.copytree(state, sd)

    spark = get_spark("remap-breakdown")
    spark.sparkContext.setLogLevel("ERROR")
    p = corpus._paths(sd)

    out = {"C": C}
    t0 = time.time()
    members = spark.read.parquet(p["members"])
    sem_rows = (members.filter((F.col("near_ok") == 1)
                               & F.col("embedding").isNotNull())
                .localCheckpoint(eager=True))
    out["n_members"] = members.count()
    out["n_sem"] = sem_rows.count()
    out["t_read_s"] = round(time.time() - t0, 2)

    old = [list(map(float, r.embedding)) for r in
           corpus._read_state(spark, p["codebook"])
           .orderBy("centroid_id").collect()]
    out["k_old"] = len(old)

    t0 = time.time()
    cents = refine_centroids(sem_rows, old, vec_col="embedding")
    out["t_refine_s"] = round(time.time() - t0, 2)

    # movement distribution: 1 - cos(old_i, new_i), slots stable
    a = np.asarray(old)
    b = np.asarray(cents)
    a = a / np.linalg.norm(a, axis=1, keepdims=True)
    b = b / np.linalg.norm(b, axis=1, keepdims=True)
    move = 1.0 - np.sum(a * b, axis=1)
    qs = np.percentile(move, [0, 10, 50, 90, 99, 100])
    out["move_quantiles"] = {k: round(float(v), 8) for k, v in
                             zip(["p0", "p10", "p50", "p90", "p99", "p100"], qs)}
    for eps in (0.0, 1e-8, 1e-6, 1e-4, 1e-3, 1e-2):
        out[f"moved_gt_{eps:g}"] = int((move > eps).sum())

    centroids = spark.createDataFrame(
        [(i, [float(x) for x in v]) for i, v in enumerate(cents)],
        "centroid_id int, embedding array<double>")

    t0 = time.time()
    assign = corpus._assign_clusters(
        sem_rows.select("doc_id"),
        sem_rows.select("doc_id", "embedding"), centroids, None)
    cols = members.columns
    remapped = (members.drop("cluster_id", "centroid_sim")
                .join(assign, "doc_id", "left")
                .select(*cols)
                .localCheckpoint(eager=True))
    n_expect = remapped.count()
    out["t_assign_s"] = round(time.time() - t0, 2)

    # what fraction of assignments actually changed?
    oldasg = members.select("doc_id", F.col("cluster_id").alias("c0"),
                            F.col("centroid_sim").alias("s0"))
    chg = (remapped.select("doc_id", "cluster_id", "centroid_sim")
           .join(oldasg, "doc_id")
           .agg(F.sum(F.when(F.col("cluster_id").eqNullSafe(F.col("c0")),
                             0).otherwise(1)).alias("cluster_changed"),
                F.sum(F.when(F.round("centroid_sim", 6)
                             .eqNullSafe(F.round("s0", 6)), 0)
                      .otherwise(1)).alias("sim_changed"))
           .first())
    out["cluster_changed"] = int(chg.cluster_changed or 0)
    out["sim_changed"] = int(chg.sim_changed or 0)

    t0 = time.time()
    corpus._replace_parquet(spark, p["members"], remapped,
                            expect_rows=n_expect)
    out["t_rewrite_s"] = round(time.time() - t0, 2)

    t0 = time.time()
    bn, bm, bp = corpus._sim_baseline(spark.read.parquet(p["members"]))
    out["t_baseline_s"] = round(time.time() - t0, 2)
    out["baseline_mean"] = round(bm, 4) if bm is not None else None

    print(json.dumps(out))
    shutil.rmtree(sd, ignore_errors=True)


if __name__ == "__main__":
    main()
