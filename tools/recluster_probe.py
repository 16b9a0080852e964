"""Recluster-path probe at 600k (VERDICT r7 task 4's scale evidence): on the
increment-probe state (.scratch/corpus_state_600000), measure

  1. corpus_drift_status      — the per-increment signal read
  2. corpus_recluster         — retrain codebook from member embeddings +
                                remap every near_ok member, history intact
  3. a post-remap drift status — baseline reset confirmed

Run tools/pipeline_probe.py then tools/increment_probe.py first (they build
the corpus + state).  Usage: python tools/recluster_probe.py [C]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, ".")

SCRATCH = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                       ".scratch")


def main():
    from pyspark.sql import functions as F

    from memory_opensource_spark.plans import corpus
    from memory_opensource_spark.session import get_spark

    C = int(sys.argv[1]) if len(sys.argv) > 1 else 1200
    state = os.path.join(SCRATCH, "corpus_state_600000")
    if not os.path.isdir(os.path.join(state, "members")):
        print("run tools/increment_probe.py first", file=sys.stderr)
        sys.exit(1)
    spark = get_spark("recluster-probe")
    spark.sparkContext.setLogLevel("ERROR")

    members = spark.read.parquet(os.path.join(state, "members"))
    n_members = members.count()
    n_sem = members.filter(F.col("centroid_sim").isNotNull()).count()
    pre = {r.doc_id: (r.is_dup, r.retained) for r in
           members.select("doc_id", "is_dup", "retained")
           .filter(F.col("is_dup").isNotNull()).sample(0.01, seed=7)
           .collect()}

    t0 = time.time()
    st = corpus.corpus_drift_status(spark, state)
    t_status = time.time() - t0

    t0 = time.time()
    res = corpus.corpus_recluster(spark, state, n_centroids=C)
    t_recluster = time.time() - t0

    t0 = time.time()
    st2 = corpus.corpus_drift_status(spark, state)
    t_status2 = time.time() - t0

    post = {r.doc_id: (r.is_dup, r.retained) for r in
            spark.read.parquet(os.path.join(state, "members"))
            .select("doc_id", "is_dup", "retained")
            .filter(F.col("doc_id").isin(list(pre)))
            .collect()}
    immutable = all(post.get(k) == v for k, v in pre.items())

    import json
    print(json.dumps({
        "members": n_members, "semantic_members": n_sem, "C": C,
        "t_drift_status_s": round(t_status, 2),
        "t_recluster_s": round(t_recluster, 2),
        "t_status_after_s": round(t_status2, 2),
        "reassigned": res["reassigned"],
        "baseline_mean_after": round(res["baseline_mean"], 4)
        if res["baseline_mean"] is not None else None,
        "history_immutable_sample": immutable,
        "pre_sample": len(pre),
        "drifted_before": st["drifted"], "drifted_after": st2["drifted"],
    }))
    assert immutable, "verdict history changed across the remap"
    spark.stop()


if __name__ == "__main__":
    main()
