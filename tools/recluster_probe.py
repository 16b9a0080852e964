"""Recluster-path probe at 600k (VERDICT r7 task 4 / r8 task 4 evidence): on
the increment-probe state (.scratch/corpus_state_600000), measure

  1. corpus_drift_status      — the per-increment signal read
  2. corpus_recluster WARM    — refine_centroids from the existing codebook
                                (r9 default), on a copy of the state
  3. corpus_recluster COLD    — full train_centroids retrain
                                (warm_start=False), on a second copy
  4. post-remap drift status + history-immutability sample on both

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

    # A/B on byte-identical copies of the state (recluster mutates it)
    import shutil

    out = {"members": n_members, "semantic_members": n_sem, "C": C,
           "t_drift_status_s": round(t_status, 2),
           "drifted_before": st["drifted"], "pre_sample": len(pre)}
    # warm2 (round-10): a SECOND warm recluster on the warm copy — the first
    # populated assign_margin, so the remap takes the margin-pruned path
    # (O(|M|·dim) flops per unflippable member instead of O(C·dim))
    for mode, kwargs in (("warm", {}), ("warm2", {}),
                         ("cold", {"warm_start": False})):
        sd = state + f"_{mode}"
        if mode == "warm2":
            sd = state + "_warm"
            if not os.path.isdir(sd):
                continue
        else:
            if os.path.isdir(sd):
                shutil.rmtree(sd)
            shutil.copytree(state, sd)
        t0 = time.time()
        res = corpus.corpus_recluster(spark, sd, n_centroids=C, **kwargs)
        t_rec = time.time() - t0
        st2 = corpus.corpus_drift_status(spark, sd)
        post = {r.doc_id: (r.is_dup, r.retained) for r in
                spark.read.parquet(os.path.join(sd, "members"))
                .select("doc_id", "is_dup", "retained")
                .filter(F.col("doc_id").isin(list(pre)))
                .collect()}
        immutable = all(post.get(k) == v for k, v in pre.items())
        out[f"t_recluster_{mode}_s"] = round(t_rec, 2)
        out[f"reassigned_{mode}"] = res["reassigned"]
        out[f"baseline_mean_{mode}"] = (round(res["baseline_mean"], 4)
                                        if res["baseline_mean"] is not None
                                        else None)
        out[f"history_immutable_{mode}"] = immutable
        out[f"drifted_after_{mode}"] = st2["drifted"]
        assert immutable, f"verdict history changed across the {mode} remap"
        if mode != "warm":          # keep the warm copy for the warm2 leg
            shutil.rmtree(sd)

    import json
    line = json.dumps(out)
    print(line)
    with open(os.path.join(SCRATCH, "recluster_probe_last.json"), "w") as f:
        f.write(line + "\n")
    spark.stop()


if __name__ == "__main__":
    main()
