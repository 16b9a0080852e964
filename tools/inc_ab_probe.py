"""corpus_increment lane-topology A/B at 600k (r14, VERDICT r13 item 2).

Measures the read-only increment (update_state=False — the declared
row's steady-state shape) from a given WORKTREE ROOT against a shared
pre-built state, so two roots (HEAD vs a variant with one fewer
materialization) can be alternated lane-by-lane:

    python tools/inc_ab_probe.py /root/repo 600000 3
    python tools/inc_ab_probe.py /root/repo/.scratch/wt_var 600000 3

State/corpus live under the MAIN repo's .scratch (absolute), keyed on n;
the state is built once (md5 hash form + deterministic id-prefix
codebook, mirroring the declared row) and never mutated.  Needs the
pipeline-probe corpus (tools/pipeline_probe.py) generated first.

Each lane: 1 cold + N timed increments (noop sink), one fresh session.
"""

from __future__ import annotations

import json
import os
import sys
import time

MAIN_SCRATCH = "/root/repo/.scratch"


def main():
    root = os.path.abspath(sys.argv[1])
    n = int(sys.argv[2]) if len(sys.argv) > 2 else 600_000
    runs = int(sys.argv[3]) if len(sys.argv) > 3 else 3
    os.chdir(root)
    sys.path.insert(0, root)

    from pyspark.sql import functions as F

    from memory_opensource_spark.plans import corpus
    from memory_opensource_spark.session import get_spark

    spark = get_spark("inc-ab")
    spark.sparkContext.setLogLevel("ERROR")
    doc_path = os.path.join(MAIN_SCRATCH, f"pipe_docs_{n}.parquet")
    emb_path = os.path.join(MAIN_SCRATCH, f"pipe_emb_{n}_64.parquet")
    docs = spark.read.parquet(doc_path)
    emb = spark.read.parquet(emb_path)
    cut = n * 9 // 10
    state = os.path.join(MAIN_SCRATCH, f"corpus_state_ab_{n}")

    if not os.path.exists(os.path.join(state, "members")):
        # deterministic codebook: 256 id-stride embeddings (no training —
        # the A/B measures lane topology, not k-means)
        cents_df = (emb.filter(F.col("doc_id") % (cut // 256) == 0)
                    .limit(256)
                    .select((F.col("doc_id") % 100000).alias("centroid_id"),
                            "embedding"))
        t0 = time.time()
        corpus.corpus_init(
            docs.filter(F.col("doc_id") < cut).select("doc_id", "text"),
            emb.filter(F.col("doc_id") < cut), cents_df, state,
            eps=0.96, jaccard_threshold=0.5, hash_fn="md5")
        print(f"# state built in {time.time()-t0:.1f}s", flush=True)

    batch_docs = (docs.filter(F.col("doc_id") >= cut)
                  .select("doc_id", "text").localCheckpoint(eager=False))
    batch_emb = (emb.filter(F.col("doc_id") >= cut)
                 .localCheckpoint(eager=False))

    walls = []
    for r in range(runs + 1):
        t0 = time.time()
        out = corpus.corpus_increment(
            spark, batch_docs, batch_emb, state,
            eps=0.96, jaccard_threshold=0.5, update_state=False)
        out.write.format("noop").mode("overwrite").save()
        walls.append(round(time.time() - t0, 3))
    print("INC_AB_RESULT " + json.dumps(
        {"root": root, "n": n, "cold": walls[0], "warm": walls[1:],
         "warm_min": min(walls[1:])}))
    spark.stop()


if __name__ == "__main__":
    main()
