"""Compaction probe: what does state fragmentation cost an increment, and
does `corpus_compact` recover it?

Every `corpus_increment(update_state=True)` appends one file GROUP to
`members` and `bands`, so a corpus maintained over thousands of micro-batches
reads thousands of parquet footers per increment.  This probe simulates that
end state directly — it copies the 600k increment-probe state, rewrites
members/bands as N_FRAG files each (default 2000, i.e. ~2000 appends'
worth of fragmentation at one file per append), times a 60k-doc increment
against the fragmented state, runs `corpus_compact`, and re-times the SAME
increment.  The delta is pure small-files overhead: listing + footer reads +
scheduler pressure from thousands of tiny input splits.

Prereq: run tools/increment_probe.py once (builds the corpus + state).

Usage: python tools/compact_probe.py [n_frag]   (default 2000)
"""

from __future__ import annotations

import os
import shutil
import sys
import time

sys.path.insert(0, ".")

SCRATCH = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                       ".scratch")


def main():
    from pyspark.sql import functions as F

    from memory_opensource_spark.plans import corpus
    from memory_opensource_spark.session import get_spark

    n = 600_000
    n_frag = int(sys.argv[1]) if len(sys.argv) > 1 else 2000
    spark = get_spark("compact-probe")
    spark.sparkContext.setLogLevel("ERROR")

    doc_path = os.path.join(SCRATCH, f"pipe_docs_{n}.parquet")
    emb_path = os.path.join(SCRATCH, f"pipe_emb_{n}_64.parquet")
    if not os.path.exists(doc_path):
        print("run tools/pipeline_probe.py first (generates the corpus)",
              file=sys.stderr)
        sys.exit(1)

    # build a fresh state with a CHEAP deterministic codebook (first 1200
    # vectors): codebook quality shifts which docs verdict 'semantic', which
    # is irrelevant to a small-files IO measurement
    state = os.path.join(SCRATCH, f"corpus_state_{n}_frag")
    shutil.rmtree(state, ignore_errors=True)
    docs_all = spark.read.parquet(doc_path)
    emb_all = spark.read.parquet(emb_path)
    cut0 = n * 9 // 10
    cents_df = (emb_all.filter(F.col("doc_id") < 1200)
                .select(F.col("doc_id").cast("int").alias("centroid_id"),
                        "embedding"))
    t0 = time.time()
    corpus.corpus_init(docs_all.filter(F.col("doc_id") < cut0),
                       emb_all.filter(F.col("doc_id") < cut0),
                       cents_df, state, eps=0.96, jaccard_threshold=0.5,
                       hash_fn="xxhash64")
    print(f"state built in {time.time() - t0:.1f}s")

    # fragment members/bands to n_frag files each — the state shape after
    # ~n_frag single-file appends (real appends write up to 32 files each,
    # so this UNDERSTATES the fragmentation per batch count)
    t0 = time.time()
    for t in ("members", "bands"):
        p = os.path.join(state, t)
        tmp = p + ".tmp"
        spark.read.parquet(p).repartition(n_frag).write.parquet(tmp)
        shutil.rmtree(p)
        os.rename(tmp, p)
    print(f"fragmented to {n_frag} files/table in {time.time() - t0:.1f}s")

    new_docs = docs_all.filter(F.col("doc_id") >= cut0)
    emb = emb_all

    def timed_increment() -> float:
        t0 = time.time()
        corpus.corpus_increment(
            spark, new_docs, emb, state, eps=0.96, jaccard_threshold=0.5,
            hash_fn="xxhash64", update_state=False,
        ).write.mode("overwrite").format("noop").save()
        return time.time() - t0

    timed_increment()                          # warm code paths
    frag = min(timed_increment() for _ in range(2))
    print(f"increment vs {n_frag}-file state:   {frag:.1f}s")

    t0 = time.time()
    counts = corpus.corpus_compact(spark, state, target_partitions=32)
    t_compact = time.time() - t0
    print(f"corpus_compact -> 32 files/table: {t_compact:.1f}s {counts}")

    compacted = min(timed_increment() for _ in range(2))
    print(f"increment vs compacted state:     {compacted:.1f}s "
          f"({frag / compacted:.2f}x recovered)")

    shutil.rmtree(state, ignore_errors=True)


if __name__ == "__main__":
    main()
