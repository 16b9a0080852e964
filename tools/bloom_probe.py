"""Bloom-vs-string-broadcast decontamination A/B at 600k (r9 evidence for
operators/bloom.py): same 8-gram contamination semantics over the
pipeline-probe corpus, eval set = every 97th doc's distinct grams.

Measures, interleaved A/B/A/B (the shared-IO box rule):
  string : explode grams -> broadcast the eval gram STRINGS -> exact join
  bloom  : build the bitmap (timed separately) -> codegen prefilter ->
           exact refine join on the survivors

plus the bloom's measured false-positive traffic (prefilter survivors vs
true joined grams) and a result-equality check (the no-FN contract).

Run tools/pipeline_probe.py first (builds .scratch/pipe_docs_600000.parquet).
Usage: python tools/bloom_probe.py [n_rows]
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
    from pyspark.sql import functions as F

    from memory_opensource_spark.functions import text as T
    from memory_opensource_spark.operators import bloom
    from memory_opensource_spark.session import get_spark

    n = int(sys.argv[1]) if len(sys.argv) > 1 else 600_000
    path = os.path.join(SCRATCH, f"pipe_docs_{n}.parquet")
    if not os.path.exists(path):
        print("run tools/pipeline_probe.py first", file=sys.stderr)
        sys.exit(1)
    spark = get_spark("bloom-probe")
    spark.sparkContext.setLogLevel("ERROR")

    docs = spark.read.parquet(path)
    tk = T.tokens(F.col("text"))
    nn = F.size(tk)
    grams = F.when(
        nn >= 8,
        F.array_distinct(F.transform(
            F.sequence(F.lit(1), nn - 7),
            lambda i: F.concat_ws(" ", F.slice(tk, i, 8)),
        ))).otherwise(F.array().cast("array<string>"))
    g = (docs.select("doc_id", grams.alias("gs"))
         .localCheckpoint(eager=True))          # shared input, off the clock
    ex = g.select("doc_id", F.explode("gs").alias("gram"))
    eval_g = (ex.filter(F.col("doc_id") % 97 == 0)
              .select("gram").distinct().localCheckpoint(eager=True))
    n_eval = eval_g.count()
    train = ex.filter(F.col("doc_id") % 97 != 0)

    def string_form():
        return (train.join(F.broadcast(eval_g), "gram")
                .groupBy("doc_id").agg(F.countDistinct("gram").alias("h")))

    m, k = bloom.optimal_params(n_eval, 0.01)
    t0 = time.time()
    bits = bloom.bloom_build(eval_g, "gram", m, k)
    t_build = time.time() - t0
    bf = spark.createDataFrame([(bits,)], "bf array<long>")

    def bloom_form():
        cand = (train.crossJoin(F.broadcast(bf))
                .filter(bloom.bloom_might_contain(
                    F.col("bf"), F.col("gram"), m, k)).drop("bf"))
        return (cand.join(eval_g, "gram")
                .groupBy("doc_id").agg(F.countDistinct("gram").alias("h")))

    walls = {"string": [], "bloom": []}
    for _ in range(2):                           # interleaved A/B/A/B
        for name, fn in (("string", string_form), ("bloom", bloom_form)):
            t0 = time.time()
            fn().write.format("noop").mode("overwrite").save()
            walls[name].append(round(time.time() - t0, 2))

    # FP traffic + no-FN contract
    survivors = (train.crossJoin(F.broadcast(bf))
                 .filter(bloom.bloom_might_contain(
                     F.col("bf"), F.col("gram"), m, k)).count())
    true_hits = train.join(F.broadcast(eval_g), "gram", "left_semi").count()
    a = {(r.doc_id, r.h) for r in string_form().collect()}
    b = {(r.doc_id, r.h) for r in bloom_form().collect()}

    print(json.dumps({
        "n_docs": n, "n_eval_grams": n_eval,
        "bloom_bits": m, "bloom_hashes": k,
        "bloom_bitmap_kb": round(m / 8 / 1024, 1),
        "t_bloom_build_s": round(t_build, 2),
        "wall_string_s": walls["string"], "wall_bloom_s": walls["bloom"],
        "prefilter_survivor_grams": survivors,
        "true_hit_grams": true_hits,
        "fp_gram_rows": survivors - true_hits,
        "results_identical": a == b,
    }))
    assert a == b, "bloom form diverged from the exact join"
    spark.stop()


if __name__ == "__main__":
    main()
