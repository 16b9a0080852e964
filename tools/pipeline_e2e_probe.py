"""600k end-to-end probe of plans/crawl.crawl_to_training_shards (r12):
drive the one-call batch front-end over the crawl_probe WARC segments
(run tools/crawl_probe.py once first to build them) with a blocklist and
an eval-suite gram table, and print the per-stage audit counts + wall.
``langs=None`` here because the synthetic fixture prose is not natural
language (the lang stage correctly reduces it to 89 "en" docs when
enabled); real crawls pass ("en",) etc.

``--bpe-budget N`` (r13) switches the shard stage to trained-BPE token
budgeting: trains a 200-merge vocabulary on the survivors, costs every
doc with the replace-fold counter, and packs ~N-token shards via the
distributed prefix sum — the added wall over hash sharding is the
PERF.md delta for VERDICT r10 task 6.

Usage: python tools/pipeline_e2e_probe.py [n_docs] [--bpe-budget N]
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import time

sys.path.insert(0, ".")

SCRATCH = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))), ".scratch")


def main():
    from memory_opensource_spark.plans.crawl import crawl_to_training_shards
    from memory_opensource_spark.session import get_spark

    n_docs = int(sys.argv[1]) if len(sys.argv) > 1 else 600_000
    warc_dir = os.path.join(SCRATCH, f"crawl_warc_{n_docs}")
    if not os.path.isdir(warc_dir) or not os.listdir(warc_dir):
        print("run tools/crawl_probe.py first", file=sys.stderr)
        sys.exit(1)
    out_dir = os.path.join(SCRATCH, f"pipe_e2e_{n_docs}")
    shutil.rmtree(out_dir, ignore_errors=True)

    spark = get_spark("pipeline-e2e-probe")
    spark.sparkContext.setLogLevel("ERROR")
    # the crawl_probe fixture's pages all live on crawl.example — block a
    # disjoint domain so the gate exercises without emptying the corpus,
    # and decontaminate against a synthetic eval sentence that occurs in
    # some fixture docs' shared prose tails
    blocklist = spark.createDataFrame(
        [("blocked.example",)], "domain string")
    eval_grams = spark.createDataFrame(
        [(f"filler token {i} of the held out benchmark sentence",)
         for i in range(64)], "gram string")

    budget = None
    if "--bpe-budget" in sys.argv:
        budget = int(sys.argv[sys.argv.index("--bpe-budget") + 1])

    t0 = time.time()
    res = crawl_to_training_shards(
        spark, os.path.join(warc_dir, "*"), out_dir,
        blocklist=blocklist, eval_grams=eval_grams,
        langs=None, min_words=3, jaccard_threshold=0.5,
        n_shards=32, token_budget=budget)
    wall = round(time.time() - t0, 2)
    n_out = sum(
        spark.read.parquet(p).count() for p in res["paths"].values())
    extra = {}
    if budget is not None:
        sh = spark.read.parquet(res["paths"]["train"])
        from pyspark.sql import functions as F
        agg = (sh.groupBy("shard")
               .agg(F.sum("n_bpe_tokens").alias("tok")).collect())
        toks = sorted(r.tok for r in agg)
        extra = {"bpe_budget": budget, "n_shards_out": len(toks),
                 "shard_tokens_min": toks[0], "shard_tokens_max": toks[-1]}
    print(json.dumps({"n_docs": n_docs, "wall_s": wall,
                      "stages": res["stages"], "rows_out": n_out,
                      "splits": sorted(res["paths"]), **extra}))


if __name__ == "__main__":
    main()
