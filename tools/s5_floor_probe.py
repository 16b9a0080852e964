"""Session-5 floor probe (OPTIMIZATION_r13 'not yet optimized' item 2):
separate the bench's per-row wall into (a) the box's fixed job/stage floor
and (b) per-row driver-side plan-construction time, so 'optimizable seconds'
can be told apart from harness floor.

Measures, in ONE quiet session:
  1. empty-job floor: min wall of a 1-task count on a pre-materialized range
  2. one-shuffle floor: min wall of a 32->32 groupBy count
  3. per headline row: BUILD wall (QUERIES[name](spark, sf) returning the
     DataFrame, no action) — second of two calls, so state fixtures and
     codegen warmup are excluded.  Rows whose build runs eager jobs
     (localCheckpoint-based plans) show it here, which is the point: that
     time is serial driver-side wall the noop action never sees.

Usage: python tools/s5_floor_probe.py [sf_dir]
"""
from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, ".")


def main():
    sf = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    from bench import HEADLINE

    from memory_opensource_spark.queries import QUERIES
    from memory_opensource_spark.session import get_spark

    spark = get_spark("s5-floor-probe")
    spark.sparkContext.setLogLevel("ERROR")
    spark.read.parquet(f"{sf}/region.parquet").count()

    base = spark.range(1).localCheckpoint()
    empty = []
    for _ in range(7):
        t0 = time.time(); base.count(); empty.append(time.time() - t0)
    shuf = []
    from pyspark.sql import functions as F
    for _ in range(7):
        t0 = time.time()
        (spark.range(10_000)
         .groupBy((F.col("id") % 97).alias("k")).count()
         .write.format("noop").mode("overwrite").save())
        shuf.append(time.time() - t0)
    print(f"empty_job_floor min {min(empty):.3f}s  "
          f"one_shuffle_floor min {min(shuf):.3f}s", flush=True)

    builds = {}
    for name in HEADLINE:
        fn = QUERIES[name]
        try:
            fn(spark, sf)           # first call: state fixtures, codegen
            t0 = time.time()
            fn(spark, sf)           # second call: steady-state build
            builds[name] = round(time.time() - t0, 3)
        except Exception as e:     # keep going; report the row
            builds[name] = None
            print(f"# {name}: build failed {e}", file=sys.stderr)
        print(f"{name}: build {builds[name]}s", flush=True)

    total = sum(v for v in builds.values() if v)
    print(json.dumps({"empty_job_floor": round(min(empty), 3),
                      "one_shuffle_floor": round(min(shuf), 3),
                      "build_total": round(total, 3),
                      "n_rows": len(builds),
                      "builds": builds}), flush=True)
    spark.stop()


if __name__ == "__main__":
    main()
