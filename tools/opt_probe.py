"""Optimization-round isolation probe (guide §1.1/§1.4/§1.5): for each named
query, run it N times against the noop sink (computes every column, no
driver-side transfer), print per-run walls, and write the formatted plan to
plans/r13/<query>_<tag>.txt.

Usage: python tools/opt_probe.py [--sf DIR] [--runs N] [--tag before] q [q..]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, ".")


def main():
    args = sys.argv[1:]
    sf = "/root/testdata/sf0.1"
    runs, tag = 3, "before"
    if "--sf" in args:
        i = args.index("--sf"); sf = args[i + 1]; del args[i:i + 2]
    if "--runs" in args:
        i = args.index("--runs"); runs = int(args[i + 1]); del args[i:i + 2]
    if "--tag" in args:
        i = args.index("--tag"); tag = args[i + 1]; del args[i:i + 2]
    names = args
    if not names:
        raise SystemExit("usage: opt_probe.py [--sf DIR] [--runs N] [--tag T] q [q..]")

    from memory_opensource_spark.queries import QUERIES
    from memory_opensource_spark.session import get_spark

    spark = get_spark("opt-probe")
    spark.sparkContext.setLogLevel("ERROR")
    # same warmup as bench.py so the first probe row is not charged codegen
    spark.read.parquet(f"{sf}/region.parquet").count()
    QUERIES["v2_cosine_topk"](spark, sf).count()

    outdir = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                          "plans", "r13")
    os.makedirs(outdir, exist_ok=True)
    for name in names:
        fn = QUERIES[name]
        spark.sparkContext.setJobDescription(f"probe:{name}")
        samples = []
        for r in range(runs):
            t0 = time.time()
            df = fn(spark, sf)
            df.write.format("noop").mode("overwrite").save()
            samples.append(round(time.time() - t0, 3))
        spark.sparkContext.setJobDescription(None)
        import contextlib
        import io
        df = fn(spark, sf)
        buf = io.StringIO()
        with contextlib.redirect_stdout(buf):
            df.explain("formatted")
        with open(os.path.join(outdir, f"{name}_{tag}.txt"), "w") as f:
            f.write(buf.getvalue())
        print(f"{name}: noop walls {samples} min {min(samples):.2f}s", flush=True)
    spark.stop()


if __name__ == "__main__":
    main()
