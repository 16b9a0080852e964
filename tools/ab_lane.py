"""Interleaved-pairs bench A/B lane (the PERF.md standing method, made
reusable in r14): run a set of registered queries TWICE (cold + warm) in
a fresh session rooted at a given worktree, print the warm seconds as
one JSON line.  Alternate lanes A,B,A,B,... from a driver shell:

    git worktree add .scratch/wt_A <commitA>
    git worktree add .scratch/wt_B <commitB>
    for i in 1 2 3; do
      python tools/ab_lane.py .scratch/wt_A q1 q2 ...
      python tools/ab_lane.py .scratch/wt_B q1 q2 ...
    done

Include one lane pinned to an OLD driver-round HEAD as a control: if
byte-identical old code runs far from its recorded bench numbers, the
box regime — not the code — explains the drift (the r14 finding that
closed the r11 drift question).

Usage: python tools/ab_lane.py <worktree-root> <query> [<query> ...]
       [--sf <dir>]  (default /root/testdata/sf0.1)
"""

from __future__ import annotations

import json
import os
import sys
import time


def main():
    args = sys.argv[1:]
    sf = "/root/testdata/sf0.1"
    if "--sf" in args:
        i = args.index("--sf")
        sf = args[i + 1]
        args = args[:i] + args[i + 2:]
    root, movers = os.path.abspath(args[0]), args[1:]
    if not movers:
        raise SystemExit("usage: ab_lane.py <root> <query> [...]")
    os.chdir(root)
    sys.path.insert(0, root)

    from memory_opensource_spark.session import get_spark

    spark = get_spark("ab", shuffle_partitions=32)
    from memory_opensource_spark.queries import QUERIES

    out = {}
    for name in movers:
        fn = QUERIES[name]
        fn(spark, sf).collect()           # cold: scans + codegen warmup
        t0 = time.time()
        fn(spark, sf).collect()           # warm: the reported sample
        out[name] = round(time.time() - t0, 3)
    print("LANE_RESULT " + json.dumps({"root": root, "sf": sf,
                                       "times": out}))
    spark.stop()


if __name__ == "__main__":
    main()
