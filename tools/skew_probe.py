"""Skew-join probe: measure a deliberately skewed shuffle join under
(a) no mitigation, (b) AQE skew-join splitting, (c) explicit salting
(operators/skew.salted_join).

Synthetic shape mirrors the 100 TB hazard: ONE tenant key owning half the
fact side.  Broadcast is disabled so the join must shuffle — at real scale the
dimension side wouldn't broadcast either.  Usage:

    python tools/skew_probe.py [rows_big] [rows_small] [hot_pct]
"""

from __future__ import annotations

import sys
import time

sys.path.insert(0, ".")


def main():
    rows_big = int(sys.argv[1]) if len(sys.argv) > 1 else 4_000_000
    rows_small = int(sys.argv[2]) if len(sys.argv) > 2 else 400_000
    hot_pct = int(sys.argv[3]) if len(sys.argv) > 3 else 50

    from pyspark.sql import SparkSession
    from pyspark.sql import functions as F

    from memory_opensource_spark.operators.skew import salted_join

    spark = (SparkSession.builder.master("local[8]")
             .appName("skew_probe")
             .config("spark.sql.shuffle.partitions", "32")
             .config("spark.sql.autoBroadcastJoinThreshold", "-1")
             .config("spark.sql.adaptive.autoBroadcastJoinThreshold", "-1")
             .getOrCreate())
    spark.sparkContext.setLogLevel("ERROR")

    n_keys = 100_000
    # hot_pct% of the big side lands on key 0; the rest spreads uniformly
    big = (spark.range(rows_big)
           .withColumn("key", F.when(F.col("id") % 100 < hot_pct, F.lit(0))
                       .otherwise(F.pmod(F.xxhash64("id"), F.lit(n_keys))))
           .withColumn("v", (F.col("id") % 97).cast("double")))
    small = (spark.range(rows_small)
             .withColumn("key", F.pmod(F.col("id"), F.lit(n_keys)))
             .withColumn("w", (F.col("id") % 13).cast("double")))
    big.localCheckpoint(); small.localCheckpoint()

    def run(label, aqe_skew, salted):
        spark.conf.set("spark.sql.adaptive.enabled", str(aqe_skew).lower())
        spark.conf.set("spark.sql.adaptive.skewJoin.enabled", str(aqe_skew).lower())
        t0 = time.time()
        if salted:
            joined = salted_join(big, small, "key", buckets=8)
        else:
            joined = big.join(small, "key")
        n = joined.agg(F.count("*"), F.sum(F.col("v") + F.col("w"))).collect()[0][0]
        dt = time.time() - t0
        print(f"{label:34s} {dt:7.2f}s  ({n} joined rows)")
        return dt

    print(f"big={rows_big} rows ({hot_pct}% on one key), small={rows_small} rows, "
          f"broadcast disabled")
    run("plain join, AQE off", aqe_skew=False, salted=False)
    run("plain join, AQE skew-split on", aqe_skew=True, salted=False)
    run("salted_join(8), AQE off", aqe_skew=False, salted=True)
    spark.stop()


if __name__ == "__main__":
    main()
