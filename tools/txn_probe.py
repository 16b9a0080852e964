"""Probe: MERGE cost on the transactional tier vs full-rewrite upsert.

2M rows, range-partitioned into 64 files by key; an incoming batch touching a
narrow key range.  Measures wall-clock and files rewritten for
TxnTable.merge (footer-stats file skipping) vs writers.upsert_parquet
(anti-join + full table rewrite).  Usage: python tools/txn_probe.py [n_rows]
"""

import sys
import tempfile
import time

sys.path.insert(0, ".")


def main():
    from pyspark.sql import functions as F

    from memory_opensource_spark.session import get_spark
    from memory_opensource_spark.sources import writers
    from memory_opensource_spark.sources.txn import TxnTable

    n = int(sys.argv[1]) if len(sys.argv) > 1 else 2_000_000
    spark = get_spark("txn-probe")
    spark.sparkContext.setLogLevel("ERROR")

    base = (spark.range(n)
            .select(F.format_string("m%09d", F.col("id")).alias("memory_id"),
                    (F.col("id") % 1000).alias("v"))
            .repartitionByRange(64, "memory_id"))
    inc = (spark.range(1000)
           .select(F.format_string("m%09d", F.col("id") + 5000).alias("memory_id"),
                   F.lit(-1).cast("long").alias("v")))

    d = tempfile.mkdtemp()

    t = TxnTable(spark, f"{d}/txn", keys=["memory_id"])
    t.overwrite(base)
    inc.count()  # materialize outside the timing
    t0 = time.time()
    hit, miss = t.matched_files(inc)
    t.merge(inc)
    t_merge = time.time() - t0
    print(f"TxnTable.merge: {t_merge:.2f}s — rewrote {len(hit)}/{len(hit)+len(miss)} "
          f"files, carried {len(miss)} by reference")

    base.write.mode("overwrite").parquet(f"{d}/plain")
    t0 = time.time()
    writers.upsert_parquet(spark, f"{d}/plain", inc, ["memory_id"])
    t_up = time.time() - t0
    print(f"upsert_parquet (full rewrite): {t_up:.2f}s")
    print(f"speedup: {t_up / t_merge:.1f}x at {n} rows; the gap scales with "
          "table_size / touched_range")

    assert t.read().filter(F.col("v") == -1).count() == 1000
    spark.stop()


if __name__ == "__main__":
    main()
