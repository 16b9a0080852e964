"""Session-5 scratch probe: split corpus_increment_dedup's warm wall into
(a) query-function build time (state reads, lanes, near_drop checkpoint)
and (b) the final verdict action.  Usage: python tools/s5_increment_phase.py
"""
from __future__ import annotations

import sys
import time

sys.path.insert(0, ".")

SF = "/root/testdata/sf0.1"


def main():
    from memory_opensource_spark.queries import QUERIES
    from memory_opensource_spark.session import get_spark

    spark = get_spark("s5-increment-phase")
    spark.sparkContext.setLogLevel("ERROR")
    spark.read.parquet(f"{SF}/region.parquet").count()
    # warm: make sure state exists
    QUERIES["corpus_increment_dedup"](spark, SF).count()
    for i in range(3):
        t0 = time.time()
        df = QUERIES["corpus_increment_dedup"](spark, SF)
        t1 = time.time()
        df.write.format("noop").mode("overwrite").save()
        t2 = time.time()
        print(f"run {i}: build {t1-t0:.2f}s action {t2-t1:.2f}s "
              f"total {t2-t0:.2f}s", flush=True)
    spark.stop()


if __name__ == "__main__":
    main()
