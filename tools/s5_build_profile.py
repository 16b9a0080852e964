"""Session-5: cProfile the BUILD (plan construction) of named queries.
Usage: python tools/s5_build_profile.py q [q...]
"""
from __future__ import annotations

import cProfile
import pstats
import sys

sys.path.insert(0, ".")

SF = "/root/testdata/sf0.1"


def main():
    names = sys.argv[1:]
    from memory_opensource_spark.queries import QUERIES
    from memory_opensource_spark.session import get_spark

    spark = get_spark("s5-build-profile")
    spark.sparkContext.setLogLevel("ERROR")
    spark.read.parquet(f"{SF}/region.parquet").count()
    for name in names:
        fn = QUERIES[name]
        fn(spark, SF)          # warm
        pr = cProfile.Profile()
        pr.enable()
        fn(spark, SF)
        pr.disable()
        print(f"===== {name} =====", flush=True)
        st = pstats.Stats(pr)
        st.sort_stats("cumulative").print_stats(22)
    spark.stop()


if __name__ == "__main__":
    main()
