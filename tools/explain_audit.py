"""Plan audit: print scale-relevant physical-plan properties for each headline
query — pushdown, broadcast, TakeOrdered, exchanges — so plan regressions are
visible at review time.  Usage: python tools/explain_audit.py [sf_dir] [query...]
"""

from __future__ import annotations

import re
import sys

sys.path.insert(0, ".")


def audit(plan: str) -> dict:
    return {
        "pushed_filters": len(re.findall(r"PushedFilters: \[[^\]]*\w", plan)),
        "broadcast_joins": plan.count("BroadcastHashJoin"),
        "sortmerge_joins": plan.count("SortMergeJoin"),
        "shuffles": plan.count("Exchange hashpartitioning")
        + plan.count("Exchange rangepartitioning"),
        "broadcasts": plan.count("BroadcastExchange"),
        "take_ordered": plan.count("TakeOrderedAndProject"),
        "full_sorts": len(re.findall(r"\bSort \[", plan)),
        "python_stages": plan.count("ArrowEvalPython") + plan.count("MapInPandas")
        + plan.count("FlatMapGroupsInPandas"),
    }


def main():
    from bench import HEADLINE
    from memory_opensource_spark.queries import QUERIES
    from memory_opensource_spark.session import get_spark

    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    names = sys.argv[2:] or HEADLINE
    spark = get_spark("audit", shuffle_partitions=8)
    spark.sparkContext.setLogLevel("ERROR")
    # long conjunct lists truncate scan metadata at 100 chars, silently
    # cutting PushedFilters out of toString() (round-6 finding: a query with
    # MORE pushed filters audited as pushF=0)
    spark.conf.set("spark.sql.maxMetadataStringLength", "10000")

    header = f"{'query':34s} pushF bcast smj shuf bexch takeOrd sorts py"
    print(header)
    for name in names:
        try:
            df = QUERIES[name](spark, sf_dir)
            a = audit(df._jdf.queryExecution().executedPlan().toString())
            print(f"{name:34s} {a['pushed_filters']:5d} {a['broadcast_joins']:5d} "
                  f"{a['sortmerge_joins']:3d} {a['shuffles']:4d} {a['broadcasts']:5d} "
                  f"{a['take_ordered']:7d} {a['full_sorts']:5d} {a['python_stages']:2d}")
        except Exception as e:  # noqa: BLE001
            print(f"{name:34s} ERROR {type(e).__name__}: {e}")
    spark.stop()


if __name__ == "__main__":
    main()
