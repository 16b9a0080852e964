"""Per-query shuffle/scan accounting for the headline queries (r9): the
100 TB question is "how many bytes move when this runs", so this measures it
instead of arguing from plan shapes — Spark status REST totals (shuffle
write bytes, input bytes, peak execution memory, stage count) per query,
one JSON line each.

Usage: python tools/shuffle_audit.py [sf_dir] [query ...]
       (default sf0.1 and a flagship/dedup/pipeline selection)
"""

from __future__ import annotations

import json
import sys
import urllib.request

sys.path.insert(0, ".")

DEFAULT = [
    "search_flagship", "search_agentic_flagship", "v5_bucketed_pairs",
    "dedup_minhash_bands", "dedup_span_fraction", "dedup_span_removal",
    "gopher_quality_flags", "gopher_repetition_flags", "sample_domain_cap",
    "shard_token_budget", "pack_sequences", "lm_quality_scores",
    "contamination_ngram", "contamination_bloom", "split_leakage_safe",
    "pipeline_mini", "corpus_increment_dedup",
]


def _stages(spark):
    base = spark.sparkContext.uiWebUrl
    app = spark.sparkContext.applicationId
    with urllib.request.urlopen(
            f"{base}/api/v1/applications/{app}/stages?status=complete") as r:
        return {s["stageId"]: s for s in json.load(r)}


def main():
    import time

    from memory_opensource_spark.queries import QUERIES
    from memory_opensource_spark.session import get_spark

    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    names = sys.argv[2:] or DEFAULT
    # the status REST API needs the UI server (get_spark disables it)
    spark = get_spark("shuffle-audit",
                      extra_conf={"spark.ui.enabled": "true"})
    spark.sparkContext.setLogLevel("ERROR")
    out = []
    for name in names:
        fn = QUERIES.get(name)
        if fn is None:
            print(f"# unknown query {name}", file=sys.stderr)
            continue
        # warm once so the audit row measures the steady-state plan, not
        # first-touch page-cache noise
        fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
        before = _stages(spark)
        t0 = time.time()
        fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
        wall = time.time() - t0
        new = [s for sid, s in _stages(spark).items() if sid not in before]
        row = {
            "query": name,
            "wall_s": round(wall, 2),
            "stages": len(new),
            "input_mb": round(sum(s.get("inputBytes", 0) for s in new)
                              / 1e6, 1),
            "shuffle_write_mb": round(
                sum(s.get("shuffleWriteBytes", 0) for s in new) / 1e6, 2),
            "peak_exec_mem_mb": round(
                max((s.get("peakExecutionMemory", 0) for s in new),
                    default=0) / 1e6, 1),
        }
        out.append(row)
        print(json.dumps(row))
    spark.stop()


if __name__ == "__main__":
    main()
