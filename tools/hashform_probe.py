"""md5 vs xxhash64 MinHash forms at scale (r14, VERDICT r13 item 6).

The oracle-pinned queries (dedup_minhash_bands, fuzzy_decontamination)
use ``hash_fn="md5"`` — the 16 per-shingle min-hashes are mins over hex
STRINGS, whose buffers are not UnsafeRow-mutable, so the signature agg
plans as SortAggregate.  The documented production path
(``hash_fn="xxhash64"``) aggregates LONGs and HashAggregates.  This
probe MEASURES that trade at 600k docs instead of asserting it:
interleaved A/B (md5, xxhash64, md5, xxhash64, ...) of

  1. the band-table build (the dedup_minhash_bands shape) -> noop sink;
  2. band table + candidate pairs (the near-dup keeper substrate).

Needs the pipeline-probe corpus: run tools/pipeline_probe.py first
(generates .scratch/pipe_docs_<n>.parquet).

Usage: python tools/hashform_probe.py [n_rows] [runs]   (600000, 3)
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, ".")

SCRATCH = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                       ".scratch")


def main():
    from memory_opensource_spark.operators import dedup
    from memory_opensource_spark.session import get_spark

    n = int(sys.argv[1]) if len(sys.argv) > 1 else 600_000
    runs = int(sys.argv[2]) if len(sys.argv) > 2 else 3
    doc_path = os.path.join(SCRATCH, f"pipe_docs_{n}.parquet")
    if not os.path.exists(doc_path):
        print("run tools/pipeline_probe.py first to generate the corpus",
              file=sys.stderr)
        sys.exit(1)

    spark = get_spark("hashform-probe")
    spark.sparkContext.setLogLevel("ERROR")
    docs = spark.read.parquet(doc_path)
    docs.count()  # warm scan

    def bands_only(hash_fn):
        t0 = time.time()
        bt = dedup.minhash_band_table(docs, id_col="doc_id",
                                      text_col="text", hash_fn=hash_fn)
        bt.write.format("noop").mode("overwrite").save()
        return round(time.time() - t0, 3)

    def bands_pairs(hash_fn):
        t0 = time.time()
        pairs = dedup.minhash_lsh_candidates(docs, id_col="doc_id",
                                             text_col="text",
                                             hash_fn=hash_fn)
        pairs.write.format("noop").mode("overwrite").save()
        return round(time.time() - t0, 3)

    out = {"n": n, "runs": runs,
           "bands": {"md5": [], "xxhash64": []},
           "pairs": {"md5": [], "xxhash64": []}}
    for r in range(runs):
        for fn in ("md5", "xxhash64"):
            spark.sparkContext.setJobDescription(f"bands:{fn}:{r}")
            out["bands"][fn].append(bands_only(fn))
        for fn in ("md5", "xxhash64"):
            spark.sparkContext.setJobDescription(f"pairs:{fn}:{r}")
            out["pairs"][fn].append(bands_pairs(fn))
        print(f"# round {r}: {json.dumps(out)}", flush=True)
    for k in ("bands", "pairs"):
        out[f"{k}_min"] = {fn: min(v) for fn, v in out[k].items()}
    print("HASHFORM_RESULT " + json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()
