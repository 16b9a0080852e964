"""Decompose dedup_minhash_bands' superlinear sf1 wall (r14).

The sf1 scale lane measured the row at 12.4-14.1 s vs 0.91 s at sf0.1 —
13.6x wall for exactly 10.0x tokens (measured) on 32 cores.  This probe
splits the pipeline at every seam, at a given SF dir, noop-sinked:

  A. scan+shingle explode only (no hashing)
  B. explode + 16 md5 columns (no agg)
  C. full signatures (explode + md5 + groupBy min)     [the suspect]
  D. full band table (C + band md5 + posexplode)       [the query]
  E. C with hash_fn=xxhash64                           [long buffers]
  F. D without fan_out (scan partitions as-is)
  G. D with fan_out to 2x cores

Usage: python tools/minhash_stage_probe.py [--sf DIR] [--runs N]
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, ".")


def main():
    args = sys.argv[1:]
    sf = "/root/repo/.scratch/sf1"
    runs = 3
    if "--sf" in args:
        i = args.index("--sf"); sf = args[i + 1]; del args[i:i + 2]
    if "--runs" in args:
        i = args.index("--runs"); runs = int(args[i + 1]); del args[i:i + 2]

    from pyspark.sql import functions as F

    from memory_opensource_spark.operators import dedup
    from memory_opensource_spark.operators.dedup import (
        minhash_band_table, minhash_signatures, shingle_grams)
    from memory_opensource_spark.session import get_spark
    from memory_opensource_spark.sources import tables
    from memory_opensource_spark.sources.tables import fan_out

    spark = get_spark("minhash-stage-probe")
    spark.sparkContext.setLogLevel("ERROR")
    docs = tables.load(spark, sf, "documents")
    docs.count()

    def t(label, df_fn):
        samples = []
        for r in range(runs):
            spark.sparkContext.setJobDescription(f"{label}:{r}")
            t0 = time.time()
            df_fn().write.format("noop").mode("overwrite").save()
            samples.append(round(time.time() - t0, 3))
        print(f"{label}: {samples} min {min(samples):.2f}", flush=True)
        return samples

    sh = lambda: fan_out(docs).select(
        F.col("doc_id").alias("id"),
        F.explode(shingle_grams(F.col("text"))).alias("shingle"))
    md5s = lambda: sh().select(
        "id", *[F.md5(F.concat(F.lit(f"{i}:"), F.col("shingle"))).alias(f"h{i}")
                for i in range(16)])

    out = {}
    out["A_explode"] = t("A_explode", sh)
    out["B_md5cols"] = t("B_md5cols", md5s)
    out["C_signatures_md5"] = t("C_signatures_md5",
                                lambda: minhash_signatures(docs))
    out["D_bands_md5"] = t("D_bands_md5", lambda: minhash_band_table(docs))
    out["E_signatures_xx"] = t("E_signatures_xx",
                               lambda: minhash_signatures(docs,
                                                          hash_fn="xxhash64"))
    out["F_bands_xx"] = t("F_bands_xx",
                          lambda: minhash_band_table(docs,
                                                     hash_fn="xxhash64"))
    out["G_agg_only"] = t(
        "G_agg_only",
        lambda: md5s().groupBy("id").agg(
            *[F.min(f"h{i}").alias(f"h{i}") for i in range(16)]))
    print("MINHASH_STAGE_RESULT " + json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()
