"""Session-5 scratch probe: serial per-piece walls of corpus_increment's
build at the bench fixture (sf0.1, warm state).  Replays the query's exact
inputs, then times each lane's checkpoint materialization SERIALLY so the
critical path is visible.  Usage: python tools/s5_increment_serial.py
"""
from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, ".")

SF = "/root/testdata/sf0.1"


def main():
    import tempfile

    from pyspark.sql import functions as F

    from memory_opensource_spark.operators import dedup
    from memory_opensource_spark.plans import corpus as cp
    from memory_opensource_spark.queries import QUERIES
    from memory_opensource_spark.session import get_spark
    from memory_opensource_spark.sources import tables

    spark = get_spark("s5-increment-serial")
    spark.sparkContext.setLogLevel("ERROR")
    spark.read.parquet(f"{SF}/region.parquet").count()
    QUERIES["corpus_increment_dedup"](spark, SF).count()   # warm + state

    tag = os.path.basename(os.path.normpath(SF))
    state = os.path.join(tempfile.gettempdir(), f"spark_graft_corpus_{tag}")
    fp_file = state + ".fingerprint"
    cut = int(open(fp_file).read().rsplit("\n", 1)[1])

    for run in range(2):
        marks = [("start", time.time())]

        def mark(name):
            marks.append((name, time.time()))

        docs = tables.load(spark, SF, "documents")
        emb_t = tables.load(spark, SF, "embeddings")
        emb = emb_t.select(F.col("vec_id").alias("doc_id"), "embedding")
        docs = docs.join(emb.select("doc_id"), "doc_id", "semi")
        batch_docs = (docs.filter(F.col("doc_id") >= cut)
                      .select("doc_id", "text").localCheckpoint(eager=False))
        batch_emb = (emb.filter(F.col("doc_id") >= cut)
                     .localCheckpoint(eager=False))
        mark("inputs_ckpt")

        p = cp._paths(state)
        cp._check_meta(spark, p, eps=0.35, jaccard_threshold=0.5,
                       hash_fn="md5")
        mark("meta")
        batch_ids = batch_docs.select(F.col("doc_id").alias("doc_id"))
        members = cp._read_state(spark, p["members"]) \
            .join(batch_ids, "doc_id", "left_anti")
        state_bands = cp._read_state(spark, p["bands"]) \
            .join(batch_ids, "doc_id", "left_anti")
        codebook = cp._read_state(spark, p["codebook"])
        mark("state_reads")

        batch_canon = cp._exact_survivors(batch_docs, "doc_id", "text")
        cp._check_alignment(batch_docs, batch_emb, "doc_id")
        mark("alignment")
        new_x = batch_canon.join(members.select("content_hash"),
                                 "content_hash", "left_anti") \
            .localCheckpoint(eager=False)
        mark("new_x")
        new_bands = dedup.minhash_band_table(
            batch_canon, id_col="doc_id", text_col="text",
            hash_fn="md5").localCheckpoint(eager=False)
        mark("new_bands")
        assign = cp._assign_clusters(
            new_x.select("doc_id"), batch_emb.select("doc_id", "embedding"),
            codebook, None).localCheckpoint(eager=False)
        mark("assign")

        r_old = state_bands.select("band_idx", "band_hash",
                                   F.col("doc_id").alias("r_id"),
                                   F.lit(0).alias("r_new"))
        r_new = new_bands.select("band_idx", "band_hash",
                                 F.col("id").alias("r_id"),
                                 F.lit(1).alias("r_new"))
        r_all = r_old.unionByName(r_new)
        cand = (new_bands.alias("l")
                .join(r_all.alias("r"),
                      (F.col("l.band_idx") == F.col("r.band_idx"))
                      & (F.col("l.band_hash") == F.col("r.band_hash"))
                      & ((F.col("r.r_new") == 0)
                         | (F.col("r.r_id") < F.col("l.id"))))
                .select(F.col("l.id").alias("left_id"),
                        F.col("r.r_id").alias("right_id"),
                        F.col("r.r_new").alias("r_new"))
                .distinct())
        right_src = (members.select("doc_id", "text")
                     .join(cand.filter(F.col("r_new") == 0)
                           .select(F.col("right_id").alias("doc_id"))
                           .distinct(),
                           "doc_id", "left_semi")
                     .unionByName(new_x.select("doc_id", "text")))
        refined = dedup.jaccard_pairs(
            right_src, cand.select("left_id", "right_id"),
            id_col="doc_id", text_col="text", threshold=0.5)
        near_drop = refined.select(F.col("left_id").alias("doc_id")) \
            .distinct().localCheckpoint(eager=False)
        mark("near_drop")

        prev = marks[0][1]
        out = []
        for name, t in marks[1:]:
            out.append(f"{name} {t-prev:.2f}")
            prev = t
        print(f"run {run}: " + "  ".join(out)
              + f"  TOTAL {marks[-1][1]-marks[0][1]:.2f}", flush=True)
    spark.stop()


if __name__ == "__main__":
    main()
