"""End-to-end training-data pipeline composition probe (VERDICT r6 item 5).

The individual ops are oracle-green; this proves the NORTH-STAR composition:

    exact dedup -> exact-substring removal (Lee et al., text REWRITE feeds
    every later stage) -> MinHash/LSH near-dup -> SemDeDup -> LM-quality
    filter -> 8-gram decontamination -> shuffle-and-shard write
    -> token-budget shard accounting

runs as one driver script over a 600k-doc corpus with controlled duplicate
structure, with bounded lineage (plan size recorded per stage — no
per-stage explosion) and stage-by-stage wall/survivor accounting
(PERF.md round-7 section).

Corpus design (so every stage has real work):
  - 40% of ids alias an earlier base id      -> exact duplicates
  - ids % 7 == 3 are a one-token variant     -> MinHash near-duplicates
  - embeddings: 512-center clustered vectors -> SemDeDup prunes within-cluster
  - text from a small hashed vocabulary      -> LM tiers + hot gram joins
  - ids % 997 == 0 form the "benchmark" set  -> decontamination hits

Usage: python tools/pipeline_probe.py [n_rows]
"""

from __future__ import annotations

import os
import shutil
import sys
import time

sys.path.insert(0, ".")

SCRATCH = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                       ".scratch")


def main():
    import json

    from pyspark.sql import functions as F

    from memory_opensource_spark.functions import lm
    from memory_opensource_spark.operators import dedup
    from memory_opensource_spark.session import get_spark
    from memory_opensource_spark.sources import writers
    from memory_opensource_spark.sources.ann_index import train_centroids

    n = int(sys.argv[1]) if len(sys.argv) > 1 else 600_000
    # r9 (VERDICT r8 task 7): the Gopher/RefinedWeb per-domain quota runs as
    # stage 1c BY DEFAULT — the 9-stage composition is the probe of record;
    # --no-domain-cap restores the r8-comparable 8-stage run
    with_cap = "--no-domain-cap" not in sys.argv
    dim = 64
    spark = get_spark("pipeline-probe")
    spark.sparkContext.setLogLevel("ERROR")
    os.makedirs(SCRATCH, exist_ok=True)
    doc_path = os.path.join(SCRATCH, f"pipe_docs_{n}.parquet")
    emb_path = os.path.join(SCRATCH, f"pipe_emb_{n}_{dim}.parquet")
    shard_path = os.path.join(SCRATCH, f"pipe_shards_{n}")

    if not os.path.exists(doc_path):
        print(f"generating {n}-doc corpus with controlled dup structure ...")
        base = (F.col("id") % (n * 3 // 5)).alias("base")
        body = F.concat_ws(" ", F.transform(
            F.sequence(F.lit(0), F.lit(39)),
            lambda i: F.substring(
                F.md5(F.concat(F.col("base").cast("string"),
                               F.lit("_"), (i / F.lit(4)).cast("int")
                               .cast("string"))), 1, 6)))
        (spark.range(n).select(F.col("id").alias("doc_id"), base)
         .withColumn("text", F.when(
             F.col("doc_id") % 7 == 3,
             F.concat(body, F.lit(" zvariant"),
                      (F.col("doc_id") % 5).cast("string")))
             .otherwise(body))
         .drop("base")
         .write.mode("overwrite").parquet(doc_path))
    if not os.path.exists(emb_path):
        # semantic topology ALIGNED with the text corpus: docs sharing a
        # topic (base % 2048) sit near one center; zero-centered noise keeps
        # same-topic cosine ~0.93 vs cross-topic ~0.75, so SemDeDup prunes
        # within-topic redundancy without erasing the corpus
        print("generating aligned embedding corpus ...")
        centers = spark.range(2048).select(
            F.col("id").alias("cid"),
            F.array(*[F.rand(seed=5000 + i) for i in range(dim)]).alias("center"))
        (spark.range(n).select(
            F.col("id").alias("doc_id"),
            ((F.col("id") % (n * 3 // 5)) % 2048).alias("cid"),
            F.array(*[F.rand(seed=i) - F.lit(0.5)
                      for i in range(dim)]).alias("noise"))
         .join(F.broadcast(centers), "cid")
         .select("doc_id", F.zip_with(
             "center", "noise", lambda c, z: c + 0.5 * z).alias("embedding"))
         .write.mode("overwrite").parquet(emb_path))

    docs = spark.read.parquet(doc_path)
    emb = spark.read.parquet(emb_path).select("doc_id", "embedding")
    t_all = time.time()
    stages = []
    frames = []

    def plan_size(df):
        return len(df._jdf.queryExecution().optimizedPlan().toString()
                   .splitlines())

    def stage(name, df, t0):
        df = df.localCheckpoint()          # stage boundary: bound the lineage
        frames.append((name, df))
        cnt = df.count()
        stages.append({"stage": name, "rows": cnt,
                       "sec": round(time.time() - t0, 2)})
        print(f"{name:14s} {cnt:8d} rows  {time.time() - t0:6.2f}s")
        return df

    # 1. exact dedup: drop every non-canonical member of a hash group
    t0 = time.time()
    drop_exact = (dedup.exact_duplicates(docs)
                  .select(F.explode("dup_ids").alias("doc_id"), "canonical_id")
                  .filter(F.col("doc_id") != F.col("canonical_id"))
                  .select("doc_id"))
    docs1 = docs.join(drop_exact, "doc_id", "left_anti")
    docs1 = stage("exact_dedup", docs1, t0)

    # 1c (optional). per-domain frequency cap (round-8 op): a quarter of the
    # corpus lands on ONE synthetic megadomain; cap 2000 keeps a uniform
    # hash-ordered sample of it and passes the 40k tail domains wholesale —
    # the Gopher/RefinedWeb quota composed INTO the pipeline, skew-proof
    if with_cap:
        from memory_opensource_spark.operators import sampling

        t0 = time.time()
        domain = (F.when(F.pmod(F.col("doc_id"), F.lit(4)) == 0,
                         F.lit("megadomain"))
                  .otherwise(F.concat(F.lit("d"),
                                      F.pmod(F.xxhash64("doc_id"),
                                             F.lit(40_000)))))
        capped = sampling.cap_rows_per_group(
            docs1.withColumn("_dom", domain)
                 .withColumn("_ord", F.xxhash64(F.col("doc_id") + 17)),
            "_dom", 2_000, "_ord", id_col="doc_id")
        docs1 = stage("domain_cap", capped.select("doc_id", "text"), t0)

    # 1b. exact-substring removal (round-7 op): cut repeated >=20-token runs
    # except their first occurrence, REWRITING text for every later stage;
    # docs trimmed below 10 tokens drop (the length-filter contract).  The
    # near-dup variants share their base's long runs, so much of stage 2's
    # work is pre-empted here — a real composition interaction, recorded.
    t0 = time.time()
    rem = dedup.remove_duplicate_spans(docs1, k=20)
    docs1b = (rem.filter(F.col("n_tokens") - F.col("removed_tokens") >= 10)
              .select(F.col("id").alias("doc_id"),
                      F.col("text_dedup").alias("text")))
    docs1b = stage("span_removal", docs1b, t0)

    # 2. MinHash/LSH near-dup: drop the higher id of every >=0.5-Jaccard pair
    t0 = time.time()
    pairs = dedup.minhash_near_duplicates(docs1b, threshold=0.5,
                                          hash_fn="xxhash64")
    drop_near = (pairs.select(
        F.greatest("left_id", "right_id").alias("doc_id")).distinct())
    docs2 = docs1b.join(drop_near, "doc_id", "left_anti")
    docs2 = stage("minhash_dedup", docs2, t0)

    # 3. SemDeDup over the survivors' embeddings (C scales ~2*sqrt(N))
    t0 = time.time()
    sub = emb.join(docs2.select("doc_id"), "doc_id", "left_semi")
    C = 1200
    cents = train_centroids(sub.withColumnRenamed("doc_id", "vec_id"), C)
    print(f"{'  (centroids)':14s} {'':8s}       {time.time() - t0:6.2f}s")
    cents_df = spark.createDataFrame(
        [(i, c) for i, c in enumerate(cents)],
        "centroid_id int, embedding array<double>")
    sem = dedup.semantic_cluster_dedup(
        sub.withColumnRenamed("doc_id", "vec_id"), cents_df, 0.96,
        approx_centroid_rows=C)
    keep_sem = sem.filter(F.col("is_dup") == 0).select(
        F.col("id").alias("doc_id"))
    docs3 = docs2.join(keep_sem, "doc_id", "left_semi")
    docs3 = stage("semdedup", docs3, t0)

    # 4. LM quality: train on the trusted slice, keep head+middle tiers
    t0 = time.time()
    clean = docs3.filter(F.col("doc_id") % 10 == 0)
    uni, bi, vocab = lm.train_bigram_lm(clean)
    scored = lm.nll_score(docs3, uni, bi, vocab)
    tiers = lm.quality_buckets(scored, n_buckets=3)
    keep_lm = tiers.filter(F.col("bucket") <= 2).select(
        F.col("id").alias("doc_id"))
    docs4 = docs3.join(keep_lm, "doc_id", "left_semi")
    docs4 = stage("lm_filter", docs4, t0)

    # 5. decontamination: drop training docs sharing an 8-gram with the
    # benchmark slice (doc_id % 997 == 0; broadcast gram inverted index)
    t0 = time.time()
    from memory_opensource_spark.functions import text as tfn

    tk = tfn.tokens(F.col("text"))
    ng = F.size(tk)
    grams = F.when(ng >= 8, F.array_distinct(F.transform(
        F.sequence(F.lit(1), ng - 7),
        lambda i: F.xxhash64(F.concat_ws(" ", F.slice(tk, i, 8)))))) \
        .otherwise(F.array().cast("array<bigint>"))
    g = docs4.select("doc_id", grams.alias("gs"))
    ex = g.select("doc_id", F.explode("gs").alias("gram"))
    eval_g = ex.filter(F.col("doc_id") % 997 == 0).select("gram").distinct()
    dirty = (ex.filter(F.col("doc_id") % 997 != 0)
             .join(F.broadcast(eval_g), "gram")
             .select("doc_id").distinct())
    docs5 = (docs4.filter(F.col("doc_id") % 997 != 0)
             .join(dirty, "doc_id", "left_anti"))
    docs5 = stage("decontaminate", docs5, t0)

    # 6. shuffle-and-shard trainer layout
    t0 = time.time()
    shutil.rmtree(shard_path, ignore_errors=True)
    writers.shard_write(docs5, shard_path, n_shards=16, seed="r7")
    manifest = spark.read.parquet(shard_path)
    n_out = manifest.count()
    n_shards = manifest.select("shard").distinct().count()
    stages.append({"stage": "shard_write", "rows": n_out,
                   "sec": round(time.time() - t0, 2)})
    print(f"{'shard_write':14s} {n_out:8d} rows  {time.time() - t0:6.2f}s "
          f"({n_shards} shards)")

    # 7. token-budget shard accounting over the final corpus (round-7 op):
    # the data-loader view — how many 1M-token shards does the survivor
    # corpus fill, and do full shards hold the budget (+<=1 doc)?
    t0 = time.time()
    toks5 = docs5.select(
        "doc_id", F.size(tfn.tokens(F.col("text"))).cast("long")
        .alias("n_tokens"))
    tb = writers.shard_by_token_budget(toks5, 1_000_000)
    n_tb = tb.select("shard").distinct().count()
    stages.append({"stage": "token_budget", "rows": n_tb,
                   "sec": round(time.time() - t0, 2)})
    print(f"{'token_budget':14s} {n_tb:8d} shards {time.time() - t0:6.2f}s")

    sizes = {name: plan_size(d) for name, d in frames}
    print("optimized-plan lines per stage (lineage stays bounded):", sizes)
    assert max(sizes.values()) < 40, "stage lineage not bounded"
    print(json.dumps({"n": n, "total_sec": round(time.time() - t_all, 2),
                      "stages": stages, "final_rows": n_out,
                      "n_shards": n_shards, "plan_lines": sizes}))


if __name__ == "__main__":
    main()
