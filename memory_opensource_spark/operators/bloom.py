"""Spark-native Bloom filter for membership prefilters (r9).

The benchmark-decontamination join (queries.contamination_ngram — GPT-3
appendix C shape) broadcasts the eval set's n-grams as STRINGS.  That works
while the eval grams are a few MB; a consortium-scale held-out suite (100M+
grams) stops fitting a broadcast long before the corpus stops needing the
check.  The classic answer is a Bloom filter: ~1.2 GB of bits encodes 1e9
grams at 1% FP, broadcasts where the strings cannot, and the EXACT join
afterwards only sees the survivors — false positives cost a little refine
traffic, never correctness.

Spark ships BloomFilter machinery only behind `DataFrame.stat.bloomFilter`
(driver-side object, not usable as a Column) and the runtime-filter
internals (`bloom_filter_agg`, not in the public registry) — so this module
builds the standard partitioned-bitmap form out of public primitives:

  build:  k seeded xxhash64 positions per value -> explode ->
          (word = pos/64, bit = pos%64) -> groupBy(word).agg(bit_or(1<<bit))
          — map-side-combinable; the dense long[] materializes driver-side
          (num_bits/8 bytes — a sidecar, like the IVF codebook).
  probe:  the long[] rides ONE broadcast row (array<long> column, the house
          one-row-crossJoin pattern); membership is k JVM-side
          element_at/shiftleft tests — whole-stage codegen, no UDF.

No false negatives by construction (every true gram sets its own bits), so
`prefilter -> exact join` returns EXACTLY the unfiltered join's rows — the
oracle-able contract `contamination_bloom` pins.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def optimal_params(n_items: int, fpp: float = 0.01) -> tuple[int, int]:
    """Textbook sizing: m = -n ln p / (ln 2)^2 bits, k = (m/n) ln 2 hashes
    (rounded, floored at 1); m rounds up to a multiple of 64."""
    n = max(1, n_items)
    m = int(-n * math.log(fpp) / (math.log(2) ** 2))
    m = max(64, (m + 63) // 64 * 64)
    k = max(1, round(m / n * math.log(2)))
    return m, k


def bloom_build(df: DataFrame, col: str, num_bits: int, k: int) -> list[int]:
    """Aggregate df[col] into a dense Bloom bitmap (list of num_bits/64
    signed longs).  One combinable shuffle of (word, 64-bit partial) rows —
    at most num_bits/64 groups regardless of input size."""
    if num_bits % 64:
        raise ValueError("num_bits must be a multiple of 64")
    pos = (df.select(F.explode(F.array(*[
        F.pmod(F.xxhash64(F.lit(i), F.col(col)), F.lit(num_bits))
        for i in range(k)])).alias("p"))
        .select((F.col("p") / 64).cast("int").alias("w"),
                F.pmod(F.col("p"), F.lit(64)).cast("int").alias("b")))
    words = (pos.select("w", F.expr("shiftleft(1L, b)").alias("m"))
             .groupBy("w").agg(F.bit_or("m").alias("bits")).collect())
    dense = [0] * (num_bits // 64)
    for r in words:
        dense[r.w] = r.bits
    return dense


def bloom_save(spark, path: str, bits: list[int], num_bits: int,
               k: int) -> None:
    """Persist a built bitmap as a one-row parquet sidecar
    ({num_bits, k, bits array<long>}) — the cross-JOB reuse form (r12):
    a deployment builds the eval-suite bitmap once (the only O(eval)
    cost), and every later ingest run loads KBs-to-MBs of parquet instead
    of re-aggregating the gram table.  Companion of the in-session reuse
    the streaming sinks already do (bitmap built at wiring time)."""
    spark.createDataFrame(
        [(num_bits, k, bits)],
        "num_bits long, k int, bits array<long>",
    ).coalesce(1).write.mode("overwrite").parquet(path)


def bloom_load(spark, path: str) -> tuple[list[int], int, int]:
    """Load a :func:`bloom_save` sidecar -> (bits, num_bits, k)."""
    row = spark.read.parquet(path).head()
    return list(row.bits), int(row.num_bits), int(row.k)


def _bit_masks():
    """64 single-bit long masks as a literal array (bit 63 wraps to the
    signed-long sign bit) — indexing this beats shiftleft, whose python
    helper only takes an int shift amount."""
    vals = [(1 << j) if j < 63 else (1 << 63) - (1 << 64) for j in range(64)]
    return F.array(*[F.lit(v).cast("long") for v in vals])


def ngram_contamination_flags(docs: DataFrame, eval_grams: DataFrame,
                              bits: list[int], num_bits: int, k: int,
                              n: int = 8, id_col: str = "doc_id",
                              text_col: str = "text") -> DataFrame:
    """Per-doc benchmark-contamination flags via a PREBUILT Bloom bitmap
    (r10): explode each doc's word ``n``-grams, codegen-probe the broadcast
    bitmap, exact-refine the survivors against ``eval_grams`` ({gram}) —
    bit-identical to the plain join by the no-false-negative contract.

    Returns {id_col, n_shared_ngrams, contaminated} for EVERY input doc.
    The bitmap is an argument (not built here) so a STREAMING caller builds
    it once and reuses it across micro-batches — the build is the only
    O(eval) cost, and micro-batches pay O(batch grams) each."""
    from ..functions.text import tokens

    spark = docs.sparkSession
    tk = tokens(F.col(text_col))
    sz = F.size(tk)
    grams = F.when(
        sz >= n,
        F.array_distinct(F.transform(
            F.sequence(F.lit(1), sz - (n - 1)),
            lambda i: F.concat_ws(" ", F.slice(tk, i, n)),
        ))).otherwise(F.array().cast("array<string>"))
    ex = (docs.select(F.col(id_col), grams.alias("_gs"))
          .select(id_col, F.explode("_gs").alias("gram")))
    bf = spark.createDataFrame([(bits,)], "bf array<long>")
    cand = (ex.crossJoin(F.broadcast(bf))
            .filter(bloom_might_contain(F.col("bf"), F.col("gram"),
                                        num_bits, k))
            .drop("bf"))
    hits = (cand.join(eval_grams.select("gram"), "gram")
            .groupBy(id_col)
            .agg(F.countDistinct("gram").alias("n_hits")))
    return (docs.select(id_col).join(hits, id_col, "left")
            .select(id_col,
                    F.coalesce(F.col("n_hits"), F.lit(0)).cast("int")
                     .alias("n_shared_ngrams"),
                    (F.coalesce(F.col("n_hits"), F.lit(0)) > 0).cast("int")
                     .alias("contaminated")))


def bloom_might_contain(bits_col, value, num_bits: int, k: int):
    """Column predicate: every one of the k seeded positions is set in the
    broadcast bitmap column ``bits_col`` (array<long>).  Pure JVM
    expressions — element_at + a 64-entry mask-array lookup + bitwise and;
    whole-stage codegen, no UDF."""
    masks = _bit_masks()
    pred = F.lit(True)
    for i in range(k):
        p = F.pmod(F.xxhash64(F.lit(i), value), F.lit(num_bits))
        word = F.element_at(bits_col, (p / 64).cast("int") + 1)
        mask = F.element_at(masks, F.pmod(p, F.lit(64)).cast("int") + 1)
        pred = pred & (word.bitwiseAND(mask) != 0)
    return pred


def fuzzy_contamination_flags(corpus: DataFrame, eval_docs: DataFrame, *,
                              id_col: str = "doc_id",
                              text_col: str = "text",
                              eval_id_col: str = "eval_id",
                              eval_text_col: str = "text",
                              threshold: float | None = None,
                              hash_fn: str = "md5",
                              max_bucket: int | None = None) -> DataFrame:
    """FUZZY decontamination verdicts (r14 — the doc-level complement of
    the exact n-gram forms above; GPT-3 appendix C / The Pile's method):
    a corpus document is contaminated when its shingle-set Jaccard
    against ANY eval document reaches ``threshold`` (default
    semantics.NEAR_DUP_JACCARD).  Returns ``{id_col, contaminated}``
    for EVERY corpus doc.

    Shape (100 TB): MinHash band tables of BOTH sides (the oracle-gated
    dedup machinery), candidates by a CROSS-table equi-join on
    (band_idx, band_hash) — the eval side is benchmark-sized, so
    Catalyst broadcasts it and the corpus is never self-joined — then
    the exact-Jaccard refine on candidates only, then one distinct +
    left join for the verdict column.  ``max_bucket`` drops oversize
    CORPUS buckets from candidate generation (the output-amplification
    guard minhash_lsh_candidates documents; near-identical boilerplate
    that collides at that scale is caught by the exact n-gram pass this
    operator composes with)."""
    from ..semantics import NEAR_DUP_JACCARD
    from .dedup import minhash_band_table

    if threshold is None:
        threshold = NEAR_DUP_JACCARD
    cb = minhash_band_table(corpus, id_col, text_col, hash_fn=hash_fn)
    if max_bucket is not None:
        small = (cb.groupBy("band_idx", "band_hash")
                 .agg(F.count("*").alias("_n"))
                 .filter(F.col("_n") <= max_bucket)
                 .drop("_n"))
        cb = cb.join(small, ["band_idx", "band_hash"], "semi")
    eb = minhash_band_table(eval_docs, eval_id_col, eval_text_col,
                            hash_fn=hash_fn)
    # the eval side is benchmark-sized by definition — broadcast it
    # EXPLICITLY (the band kernel output carries no stats, so a static
    # plan would SortMergeJoin and only AQE would fix it at runtime)
    cands = (cb.alias("c")
             .join(F.broadcast(eb.alias("e")),
                   (F.col("c.band_idx") == F.col("e.band_idx"))
                   & (F.col("c.band_hash") == F.col("e.band_hash")))
             .select(F.col("c.id").alias("left_id"),
                     F.col("e.id").alias("right_id"))
             .distinct())
    # exact refine across the two tables (the jaccard_pairs algebra,
    # with each side's shingles joined from its own frame)
    from ..functions.text import shingles

    shc = corpus.select(F.col(id_col).alias("left_id"),
                        shingles(F.col(text_col)).alias("lsh_"))
    she = eval_docs.select(F.col(eval_id_col).alias("right_id"),
                           shingles(F.col(eval_text_col)).alias("rsh_"))
    hits = (cands.join(shc, "left_id").join(she, "right_id")
            .withColumn("inter", F.size(F.array_intersect("lsh_", "rsh_")))
            .withColumn("uni", F.size(F.array_union("lsh_", "rsh_")))
            .filter(F.col("inter").cast("double")
                    / F.greatest(F.col("uni"), F.lit(1)) >= threshold)
            .select(F.col("left_id").alias(id_col)).distinct())
    return (corpus.select(id_col)
            .join(hits.withColumn("_c", F.lit(1)), id_col, "left")
            .select(id_col,
                    F.coalesce(F.col("_c"), F.lit(0)).alias("contaminated")))


def fuzzy_decontaminate(corpus: DataFrame, eval_docs: DataFrame,
                        **kw) -> DataFrame:
    """Drop fuzzy-contaminated corpus rows (see
    :func:`fuzzy_contamination_flags`); returns surviving corpus rows
    with their original columns."""
    id_col = kw.get("id_col", "doc_id")
    flags = fuzzy_contamination_flags(corpus, eval_docs, **kw)
    return corpus.join(flags.filter(F.col("contaminated") == 1)
                       .select(id_col), id_col, "left_anti")
