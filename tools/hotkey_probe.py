"""Hot-key resilience probe for the dedup family (VERDICT r7 tasks 1 + 8).

Real web corpora are Zipfian: one boilerplate k-token span (cookie banner,
licence footer) can appear in a third of all documents, and one content hash
can own half the corpus.  This probe plants exactly that and measures how
each dedup shape behaves, reading per-task runtime distributions from the
Spark status REST API so "no straggler" is evidence, not argument.

Part A — ExactSubstr span ops at 600k docs, k=50, one span planted in 70%
of documents (so the hot span key owns ~25% of all span rows):
  (a) legacy r7 shape: concat_ws k-token STRING spans + md5 +
      Window.partitionBy(span)         -- the shape VERDICT r7 flagged
  (b) rolling-hash spans + the same window  -- isolates the hash delta
  (c) production dedup.span_dup_fraction    -- rolling hash + map-side-
      combinable groupBy, no content-key window
  plus (d) production dedup.remove_duplicate_spans (min-struct groupBy +
  composite-key anti-join).
  HARD ASSERTS on (c)/(d): executed plan contains no Window node, and no
  task in any heavy stage runs > 2x its stage median.

Part B — the rest of the family:
  - jaccard_pairs with 50% of candidate rows sharing one id: asserts AQE
    skew-join splitting fires (`skew=true` in the final adaptive plan).
  - exact_duplicates / fingerprint_duplicates with 50% identical docs:
    map-side-combinable groupBy, task-balance measured.
  - minhash band join under a planted mega-bucket: demonstrates that the
    hazard there is OUTPUT amplification (|bucket|^2 pairs), which AQE
    input-size splitting CANNOT fix, and that the max_bucket cap bounds it.

Usage:  python tools/hotkey_probe.py [n_docs]
"""

from __future__ import annotations

import json
import sys
import time
import urllib.request

sys.path.insert(0, ".")

K = 50
BOILER = " ".join(f"b{i}" for i in range(K))


def _stage_ids(spark):
    base = spark.sparkContext.uiWebUrl
    app = spark.sparkContext.applicationId
    with urllib.request.urlopen(
            f"{base}/api/v1/applications/{app}/stages?status=complete") as r:
        return {s["stageId"]: s for s in json.load(r)}


def _task_balance(spark, before_ids, min_ms: int = 500):
    """Worst max/median task-runtime ratio over heavy stages completed since
    `before_ids`, plus shuffle-write bytes and peak execution memory.
    ``min_ms``: stages whose slowest task is under this are noise and
    skipped (raise it to 2000 when probing for scale-killer stragglers
    specifically — sub-second max/median ratios are scheduler jitter)."""
    base = spark.sparkContext.uiWebUrl
    app = spark.sparkContext.applicationId
    after = _stage_ids(spark)
    new = [s for sid, s in after.items() if sid not in before_ids]
    worst, worst_stage = 0.0, None
    shuffle_bytes = sum(s.get("shuffleWriteBytes", 0) for s in new)
    peak_mem = max((s.get("peakExecutionMemory", 0) for s in new), default=0)
    for s in new:
        if s.get("numCompleteTasks", 0) < 8:
            continue
        url = (f"{base}/api/v1/applications/{app}/stages/{s['stageId']}/"
               f"{s['attemptId']}/taskSummary?quantiles=0.0,0.5,1.0")
        try:
            with urllib.request.urlopen(url) as r:
                q = json.load(r)
        except Exception:
            continue
        lo, med, hi = q["executorRunTime"]
        if hi < min_ms:                   # sub-threshold stages are noise
            continue
        ratio = hi / max(med, 1.0)
        if ratio > worst:
            worst, worst_stage = ratio, (s["stageId"], int(med), int(hi))
    return worst, worst_stage, shuffle_bytes, peak_mem


def _legacy_span_fraction(docs, k, rolling):
    """The r7 window shape, reconstructed for the A/B (not exported)."""
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    from memory_opensource_spark.operators.dedup import _span_table
    from memory_opensource_spark.functions.text import tokens

    if rolling:
        spans = _span_table(docs, k, "doc_id", "text")
    else:
        tk = tokens(F.col("text"))
        spans = (docs
                 .select(F.col("doc_id").alias("id"), tk.alias("tk"))
                 .filter(F.size("tk") >= k)
                 .select("id", F.posexplode(
                     F.transform(
                         F.sequence(F.lit(0), F.size("tk") - k),
                         lambda j: F.concat_ws(" ", F.slice("tk", j + 1, k))),
                 ).alias("pos", "gram"))
                 .select("id", "pos", F.md5(F.col("gram")).alias("span")))
    counted = spans.withColumn(
        "_c", F.count("*").over(Window.partitionBy("span")))
    return (counted.groupBy("id")
            .agg(F.count("*").alias("n_spans"),
                 F.sum((F.col("_c") > 1).cast("long")).alias("dup_spans")))


def main():
    n_docs = int(sys.argv[1]) if len(sys.argv) > 1 else 600_000

    from pyspark.sql import functions as F
    from pyspark.sql import SparkSession

    from memory_opensource_spark.operators import dedup

    spark = (SparkSession.builder.master("local[8]")
             .appName("hotkey_probe")
             .config("spark.sql.shuffle.partitions", "64")
             .config("spark.driver.memory", "24g")
             .config("spark.sql.adaptive.enabled", "true")
             .getOrCreate())
    spark.sparkContext.setLogLevel("ERROR")

    # --- Part A: span ops ---------------------------------------------------
    # 70% hot docs: unique 1-token prefix + the 50-token boilerplate -> 2
    # spans each, the second IS the hot key (~0.42M occurrences of ONE span,
    # ~25% of all span rows).  30% cold docs: 61 unique-ish tokens, 12 spans.
    docs = (spark.range(n_docs)
            .withColumn("hot", F.col("id") % 10 < 7)
            .select(
                F.col("id").alias("doc_id"),
                F.when(F.col("hot"),
                       F.concat(F.lit("u"), F.col("id"), F.lit(" " + BOILER)))
                .otherwise(F.array_join(
                    F.transform(
                        F.sequence(F.lit(1), F.lit(61)),
                        lambda j: F.concat(
                            F.lit("t"),
                            F.pmod(F.xxhash64(F.col("id") * 100 + j),
                                   F.lit(5_000_000)))),
                    " ")).alias("text")))
    docs = docs.localCheckpoint()
    n_spans_total = n_docs * 7 // 10 * 2 + n_docs * 3 // 10 * 12
    print(f"Part A: {n_docs} docs, ~{n_spans_total} spans, hot span holds "
          f"~{n_docs * 7 // 10} occurrences "
          f"({100 * 0.7 * 2 / (0.7 * 2 + 0.3 * 12):.0f}% of span rows)\n")

    results = {}

    def run(label, df):
        before = _stage_ids(spark)
        t0 = time.time()
        df.agg(F.count("*"), F.sum("dup_spans")
               if "dup_spans" in df.columns else F.sum("removed_tokens")
               ).collect()
        dt = time.time() - t0
        ratio, stage, shuf, peak = _task_balance(spark, before)
        plan = df._jdf.queryExecution().executedPlan().toString()
        has_window = "Window" in plan
        results[label] = (dt, ratio, shuf, peak, has_window)
        print(f"{label:44s} {dt:7.2f}s  max/med task {ratio:5.2f}x "
              f"{('(stage %d: med %dms max %dms)' % stage) if stage else ''}  "
              f"shuffle {shuf / 1e6:.0f}MB  peakmem {peak / 1e6:.0f}MB  "
              f"window={has_window}")
        return ratio, has_window

    run("(a) legacy concat_ws+md5 + Window",
        _legacy_span_fraction(docs, K, rolling=False))
    run("(b) rolling hash + Window",
        _legacy_span_fraction(docs, K, rolling=True))
    rc, wc = run("(c) span_dup_fraction (groupBy, shipped)",
                 dedup.span_dup_fraction(docs, k=K))
    rd, wd = run("(d) remove_duplicate_spans (shipped)",
                 dedup.remove_duplicate_spans(docs, k=K))
    # (e) line_dedup under the same Zipfian density: the hot docs share the
    # boilerplate AS ONE LINE here (text has no newlines, so every doc is a
    # single line and 70% of docs collide on dedupe-by-line)
    re_, we = run("(e) line_dedup (groupBy+composite join, shipped)",
                  dedup.line_dedup(docs).select(
                      "id", F.col("kept_lines").alias("dup_spans")))

    assert not wc and not wd and not we, \
        "shipped dedup ops must not contain Window"
    assert rc < 2.0, f"span_dup_fraction straggler: {rc:.2f}x"
    assert rd < 2.0, f"remove_duplicate_spans straggler: {rd:.2f}x"
    assert re_ < 2.0, f"line_dedup straggler: {re_:.2f}x"
    print("\nPart A asserts PASS: no Window node, no task > 2x stage median "
          "in any shipped op\n")

    # --- Part B: family-wide hot keys ---------------------------------------
    # B1: jaccard refine join with 50% of candidate rows on ONE doc id ->
    # input-size skew on the candidates side; AQE must split it.
    nb = 200_000
    bdocs = (spark.range(nb)
             .select(F.col("id").alias("doc_id"),
                     F.array_join(
                         F.transform(F.sequence(F.lit(1), F.lit(30)),
                                     lambda j: F.concat(
                                         F.lit("w"),
                                         F.pmod(F.xxhash64(F.col("id") * 37 + j),
                                                F.lit(200_000)))),
                         " ").alias("text"))).localCheckpoint()
    ncand = 2_000_000
    cands = (spark.range(ncand)
             .select(F.when(F.col("id") % 2 == 0, F.lit(0))
                     .otherwise(F.pmod(F.xxhash64("id"), F.lit(nb)))
                     .alias("left_id"),
                     F.pmod(F.xxhash64(F.col("id") + 7), F.lit(nb))
                     .alias("right_id"))).localCheckpoint()
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    spark.conf.set("spark.sql.adaptive.autoBroadcastJoinThreshold", "-1")
    spark.conf.set("spark.sql.adaptive.skewJoin.enabled", "true")
    spark.conf.set("spark.sql.adaptive.skewJoin.skewedPartitionFactor", "2")
    # thresholds scaled DOWN to the probe's MB-sized partitions (production
    # defaults are 256m/64m — same mechanism, bigger units)
    spark.conf.set(
        "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes", "1m")
    spark.conf.set("spark.sql.adaptive.advisoryPartitionSizeInBytes", "512k")
    # the refine join's output feeds a second shuffle (the right_id join), so
    # splitting the skewed partition adds an exchange — Spark skips that
    # trade by default; at real scale the straggler costs more than the
    # exchange, which is exactly what this flag is for
    spark.conf.set("spark.sql.adaptive.forceOptimizeSkewedJoin", "true")
    jp = dedup.jaccard_pairs(bdocs, cands, threshold=0.0)
    before = _stage_ids(spark)
    t0 = time.time()
    # execute the df's OWN QueryExecution so the adaptive plan we inspect is
    # the final one (count() would build and execute a separate QE)
    ep = jp._jdf.queryExecution().executedPlan()
    ep.execute().count()
    dt = time.time() - t0
    ratio, stage, _, _ = _task_balance(spark, before)
    skew_fired = "skew=true" in ep.toString()
    print(f"B1 jaccard_pairs hot-id join: {dt:.2f}s  max/med {ratio:.2f}x  "
          f"AQE skew-split fired={skew_fired}")
    assert skew_fired, "AQE skew split did not fire on the refine join"
    spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.unset("spark.sql.adaptive.autoBroadcastJoinThreshold")

    # B2: exact/fingerprint dedup with 50% identical docs -> combinable
    # groupBy; the hot content hash reduces map-side.
    edocs = (spark.range(n_docs)
             .select(F.col("id").alias("doc_id"),
                     F.when(F.col("id") % 2 == 0, F.lit(BOILER))
                     .otherwise(F.concat(F.lit("unique "), F.col("id")))
                     .alias("text"))).localCheckpoint()
    before = _stage_ids(spark)
    t0 = time.time()
    dedup.fingerprint_duplicates(edocs).count()
    dt = time.time() - t0
    ratio, stage, _, _ = _task_balance(spark, before)
    print(f"B2 fingerprint_duplicates 50% one hash: {dt:.2f}s  "
          f"max/med {ratio:.2f}x")
    assert ratio < 2.0 or ratio == 0.0, f"fingerprint straggler {ratio:.2f}x"
    before = _stage_ids(spark)
    t0 = time.time()
    bounded = dedup.exact_duplicates(edocs, max_ids=0)
    n_groups = bounded.count()
    dt = time.time() - t0
    ratio, _, _, _ = _task_balance(spark, before)
    assert "dup_ids" not in bounded.columns
    print(f"B2 exact_duplicates(max_ids=0, bounded mode) 50% one hash: "
          f"{dt:.2f}s  max/med {ratio:.2f}x  ({n_groups} dup groups)")
    caps = dedup.exact_duplicates(edocs, max_ids=100).select(
        F.max(F.size("dup_ids"))).collect()[0][0]
    print(f"   max_ids=100 output cap: dup_ids len {caps} "
          f"(full list would be {n_docs // 2})")
    assert caps <= 100 and (ratio < 2.0 or ratio == 0.0)

    # B3: minhash band join under a planted mega-bucket.  AQE input-size
    # splitting does NOT guard this: a bucket of m docs contributes only m
    # INPUT rows per band but m^2/2 OUTPUT pairs — the blowup happens inside
    # the join.  The guard is the bucket cap.
    mega = 4_000
    mdocs = (spark.range(nb)
             .select(F.col("id").alias("doc_id"),
                     F.when(F.col("id") < mega, F.lit(BOILER))
                     .otherwise(F.array_join(
                         F.transform(F.sequence(F.lit(1), F.lit(30)),
                                     lambda j: F.concat(
                                         F.lit("w"),
                                         F.pmod(F.xxhash64(F.col("id") * 41 + j),
                                                F.lit(300_000)))),
                         " ")).alias("text"))).localCheckpoint()
    t0 = time.time()
    capped = dedup.minhash_lsh_candidates(
        mdocs, hash_fn="xxhash64", max_bucket=1_000).count()
    dt_cap = time.time() - t0
    t0 = time.time()
    full = dedup.minhash_lsh_candidates(mdocs, hash_fn="xxhash64").count()
    dt_full = time.time() - t0
    print(f"B3 band join, {mega}-doc mega-bucket: uncapped {full} pairs "
          f"{dt_full:.2f}s vs max_bucket=1000 {capped} pairs {dt_cap:.2f}s "
          f"(quadratic output suppressed {full / max(capped, 1):.0f}x)")
    assert capped < full

    # --- Part C: per-domain cap under a Zipfian domain -----------------------
    # 50% of 600k docs on ONE domain; cap 1000.  The window form would sort
    # 300k rows in one task; cap_rows_per_group buckets the hot domain into
    # range partitions.  Assert: result parity-checked structurally (every
    # group at min(count, cap)) and no task > 2x stage median.
    from memory_opensource_spark.operators.sampling import cap_rows_per_group

    cdocs = (spark.range(n_docs)
             .select(F.col("id").alias("doc_id"),
                     F.when(F.col("id") % 2 == 0, F.lit("megadomain"))
                     .otherwise(F.concat(F.lit("d"),
                                         F.pmod(F.xxhash64("id"), F.lit(50_000))))
                     .alias("domain"),
                     F.xxhash64(F.col("id") + 99).alias("ord"))
             ).localCheckpoint()
    before = _stage_ids(spark)
    t0 = time.time()
    capped = cap_rows_per_group(cdocs, "domain", 1_000, "ord",
                                id_col="doc_id")
    sizes = {r.domain: r.n for r in
             capped.groupBy("domain").agg(F.count("*").alias("n"))
             .filter(F.col("n") > 1_000).collect()}
    n_kept = capped.count()
    dt = time.time() - t0
    ratio, stage, _, _ = _task_balance(spark, before)
    print(f"C  cap_rows_per_group, 50% one domain, cap=1000: {dt:.2f}s  "
          f"max/med {ratio:.2f}x  kept {n_kept} rows, over-cap groups: "
          f"{sizes}")
    assert not sizes, f"quota violated: {sizes}"
    assert ratio < 2.0 or ratio == 0.0, f"cap straggler {ratio:.2f}x"

    print("\nAll hot-key asserts PASS")
    spark.stop()


if __name__ == "__main__":
    main()
