"""Sinks: partitioned parquet layout + MERGE-style upserts.

The physical layout IS the index at 100 TB:
- ``chunks`` partitioned by (namespace_id, ivf_bucket): tenant filters and ANN
  probes both become partition pruning — the scan literally skips directories.
- ``memories``/``nodes`` partitioned by namespace_id.
- upsert = read-modify-write per partition here (plain parquet); on Delta this
  is MERGE INTO with file skipping — same logical contract (api._merge).

``write_partitioned``/``read_pruned`` are exercised by tests that assert
PartitionFilters actually appear in the physical plan.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def write_partitioned(df: DataFrame, path: str, partition_cols: list[str],
                      mode: str = "overwrite") -> None:
    df.write.mode(mode).partitionBy(*partition_cols).parquet(path)


def read_table(spark: SparkSession, path: str) -> DataFrame:
    return spark.read.parquet(path)


def upsert_parquet(spark: SparkSession, path: str, incoming: DataFrame,
                   keys: list[str], partition_cols: list[str] | None = None) -> None:
    """MERGE INTO semantics on a parquet table: replace rows matching on keys,
    keep the rest, rewrite.  (Delta would do this with file-level skipping; the
    logical result is identical.)"""
    try:
        existing = spark.read.parquet(path)
    except Exception as e:
        # ONLY a missing path means "table does not exist".  Any other read
        # failure (permissions, corrupt footer, transient storage error)
        # must propagate — swallowing it here would silently OVERWRITE the
        # whole table with just the incoming batch (round-5 review finding).
        if "PATH_NOT_FOUND" in str(e) or "Path does not exist" in str(e):
            existing = None
        else:
            raise
    if existing is not None:
        kept = existing.join(incoming.select(*keys).distinct(), keys, "left_anti")
        out = kept.unionByName(incoming, allowMissingColumns=True)
    else:
        out = incoming
    # materialize before overwrite (reading and overwriting the same path lazily
    # would truncate the input mid-scan)
    out_cached = out.localCheckpoint(eager=True)
    writer = out_cached.write.mode("overwrite")
    if partition_cols:
        writer = writer.partitionBy(*partition_cols)
    writer.parquet(path)


def write_bucketed(df: DataFrame, table: str, bucket_col: str, n_buckets: int,
                   sort_col: str | None = None, mode: str = "overwrite") -> None:
    """Bucketed managed table: co-locates rows by hash(bucket_col) at WRITE
    time, so equi-joins/aggregations on that column need NO shuffle at read
    time — the 'pre-partitioning for co-located joins' strategy.  At 100 TB
    this converts every chunk->memory join from a 2-sided shuffle into a
    zip of pre-sorted buckets."""
    w = df.write.mode(mode).bucketBy(n_buckets, bucket_col)
    if sort_col:
        w = w.sortBy(sort_col)
    w.saveAsTable(table)


def join_is_shuffle_free(left_table: str, right_table: str, on: str,
                         spark: SparkSession) -> bool:
    """True when joining the two (bucketed) tables on `on` produces a plan with
    no Exchange — the bucketing proof used by tests/PERF."""
    df = spark.table(left_table).join(spark.table(right_table), on)
    plan = df._jdf.queryExecution().executedPlan().toString()
    return "Exchange" not in plan


def compact(spark: SparkSession, path: str, target_files: int) -> int:
    """Small-file compaction: rewrite a parquet dir into ``target_files`` files.
    (At scale: run per partition after streaming ingest; file counts in the
    thousands per partition destroy scan planning time.)  Returns row count."""
    df = spark.read.parquet(path)
    out = df.coalesce(target_files).localCheckpoint(eager=True)
    out.write.mode("overwrite").parquet(path)
    return out.count()


def partition_pruning_evidence(spark: SparkSession, path: str,
                               pred_col: str, pred_val) -> tuple[DataFrame, bool]:
    """Return (filtered df, whether the physical plan shows PartitionFilters
    pruning on pred_col) — used by tests and PERF evidence."""
    df = spark.read.parquet(path).filter(F.col(pred_col) == pred_val)
    plan = df._jdf.queryExecution().executedPlan().toString()
    pruned = "PartitionFilters: [" in plan and pred_col in plan.split("PartitionFilters:")[1][:400]
    return df, pruned


def _zvalue(df: DataFrame, cols: list[str], bits: int = 12):
    """Morton (Z-order) key as a Column: each column is quantized to
    ``bits`` levels between its min and max, then the bit planes are
    interleaved.  Pure codegen arithmetic (shift/or over 64-bit longs) — no
    UDF, no shuffle of its own.  Quantization bounds come from one tiny
    agg (2 scalars per column, driver-broadcast literals)."""
    # Every interleaved bit position must fit a signed 64-bit long: Spark's
    # shiftleft wraps the shift amount mod 64, so bits*len(cols) > 63 would
    # SILENTLY fold high bit planes onto low positions and destroy the Morton
    # ordering (clustering quality collapses with no error).  Auto-reduce.
    if bits * len(cols) > 63:
        bits = 63 // len(cols)
        if bits < 1:
            raise ValueError(f"zorder: too many columns ({len(cols)}) — "
                             "cannot give each at least 1 bit in a 64-bit key")
    bounds = df.agg(*[f for c in cols
                      for f in (F.min(F.col(c).cast("double")).alias(f"lo_{c}"),
                                F.max(F.col(c).cast("double")).alias(f"hi_{c}"))]
                    ).first()
    levels = (1 << bits) - 1
    quantized = []
    for c in cols:
        blo, bhi = bounds[f"lo_{c}"], bounds[f"hi_{c}"]
        if blo is None or bhi is None:
            # empty input or all-NULL column: no meaningful clustering axis —
            # degrade to a constant key (single bucket) instead of crashing,
            # so compacting an emptied table stays a no-op
            quantized.append(F.lit(0).cast("long"))
            continue
        lo, hi = float(blo), float(bhi)
        span = (hi - lo) or 1.0
        q = F.least(
            F.lit(levels),
            F.floor((F.col(c).cast("double") - F.lit(lo)) / F.lit(span) * levels)
            .cast("long"),
        )
        quantized.append(F.greatest(F.lit(0).cast("long"), q))
    z = F.lit(0).cast("long")
    n = len(cols)
    for bit in range(bits):
        for j, q in enumerate(quantized):
            plane = F.shiftleft(
                F.shiftright(q, bit).bitwiseAND(F.lit(1)), bit * n + j
            )
            z = z.bitwiseOR(plane)
    return z


def zorder_write(df: DataFrame, path: str, cols: list[str],
                 n_files: int = 8, bits: int = 12,
                 mode: str = "overwrite") -> None:
    """Z-order clustering for MULTI-column data skipping (the SURVEY §7.1
    step-9 'Z-order' pass; Delta exposes the same thing as OPTIMIZE ZORDER
    BY).  Rows are range-partitioned and sorted by their Morton key, so each
    parquet file covers a small hyper-rectangle of the (col1, col2, ...)
    space — the footer MIN/MAX stats of EVERY clustered column become tight
    per file, and a predicate on ANY of the columns (not just the leading
    sort key, which is all a plain ORDER BY gives) skips most files/row
    groups at scan time.  Numeric columns only (strings hash first if
    needed).  The cost is one range-shuffle at write time; reads pay
    nothing."""
    z = _zvalue(df, cols, bits).alias("__z")
    out = (df.select("*", z)
           .repartitionByRange(n_files, F.col("__z"))
           .sortWithinPartitions("__z")
           .drop("__z"))
    out.write.mode(mode).parquet(path)


def shard_assignment(df: DataFrame, n_shards: int, seed: str,
                     id_col: str = "doc_id") -> DataFrame:
    """Deterministic shuffle-and-shard for training-data ordering (the
    corpus-prep step between dedup/filtering and the trainer's data loader:
    GPT-3/C4-style global example shuffling, sharded for parallel readers).

    Every row gets a pseudo-random permutation key ``md5(seed:id)`` —
    deterministic, partition-layout independent, reshuffled by changing the
    seed — then:

    - ``shard`` = first 8 hex digits of the key mod n_shards.  Hash-assigned,
      NOT row_number-assigned: no global sort, no single-partition window —
      embarrassingly parallel at any corpus size, balanced in expectation
      (per-shard skew is O(sqrt(N/n_shards)) by the balls-in-bins bound).
    - ``pos`` = rank within the shard ordered by (key, id) — the reader's
      deterministic batch order.  The window partitions by shard, so its sort
      is per-shard, never global.

    Adds {__key, shard, pos}.  All math is hex-string + conv — identical in
    any engine that has md5, so results are oracle-checkable bit-for-bit.
    """
    from pyspark.sql import Window

    key = F.md5(F.concat(F.lit(seed), F.lit(":"), F.col(id_col).cast("string")))
    out = df.withColumn("__key", key).withColumn(
        "shard",
        (F.conv(F.substring(F.col("__key"), 1, 8), 16, 10).cast("long")
         % n_shards).cast("int"))
    w = Window.partitionBy("shard").orderBy(F.col("__key").asc(),
                                            F.col(id_col).asc())
    return out.withColumn("pos", F.row_number().over(w))


def shard_by_token_budget(df: DataFrame, budget_tokens: int,
                          id_col: str = "doc_id",
                          tokens_col: str = "n_tokens",
                          range_partitions: int = 64,
                          rows_per_bucket: int = 4_000_000) -> DataFrame:
    """Token-budgeted sequential sharding: rows in ``id_col`` order are packed
    into shards of ~``budget_tokens`` each — ``shard = floor(exclusive prefix
    sum of tokens / budget)``.  The trainer-side complement to
    ``shard_assignment``: hash sharding balances document COUNTS, but data
    loaders budget TOKENS per shard/epoch slice (the GPT-3/Megatron corpus
    prep convention), and long-document skew makes the two very different.
    A document straddling a boundary belongs to the shard its FIRST token
    falls in (budgets are soft by at most one document); NULL token counts
    pack as 0.  Adds {shard}.

    EXACT ``sum(tokens) over (order by id rows between unbounded preceding
    and 1 preceding)`` semantics WITHOUT a single-partition window — the same
    distributed-prefix machinery as ``functions/lm.quality_buckets``:

    1. range-bucket rows by percentile boundaries of ``id_col`` (monotone, so
       bucket order == id order; accuracy only affects balance) — bucket
       count adaptive ``clamp(ceil(n/rows_per_bucket), 2, range_partitions)``
       (each boundary is a comparison term replicated into three plan keys;
       see the quality_buckets note on planning/codegen cost);
    2. per-bucket token TOTALS -> cumulative offsets in-plan (a broadcast
       self-join over <= range_partitions rows);
    3. exclusive prefix sum inside each bucket (window PARTITIONED by the
       range bucket) + broadcast offset = exact global prior-token count.
    """
    from pyspark.sql import Window

    df = df.localCheckpoint(eager=False)
    probs = [i / range_partitions for i in range(1, range_partitions)]
    head = df.agg(
        F.percentile_approx(F.col(id_col).cast("double"), probs, 10_000)
        .alias("b"),
        F.count("*").alias("n")).first()
    n_rows = head["n"]
    if n_rows == 0:
        return df.withColumn("shard", F.lit(None).cast("int"))
    k = int(min(range_partitions, max(2, -(-n_rows // rows_per_bucket))))
    raw = list(head["b"] or [])
    if k < range_partitions and raw:
        idx = [round(range_partitions * i / k) - 1 for i in range(1, k)]
        raw = [raw[j] for j in idx if 0 <= j < len(raw)]
    bounds = sorted(set(b for b in raw if b is not None))
    rb = F.lit(0)
    for b in bounds:
        rb = rb + (F.col(id_col).cast("double") > F.lit(float(b))).cast("int")
    # NULL ids: every comparison is NULL, so rb would be NULL and the
    # broadcast offsets join would silently DROP those rows (r8 sweep find).
    # Map them to bucket 0 — the window's orderBy sorts nulls first, so this
    # is the exact "nulls first" total order Spark's own sort would give.
    rb = F.coalesce(rb, F.lit(0))
    toks = F.coalesce(F.col(tokens_col).cast("long"), F.lit(0))
    out = df.withColumn("_rb", rb).withColumn("_tk", toks)

    sums = out.groupBy("_rb").agg(F.sum("_tk").alias("_s"))
    offs = (sums.alias("a")
            .join(sums.alias("b"), F.col("b._rb") < F.col("a._rb"), "left")
            .groupBy(F.col("a._rb").alias("_rb"))
            .agg(F.coalesce(F.sum("b._s"), F.lit(0)).alias("_off")))
    out = out.join(F.broadcast(offs), "_rb")

    w = (Window.partitionBy("_rb").orderBy(F.col(id_col).asc())
         .rowsBetween(Window.unboundedPreceding, -1))
    prior = F.col("_off") + F.coalesce(F.sum("_tk").over(w), F.lit(0))
    shard = F.floor(prior / F.lit(float(budget_tokens))).cast("int")
    return (out.withColumn("shard", shard)
            .drop("_rb", "_tk", "_off"))


def grouped_prefix_sum(df: DataFrame, group_col: str, order_col: str,
                       value_col: str, out_col: str = "prior",
                       range_partitions: int = 64,
                       rows_per_bucket: int = 4_000_000,
                       tie_col: str | None = None) -> DataFrame:
    """EXACT per-group exclusive prefix sum — ``sum(value) over (partition
    by group order by order rows unbounded preceding to 1 preceding)`` —
    WITHOUT a whole-group window partition (round 8: a 20-source corpus
    gives that window 20 tasks at ANY scale; a Zipfian group is one task).

    ``order_col`` must be UNIQUE within each group for a deterministic
    result (rows tied on order_col would get partition-layout-dependent
    prior sums); when it is not, pass a unique ``tie_col`` to break ties —
    it is appended to the intra-bucket window order.  Note the range
    buckets split on order_col alone, so order_col ties that straddle a
    bucket boundary still sum deterministically only when the tied rows'
    values land in the same bucket (ties never straddle: bucket membership
    is a pure function of order_col).

    Same machinery as :func:`shard_by_token_budget`, group-scoped: range-
    bucket rows by GLOBAL percentiles of ``order_col`` (monotone, so bucket
    order == order within every group too; a group's rows spread across all
    buckets), per-(group, bucket) totals -> per-group cumulative offsets
    (an equi-join on the group key, AQE-splittable), window partitioned by
    (group, bucket).  NULL group keys form one group (null-safe struct
    key); NULL order keys sort first, NULL values add 0.  Adds ``out_col``;
    drops nothing."""
    from pyspark.sql import Window

    cols = df.columns
    df = df.withColumn("_g", F.struct(F.col(group_col).alias("k"))) \
           .localCheckpoint(eager=False)
    probs = [i / range_partitions for i in range(1, range_partitions)]
    head = df.agg(
        F.percentile_approx(F.col(order_col).cast("double"), probs, 10_000)
        .alias("b"),
        F.count("*").alias("n")).first()
    n_rows = head["n"]
    if n_rows == 0:
        return df.drop("_g").withColumn(out_col, F.lit(None).cast("long"))
    k = int(min(range_partitions, max(2, -(-n_rows // rows_per_bucket))))
    raw = list(head["b"] or [])
    if k < range_partitions and raw:
        idx = [round(range_partitions * i / k) - 1 for i in range(1, k)]
        raw = [raw[j] for j in idx if 0 <= j < len(raw)]
    bounds = sorted(set(b for b in raw if b is not None))
    rb = F.lit(0)
    for b in bounds:
        rb = rb + (F.col(order_col).cast("double") > F.lit(float(b))).cast("int")
    out = df.withColumn("_rb", F.coalesce(rb, F.lit(0))).withColumn(
        "_v", F.coalesce(F.col(value_col).cast("long"), F.lit(0)))
    sums = out.groupBy("_g", "_rb").agg(F.sum("_v").alias("_s"))
    offs = (sums.alias("a")
            .join(sums.alias("b"),
                  (F.col("a._g") == F.col("b._g"))
                  & (F.col("b._rb") < F.col("a._rb")), "left")
            .groupBy(F.col("a._g").alias("_g"), F.col("a._rb").alias("_rb"))
            .agg(F.coalesce(F.sum("b._s"), F.lit(0)).alias("_off")))
    order_keys = [F.col(order_col).asc()]
    if tie_col is not None:
        order_keys.append(F.col(tie_col).asc())
    w = (Window.partitionBy("_g", "_rb").orderBy(*order_keys)
         .rowsBetween(Window.unboundedPreceding, -1))
    prior = F.col("_off") + F.coalesce(F.sum("_v").over(w), F.lit(0))
    return (out.join(offs, ["_g", "_rb"])
            .withColumn(out_col, prior.cast("long"))
            .select(*cols, out_col))


def shard_write(df: DataFrame, path: str, n_shards: int, seed: str,
                id_col: str = "doc_id", mode: str = "overwrite") -> None:
    """Materialize the sharded layout: one directory per shard, rows inside
    each file already in reader order.  repartition on shard BEFORE
    partitionBy — the dynamic-partition file-spray lesson (32 writers x
    n_shards small files otherwise)."""
    out = (shard_assignment(df, n_shards, seed, id_col)
           .repartition(n_shards, F.col("shard"))
           .sortWithinPartitions("shard", "pos")
           .drop("__key"))
    out.write.mode(mode).partitionBy("shard").parquet(path)


def file_stats_ranges(path: str, col: str) -> list[tuple]:
    """Per-file (min, max) of ``col`` from parquet footers — the skipping
    index a stats-aware reader uses; exposed for tests/PERF evidence."""
    import os

    import pyarrow.parquet as pq

    out = []
    for fn in sorted(os.listdir(path)):
        if not fn.endswith(".parquet"):
            continue
        md = pq.ParquetFile(os.path.join(path, fn)).metadata
        idx = {md.schema.column(i).name: i for i in range(md.num_columns)}[col]
        lo = hi = None
        for rg in range(md.num_row_groups):
            s = md.row_group(rg).column(idx).statistics
            if s is None or not s.has_min_max:
                continue
            lo = s.min if lo is None else min(lo, s.min)
            hi = s.max if hi is None else max(hi, s.max)
        out.append((lo, hi))
    return out


def files_matching(path: str, col: str, lo, hi) -> int:
    """How many files a [lo, hi] predicate on ``col`` must read, by footer
    stats — the measurable skipping win of zorder_write."""
    n = 0
    for flo, fhi in file_stats_ranges(path, col):
        if flo is None or not (hi < flo or lo > fhi):
            n += 1
    return n


def fixed_window_examples(df: DataFrame, window_tokens: int,
                          id_col: str = "doc_id",
                          tokens_col: str = "n_tokens") -> DataFrame:
    """Fixed-length training-example construction (r13) — the
    tokenize-concatenate-split step every causal-LM corpus ends with
    (GPT-3 arXiv:2005.14165 §2.3 packs documents into 2048-token
    contexts; T5/Megatron do the same): documents in ``id_col`` order
    form one conceptual token stream, cut every ``window_tokens``; each
    document yields one PIECE row per window it overlaps.

    Returns {id_col, window_id, doc_tok_start, doc_tok_end, win_offset}:
    the half-open token span [doc_tok_start, doc_tok_end) of the doc
    (document-local offsets — the trainer slices the doc's token array
    with them) landing in ``window_id`` at window-local position
    ``win_offset``.  Self-verifying invariants (test-pinned): a doc's
    pieces tile [0, n) exactly; every window's pieces sum to
    ``window_tokens`` except the last.

    Zero/NULL-token documents contribute nothing (filtered).

    Scale shape: the global stream position is the EXACT distributed
    prefix sum (:func:`grouped_prefix_sum` — range-bucketed, never a
    single-partition window), piece expansion is a bounded
    ``sequence()`` explode (<= n/W + 1 rows per doc), and every
    boundary is int64 arithmetic (``div``, no float division — a
    100 TB stream position exceeds double precision)."""
    if window_tokens < 1:
        raise ValueError(f"window_tokens must be >= 1, got {window_tokens}")
    src = (df.filter(F.col(tokens_col).isNotNull()
                     & (F.col(tokens_col) > 0))
           .select(F.col(id_col),
                   F.col(tokens_col).cast("long").alias("_n"))
           .withColumn("_all", F.lit(1)))
    pri = grouped_prefix_sum(src, "_all", id_col, "_n", "prior")
    W = int(window_tokens)
    start, end = F.col("prior"), F.col("prior") + F.col("_n")
    w0 = F.expr(f"prior div {W}")
    w1 = F.expr(f"(prior + _n - 1) div {W}")
    pieces = (pri.withColumn("window_id",
                             F.explode(F.sequence(w0, w1))))
    tok_start = F.greatest(start, F.col("window_id") * W)
    tok_end = F.least(end, (F.col("window_id") + 1) * W)
    return pieces.select(
        F.col(id_col),
        F.col("window_id"),
        (tok_start - start).alias("doc_tok_start"),
        (tok_end - start).alias("doc_tok_end"),
        (tok_start - F.col("window_id") * W).alias("win_offset"))


def shard_balanced_load(df: DataFrame, n_shards: int,
                        tokens_col: str = "n_tokens",
                        id_col: str = "doc_id",
                        range_buckets: int = 64) -> DataFrame:
    """Load-balanced sharding for a FIXED worker count (r13) — the
    data-parallel complement of :func:`shard_assignment` (count-balanced
    hash) and :func:`shard_by_token_budget` (size-governed shard count):
    N training workers each want the SAME token total, and document
    length skew makes hash assignment miss by the heavy tail.

    Serpentine (snake/folded) distribution: rank documents by
    (tokens DESC, id ASC) and deal rank r to

        pass = (r-1) // N,  pos = (r-1) % N
        shard = pos        if pass is even
              = N-1 - pos  if pass is odd

    — the closed-form cousin of LPT greedy scheduling (Graham 1969):
    each pass deals one doc per shard, the fold cancels the
    within-pass descending bias, and the max-shard excess is bounded by
    one document.  Deterministic, partition-layout independent.

    The global rank reuses the skew-proof grouped machinery with ONE
    group (range-bucketed by token value — no single-partition window).
    NULL token counts rank as 0 (they cost nothing to any shard).
    Adds {shard}; drops nothing."""
    if n_shards < 1:
        raise ValueError(f"n_shards must be >= 1, got {n_shards}")
    from ..operators.sampling import grouped_exact_ranks

    cols = df.columns
    prep = (df.withColumn("_g", F.struct(F.lit(1).alias("k")))
            .withColumn("_negtok",
                        -F.coalesce(F.col(tokens_col).cast("double"),
                                    F.lit(0.0))))
    ranked = grouped_exact_ranks(prep, "_negtok", id_col, range_buckets)
    r0 = F.col("_rk") - 1
    pas = F.floor(r0 / n_shards).cast("long")
    pos = r0 % n_shards
    shard = F.when(pas % 2 == 0, pos).otherwise(n_shards - 1 - pos)
    return ranked.select(*cols, shard.cast("int").alias("shard"))
