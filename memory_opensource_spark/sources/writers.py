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
    except Exception:
        existing = None
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
