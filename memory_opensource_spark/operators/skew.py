"""Skew mitigation: key salting for hot-key joins/aggregations.

AQE's skew-join handles most cases at runtime
(spark.sql.adaptive.skewJoin.enabled, on in session.get_spark); salting is the
explicit fallback for aggregations and for joins whose skew AQE can't split
(e.g. a single tenant holding 30% of 100 TB):

- aggregation: groupBy(key, salt) partial -> groupBy(key) final — two small
  shuffles instead of one stalled task;
- join: salt the skewed side, explode the replicated side over the salt range.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def with_salt(df: DataFrame, salt_cols: list[str], buckets: int,
              salt_col: str = "_salt") -> DataFrame:
    """Deterministic salt from stable row attributes (never rand() — replays
    must be idempotent, SURVEY §7.3).  ``salt_cols`` should include a row-level
    component (an id), not just the hot key, or the hot key won't split."""
    return df.withColumn(
        salt_col, F.pmod(F.xxhash64(*[F.col(c) for c in salt_cols]), F.lit(buckets))
    )


def salted_count(df: DataFrame, key_col: str, buckets: int = 16) -> DataFrame:
    """Two-phase skew-safe count: per-(key,salt) partial, then per-key final.
    spark_partition_id is the row-level salt — replay-safe for aggregation
    because the final sum is salt-invariant."""
    salted = df.withColumn("_salt", F.spark_partition_id() % buckets)
    partial = salted.groupBy(key_col, "_salt").agg(F.count("*").alias("_c"))
    return partial.groupBy(key_col).agg(F.sum("_c").alias("count"))


def salted_join(big: DataFrame, small: DataFrame, key_col: str,
                buckets: int = 8) -> DataFrame:
    """Skewed equi-join: salt the big side per-row, replicate the small side
    across the salt range, join on (key, salt).  Each hot key spreads over
    ``buckets`` tasks."""
    big_salted = big.withColumn("_salt", F.spark_partition_id() % buckets)
    salt_range = F.explode(F.sequence(F.lit(0), F.lit(buckets - 1))).alias("_salt")
    small_rep = small.select("*", salt_range)
    out = big_salted.join(small_rep, [key_col, "_salt"]).drop("_salt")
    return out
