"""Windowing operators (SURVEY §2.9): tumbling / sliding / session windows and the
ContextWindow row-buffer, in both batch and streaming-compatible forms.

Batch forms use arithmetic on epoch seconds (floor to bucket) rather than
``F.window`` structs so the DuckDB oracle can express the identical bucketing;
streaming forms (streaming/) use the native ``window()``/``session_window()``.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def tumbling(df: DataFrame, ts_col: str, width_seconds: int,
             keys: list[str] | None = None, as_timestamp: bool = True) -> DataFrame:
    """Tumbling window groupBy: adds ``window_start`` (epoch-floored).

    ``as_timestamp=False`` keeps the bucket as an epoch-second BIGINT — the
    canonicalizer-safe form for oracle-checked outputs (driver value hashes
    drift on timestamp-typed columns)."""
    bucket = (F.unix_timestamp(F.col(ts_col)) / width_seconds).cast("bigint") * width_seconds
    if not as_timestamp:
        return df.withColumn("window_start", bucket)
    return df.withColumn("window_start", F.to_timestamp(F.from_unixtime(bucket)))


def sliding_last_n(df: DataFrame, key_col: str, ts_col: str, order_id: str,
                   n: int, value_col: str) -> DataFrame:
    """ST3 ContextWindow (memory/context_window.py:1-13): per key, stats over the
    last N rows ordered by time — ``rowsBetween(-N, 0)``."""
    w = (
        Window.partitionBy(key_col)
        .orderBy(F.col(ts_col).asc(), F.col(order_id).asc())
        .rowsBetween(-(n - 1), 0)
    )
    return df.withColumn("ctx_avg", F.avg(value_col).over(w)).withColumn(
        "ctx_count", F.count(value_col).over(w)
    )


def session_ids(df: DataFrame, key_col: str, ts_col: str,
                gap_seconds: int) -> DataFrame:
    """Batch session windows (ST2 analog): gaps-and-islands — a new session starts
    when the gap from the previous event exceeds ``gap_seconds``.  Adds
    ``session_id`` (per-key ordinal).  Oracle-expressible via lag + running sum.
    """
    w = Window.partitionBy(key_col).orderBy(F.col(ts_col).asc())
    prev_ts = F.lag(F.col(ts_col)).over(w)
    is_new = F.when(
        prev_ts.isNull()
        | ((F.unix_timestamp(F.col(ts_col)) - F.unix_timestamp(prev_ts)) > gap_seconds),
        1,
    ).otherwise(0)
    return df.withColumn("_new_session", is_new).withColumn(
        "session_id", F.sum("_new_session").over(w.rowsBetween(Window.unboundedPreceding, 0))
    ).drop("_new_session")
