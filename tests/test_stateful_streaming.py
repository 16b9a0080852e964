"""applyInPandasWithState EMA counters: stream result == sequential batch twin,
and state persists across micro-batches."""

import shutil
import tempfile

import pandas as pd
import pytest
from pyspark.sql import functions as F

from memory_opensource_spark.streaming.stateful import (
    ema_sequential_py,
    streaming_ema_counters,
)


def _write_batch(spark, d, rows, name):
    df = spark.createDataFrame(rows, "user_id string, ts string").select(
        "user_id", F.to_timestamp("ts").alias("ts")
    )
    # one part-file per logical batch: with maxFilesPerTrigger=1 each FILE is a
    # micro-batch, and multi-file batches would arrive in arbitrary order
    df.coalesce(1).write.mode("overwrite").parquet(f"{d}/in/{name}")


def test_streaming_ema_matches_sequential_twin(spark):
    d = tempfile.mkdtemp()
    try:
        rows = [
            ("u1", "2024-01-01 00:00:00"),
            ("u1", "2024-01-16 00:00:00"),
            ("u1", "2024-01-31 00:00:00"),
            ("u2", "2024-01-31 00:00:00"),
        ]
        _write_batch(spark, d, rows, "b0")
        stream = spark.readStream.schema("user_id string, ts timestamp").option(
            "maxFilesPerTrigger", "1"
        ).parquet(f"{d}/in/*")
        out = streaming_ema_counters(stream)
        q = (
            out.writeStream.format("memory").queryName("ema_out")
            .outputMode("update").trigger(availableNow=True)
            .option("checkpointLocation", f"{d}/ckpt").start()
        )
        q.awaitTermination(120)
        got = {r.key: r for r in spark.sql(
            "select * from (select *, row_number() over (partition by key order by hit_total desc) rn "
            "from ema_out) where rn = 1"
        ).collect()}
        ts_us = [int(pd.Timestamp(t).value // 1000) for _, t in rows[:3]]
        assert abs(got["u1"].ema - ema_sequential_py(ts_us)) < 1e-9
        assert got["u1"].hit_total == 3.0
        assert got["u2"].ema == 1.0
    finally:
        shutil.rmtree(d, ignore_errors=True)


def test_state_persists_across_micro_batches(spark):
    d = tempfile.mkdtemp()
    captured = []

    def sink(batch_df, batch_id):
        captured.extend(batch_df.collect())

    def run_once():
        stream = spark.readStream.schema("user_id string, ts timestamp").option(
            "maxFilesPerTrigger", "1"
        ).parquet(f"{d}/in/*")
        q = (
            streaming_ema_counters(stream)
            .writeStream.foreachBatch(sink)
            .outputMode("update").trigger(availableNow=True)
            .option("checkpointLocation", f"{d}/ckpt").start()
        )
        q.awaitTermination(120)

    try:
        _write_batch(spark, d, [("u1", "2024-01-01 00:00:00")], "b0")
        run_once()
        # second batch arrives 30 days later (one half-life): the resumed query
        # must decay the checkpointed state, not restart it
        _write_batch(spark, d, [("u1", "2024-01-31 00:00:00")], "b1")
        captured.clear()
        run_once()
        rows = [r for r in captured if r.key == "u1"]
        assert rows, "expected updated state for u1"
        r = max(rows, key=lambda r: r.hit_total)
        assert r.hit_total == 2.0
        assert abs(r.ema - (0.5 + 1.0)) < 1e-9  # decayed prior + fresh hit
    finally:
        shutil.rmtree(d, ignore_errors=True)
