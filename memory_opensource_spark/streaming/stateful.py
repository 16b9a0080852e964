"""Custom stateful streaming operator (ST5 true-streaming form):
per-key time-decayed EMA counters via applyInPandasWithState.

Batch mode recomputes EMAs from timestamps (ranking.ema_counters — replay-safe);
this is the micro-batch state-store form for continuous pipelines: state =
(ema, hit_total, last_ts), update = decay-then-add, identical arithmetic to
services/memory_management.py:3177-3342 so batch and stream agree.
"""

from __future__ import annotations

from collections.abc import Iterator
from typing import Any

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import (
    DoubleType,
    LongType,
    StringType,
    StructField,
    StructType,
    TimestampType,
)

from ..semantics import EMA_HALF_LIFE_DAYS

STATE_SCHEMA = StructType([
    StructField("ema", DoubleType()),
    StructField("hit_total", DoubleType()),
    StructField("last_ts_us", LongType()),
])

OUTPUT_SCHEMA = StructType([
    StructField("key", StringType()),
    StructField("ema", DoubleType()),
    StructField("hit_total", DoubleType()),
    StructField("last_ts", TimestampType()),
])


def _update(key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState) -> Iterator[pd.DataFrame]:
    half_life_s = EMA_HALF_LIFE_DAYS * 86400.0
    if state.exists:
        ema, hits, last_us = state.get
    else:
        ema, hits, last_us = 0.0, 0.0, None
    # concat ALL chunks before sorting: the iterator yields per-partition pdfs
    # in arbitrary order, and decay-then-add is order-sensitive
    all_pdf = pd.concat(list(pdfs), ignore_index=True)
    if len(all_pdf):
        all_pdf = all_pdf.sort_values("ts")
        for ts in all_pdf["ts"]:
            ts_us = int(ts.value // 1000)  # pandas ns -> us
            if last_us is not None:
                delta_s = max((ts_us - last_us) / 1e6, 0.0)
                ema *= 0.5 ** (delta_s / half_life_s)
            ema += 1.0
            hits += 1.0
            last_us = ts_us
    state.update((ema, hits, last_us))
    yield pd.DataFrame(
        {"key": [key[0]], "ema": [ema], "hit_total": [hits],
         "last_ts": [pd.Timestamp(last_us * 1000)]}
    )


def streaming_ema_counters(stream: DataFrame, key_col: str = "user_id",
                           ts_col: str = "ts") -> DataFrame:
    """stream must have (key_col, ts_col).  Emits one row per key per
    micro-batch with the updated (ema, hit_total, last_ts)."""
    keyed = stream.select(F.col(key_col).cast("string").alias("key"),
                          F.col(ts_col).alias("ts"))
    return keyed.groupBy("key").applyInPandasWithState(
        _update, OUTPUT_SCHEMA, STATE_SCHEMA, "update", GroupStateTimeout.NoTimeout
    )


def ema_sequential_py(timestamps_us: list[int],
                      half_life_days: float = EMA_HALF_LIFE_DAYS) -> float:
    """Driver-side twin (for tests): sequential decay-then-add over sorted ts."""
    half_life_s = half_life_days * 86400.0
    ema, last = 0.0, None
    for t in sorted(timestamps_us):
        if last is not None:
            ema *= 0.5 ** ((t - last) / 1e6 / half_life_s)
        ema += 1.0
        last = t
    return ema
