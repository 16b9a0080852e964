"""Session compression tests (the /compress endpoint analog)."""

import pytest
from pyspark.sql import functions as F

from memory_opensource_spark.operators.compress import compress_sessions


@pytest.fixture(scope="module")
def messages(spark):
    rows = []
    # session u1: 10 old "setup" messages then 5 recent "deploy" messages
    for i in range(10):
        rows.append((i, "u1", f"2024-01-01 10:{i:02d}:00", "setup"))
    for i in range(5):
        rows.append((100 + i, "u1", f"2024-01-01 11:{i:02d}:00", "deploy"))
    df = spark.createDataFrame(rows, "event_id long, user_id string, ts string, event_type string")
    return df.select("event_id", "user_id", F.to_timestamp("ts").alias("ts"), "event_type")


def test_tiers_reflect_recency(messages):
    out = compress_sessions(messages, ["user_id"], short_n=5, medium_n=20, top_k=2).collect()
    assert len(out) == 1
    r = out[0]
    assert r.message_count == 15
    # the last 5 messages are all "deploy"
    assert r.short_term == "deploy"
    # whole session: setup dominates (10 vs 5)
    assert r.long_term == "setup, deploy"
    assert r.topics == "setup, deploy"
    assert r.last_updated is not None


def test_top_terms_tie_break_is_lexicographic(spark):
    rows = [(1, "u", "2024-01-01 10:00:00", "zeta"), (2, "u", "2024-01-01 10:01:00", "alpha")]
    df = spark.createDataFrame(rows, "event_id long, user_id string, ts string, event_type string")
    df = df.select("event_id", "user_id", F.to_timestamp("ts").alias("ts"), "event_type")
    r = compress_sessions(df, ["user_id"], top_k=2).collect()[0]
    assert r.long_term == "alpha, zeta"  # equal counts -> lexicographic
