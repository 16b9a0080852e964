"""Feedback analytics operators vs the reference's expected numbers
(tests/test_feedback_analytics_end_to_end.py:38-84, feedback_routes.py:1042-1064)."""

import pyspark.sql.functions as F
import pytest

from memory_opensource_spark.operators import feedback as FB


@pytest.fixture(scope="module")
def scenario(spark):
    # The reference test scenario: one query log, three feedbacks —
    # thumbs_up cites memA+memB, copy_action cites memA, rating cites memB.
    rows = [
        ("q1", "thumbs_up", "memA"), ("q1", "thumbs_up", "memB"),
        ("q1", "copy_action", "memA"),
        ("q1", "rating", "memB"),
    ]
    return spark.createDataFrame(rows, "query_id string, feedback_type string, memory_id string")


def test_cited_confidence_matches_reference_numbers(scenario):
    fb = scenario.withColumn(
        "w", FB.citation_weight_col(F.col("feedback_type")))
    out = FB.cited_confidence_scores(fb, "query_id", "memory_id", "w")
    got = {r["memory_id"]: (r["weight"], r["confidence"]) for r in out.collect()}
    # memA: thumbs_up(1) + copy_action(2) = 3 -> 3/5 = 0.6
    # memB: thumbs_up(1) + rating(1) = 2 -> 2/5 = 0.4
    assert got == {"memA": (3, 0.6), "memB": (2, 0.4)}


def test_confidence_sums_to_one_per_scope(spark):
    rows = [("q%d" % (i % 3), "thumbs_up", "m%d" % (i % 7)) for i in range(50)]
    fb = (spark.createDataFrame(rows, "query_id string, feedback_type string, memory_id string")
          .withColumn("w", FB.citation_weight_col(F.col("feedback_type"))))
    out = FB.cited_confidence_scores(fb, "query_id", "memory_id", "w")
    sums = out.groupBy("query_id").agg(F.round(F.sum("confidence"), 4).alias("s")).collect()
    assert all(abs(r["s"] - 1.0) < 1e-3 for r in sums)


def test_engagement_signal_mapping(spark):
    cases = [
        ("thumbs_up", "thumbs_feedback"), ("thumbs_down", "thumbs_feedback"),
        ("rating", "rating_feedback"),
        ("copy_action", "user_action"), ("save_action", "user_action"),
        ("create_document", "user_action"),
        ("correction", "correction_feedback"), ("report", "report_feedback"),
        ("memory_relevance", "general_feedback"),
    ]
    df = spark.createDataFrame([(t,) for t, _ in cases], "feedback_type string")
    got = df.select("feedback_type",
                    FB.engagement_signal_col(F.col("feedback_type")).alias("sig")).collect()
    expect = dict(cases)
    assert all(expect[r["feedback_type"]] == r["sig"] for r in got)


def test_batch_trigger_paths(spark):
    # u1: sessions of 30 (2 full batches, in_session), 17 (1 full + 2 leftover,
    # flushed by session 3), 4 (last session -> pending).
    rows = [("u1", 1, 30), ("u1", 2, 17), ("u1", 3, 4), ("u2", 1, 15)]
    sess = spark.createDataFrame(
        rows, "user_id string, session_id long, message_count long")
    out = {(r["user_id"], r["session_id"]): (r["full_batches"], r["leftover"], r["flush_path"])
           for r in FB.batch_trigger_report(sess).collect()}
    assert out[("u1", 1)] == (2, 0, "in_session")
    assert out[("u1", 2)] == (1, 2, "next_session")
    assert out[("u1", 3)] == (0, 4, "pending")
    assert out[("u2", 1)] == (1, 0, "in_session")
