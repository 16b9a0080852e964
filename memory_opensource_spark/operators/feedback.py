"""Feedback analytics: cited-memory confidence scores, engagement rollups, and
the cross-session batch-trigger decision.

Reference semantics:
- Cited-memory confidence (tests/test_feedback_analytics_end_to_end.py:38-84):
  each positive feedback event contributes a type weight to every memory it
  cites (thumbs_up/rating = 1, copy/save user-actions = 2); per query scope the
  scores normalize to sum 1 (memA 3/5 = 0.6, memB 2/5 = 0.4 in the reference
  test).
- Engagement-signal mapping (routers/v1/feedback_routes.py:1042-1064):
  thumbs_up/thumbs_down -> thumbs_feedback, rating -> rating_feedback,
  copy_action/save_action/create_document -> user_action, correction ->
  correction_feedback, report -> report_feedback, else general_feedback.
- Batch trigger (services/message_service.py:678-712): a session's messages are
  analyzed in batches of 15; when a NEW session starts, any unprocessed
  leftover of the previous session is flushed — so only a user's LAST session
  can hold pending messages.

All three are plain groupBy/window plans: one shuffle each on the grouping
key, codegen'd CASE expressions, no UDFs — scan-parallel at any corpus size.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

# Deterministic fixture mapping: event_type -> reference FeedbackType
# (models/shared_types.py:751-762).  The five synthetic event types stand in
# for the five feedback shapes a live deployment records.
EVENT_FEEDBACK_TYPE = {
    "click": "thumbs_up",
    "view": "rating",
    "purchase": "copy_action",
    "signup": "save_action",
    "error": "report",
}

# Positive citation weights (tests/test_feedback_analytics_end_to_end.py:80-84:
# thumbs_up=1, copy_action=2, rating=1; user-action types count double).
# report/thumbs_down carry no citation weight.
FEEDBACK_WEIGHT = {
    "thumbs_up": 1,
    "rating": 1,
    "copy_action": 2,
    "save_action": 2,
    "report": 0,
}


def feedback_type_col(event_type: Column) -> Column:
    expr = F.lit(None).cast("string")
    for etype, ftype in EVENT_FEEDBACK_TYPE.items():
        expr = F.when(event_type == etype, F.lit(ftype)).otherwise(expr)
    return expr


def citation_weight_col(feedback_type: Column) -> Column:
    expr = F.lit(0)
    for ftype, w in FEEDBACK_WEIGHT.items():
        expr = F.when(feedback_type == ftype, F.lit(w)).otherwise(expr)
    return expr


def engagement_signal_col(feedback_type: Column) -> Column:
    """routers/v1/feedback_routes.py:1049-1061 verbatim mapping."""
    return (
        F.when(feedback_type.isin("thumbs_up", "thumbs_down"), "thumbs_feedback")
        .when(feedback_type == "rating", "rating_feedback")
        .when(feedback_type.isin("copy_action", "save_action", "create_document"),
              "user_action")
        .when(feedback_type == "correction", "correction_feedback")
        .when(feedback_type == "report", "report_feedback")
        .otherwise("general_feedback")
    )


def cited_confidence_scores(feedback: DataFrame, scope_col: str,
                            memory_col: str, weight_col: str = "weight",
                            ) -> DataFrame:
    """Per-scope normalized cited-memory confidence.

    ``feedback`` rows: one per (feedback event, cited memory) with a positive
    integer ``weight_col``.  Output adds ``confidence`` = weight share within
    the scope (sums to 1.0 per scope, matching the reference's
    citedMemoryConfidenceScores).  Plan: one shuffle on (scope, memory) for the
    partial-aggregated sum, then a scope window that reuses the hash
    partitioning — no driver work.
    """
    agg = (feedback.groupBy(scope_col, memory_col)
           .agg(F.sum(weight_col).cast("bigint").alias("weight")))
    total = F.sum("weight").over(Window.partitionBy(scope_col))
    return agg.withColumn(
        "confidence", F.round((F.col("weight") / total).cast("double"), 6))


def engagement_rollup(feedback: DataFrame, ts_col: str = "ts",
                      value_col: str = "value") -> DataFrame:
    """Daily engagement-signal rollup (QueryLog engagement analytics):
    count + mean score per (day, signal).  Single shuffle on the rollup key.
    ``day`` is the day-bucket as epoch-second BIGINT (canonicalizer-safe)."""
    day = F.unix_timestamp(F.date_trunc("day", F.col(ts_col))).alias("day")
    sig = engagement_signal_col(F.col("feedback_type")).alias("engagement_signal")
    return (feedback.groupBy(day, sig)
            .agg(F.count("*").alias("feedback_count"),
                 F.round(F.avg(F.col(value_col)).cast("double"), 6)
                 .alias("mean_score")))


def batch_trigger_report(sessions: DataFrame, user_col: str = "user_id",
                         session_col: str = "session_id",
                         count_col: str = "message_count",
                         batch_size: int = 15) -> DataFrame:
    """services/message_service.py:678-712 as a set-level audit: for every
    (user, session) with ``count_col`` messages, how many full batches the
    15-message threshold triggered in-session, the leftover count, and which
    path flushes the leftover — the next session's start, or (for the user's
    final session only) still pending.

    The "last session" compare uses the ordering of ``session_col`` — correct
    for this engine's session ids (windows.session_ids emits per-user BIGINT
    ordinals, monotone in time).  String ids would compare lexicographically
    ('sess_9' > 'sess_10'), so non-numeric callers must pass a
    chronologically ordered key; enforced below rather than silently
    misclassifying flush paths."""
    from pyspark.sql.types import NumericType

    if not isinstance(sessions.schema[session_col].dataType, NumericType):
        raise ValueError(
            f"{session_col} must be numeric (chronologically ordered); "
            "string session ids compare lexicographically and would "
            "misclassify next_session/pending flush paths"
        )
    full = F.floor(F.col(count_col) / batch_size).cast("bigint")
    leftover = (F.col(count_col) % batch_size).cast("bigint")
    last_sess = F.max(session_col).over(Window.partitionBy(user_col))
    flush = (
        F.when(leftover == 0, "in_session")
        .when(F.col(session_col) < last_sess, "next_session")
        .otherwise("pending")
    )
    return (sessions
            .withColumn("full_batches", full)
            .withColumn("leftover", leftover)
            .withColumn("flush_path", flush))
