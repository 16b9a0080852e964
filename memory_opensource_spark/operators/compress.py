"""Session compression (COMPRESS_ENDPOINT_GUIDE.md / GET
/v1/messages/sessions/{id}/compress): reduce a message stream into tiered
summaries for LLM context windows.

The reference generates short/medium/long-term summaries + topics with an LLM;
the engine computes the same *shape* deterministically (top-terms per tier), and
the summarizer is pluggable exactly like the reranker: swap the term-ranking
stage for an LLM call without touching the windowing.

Tiers (reference semantics):
- short_term  : the most recent ``short_n`` messages
- medium_term : the most recent ``medium_n`` messages
- long_term   : the whole session
- topics      : top-k terms of the whole session
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def _top_terms(df: DataFrame, group_cols: list[str], term_col: str, k: int,
               out_col: str) -> DataFrame:
    counts = df.groupBy(*group_cols, term_col).agg(F.count("*").alias("c"))
    w = Window.partitionBy(*group_cols).orderBy(F.col("c").desc(), F.col(term_col).asc())
    # collect_list does NOT preserve order — collect (rank, term) structs and
    # sort before joining, or the summary string is nondeterministic
    return (
        counts.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= k)
        .groupBy(*group_cols)
        .agg(
            F.array_join(
                F.transform(
                    F.array_sort(F.collect_list(F.struct("rn", F.col(term_col).alias("t")))),
                    lambda x: x["t"],
                ),
                ", ",
            ).alias(out_col)
        )
    )


def compress_sessions(messages: DataFrame, session_cols: list[str],
                      ts_col: str = "ts", order_id: str = "event_id",
                      term_col: str = "event_type",
                      short_n: int = 5, medium_n: int = 20,
                      top_k: int = 3) -> DataFrame:
    """One row per session: {*session_cols, message_count, short_term,
    medium_term, long_term, topics, last_updated}."""
    w = Window.partitionBy(*session_cols).orderBy(
        F.col(ts_col).desc(), F.col(order_id).desc()
    )
    recency = messages.withColumn("_recency", F.row_number().over(w))

    short = _top_terms(recency.filter(F.col("_recency") <= short_n),
                       session_cols, term_col, top_k, "short_term")
    medium = _top_terms(recency.filter(F.col("_recency") <= medium_n),
                        session_cols, term_col, top_k, "medium_term")
    long_ = _top_terms(recency, session_cols, term_col, top_k, "long_term")
    topics = _top_terms(recency, session_cols, term_col, top_k, "topics")

    base = messages.groupBy(*session_cols).agg(
        F.count("*").alias("message_count"),
        F.max(ts_col).alias("last_updated"),
    )
    out = base
    for t in (short, medium, long_, topics):
        out = out.join(t, session_cols, "left")
    return out
