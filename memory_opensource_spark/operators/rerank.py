"""Rerank stage (R6/R7): the pluggable cross-encoder/LLM-judge slot.

The reference reranks top-k results with Cohere rerank v3.5
(memory/memory_graph.py:6939-6998) or an LLM judge returning
{score 1-10, confidence 0-1} with a neutral 5/0.5 on error (:6999-7105).
Here the scorer is a batch function over (query, content) pairs running in
mapInPandas — swap `deterministic_scorer` for a real model client with the
same signature.  Scores normalize to [0,1] and re-sort the results.
"""

from __future__ import annotations

from collections.abc import Callable, Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import DoubleType, StructField, StructType

NEUTRAL_SCORE = 0.5  # LLM-judge error fallback: 5/10 (memory_graph.py:7060)


def deterministic_scorer(query: str, contents: pd.Series) -> pd.Series:
    """Default scorer (SURVEY §2.10): token-overlap fraction between query and
    content — deterministic, monotone in true relevance for the fixtures."""
    q_toks = {t for t in query.lower().split() if t}

    def score(c):
        if not isinstance(c, str) or not q_toks:
            return NEUTRAL_SCORE
        c_toks = {t for t in c.lower().split() if t}
        return len(q_toks & c_toks) / len(q_toks)

    return contents.map(score)


def rerank_stage(results: DataFrame, query: str,
                 scorer: Callable[[str, pd.Series], pd.Series] = deterministic_scorer,
                 content_col: str = "content", id_col: str = "memory_id",
                 orig_score_col: str = "score") -> DataFrame:
    """Attach ``rerank_score`` via the scorer (Arrow-batched) and re-sort
    PURELY by it — the reference sorts by the rerank score alone
    (``sorted(scores, key=lambda x: x[0], reverse=True)``,
    memory_graph.py:7092-7093; the original similarity score is NOT fused —
    normalized rerank scores become ``confidence_scores`` downstream).  The
    reference's stable sort preserves the incoming (original-score) order on
    ties; a distributed engine must pin that explicitly, so ties break
    (orig score desc, id asc).  Errors inside the scorer degrade that batch
    to the neutral score rather than failing the query (the neutral-5
    fallback, :7060) — with every score neutral, the ordering collapses to
    the original ranking, exactly like the reference's stable sort."""
    schema = StructType(
        list(results.schema.fields) + [StructField("rerank_score", DoubleType())]
    )

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            try:
                s = scorer(query, pdf[content_col]).astype("float64")
                s = s.clip(0.0, 1.0)
            except Exception:  # noqa: BLE001 — neutral fallback per reference
                s = pd.Series([NEUTRAL_SCORE] * len(pdf))
            pdf = pdf.copy()
            pdf["rerank_score"] = s.to_numpy()
            yield pdf

    scored = results.mapInPandas(run, schema)
    return scored.orderBy(F.col("rerank_score").desc(),
                          F.col(orig_score_col).desc(), F.col(id_col).asc())
