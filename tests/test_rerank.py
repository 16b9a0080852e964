"""Rerank stage tests: scorer plumbing, fusion, neutral fallback."""

import pandas as pd
import pytest
from pyspark.sql import functions as F

from memory_opensource_spark.operators import rerank


@pytest.fixture(scope="module")
def results(spark):
    return spark.createDataFrame(
        [("m1", 0.9, "completely unrelated text"),
         ("m2", 0.5, "spark engine distributed compute"),
         ("m3", 0.4, "the spark engine")],
        "memory_id string, score double, content string",
    )


def test_rerank_reorders_purely_by_rerank_score(results):
    """Reference sorts by the rerank score ALONE (memory_graph.py:7092-7093);
    the original vector score only breaks ties (the stable-sort prior order).
    m1's 0.9 original score must NOT keep it ahead of the relevant rows."""
    out = rerank.rerank_stage(results, "spark engine").collect()
    # m2/m3 mention both query terms (rerank 1.0) and tie -> orig score
    # breaks it (m2 0.5 > m3 0.4); m1 (rerank 0.0) drops LAST despite 0.9
    assert [r.memory_id for r in out] == ["m2", "m3", "m1"]
    by_id = {r.memory_id: r for r in out}
    assert by_id["m2"].rerank_score == 1.0
    assert by_id["m1"].rerank_score == 0.0


def test_rerank_neutral_fallback_on_scorer_error(results):
    def broken(query, contents):
        raise RuntimeError("model down")

    out = rerank.rerank_stage(results, "spark engine", scorer=broken).collect()
    assert all(r.rerank_score == rerank.NEUTRAL_SCORE for r in out)
    # all-neutral scores collapse the ordering to the original ranking —
    # exactly what the reference's stable sort does
    assert [r.memory_id for r in out] == ["m1", "m2", "m3"]


def test_rerank_custom_model_slot(results):
    def fake_cross_encoder(query, contents: pd.Series) -> pd.Series:
        return contents.str.len() / contents.str.len().max()  # any batch fn

    out = rerank.rerank_stage(results, "q", scorer=fake_cross_encoder).collect()
    assert len(out) == 3 and all(0 <= r.rerank_score <= 1 for r in out)
