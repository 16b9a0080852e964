"""Accuracy-score formula vs the reference scorer
(tests/calculate_query_scores.py:78-185)."""

import pyspark.sql.functions as F

from memory_opensource_spark.functions import evalscore as E

SPEC = {
    "must_include": ["H2", "High PDP"],
    "keywords": ["H2", "High PDP", "refrigerant leak", "flow rate"],
    "expected_content": "high pdp refrigerant leak flow rate",
}


def _score(spark, content):
    df = spark.createDataFrame([(content,)], "text string")
    return df.select(E.accuracy_score(F.col("text"), SPEC).alias("s")).collect()[0]["s"]


def test_full_coverage_score(spark):
    # must 4.0 + keywords 3.0 + Jaccard 6/7 ("h2" is a content token but not an
    # expected token) * 3 = 2.571 -> 9.6 after round-1
    assert _score(spark, "h2 high pdp refrigerant leak flow rate") == 9.6


def test_empty_content_scores_zero(spark):
    assert _score(spark, "   ") == 0.0
    assert _score(spark, None) == 0.0


def test_partial_must_include_scales_by_fraction(spark):
    # only "H2" of the two must-includes -> 4 * 1/2 = 2.0 must points;
    # keywords: only "H2" of four -> 3 * 1/4 = 0.75; similarity: token "h2"
    # is not in expected tokens -> 0.  Total 2.8 after round-1.
    assert _score(spark, "h2") == 2.8


def test_case_insensitive_contains(spark):
    a = _score(spark, "REFRIGERANT LEAK detected near H2 sensor")
    b = _score(spark, "refrigerant leak detected near h2 sensor")
    assert a == b > 0


def test_score_monotone_in_keyword_coverage(spark):
    less = _score(spark, "high pdp")
    more = _score(spark, "high pdp refrigerant leak")
    assert more > less
