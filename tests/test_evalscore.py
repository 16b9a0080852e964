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


def test_sequence_matcher_leg_matches_stdlib(spark):
    """r9 (VERDICT r8 task 6): the Arrow sequence_matcher path must be
    bit-identical to a driver-side difflib call on the same inputs.

    r10 (ADVICE): the pinned ordering is the REFERENCE's
    (calculate_query_scores.py:106,170) — lowercase FIRST, then slice to
    500, on BOTH sides.  Rows 6-7 + the long expected spec below diverge
    under the old truncate-then-lower / untruncated-expected form."""
    import difflib

    rows = [
        (1, "high pdp refrigerant leak detected in the flow rate sensor"),
        (2, "completely unrelated text about gardening and soil quality"),
        (3, ""),
        (4, None),
        (5, "x" * 1200 + " high pdp"),   # prefix cut at 500 chars
        # length-changing case folds straddling the 500 boundary:
        # 'İ'.lower() == 'i̇' (2 chars), 'ẞ'.lower() == 'ß' (1 char)
        (6, "İ" * 499 + "high pdp refrigerant leak"),
        (7, "ẞ" * 505 + " flow rate"),
    ]
    df = spark.createDataFrame(rows, "doc_id int, text string")
    for exp in (SPEC["expected_content"],
                # expected side longer than 500 chars — must be truncated
                "flow rate " * 80):
        got = {r.doc_id: r.s for r in df.select(
            "doc_id",
            E.sequence_matcher_similarity(F.col("text"), exp).alias("s"))
            .collect()}
        for i, txt in rows:
            want = (0.0 if txt is None else
                    difflib.SequenceMatcher(None, txt.lower()[:500],
                                            exp.lower()[:500]).ratio())
            assert got[i] == want, (i, got[i], want)


def test_sequence_matcher_vs_jaccard_ranking_agreement(spark):
    """r9 (VERDICT r8 task 6): ranking agreement between the Jaccard
    substitute and the reference's real difflib leg, measured on the full
    COMPOSITE 0-10 score over sf0.001 (the sim leg is 3 of 10 points).

    DOCUMENTED DIVERGENCE: the raw sim legs reorder the tail (difflib
    rewards in-order character runs, Jaccard token sets — raw-leg top-10
    overlap is as low as 3/10 on the fixture), but the composite orderings
    agree broadly: measured Spearman 0.89-0.95 and top-20 overlap 10-17/20
    per spec; pinned at rho > 0.85 / overlap >= 10.  Deterministic fixture
    -> deterministic values."""
    import numpy as np

    from memory_opensource_spark.queries import _EVAL_SPECS
    from memory_opensource_spark.sources import tables

    docs = tables.load(spark, "/root/testdata/sf0.001", "documents")
    for spec in _EVAL_SPECS:
        rows = docs.select(
            "doc_id",
            E.accuracy_score(F.col("text"), spec).alias("j"),
            E.accuracy_score(F.col("text"), spec,
                             similarity="sequence_matcher").alias("m"),
        ).collect()
        top_j = {r.doc_id for r in sorted(
            rows, key=lambda r: (-r.j, r.doc_id))[:20]}
        top_m = {r.doc_id for r in sorted(
            rows, key=lambda r: (-r.m, r.doc_id))[:20]}
        assert len(top_j & top_m) >= 10, (spec["spec_id"], top_j, top_m)
        j = np.array([r.j for r in rows])
        m = np.array([r.m for r in rows])
        rj = np.argsort(np.argsort(-j))
        rm = np.argsort(np.argsort(-m))
        rho = float(np.corrcoef(rj, rm)[0, 1])
        assert rho > 0.85, (spec["spec_id"], rho)
