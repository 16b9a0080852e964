"""Retrieval-quality accuracy scoring — the reference's eval harness
(tests/calculate_query_scores.py:78-185) as codegen'd Column expressions.

Score (0-10) per (expected-answer spec, retrieved content):
- must-include coverage: found/total * 4, capped at 4
- keyword coverage:      found/total * 3, capped at 3
- content similarity:    similarity * 3

The reference's similarity leg is difflib.SequenceMatcher.ratio() over the
first 500 lowercased chars — a Python-only algorithm with no SQL analog in
either engine.  DELIBERATE DEVIATION: we substitute token-set Jaccard over the
same 500-char prefix (deterministic, expressible identically in Spark and
DuckDB, and monotone in overlap like the original).  Everything else follows
the reference formula, including the round-to-1-decimal and the 0-10 clamp.

All scoring is literal-keyword `contains` + array set ops on a split — pure
whole-stage-codegen, no UDF, scan-parallel: scoring a 100 TB corpus against a
spec list is a single map pass.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def _tokens(col: Column) -> Column:
    """lower, split on single space, drop empties, dedup — the engine-parity
    tokenization used across the battery (functions/text.py)."""
    return F.array_distinct(
        F.filter(F.split(F.lower(col), " "), lambda t: t != ""))


def coverage_points(content_lower: Column, keywords: list[str],
                    max_points: float) -> Column:
    """found/total * max_points, capped — reference lines 117-136/139-165."""
    if not keywords:
        return F.lit(0.0)
    found = sum(
        (F.when(content_lower.contains(k.lower()), 1).otherwise(0)
         for k in keywords),
        F.lit(0),
    )
    pts = found.cast("double") / F.lit(float(len(keywords))) * F.lit(max_points)
    return F.least(F.lit(max_points), pts)


def jaccard_similarity(content: Column, expected_content: str,
                       prefix_chars: int = 500) -> Column:
    """Token-set Jaccard over the first ``prefix_chars`` chars (the documented
    SequenceMatcher substitute)."""
    toks = _tokens(F.substring(content, 1, prefix_chars))
    exp = sorted({t for t in expected_content.lower().split(" ") if t})
    exp_arr = F.array(*[F.lit(t) for t in exp])
    inter = F.size(F.array_intersect(toks, exp_arr)).cast("double")
    union = F.size(F.array_union(toks, exp_arr)).cast("double")
    return F.when(union > 0, inter / union).otherwise(F.lit(0.0))


def sequence_matcher_similarity(content: Column, expected_content: str,
                                prefix_chars: int = 500) -> Column:
    """The reference's ACTUAL similarity leg — ``difflib.SequenceMatcher(
    None, content.lower()[:500], expected.lower()[:500]).ratio()`` — as a
    batched Arrow UDF (r9, VERDICT r8 task 6: the exact-parity scoring path
    beside the documented Jaccard substitute).  Order matters and matches
    the reference exactly (calculate_query_scores.py:106,169-170):
    lowercase FIRST, then slice to 500, on BOTH sides — case-folding can
    change string length (e.g. 'İ' → 'i̇'), and the expected side is
    truncated too.

    Use THIS for bounded eval sets and audits; keep
    :func:`jaccard_similarity` for corpus passes — ratio() is
    O(len_a x len_b) Python per pair with no SQL analog in either engine
    (which is why the DuckDB-gated query row stays on Jaccard).
    Deterministic: plain stdlib defaults, batch-order independent (one
    ratio per row against a constant)."""
    import pandas as pd  # noqa: F401  (Arrow path requirement)
    from pyspark.sql.functions import pandas_udf

    exp = expected_content.lower()[:prefix_chars]

    @pandas_udf("double")
    def ratio(s):
        import difflib

        def one(x):
            if x is None:
                return 0.0
            return difflib.SequenceMatcher(
                None, x.lower()[:prefix_chars], exp).ratio()

        return s.map(one)

    return ratio(content)


def accuracy_score(content: Column, spec: dict,
                   similarity: str = "jaccard") -> Column:
    """The full 0-10 score for one expected-answer spec
    ``{"must_include": [...], "keywords": [...], "expected_content": "..."}``.
    Empty content scores 0 (reference line 92).  ``similarity`` picks the
    similarity leg: ``"jaccard"`` (column-expression scale path, default) or
    ``"sequence_matcher"`` (the reference's exact difflib ratio, Arrow UDF —
    bounded eval sets only)."""
    lower = F.lower(content)
    must = coverage_points(lower, spec.get("must_include", []), 4.0)
    kw = coverage_points(lower, spec.get("keywords", []), 3.0)
    if similarity == "sequence_matcher":
        sim = sequence_matcher_similarity(
            content, spec.get("expected_content", "")) * 3.0
    elif similarity == "jaccard":
        sim = jaccard_similarity(content, spec.get("expected_content", "")) * 3.0
    else:
        raise ValueError(f"unknown similarity leg: {similarity!r}")
    total = F.round(F.least(F.lit(10.0), F.greatest(F.lit(0.0), must + kw + sim)), 1)
    empty = content.isNull() | (F.trim(content) == "")
    return F.when(empty, 0.0).otherwise(total)
