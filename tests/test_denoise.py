"""Span-corruption example construction (functions/denoise)."""

import duckdb

from memory_opensource_spark.functions.denoise import (
    corruption_spans, corruption_spans_sql)


def _docs(spark):
    rows = [(1, 100), (2, 7), (3, 3), (4, 1), (5, 0), (6, None), (7, 2000)]
    return spark.createDataFrame(rows, "doc_id long, n_tokens int")


def test_spans_nonoverlapping_and_density(spark):
    out = corruption_spans(_docs(spark)).collect()
    by = {}
    for r in out:
        by.setdefault(r["doc_id"], []).append(r)
    # docs 3/4 (m rounds to 0), doc 5 (n=0), doc 6 (NULL) emit nothing
    assert set(by) == {1, 2, 7}
    for d, spans in by.items():
        n = {1: 100, 2: 7, 7: 2000}[d]
        ordered = sorted((r["start"], r["end"]) for r in spans)
        masked = 0
        for (a1, b1), (a2, b2) in zip(ordered, ordered[1:]):
            assert b1 <= a2              # non-overlap by construction
        for a, b in ordered:
            assert 0 <= a < b <= n
            masked += b - a
        # masked tokens == round(0.15 * n) exactly (largest-remainder
        # split, each span clamped only when a segment is too short)
        assert masked == round(0.15 * n), (d, masked)
    # sentinel numbering is 0-based consecutive
    s7 = sorted(r["sentinel"] for r in by[7])
    assert s7 == list(range(len(s7)))


def test_spans_deterministic_salt_sensitivity(spark):
    a = sorted(map(tuple, corruption_spans(_docs(spark)).collect()))
    b = sorted(map(tuple, corruption_spans(_docs(spark)).collect()))
    assert a == b
    c = sorted(map(tuple, corruption_spans(_docs(spark),
                                           salt="other").collect()))
    assert a != c


def test_duckdb_twin_parity(spark, tmp_path):
    df = _docs(spark)
    path = str(tmp_path / "docs.parquet")
    df.toPandas().to_parquet(path)
    con = duckdb.connect()
    con.execute(f"CREATE VIEW docs_v AS SELECT * FROM '{path}'")
    got = sorted(map(tuple,
                     con.execute(corruption_spans_sql("docs_v")).fetchall()))
    want = sorted(map(tuple, corruption_spans(df).collect()))
    assert got == want
