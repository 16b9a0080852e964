"""Preference-pair construction (operators/preference)."""

import duckdb

from memory_opensource_spark.operators.preference import (
    build_preference_pairs, preference_pairs_sql)


def _log(spark):
    rows = [
        # prompt 1: clear ordering
        (1, "a", 0.9, 10), (1, "b", 0.2, 11), (1, "c", 0.5, 12),
        # prompt 2: reward tie at the top -> larger id is chosen
        (2, "d", 0.7, 20), (2, "e", 0.7, 21), (2, "f", 0.1, 22),
        # prompt 3: single response -> margin 0, dropped
        (3, "g", 0.4, 30),
        # prompt 4: all rewards equal -> margin 0, dropped
        (4, "h", 0.3, 40), (4, "i", 0.3, 41),
    ]
    return spark.createDataFrame(
        rows, "prompt_id long, response string, score double, response_id long")


def test_pairs_pick_best_worst_with_tiebreak(spark):
    out = {r["prompt_id"]: r for r in build_preference_pairs(_log(spark)).collect()}
    assert set(out) == {1, 2}
    assert (out[1]["chosen"], out[1]["rejected"]) == ("a", "b")
    assert abs(out[1]["margin"] - 0.7) < 1e-9
    # tie at 0.7: max struct -> larger id ("e"); min -> "f"
    assert (out[2]["chosen"], out[2]["rejected"]) == ("e", "f")


def test_min_margin_filter(spark):
    out = build_preference_pairs(_log(spark), min_margin=0.65).collect()
    assert [r["prompt_id"] for r in out] == [1]


def test_duckdb_twin_parity(spark, tmp_path):
    df = _log(spark)
    path = str(tmp_path / "log.parquet")
    df.toPandas().to_parquet(path)
    con = duckdb.connect()
    con.execute(f"CREATE VIEW log_v AS SELECT * FROM '{path}'")
    got = sorted(con.execute(preference_pairs_sql("log_v")).fetchall())
    want = sorted((r["prompt_id"], r["chosen"], r["rejected"], r["margin"])
                  for r in build_preference_pairs(df).collect())
    assert got == want


def test_ict_pairs_adjacency_and_cap(spark):
    from memory_opensource_spark.operators.preference import ict_pairs
    rows = [(1, "abcdefghij"),      # 10 chars, W=4 -> chunks abcd efgh ij
            (2, "abc"),             # single chunk -> nothing
            (3, None),              # NULL -> nothing
            (4, "x" * 40)]          # 10 chunks -> capped pairs
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = ict_pairs(df, chunk_chars=4, max_pairs_per_doc=2).collect()
    by = {}
    for r in out:
        by.setdefault(r["doc_id"], []).append(r)
    assert set(by) == {1, 4}
    d1 = sorted(by[1], key=lambda r: r["pair_idx"])
    assert [(r["query_text"], r["positive_text"]) for r in d1] == \
        [("abcd", "efgh"), ("efgh", "ij")]
    assert len(by[4]) == 2          # fan-out cap
