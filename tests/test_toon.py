"""TOON response format (memory_routes_v1.py:2232-2239, :3161-3189 semantics)."""

import json

from memory_opensource_spark.functions.toon import (
    format_search_response,
    strip_empty_values,
    toon_encode,
)


def test_strip_empty_values():
    assert strip_empty_values(
        {"a": 1, "b": "", "c": [], "d": {}, "e": None, "f": {"g": "", "h": 2}}
    ) == {"a": 1, "f": {"h": 2}}


def test_tabular_array_encoding():
    out = toon_encode({
        "status": "success",
        "memories": [
            {"memory_id": "m1", "score": 0.91, "content": "alpha"},
            {"memory_id": "m2", "score": 0.87, "content": "beta"},
        ],
    })
    assert out.splitlines() == [
        "status: success",
        "memories[#2]{memory_id,score,content}:",
        "  m1,0.91,alpha",
        "  m2,0.87,beta",
    ]


def test_scalar_list_and_nesting():
    out = toon_encode({"ids": ["a", "b", "c"], "meta": {"n": 3, "ok": True}})
    assert out.splitlines() == [
        "ids[#3]: a,b,c",
        "meta:",
        "  n: 3",
        "  ok: true",
    ]


def test_toon_smaller_than_json():
    rows = [{"memory_id": f"m{i}", "score": 0.5 + i / 100, "content": "x" * 40,
             "topics": ""} for i in range(20)]
    toon = format_search_response(rows, "q", "toon")
    js = format_search_response(rows, "q", "json")
    assert len(toon) < len(js) * 0.8        # the 30-60% reduction claim's floor
    assert "topics" not in toon             # empty values stripped


def test_engine_search_formatted(spark):
    from memory_opensource_spark.api import MemoryEngine
    from memory_opensource_spark.operators.predicate import AclContext

    eng = MemoryEngine(spark, dim=32)
    eng.add_memory_batch([
        {"memory_id": "m1", "content": "spark distributed engine",
         "user_id": "alice", "user_read_access": ["alice"]},
    ])
    txt = eng.search_formatted("spark engine", ctx=AclContext(user_id="alice"),
                               score_threshold=None)
    assert txt.startswith("status: success")
    assert "memories[#1]{memory_id,score,content}:" in txt
    assert "m1" in txt
