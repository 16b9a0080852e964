"""OMO v1 portability (routers/v1/omo_routes.py:86-340, models/omo.py):
export memories as OMO objects, import them back through the real write
path, and reject malformed objects loudly."""

import json

import pytest
from pyspark.sql import functions as F

from memory_opensource_spark.api import MemoryEngine
from memory_opensource_spark.operators.predicate import AclContext
from memory_opensource_spark.sources import omo


@pytest.fixture()
def engine(spark):
    eng = MemoryEngine(spark, dim=16)
    eng.add_memory_batch([
        {"memory_id": "m1", "content": "portable memory one", "user_id": "alice",
         "user_read_access": ["alice", "bob"], "topics": ["a", "b"],
         "namespace_id": "ns1", "organization_id": "o1"},
        {"memory_id": "m2", "content": "second exported row", "user_id": "alice"},
    ])
    return eng


def test_export_shape_is_omo_v1(engine):
    out = {r.memory_id: json.loads(r.omo_json)
           for r in engine.export_omo().collect()}
    o = out["m1"]
    # required fields + enum defaults (models/omo.py:86-105)
    assert o["id"] == "m1" and o["content"] == "portable memory one"
    assert o["type"] in omo.OMO_TYPES
    assert o["consent"] in omo.OMO_CONSENT and o["risk"] in omo.OMO_RISK
    assert "T" in o["createdAt"]
    assert o["topics"] == ["a", "b"]
    assert o["acl"]["read"] == ["alice", "bob"]
    # vendor fields ride the ext namespace (models/omo.py:150-157)
    meta = o["ext"]["papr:metadata"]
    assert meta["user_id"] == "alice" and meta["namespace_id"] == "ns1"
    # id filter
    only = engine.export_omo(["m2"]).collect()
    assert [r.memory_id for r in only] == ["m2"]


def test_roundtrip_through_real_write_path(engine, spark, tmp_path):
    path = str(tmp_path / "dump.omo.json")
    engine.export_omo().select("omo_json").write.mode("overwrite").text(path)

    dst = MemoryEngine(spark, dim=16)
    results = dst.import_omo(path)
    assert sorted(r.memory_id for r in results) == ["m1", "m2"]
    got = dst.get_memory("m1")
    assert got["content"] == "portable memory one"
    # ACL survives: bob can read the imported memory, a stranger cannot
    hits = dst.search("portable memory", ctx=AclContext(user_id="bob"),
                      score_threshold=None).collect()
    assert any(r.memory_id == "m1" for r in hits)
    none = dst.search("portable memory", ctx=AclContext(user_id="stranger"),
                      score_threshold=None).collect()
    assert not none


def test_import_rejects_invalid_omo(spark):
    bad = spark.createDataFrame(
        [(json.dumps({"id": "x1", "createdAt": "2024-01-01T00:00:00",
                      "type": "text", "content": "ok",
                      "consent": "TOTALLY_BOGUS"}),)],
        "omo_json string")
    with pytest.raises(ValueError, match="invalid OMO"):
        omo.parse_omo(bad).collect()
    # non-strict mode lets a policy layer decide instead
    rows = omo.parse_omo(bad, strict=False).collect()
    assert rows[0].consent == "TOTALLY_BOGUS"

    # a MISSING required enum must also fail strict: isin(NULL) is NULL, and
    # an unguarded NULL predicate would silently drop the row from the bad set
    no_consent = spark.createDataFrame(
        [(json.dumps({"id": "x2", "createdAt": "2024-01-01T00:00:00",
                      "type": "text", "content": "ok"}),)],
        "omo_json string")
    with pytest.raises(ValueError, match="invalid OMO"):
        omo.parse_omo(no_consent).collect()


def test_export_is_single_projection(spark):
    """The export must stay one scan+projection — no joins, no shuffles
    (the reference loops per memory id; the Spark form is a map).  Run on a
    plain memories frame: the engine's in-session table is a union of
    batches, which would obscure the shape."""
    from memory_opensource_spark.sources import tables

    mems = tables.build_memories(
        tables.load(spark, "/root/testdata/sf0.001", "documents"))
    plan = omo.export_omo(mems)._jdf.queryExecution().executedPlan().toString()
    for marker in ("Join", "Exchange"):
        assert marker not in plan, plan[:400]
