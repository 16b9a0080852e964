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


def test_archive_import_matches_batch_import(engine, spark, tmp_path):
    """import_omo_archive (distributed, no driver row materialization) must
    land the same memories/chunks/ACL state as the BATCH_MAX-bounded
    import_omo on the same archive."""
    path = str(tmp_path / "dump2.omo.json")
    engine.export_omo().select("omo_json").write.mode("overwrite").text(path)

    a = MemoryEngine(spark, dim=16)
    a.import_omo(path)
    b = MemoryEngine(spark, dim=16)
    stats = b.import_omo_archive(path)
    assert stats == {"imported": 2, "reused": 0}

    cols = ["memory_id", "content", "user_id", "user_read_access",
            "namespace_id", "organization_id", "topics", "consent", "risk"]
    rows_a = sorted((tuple(str(r[c]) for c in cols)
                     for r in a.memories.select(*cols).collect()))
    rows_b = sorted((tuple(str(r[c]) for c in cols)
                     for r in b.memories.select(*cols).collect()))
    assert rows_a == rows_b
    assert a.chunks.count() == b.chunks.count()
    assert b.nodes.filter(F.col("node_id") == "m1").count() == 1
    # ACL parity through the read path
    hits = b.search("portable memory", ctx=AclContext(user_id="bob"),
                    score_threshold=None).collect()
    assert any(r.memory_id == "m1" for r in hits)


def test_archive_import_scales_past_batch_max(spark, tmp_path):
    """A >BATCH_MAX archive (the shape import_omo REFUSES) restores in one
    distributed job; near-dup reuse applies via anti-join (identical
    contents collapse), and validation failures surface bounded."""
    import pytest
    from memory_opensource_spark.semantics import BATCH_MAX

    n = BATCH_MAX * 2 + 500
    src = spark.range(n).select(
        F.concat(F.lit("b"), F.col("id")).alias("memory_id"),
        F.concat(F.lit("unique body zz"), F.col("id"),
                 F.lit(" qx"), (F.col("id") * 7).cast("string")).alias("content"),
        F.lit("u1").alias("user_id"),
        F.date_format(F.current_timestamp(),
                      "yyyy-MM-dd'T'HH:mm:ss").alias("createdAt"),
    )
    from memory_opensource_spark.sources.omo import export_omo
    arch = export_omo(
        src.select(F.col("memory_id"), F.col("content"), F.col("user_id"),
                   F.current_timestamp().alias("created_at")))
    path = str(tmp_path / "big.omo.json")
    arch.select("omo_json").write.mode("overwrite").text(path)

    eng = MemoryEngine(spark, dim=16)
    with pytest.raises(ValueError, match="exceeds max"):
        eng.import_omo(path)
    stats = eng.import_omo_archive(path)
    assert stats["imported"] + stats["reused"] == n
    assert eng.memories.count() == stats["imported"]

    bad = spark.createDataFrame(
        [("x1", json.dumps({
            "id": "x1", "createdAt": "2024-01-01T00:00:00", "type": "text",
            "content": "c", "consent": "explicit",
            "ext": {"papr:metadata": {
                "user_id": "someone@example.com"}}}))],
        "memory_id string, omo_json string")
    with pytest.raises(ValueError, match="external"):
        eng.import_omo_archive(bad)
