"""Background enrichment plan tests (§3.2 step 3)."""

import pytest
from pyspark.sql import functions as F

from memory_opensource_spark.plans import enrich


@pytest.fixture(scope="module")
def fixtures(spark):
    new_mems = spark.createDataFrame(
        [("mA", "quantum computing hardware advances rapidly"),
         ("mB", "short words only here")],
        "memory_id string, content string",
    )
    new_chunks = spark.createDataFrame(
        [("mA", [1.0, 0.0, 0.0]), ("mB", [0.0, 1.0, 0.0])],
        "memory_id string, embedding array<double>",
    )
    corpus = spark.createDataFrame(
        [("old1", [0.99, 0.1, 0.0]), ("old2", [0.0, 0.98, 0.2]),
         ("old3", [0.5, 0.5, 0.7]), ("old4", [-1.0, 0.0, 0.0])],
        "memory_id string, embedding array<double>",
    )
    return new_mems, new_chunks, corpus


def test_enrich_full_pipeline(spark, fixtures):
    new_mems, new_chunks, corpus = fixtures
    out = enrich.enrich(new_mems, new_chunks, corpus, k_related=2)

    edges = out["related_edges"].collect()
    by_src = {}
    for e in edges:
        by_src.setdefault(e.src, []).append(e)
    assert by_src["mA"][0].dst == "old1"  # nearest neighbor first
    assert all(e.rel_type == "RELATED_TO" and e.similarity_score is not None for e in edges)

    grouped = {r.memory_id: r for r in out["grouped_points"].collect()}
    assert grouped["mA"].is_grouped_memories
    assert grouped["mA"].related_memory_ids[0] == "old1"
    assert len(grouped["mA"].related_memory_ids) == 2

    ents = out["entities"].collect()
    # only tokens > 5 chars become entities
    assert {e.prop_name for e in ents if e.memory_id == "mA"} == {
        "quantum", "computing", "hardware", "advances", "rapidly"
    }
    assert all(e.entity_id.startswith("ent_") for e in ents)

    ex_edges = out["extracted_edges"].collect()
    assert all(e.rel_type == "EXTRACTED" for e in ex_edges)
    assert {e.src for e in ex_edges} == {"mA"}  # mB has no >5-char tokens

    props = out["property_index"].collect()
    assert all(p.property_key == "Entity.name" for p in props)


def test_enrich_deterministic(spark, fixtures):
    new_mems, new_chunks, corpus = fixtures
    a = enrich.enrich(new_mems, new_chunks, corpus)["related_edges"].collect()
    b = enrich.enrich(new_mems, new_chunks, corpus)["related_edges"].collect()
    assert sorted(map(str, a)) == sorted(map(str, b))


def test_predict_related_multichunk_memory_dedup(spark):
    """A multi-chunk memory must get k DISTINCT memory neighbors with one
    score per pair (max over chunks), one RELATED_TO edge per pair, and ONE
    grouped point — not per-chunk duplicates (round-5 review finding)."""
    from memory_opensource_spark.plans import enrich

    def vec(*xs):
        return [float(x) for x in xs]

    # mA has 2 chunks pointing at the same nearest neighbor mX from both
    new_chunks = spark.createDataFrame(
        [("mA", "mA_0", 0, vec(1, 0, 0)), ("mA", "mA_1", 1, vec(0.9, 0.1, 0))],
        "memory_id string, chunk_id string, chunk_index int, embedding array<double>")
    corpus = spark.createDataFrame(
        [("mX", "mX_0", 0, vec(1, 0.05, 0)),
         ("mY", "mY_0", 0, vec(0, 1, 0)),
         ("mZ", "mZ_0", 0, vec(0, 0, 1))],
        "memory_id string, chunk_id string, chunk_index int, embedding array<double>")

    sims = enrich.predict_related(new_chunks, corpus, k=3)
    rows = sims.filter(F.col("left_id") == "mA").collect()
    pairs = [(r.left_id, r.right_id) for r in rows]
    assert len(pairs) == len(set(pairs)) == 3          # distinct neighbors
    assert {p[1] for p in pairs} == {"mX", "mY", "mZ"}  # no slot crowded out

    edges = enrich.related_edges(sims, k=3).filter(F.col("src") == "mA").collect()
    assert len({(e.src, e.dst) for e in edges}) == len(edges) == 3

    gp = enrich.grouped_points(new_chunks, sims, k=3)
    mine = gp.filter(F.col("memory_id") == "mA").collect()
    assert len(mine) == 1                               # one point per memory
    assert mine[0].embedding == vec(1, 0, 0)            # first chunk's vector
    assert len(set(mine[0].related_memory_ids)) == len(mine[0].related_memory_ids)
