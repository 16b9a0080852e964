"""Graph operator tests over a small crafted property graph."""

import pytest
from pyspark.sql import functions as F

from memory_opensource_spark.operators import graph
from memory_opensource_spark.operators.graph import PatternSpec


@pytest.fixture(scope="module")
def g(spark):
    nodes = spark.createDataFrame(
        [
            ("p1", "Person", "Alice", "active"),
            ("p2", "Person", "Bob", "active"),
            ("c1", "Company", "Acme Corp", "active"),
            ("c2", "Company", "Globex", "inactive"),
            ("m1", "Memory", "note about acme", "active"),
        ],
        "node_id string, label string, prop_name string, prop_status string",
    )
    edges = spark.createDataFrame(
        [
            ("p1", "c1", "WORKS_AT"),
            ("p2", "c2", "WORKS_AT"),
            ("m1", "p1", "EXTRACTED"),
            ("p1", "p2", "RELATED_TO"),
        ],
        "src string, dst string, rel_type string",
    )
    return nodes, edges


def test_match_pattern_undirected(g):
    nodes, edges = g
    spec = PatternSpec(source_label="Person", relationship_type="WORKS_AT",
                       target_label="Company", direction="any")
    out = graph.match_pattern(nodes, edges, spec).collect()
    assert {(r.m_id, r.n_id) for r in out} == {("p1", "c1"), ("p2", "c2")}


def test_match_pattern_reversed_orientation_found(g):
    nodes, edges = g
    # Memory-EXTRACTED-Person stored as m1->p1; undirected match from Person side
    spec = PatternSpec(source_label="Person", relationship_type="EXTRACTED",
                       target_label="Memory", direction="any")
    out = graph.match_pattern(nodes, edges, spec).collect()
    assert {(r.m_id, r.n_id) for r in out} == {("p1", "m1")}


def test_match_pattern_directed_excludes_reverse(g):
    nodes, edges = g
    spec = PatternSpec(source_label="Person", relationship_type="EXTRACTED",
                       target_label="Memory", direction="out")
    assert graph.match_pattern(nodes, edges, spec).count() == 0


def test_match_pattern_with_predicate(g):
    nodes, edges = g
    spec = PatternSpec(source_label="Person", relationship_type="WORKS_AT",
                       target_label="Company", direction="any")
    out = graph.match_pattern(
        nodes, edges, spec, n_pred=F.col("prop_status") == "active", node_cols=["prop_status"]
    ).collect()
    assert {(r.m_id, r.n_id) for r in out} == {("p1", "c1")}


def test_two_hop_paths(g):
    nodes, edges = g
    out = graph.two_hop_paths(nodes, edges, start_pred=F.col("node_id") == "m1").collect()
    d1 = {(r.start_id, r.end_id) for r in out if r.depth == 1}
    d2 = {(r.start_id, r.hop1_id, r.end_id) for r in out if r.depth == 2}
    assert d1 == {("m1", "p1")}
    assert d2 == {("m1", "p1", "c1"), ("m1", "p1", "p2")}


def test_lookups(g):
    nodes, edges = g
    assert graph.find_node_by_property(nodes, "Company", "prop_name", "Globex").first().node_id == "c2"
    assert graph.find_node_by_fuzzy_match(nodes, "Company", "prop_name", "ACME").first().node_id == "c1"
    r = graph.find_node_via_relationship(nodes, edges, "Person", "WORKS_AT", "c1", "out")
    assert r.first().node_id == "p1"


def test_schema_discovery(g):
    nodes, edges = g
    labels, rels = graph.schema_discovery(nodes, edges)
    assert {r.label for r in labels.collect()} == {"Person", "Company", "Memory"}
    assert {r.rel_type for r in rels.collect()} == {"WORKS_AT", "EXTRACTED", "RELATED_TO"}


def test_merge_nodes_upsert_semantics(spark, g):
    nodes, _ = g
    incoming = spark.createDataFrame(
        [("c1", "Company", "Acme Corporation", "active"),
         ("c9", "Company", "Initech", "active")],
        "node_id string, label string, prop_name string, prop_status string",
    )
    merged = graph.merge_nodes(nodes, incoming, ["node_id"])
    got = {r.node_id: r.prop_name for r in merged.collect()}
    assert got["c1"] == "Acme Corporation"  # updated
    assert got["c9"] == "Initech"           # inserted
    assert len(got) == 6


def test_related_to_edges_topk(spark):
    sims = spark.createDataFrame(
        [("a", "b", 0.9), ("a", "c", 0.8), ("a", "d", 0.7), ("a", "e", 0.6)],
        "left_id string, right_id string, score double",
    )
    out = graph.related_to_edges(sims, k=3).collect()
    assert [r.dst for r in out] == ["b", "c", "d"]
    assert all(r.rel_type == "RELATED_TO" for r in out)


def test_semantic_match_resolves_similar_and_creates_below_threshold(spark):
    """G5 (memory/memory_graph.py:3050-3089): a non-identical-but-similar
    mention resolves to the indexed node's canonical id (inclusive >= 0.85,
    Qdrant score_threshold semantics) and the G3 fetch returns the node's
    properties; a below-threshold mention resolves to NULL (caller creates)."""
    from memory_opensource_spark.operators.graph import find_node_by_semantic_match

    idx = spark.createDataFrame(
        [("ent_a", [1.0, 0.0]), ("ent_b", [0.0, 1.0])],
        "node_id string, embedding array<double>")
    nodes = spark.createDataFrame(
        [("ent_a", "Entity", "alpha"), ("ent_b", "Entity", "beta")],
        "node_id string, label string, prop_name string")
    mentions = spark.createDataFrame(
        [("m_similar", [0.97, 0.24]),   # cos vs ent_a ~= 0.971 -> resolves
         ("m_far", [0.7, 0.714]),       # cos ~= 0.70 with both -> creates
         ("m_exactly", [0.85, float((1 - 0.85**2) ** 0.5)])],  # cos == 0.85 inclusive
        "mention_id string, embedding array<double>")
    out = {r.mention_id: r for r in find_node_by_semantic_match(
        mentions, idx, nodes, threshold=0.85).collect()}
    assert out["m_similar"].canonical_id == "ent_a"
    assert out["m_similar"].prop_name == "alpha"       # the G3 fetch
    assert out["m_similar"].score >= 0.85
    assert out["m_far"].canonical_id is None           # reference returns None
    assert out["m_far"].score is None
    assert out["m_exactly"].canonical_id == "ent_a"    # >= is inclusive
