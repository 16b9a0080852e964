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


@pytest.fixture(scope="module")
def tenant_g(spark):
    """Nodes carrying the full tenant + ACL block (reference node-path
    scoping, memory_graph.py:3001-3020)."""
    cols = ("node_id string, label string, prop_name string, user_id string, "
            "user_read_access array<string>, workspace_id string, "
            "workspace_read_access array<string>, organization_id string, "
            "organization_read_access array<string>, namespace_id string, "
            "namespace_read_access array<string>")
    nodes = spark.createDataFrame(
        [
            # owned by alice, ws w1, org o1
            ("e1", "Entity", "apple", "alice", ["alice"], "w1", ["w1"],
             "o1", ["o1"], "ns1", ["ns1"]),
            # legacy NULL-org row, same name
            ("e2", "Entity", "apple", "alice", ["alice"], "w1", ["w1"],
             None, [], None, []),
            # bob's node, unreadable by alice, org o1
            ("e3", "Entity", "apple", "bob", ["bob"], "w1", ["w1"],
             "o1", ["o1"], "ns1", ["ns1"]),
        ],
        cols,
    )
    edges = spark.createDataFrame(
        [("e3", "e1", "LINKS"), ("e2", "e1", "LINKS")],
        "src string, dst string, rel_type string",
    )
    return nodes, edges


def test_node_lookup_strict_org_excludes_legacy_null(spark, tenant_g):
    """Node-path tenant scoping has NO legacy-NULL allowance: an org-scoped
    lookup must skip NULL-org nodes even when the caller owns them
    (unlike the memory path, memory_graph.py:5834-5844 vs :3002-3009)."""
    from memory_opensource_spark.operators.predicate import (
        AclContext, node_acl_predicate)

    nodes, _ = tenant_g
    ctx = AclContext(user_id="alice", organization_id="o1")
    kept = sorted(r.node_id for r in
                  nodes.filter(node_acl_predicate(ctx)).collect())
    # e2 (alice's own LEGACY row) is dropped by the strict org equality;
    # e3 passes via the org_read_access OR-arm + matching org tenant.
    assert kept == ["e1", "e3"]


def test_node_lookup_or_block_has_no_role_arm(spark, tenant_g):
    """Roles open the memory path but NOT the node path (:3010-3020)."""
    from memory_opensource_spark.operators.predicate import (
        AclContext, node_acl_predicate)

    nodes, _ = tenant_g
    ctx = AclContext(user_id="carol", role_ids=["r1"])
    roled = nodes.withColumn("role_read_access", F.array(F.lit("r1")))
    assert roled.filter(node_acl_predicate(ctx)).count() == 0


def test_via_relationship_either_endpoint_grants_access(spark, tenant_g):
    """G6's single OR-block spans BOTH endpoints (memory_graph.py:3192-3208):
    bob's e3 is returned to alice because the TARGET e1 is alice's, even
    though e3 itself fails every alice arm."""
    from memory_opensource_spark.operators.predicate import AclContext

    nodes, edges = tenant_g
    ctx = AclContext(user_id="alice")
    out = graph.find_node_via_relationship(
        nodes, edges, "Entity", "LINKS", "e1", "out", ctx=ctx).collect()
    assert [r.node_id for r in out] == ["e2"]  # min node_id among e2, e3
    # and with a target alice cannot access, nothing comes back
    ctx2 = AclContext(user_id="dave")
    assert graph.find_node_via_relationship(
        nodes, edges, "Entity", "LINKS", "e1", "out", ctx=ctx2).count() == 0


def test_acl_arm_dropped_past_ten_entries(spark):
    """The memory-path workspace/role OR-arms are omitted when the list
    exceeds 10 entries (reference speed guard, memory_graph.py:5821-5827)."""
    from memory_opensource_spark.operators.predicate import (
        AclContext, acl_predicate)

    df = spark.createDataFrame(
        [("m1", "owner", ["nobody"], ["w5"], [], None, None)],
        "memory_id string, user_id string, user_read_access array<string>, "
        "workspace_read_access array<string>, role_read_access array<string>, "
        "organization_id string, namespace_id string",
    )
    small = AclContext(user_id="me", workspace_ids=[f"w{i}" for i in range(10)])
    big = AclContext(user_id="me", workspace_ids=[f"w{i}" for i in range(11)])
    assert df.filter(acl_predicate(small)).count() == 1   # w5 arm present
    assert df.filter(acl_predicate(big)).count() == 0     # arm dropped


def test_match_pattern_limit_dedups_even_without_dedup_flag(spark):
    """Review r7: with dedup=False a spec.limit over non-distinct path rows
    would let duplicate rows (self-loops under direction="any", repeated edge
    rows) consume limit slots and silently drop distinct matches — the limit
    path must dedup first regardless of the flag."""
    nodes = spark.createDataFrame(
        [("m1", "Memory", "a", "active"), ("m2", "Memory", "b", "active")],
        "node_id string, label string, prop_name string, prop_status string")
    edges = spark.createDataFrame(
        [("m1", "m1", "RELATED_TO"),   # self-loop: 2 identical rows undirected
         ("m1", "m2", "RELATED_TO")],
        "src string, dst string, rel_type string")
    spec = PatternSpec(source_label="Memory", relationship_type="RELATED_TO",
                       target_label="Memory", direction="any", limit=2)
    out = graph.match_pattern(nodes, edges, spec, dedup=False).collect()
    assert {(r.m_id, r.n_id) for r in out} == {("m1", "m1"), ("m1", "m2")}
