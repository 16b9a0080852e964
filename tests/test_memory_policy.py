"""MemoryPolicy resolution + OMO enforcement parity tests.

Scenario sources (mirrored, not copied):
- tests/test_memory_policy/test_memory_policy_resolver.py (merge precedence,
  constraint merging by node_type / composite edge key, type-level extraction,
  consent-none skip, DeepTrust controlled-vocabulary scenario)
- services/omo_safety.py:26-130 (consent drop, risk annotations, flagged ACL)
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from memory_opensource_spark.operators import memory_policy as mp
from memory_opensource_spark.operators.memory_policy import (
    _merge_edge_constraints,
    _merge_node_constraints,
    enforce_omo,
    extract_type_level_constraints,
    merge_memory_policies,
    resolve_memory_policy,
    should_skip_graph_extraction,
)


# --------------------------------------------------------------------------- #
# merge_memory_policies (resolver tests :30-130)
# --------------------------------------------------------------------------- #

def test_no_policies_returns_defaults():
    p = merge_memory_policies(None, None)
    assert p["mode"] == "auto"
    assert p["consent"] == "implicit"
    assert p["risk"] == "none"
    assert p["node_constraints"] == [] and p["edge_constraints"] == []
    assert p["nodes"] is None and p["relationships"] is None and p["acl"] is None


def test_schema_only_applies_schema_values():
    p = merge_memory_policies({"mode": "manual", "consent": "explicit"}, None)
    assert p["mode"] == "manual" and p["consent"] == "explicit" and p["risk"] == "none"


def test_memory_overrides_schema_scalars():
    schema = {"mode": "manual", "consent": "explicit", "risk": "sensitive"}
    memory = {"mode": "auto", "consent": "terms", "risk": "flagged"}
    p = merge_memory_policies(schema, memory)
    assert (p["mode"], p["consent"], p["risk"]) == ("auto", "terms", "flagged")


def test_acl_nodes_relationships_override():
    schema = {"acl": {"read": ["a"]}, "nodes": [{"id": "n1"}],
              "relationships": [{"source": "$this", "target": "x", "type": "T"}]}
    memory = {"acl": {"read": ["b"]}, "nodes": [{"id": "n2"}], "relationships": []}
    p = merge_memory_policies(schema, memory)
    assert p["acl"] == {"read": ["b"]}
    assert p["nodes"] == [{"id": "n2"}]
    assert p["relationships"] == []   # explicit empty list overrides (is not None)


def test_structured_mode_normalizes_to_manual():
    assert merge_memory_policies(None, {"mode": "structured"})["mode"] == "manual"
    with pytest.raises(ValueError):
        merge_memory_policies(None, {"mode": "bogus"})


# --------------------------------------------------------------------------- #
# node-constraint merging (resolver tests :133-233)
# --------------------------------------------------------------------------- #

def test_node_constraints_memory_overrides_same_type():
    merged = _merge_node_constraints(
        [{"node_type": "TacticDef", "create": "never"}],
        [{"node_type": "TacticDef", "create": "auto"}])
    assert merged == [{"node_type": "TacticDef", "create": "auto"}]


def test_node_constraints_mixed_override_and_preserve():
    schema = [{"node_type": "A", "create": "never"}, {"node_type": "B", "create": "never"}]
    memory = [{"node_type": "B", "create": "auto"}, {"node_type": "C", "create": "auto"}]
    merged = _merge_node_constraints(schema, memory)
    by_type = {c["node_type"]: c["create"] for c in merged}
    assert by_type == {"A": "never", "B": "auto", "C": "auto"}


def test_node_constraint_without_node_type_ignored():
    merged = _merge_node_constraints(
        [{"node_type": "TacticDef", "create": "never"}], [{"create": "auto"}])
    assert merged == [{"node_type": "TacticDef", "create": "never"}]


# --------------------------------------------------------------------------- #
# edge-constraint merging by composite key (resolver tests :238-315)
# --------------------------------------------------------------------------- #

def test_edge_constraints_exact_key_overrides():
    merged = _merge_edge_constraints(
        [{"edge_type": "MITIGATES", "create": "never"}],
        [{"edge_type": "MITIGATES", "create": "auto"}])
    assert merged == [{"edge_type": "MITIGATES", "create": "auto"}]


def test_edge_constraints_different_target_not_override():
    schema = [{"edge_type": "M", "target_type": "X", "create": "never"}]
    memory = [{"edge_type": "M", "target_type": "Y", "create": "auto"}]
    merged = _merge_edge_constraints(schema, memory)
    assert len(merged) == 2
    assert {c.get("target_type"): c["create"] for c in merged} == {"X": "never", "Y": "auto"}


# --------------------------------------------------------------------------- #
# type-level extraction (resolver tests :319-412)
# --------------------------------------------------------------------------- #

def test_extract_empty_schema_returns_empty():
    out = extract_type_level_constraints({})
    assert out == {"node_constraints": [], "edge_constraints": []}


def test_extract_node_and_edge_constraints_from_dict():
    schema = {
        "node_types": {
            "TacticDef": {"constraint": {"create": "never"}},
            "Free": {},
        },
        "relationship_types": {
            "MITIGATES": {"constraint": {"create": "never"},
                          "allowed_source_types": ["SecurityBehavior"],
                          "allowed_target_types": ["TacticDef"]},
        },
    }
    out = extract_type_level_constraints(schema)
    assert out["node_constraints"] == [{"create": "never", "node_type": "TacticDef"}]
    (ec,) = out["edge_constraints"]
    assert ec["edge_type"] == "MITIGATES"
    assert ec["source_type"] == "SecurityBehavior" and ec["target_type"] == "TacticDef"


def test_extract_multiple_allowed_types_no_inference():
    schema = {"node_types": {}, "relationship_types": {
        "R": {"constraint": {"create": "auto"},
              "allowed_source_types": ["A", "B"]}}}
    (ec,) = extract_type_level_constraints(schema)["edge_constraints"]
    assert "source_type" not in ec


def test_resolve_full_precedence_chain():
    """defaults -> type-level -> schema policy -> memory policy."""
    schema = {
        "node_types": {"T": {"constraint": {"create": "never"}}},
        "relationship_types": {},
        "memory_policy": {"consent": "explicit",
                          "node_constraints": [{"node_type": "U", "create": "never"}]},
    }
    p = resolve_memory_policy(schema, {"risk": "sensitive",
                                       "node_constraints": [{"node_type": "T", "create": "auto"}]})
    assert p["consent"] == "explicit" and p["risk"] == "sensitive"
    by_type = {c["node_type"]: c["create"] for c in p["node_constraints"]}
    assert by_type == {"T": "auto", "U": "never"}


# --------------------------------------------------------------------------- #
# skip / omo helpers (resolver tests :440-460, omo_safety.py:310-334)
# --------------------------------------------------------------------------- #

def test_consent_none_skips_extraction():
    assert should_skip_graph_extraction({"consent": "none"}) is True
    assert should_skip_graph_extraction({"consent": "implicit"}) is False
    assert should_skip_graph_extraction({}) is False


def test_extraction_method_mapping():
    assert mp.extraction_method("manual") == "manual"
    assert mp.extraction_method("structured") == "manual"
    assert mp.extraction_method("auto") == "llm"


def test_level_validators():
    assert mp.validate_consent_level("terms") and not mp.validate_consent_level("x")
    assert mp.validate_risk_level("flagged") and not mp.validate_risk_level("x")


# --------------------------------------------------------------------------- #
# data-plane enforcement (omo_safety.py:26-130)
# --------------------------------------------------------------------------- #

@pytest.fixture()
def omo_frames(spark):
    mems = spark.createDataFrame(
        [("m1", "implicit", "none", "alice", ["alice", "bob"], ["alice"]),
         ("m2", "none", "none", "bob", ["bob"], ["bob"]),
         ("m3", "explicit", "flagged", "carol", ["carol", "dave"], ["carol"]),
         ("m4", "terms", "sensitive", "dave", ["dave"], ["dave"]),
         ("m5", None, "none", "eve", ["eve"], ["eve"])],  # legacy: unlabeled
        "memory_id string, consent string, risk string, user_id string, "
        "user_read_access array<string>, user_write_access array<string>")
    ents = spark.createDataFrame(
        [("m1", "e1"), ("m2", "e2"), ("m3", "e3"), ("m4", "e4"), ("m5", "e5")],
        "memory_id string, entity_id string")
    return ents, mems


def test_enforce_omo_drops_consent_none(spark, omo_frames):
    """Only the EXPLICIT 'none' level blocks extraction; a NULL (legacy,
    unlabeled) consent passes — the reference's gate is `if consent ==
    "none"` and Python's None != "none" (omo_safety.py:43-48).  A bare
    SQL `<> 'none'` filter would silently drop m5."""
    out = enforce_omo(*omo_frames)
    assert sorted(r.memory_id for r in out.collect()) == ["m1", "m3", "m4", "m5"]
    m5 = {r.memory_id: r for r in out.collect()}["m5"]
    assert m5.omo_consent is None and m5.omo_risk == "none"


def test_enforce_omo_annotations_and_flagged_acl(spark, omo_frames):
    rows = {r.memory_id: r for r in enforce_omo(*omo_frames).collect()}
    assert rows["m1"].omo_consent == "implicit" and rows["m1"].omo_risk == "none"
    assert rows["m1"].requires_review is False
    assert rows["m1"].acl_read == ["alice", "bob"]          # normal ACL kept
    assert rows["m4"].omo_risk == "sensitive" and rows["m4"].requires_review is False
    # flagged: review + owner-only ACL (omo_safety.py:94-107)
    assert rows["m3"].requires_review is True
    assert rows["m3"].acl_read == ["carol"] and rows["m3"].acl_write == ["carol"]
    assert rows["m3"].omo_source_memory_id == "m3"


def test_enforce_omo_without_write_col(spark, omo_frames):
    ents, mems = omo_frames
    out = enforce_omo(ents, mems.drop("user_write_access"))
    rows = {r.memory_id: r for r in out.collect()}
    assert rows["m1"].acl_write == []
    assert rows["m3"].acl_write == ["carol"]                # flagged still owner-only


# --------------------------------------------------------------------------- #
# engine integration (api.add_memory_batch / enrich / register_schema)
# --------------------------------------------------------------------------- #

@pytest.fixture()
def engine(spark):
    from memory_opensource_spark.api import MemoryEngine

    return MemoryEngine(spark, dim=32)


def test_engine_policy_stamps_omo_fields(engine):
    engine.add_memory(memory_id="pm1", content="alpha beta gamma delta", user_id="u1",
                      memory_policy={"consent": "explicit", "risk": "sensitive"})
    engine.add_memory(memory_id="pm2", content="epsilon zeta", user_id="u1")
    rows = {r.memory_id: r for r in
            engine.memories.select("memory_id", "consent", "risk").collect()}
    assert rows["pm1"].consent == "explicit" and rows["pm1"].risk == "sensitive"
    assert rows["pm2"].consent == "implicit" and rows["pm2"].risk == "none"


def test_engine_consent_none_skips_enrichment_extraction(engine):
    engine.add_memory(memory_id="pm1", content="confidential dossier contents here",
                      user_id="u1", memory_policy={"consent": "none"})
    engine.add_memory(memory_id="pm2", content="ordinary searchable memories here",
                      user_id="u1")
    engine.enrich_memories()
    extracted_src = {r.src for r in
                     engine.edges.filter(F.col("rel_type") == "EXTRACTED").collect()}
    assert "pm2" in extracted_src and "pm1" not in extracted_src


def test_engine_schema_level_policy_applies(engine):
    from memory_opensource_spark.operators.schema_registry import NodeTypeDef

    engine.register_schema(
        "sec", [NodeTypeDef(name="Person", properties={"name": "string"},
                            required=[], unique_identifiers=[])],
        memory_policy={"consent": "explicit", "risk": "sensitive"})
    engine.add_memory(memory_id="pm1", content="schema scoped memory", user_id="u1",
                      schema_id="sec")
    engine.add_memory(memory_id="pm2", content="schema scoped but overridden",
                      user_id="u1", schema_id="sec", memory_policy={"risk": "none"})
    rows = {r.memory_id: r for r in
            engine.memories.select("memory_id", "consent", "risk").collect()}
    assert rows["pm1"].consent == "explicit" and rows["pm1"].risk == "sensitive"
    assert rows["pm2"].consent == "explicit" and rows["pm2"].risk == "none"


def test_engine_manual_mode_graph_with_placeholders(engine):
    engine.add_memory(memory_id="pm1", content="first memory", user_id="u1")
    engine.add_memory(
        memory_id="pm2", content="second memory", user_id="u1",
        memory_policy={
            "mode": "manual",
            "nodes": [{"id": "proj1", "type": "Project",
                       "properties": {"name": "Apollo", "status": "active"}}],
            "relationships": [
                {"source": "$this", "target": "proj1", "type": "PART_OF"},
                {"source": "$this", "target": "$previous", "type": "FOLLOWS"},
            ],
        })
    nodes = {r.node_id: r for r in engine.nodes.collect()}
    assert nodes["proj1"].label == "Project" and nodes["proj1"].prop_name == "Apollo"
    edges = {(r.src, r.dst, r.rel_type) for r in engine.edges.collect()}
    assert ("pm2", "proj1", "PART_OF") in edges
    assert ("pm2", "pm1", "FOLLOWS") in edges


def test_engine_manual_mode_no_previous_skips_edge(engine):
    engine.add_memory(
        memory_id="pm1", content="solo memory", user_id="u9",
        memory_policy={"mode": "manual", "relationships": [
            {"source": "$this", "target": "$previous", "type": "FOLLOWS"}]})
    assert engine.edges.filter(F.col("rel_type") == "FOLLOWS").isEmpty()
