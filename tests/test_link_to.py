"""link_to DSL grammar + compile tests (G13) and constraint policies (G14)."""

import pytest
from pyspark.sql import functions as F

from memory_opensource_spark.operators import constraints, link_to
from memory_opensource_spark.operators.link_to import EdgeLink, NodeLink


class TestParse:
    def test_plain_lookup(self):
        s = link_to.parse("Person:email")
        assert s == NodeLink(label="Person", prop="email", match="payload")

    def test_exact(self):
        s = link_to.parse("Company:name=Acme Corp")
        assert s.match == "exact" and s.value == "Acme Corp"

    def test_semantic_with_threshold(self):
        s = link_to.parse("Company:name~acme@0.9")
        assert s.match == "semantic" and s.value == "acme" and s.threshold == 0.9

    def test_semantic_default_threshold(self):
        s = link_to.parse("Company:name~acme")
        assert s.threshold == 0.85  # SEMANTIC_MATCH_THRESHOLD (memory_graph.py:3054)

    def test_via_edge(self):
        s = link_to.parse("Person:email=a@b.co.via(WORKS_AT->Company:name)")
        assert isinstance(s, EdgeLink)
        assert s.edge_type == "WORKS_AT"
        assert s.src.label == "Person" and s.dst.label == "Company"

    def test_explicit_edge_form(self):
        s = link_to.parse("Task:title->ASSIGNED_TO->Person:email")
        assert isinstance(s, EdgeLink) and s.edge_type == "ASSIGNED_TO"

    def test_special_refs(self):
        assert link_to.parse("$this").special == "this"
        assert link_to.parse("$previous").special == "previous"
        assert link_to.parse("$context:3").special == "context:3"

    @pytest.mark.parametrize("bad", ["", "NoColonHere->", "A:b~x@notanum", "->EDGE->B:c"])
    def test_malformed_rejected(self, bad):
        with pytest.raises(ValueError):
            link_to.parse(bad)


class TestCompile:
    @pytest.fixture(scope="class")
    def nodes(self, spark):
        return spark.createDataFrame(
            [("n1", "Company", "Acme Corp"), ("n2", "Company", "Globex"),
             ("n3", "Person", "alice@acme.com")],
            "node_id string, label string, prop_name string",
        )

    def test_exact_lookup(self, nodes):
        spec = link_to.parse("Company:name=Globex")
        out = link_to.compile_lookup(spec, nodes).collect()
        assert len(out) == 1 and out[0].node_id == "n2"

    def test_semantic_contains_fallback(self, nodes):
        spec = link_to.parse("Company:name~ACME")
        out = link_to.compile_lookup(spec, nodes).collect()
        assert len(out) == 1 and out[0].node_id == "n1"

    def test_payload_value(self, nodes):
        spec = link_to.parse("Person:email")
        out = link_to.compile_lookup(spec, nodes, payload_value="alice@acme.com").collect()
        assert len(out) == 1 and out[0].node_id == "n3"


class TestConstraints:
    def test_compile_when_tree(self, spark):
        df = spark.createDataFrame(
            [("a", 5, "open"), ("b", 15, "open"), ("c", 15, "closed")],
            "id string, priority int, status string",
        )
        cond = {"_and": [{"priority": {"gte": 10}}, {"_not": {"status": "closed"}}]}
        out = [r.id for r in df.filter(constraints.compile_when(cond)).collect()]
        assert out == ["b"]

    def test_node_lookup_and_miss_routing(self, spark):
        existing = spark.createDataFrame(
            [("n1", "Person", "alice"), ("n2", "Person", "bob")],
            "node_id string, label string, name string",
        )
        cands = spark.createDataFrame([("alice",), ("carol",)], "name string")
        c = constraints.NodeConstraint(label="Person", key_props=["name"])
        out = constraints.resolve_nodes(cands, existing, c)
        assert [r.resolved_id for r in out["matched"].collect()] == ["n1"]
        assert [r.name for r in out["missed"].collect()] == ["carol"]

    def test_node_upsert(self, spark):
        existing = spark.createDataFrame(
            [("n1", "Person", "alice")], "node_id string, label string, name string"
        )
        cands = spark.createDataFrame([("alice",), ("dave",)], "name string")
        c = constraints.NodeConstraint(label="Person", key_props=["name"], create="upsert")
        ups = constraints.resolve_nodes(cands, existing, c)["upserts"].collect()
        assert {r.name for r in ups} == {"alice", "dave"}
        assert len(ups) == 2  # alice replaced, not duplicated

    def test_edge_requires_both_endpoints(self, spark):
        nodes = spark.createDataFrame([("p1",), ("c1",)], "node_id string")
        cands = spark.createDataFrame(
            [("p1", "c1"), ("p1", "missing")], "person string, company string"
        )
        c = constraints.EdgeConstraint(edge_type="WORKS_AT", src_key="person", dst_key="company")
        out = constraints.resolve_edges(cands, nodes, c).collect()
        assert len(out) == 1 and (out[0].src, out[0].dst) == ("p1", "c1")
