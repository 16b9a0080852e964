"""Dynamic schema registry: validation compilation + schema-driven merge keys.

Mirrors the reference's custom-schema behaviors (models/user_schemas.py,
models/cipher_ast.py:66-280, memory/memory_graph.py:10542-10712)."""

import pytest
from pyspark.sql import functions as F

from memory_opensource_spark.operators.schema_registry import (
    NodeTypeDef,
    SchemaRegistry,
    props_from_columns,
    schema_merge_nodes,
)


@pytest.fixture()
def registry(spark):
    reg = SchemaRegistry(spark)
    reg.register("s1", [
        NodeTypeDef(
            name="Customer",
            properties={"name": "string", "email": "string", "age": "integer"},
            required=["name", "email"],
            unique_identifiers=["email"],
        ),
        NodeTypeDef(name="Note", properties={"text": "string"}),
    ])
    return reg


def test_schema_df_shape(registry):
    rows = registry.to_df().collect()
    assert len(rows) == 4  # 3 Customer props + 1 Note prop
    em = [r for r in rows if r.property == "email"][0]
    assert em.required and em.is_unique and em.node_type == "Customer"


def test_definition_validators():
    with pytest.raises(ValueError, match="Required property"):
        NodeTypeDef(name="X", properties={"a": "string"}, required=["b"])
    with pytest.raises(ValueError, match="Unique identifier"):
        NodeTypeDef(name="X", properties={"a": "string"}, unique_identifiers=["b"])
    with pytest.raises(ValueError, match="more than 10"):
        NodeTypeDef(name="X", properties={f"p{i}": "string" for i in range(11)})


def test_validation_rules(spark, registry):
    rows = [
        ("ok", {"name": "Ada", "email": "a@x.io", "age": "37"}),
        ("missing_req", {"name": "Bob"}),
        ("bad_type", {"name": "Cy", "email": "c@x.io", "age": "old"}),
        ("extra_prop", {"name": "Di", "email": "d@x.io", "nickname": "D"}),
    ]
    df = spark.createDataFrame(rows, "id string, props map<string,string>")
    out = {r.id: r for r in registry.validate(df, "Customer").collect()}
    assert out["ok"].is_valid
    assert out["missing_req"].violations == ["missing required property: email"]
    assert out["bad_type"].violations == ["type violation: age"]
    assert out["extra_prop"].violations == ["undeclared properties: nickname"]


def test_reject_invalid_raises(spark, registry):
    bad = spark.createDataFrame([("x", {"name": "NoMail"})],
                                "id string, props map<string,string>")
    with pytest.raises(ValueError, match="missing required property: email"):
        registry.reject_invalid(bad, "Customer")
    ok = spark.createDataFrame([("y", {"name": "N", "email": "n@x.io"})],
                               "id string, props map<string,string>")
    assert registry.reject_invalid(ok, "Customer").count() == 1


def test_schema_driven_merge(spark, registry):
    existing = spark.createDataFrame(
        [("n1", {"name": "Ada", "email": "a@x.io"}),
         ("n2", {"name": "Bob", "email": "b@x.io"})],
        "node_id string, props map<string,string>")
    incoming = spark.createDataFrame(
        [("n9", {"name": "Ada Lovelace", "email": "a@x.io"}),   # same email -> replace
         ("n3", {"name": "Cy", "email": "c@x.io"})],            # new
        "node_id string, props map<string,string>")
    out = schema_merge_nodes(existing, incoming, registry, "Customer")
    got = {r.props["email"]: (r.node_id, r.props["name"]) for r in out.collect()}
    assert got == {"a@x.io": ("n9", "Ada Lovelace"),
                   "b@x.io": ("n2", "Bob"),
                   "c@x.io": ("n3", "Cy")}


def test_merge_without_unique_ids_routes_to_fallback(spark, registry):
    df = spark.createDataFrame([("n1", {"text": "t"})],
                               "node_id string, props map<string,string>")
    assert registry.merge_keys("Note") == []
    with pytest.raises(ValueError, match="content-based"):
        schema_merge_nodes(df, df, registry, "Note")


def test_props_from_columns(spark):
    df = spark.createDataFrame([("a", "Ada", None)],
                               "node_id string, prop_name string, prop_status string")
    out = props_from_columns(df, {"name": "prop_name", "status": "prop_status"}).first()
    assert out.props == {"name": "Ada"}  # nulls dropped from the map


def test_engine_schema_aware_add_graph(spark):
    from memory_opensource_spark.api import MemoryEngine

    eng = MemoryEngine(spark, dim=32)
    eng.register_schema("s1", [NodeTypeDef(
        name="Person",
        properties={"name": "string", "status": "string"},
        required=["name"],
        unique_identifiers=["name"],
    )])
    eng.add_graph([{"node_id": "p1", "label": "Person", "prop_name": "Ada",
                    "prop_status": "active"}], [])
    # same name, new node_id -> schema merge REPLACES, count stays 1
    eng.add_graph([{"node_id": "p2", "label": "Person", "prop_name": "Ada",
                    "prop_status": "updated"}], [])
    rows = eng.nodes.collect()
    assert len(rows) == 1
    assert rows[0].node_id == "p2" and rows[0].prop_status == "updated"
    # unregistered label keeps node_id merge: same name but new id -> 2 rows
    eng.add_graph([{"node_id": "c1", "label": "City", "prop_name": "Rome"}], [])
    eng.add_graph([{"node_id": "c2", "label": "City", "prop_name": "Rome"}], [])
    assert eng.nodes.filter(F.col("label") == "City").count() == 2
    # required-property violation rejected
    import pytest as _pytest
    with _pytest.raises(ValueError, match="missing required property: name"):
        eng.add_graph([{"node_id": "p3", "label": "Person"}], [])
