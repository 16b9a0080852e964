"""ACL + metadata predicate compiler tests — one test per arm of the OR-block
(FIXTURES.md invariant 5) plus the customMetadata algebra quirks."""

import pytest
from pyspark.sql import functions as F

from memory_opensource_spark.operators.predicate import (
    AclContext,
    FilterSpec,
    acl_predicate,
    metadata_predicate,
)


@pytest.fixture(scope="module")
def acl_df(spark):
    rows = [
        # (memory_id, user_id, user_read, ws_read, role_read, org_read, ns_read, ns_id)
        ("owner", "me", [], [], [], [], [], "ns1"),
        ("direct", "other", ["me"], [], [], [], [], "ns1"),
        ("via_ws", "other", [], ["w1"], [], [], [], "ns1"),
        ("via_role", "other", [], [], ["r1"], [], [], "ns1"),
        ("via_org", "other", [], [], [], ["o1"], [], "ns1"),
        ("via_ns", "other", [], [], [], [], ["ns1"], "ns1"),
        ("no_access", "other", ["x"], ["wx"], ["rx"], ["ox"], ["nsx"], "ns1"),
        ("legacy", "other", ["me"], [], [], [], [], None),  # NULL ns still matches
        ("other_ns", "other", ["me"], [], [], [], [], "ns2"),  # scoped out
    ]
    df = spark.createDataFrame(
        rows,
        "memory_id string, user_id string, user_read_access array<string>, "
        "workspace_read_access array<string>, role_read_access array<string>, "
        "organization_read_access array<string>, namespace_read_access array<string>, "
        "namespace_id string",
    )
    return df.withColumn("organization_id", F.lit(None).cast("string"))


def _visible(df, ctx):
    return sorted(r.memory_id for r in df.filter(acl_predicate(ctx)).collect())


def test_acl_or_block_all_arms(acl_df):
    # a namespaced request hard-scopes: legacy (NULL ns) and other_ns rows are
    # EXCLUDED even though their OR-block arms match (memory_graph.py:5861-5871)
    ctx = AclContext(user_id="me", workspace_ids=["w1"], role_ids=["r1"],
                     organization_id="o1", namespace_id="ns1")
    assert _visible(acl_df, ctx) == sorted(
        ["owner", "direct", "via_ws", "via_role", "via_org", "via_ns"]
    )


def test_acl_owner_only(acl_df):
    # no namespace on the request -> no scoping; NULL-ns legacy rows visible
    assert _visible(acl_df, AclContext(user_id="me")) == sorted(
        ["owner", "direct", "legacy", "other_ns"]
    )


def test_acl_namespace_scoping_is_strict(acl_df):
    """The one reference read-path semantic r5 got wrong: namespace scoping is
    an unconditional Qdrant MUST MatchValue(namespace_id=ns) — NULL-namespace
    rows are excluded under a namespaced request (memory_graph.py:5861-5871;
    the legacy-NULL allowance exists for organization_id ONLY, :5834-5844)."""
    ctx = AclContext(user_id="me", namespace_id="ns1")
    assert _visible(acl_df, ctx) == sorted(["owner", "direct", "via_ns"])


def test_acl_no_access(acl_df):
    assert _visible(acl_df, AclContext(user_id="nobody")) == []


@pytest.fixture(scope="module")
def meta_df(spark):
    rows = [
        ("m1", {"priority": "5", "archived": "true", "tag": "alpha"}),
        ("m2", {"priority": "10", "archived": "false", "tag": "beta"}),
        ("m3", {"priority": "2", "archived": "true", "tag": "alpha"}),
    ]
    return spark.createDataFrame(rows, "memory_id string, custom_metadata map<string,string>")


def _match(df, spec):
    return sorted(r.memory_id for r in df.filter(metadata_predicate(spec)).collect())


def test_custom_metadata_numeric_is_lower_bound(meta_df):
    # F3 quirk: bare numeric means >= (memory_graph.py:5990-5997)
    assert _match(meta_df, FilterSpec(custom_metadata={"priority": 5})) == ["m1", "m2"]


def test_custom_metadata_bool_eq(meta_df):
    assert _match(meta_df, FilterSpec(custom_metadata={"archived": True})) == ["m1", "m3"]


def test_custom_metadata_range_dict(meta_df):
    assert _match(
        meta_df, FilterSpec(custom_metadata={"priority": {"gte": 2, "lt": 10}})
    ) == ["m1", "m3"]


def test_custom_metadata_list_match_any(meta_df):
    assert _match(
        meta_df, FilterSpec(custom_metadata={"tag": ["alpha", "gamma"]})
    ) == ["m1", "m3"]


def test_custom_metadata_string_eq(meta_df):
    assert _match(meta_df, FilterSpec(custom_metadata={"tag": "beta"})) == ["m2"]


def test_omo_safety_filter_in_spec(spark):
    # F7 (services/omo_safety.py): consent whitelist AND risk blacklist
    df = spark.createDataFrame(
        [("m1", "explicit", "none"), ("m2", "none", "none"),
         ("m3", "explicit", "flagged")],
        "memory_id string, consent string, risk string",
    )
    spec = FilterSpec(consent_allowed=["explicit", "implicit"], risk_blocked=["flagged"])
    assert _match(df, spec) == ["m1"]


def test_custom_metadata_string_matches_list_membership(spark):
    # F4 (memory_graph.py:6855-6897): string filter also matches membership in a
    # list-valued entry
    df = spark.createDataFrame(
        [("m1", {"labels": "red, green, blue"}), ("m2", {"labels": "yellow"})],
        "memory_id string, custom_metadata map<string,string>",
    )
    assert _match(df, FilterSpec(custom_metadata={"labels": "green"})) == ["m1"]
    assert _match(df, FilterSpec(custom_metadata={"labels": "yellow"})) == ["m2"]


def test_node_acl_identityless_context_is_unrestricted(spark):
    """Round-7 sweep fix: the reference builds acl_conditions ONLY for
    identities the request carries and OMITS the OR-block entirely when there
    are none (memory_graph.py:3029-3030 `if acl_conditions:`) — an
    identity-less node lookup matches unrestricted, it is not denied."""
    from memory_opensource_spark.operators.predicate import (AclContext,
                                                             node_acl_predicate)

    df = spark.createDataFrame(
        [("n1", "alice", ["bob"], ["w1"], ["o1"], ["ns1"], "w1", "o1", "ns1")],
        "node_id string, user_id string, user_read_access array<string>, "
        "workspace_read_access array<string>, organization_read_access array<string>, "
        "namespace_read_access array<string>, workspace_id string, "
        "organization_id string, namespace_id string")
    empty_ctx = AclContext(user_id=None)
    assert df.filter(node_acl_predicate(empty_ctx)).count() == 1
    # tenant-only context: tenant AND applies, OR-block is tenant arms only
    ws_ctx = AclContext(user_id=None, workspace_id="w1")
    assert df.filter(node_acl_predicate(ws_ctx)).count() == 1
    ws_bad = AclContext(user_id=None, workspace_id="w2")
    assert df.filter(node_acl_predicate(ws_bad)).count() == 0
