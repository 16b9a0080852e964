"""PropertyOverrideRule semantics vs the reference
(api_handlers/chat_gpt_completion.py:4246-4348)."""

import pyspark.sql.functions as F

from memory_opensource_spark.operators.graph import apply_property_overrides


def _nodes(spark, rows):
    df = spark.createDataFrame(rows, "node_id string, label string, name string, status string")
    return df.withColumn("props", F.create_map(
        F.lit("name"), F.col("name"), F.lit("status"), F.col("status")))


def _props(out):
    return {r["node_id"]: (dict(r["props"]), r["applied_rules"]) for r in out.collect()}


def test_match_set_and_no_match_rule(spark):
    nodes = _nodes(spark, [("n1", "User", "Alice", "new"),
                           ("n2", "User", "Bob", "new"),
                           ("n3", "Note", "x", "new")])
    rules = [
        {"nodeLabel": "User", "match": {"name": "Alice"}, "set": {"id": "user_alice_123", "role": "pm"}},
        {"nodeLabel": "Note", "set": {"pageId": "pg_123"}},
    ]
    got = _props(apply_property_overrides(nodes, rules))
    assert got["n1"][0]["id"] == "user_alice_123" and got["n1"][0]["role"] == "pm"
    assert got["n1"][1] == 1
    assert "id" not in got["n2"][0] and got["n2"][1] == 0
    assert got["n3"][0]["pageId"] == "pg_123" and got["n3"][1] == 1


def test_match_against_original_props_and_last_rule_wins(spark):
    nodes = _nodes(spark, [("n1", "User", "Alice", "active")])
    rules = [
        {"nodeLabel": "User", "match": {"status": "active"}, "set": {"status": "verified", "tier": "premium"}},
        # still matches: conditions evaluate against the ORIGINAL status
        {"nodeLabel": "User", "match": {"status": "active"}, "set": {"tier": "gold"}},
    ]
    got = _props(apply_property_overrides(nodes, rules))
    assert got["n1"][0]["status"] == "verified"
    assert got["n1"][0]["tier"] == "gold"  # later rule overwrites
    assert got["n1"][1] == 2


def test_missing_match_key_is_no_match(spark):
    nodes = _nodes(spark, [("n1", "User", "Alice", "active")])
    rules = [{"nodeLabel": "User", "match": {"absent_key": "x"}, "set": {"hit": "y"}}]
    got = _props(apply_property_overrides(nodes, rules))
    assert "hit" not in got["n1"][0] and got["n1"][1] == 0


def test_no_set_keys_only_counts(spark):
    nodes = _nodes(spark, [("n1", "User", "Alice", "active")])
    out = apply_property_overrides(nodes, [{"nodeLabel": "User", "set": {}}])
    r = out.collect()[0]
    assert r["applied_rules"] == 1 and dict(r["props"]) == {"name": "Alice", "status": "active"}


def test_randomized_parity_with_python_twin(spark):
    """Randomized nodes x rules vs a direct transcription of the reference's
    in-place loop (chat_gpt_completion.py:4267-4310)."""
    import random

    rng = random.Random(42)
    labels = ["User", "Note", "Task"]
    statuses = ["new", "active", "done"]
    names = ["a", "b", "c", "d"]

    rows = [(f"n{i}", rng.choice(labels), rng.choice(names), rng.choice(statuses))
            for i in range(40)]
    rules = []
    for _ in range(6):
        rule = {"nodeLabel": rng.choice(labels),
                "set": {rng.choice(["tier", "status", "flag"]): rng.choice(["x", "y", "z"])}}
        if rng.random() < 0.6:
            key = rng.choice(["name", "status", "missing_key"])
            rule["match"] = {key: rng.choice(names + statuses)}
        rules.append(rule)

    def twin(label, props):
        final = dict(props)
        applied = 0
        for r in rules:
            if r["nodeLabel"] != label:
                continue
            ok = True
            for k, v in (r.get("match") or {}).items():
                if props.get(k) != v:   # ORIGINAL props, reference semantics
                    ok = False
                    break
            if not ok:
                continue
            applied += 1
            final.update(r["set"])
        return final, applied

    expected = {nid: twin(lbl, {"name": nm, "status": st})
                for nid, lbl, nm, st in rows}
    got = _props(apply_property_overrides(_nodes(spark, rows), rules))
    assert got == expected
