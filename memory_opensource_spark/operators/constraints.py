"""Node/Edge constraint policies (G14): create/lookup/on_miss/when/set.

Spec from models/shared_types.py:1277-1684 (NodeConstraint, EdgeConstraint) and
the resolver services (node_constraint_resolver.py, edge_constraint_resolver.py)
— re-expressed as DataFrame plan branches:

- ``create='lookup'``  -> left join against existing nodes; on_miss decides what
                          happens to unmatched rows (create / ignore / error).
- ``create='upsert'``  -> MERGE semantics (anti-join + union).
- ``when``             -> boolean condition tree {_and/_or/_not, col: value} or
                          {col: {op: value}} compiled to a Column.
- ``set``              -> literal column assignments applied to matched rows.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Any

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

_OPS = {
    "eq": lambda c, v: c == v,
    "ne": lambda c, v: c != v,
    "gt": lambda c, v: c > v,
    "gte": lambda c, v: c >= v,
    "lt": lambda c, v: c < v,
    "lte": lambda c, v: c <= v,
    "contains": lambda c, v: c.contains(v),
    "starts_with": lambda c, v: c.startswith(v),
    "ends_with": lambda c, v: c.endswith(v),
    "in": lambda c, v: c.isin(*v),
}


def compile_when(cond: dict[str, Any]) -> Column:
    """Compile a `when` condition tree to a Column.

    {"_and": [...]} / {"_or": [...]} / {"_not": {...}} combinators; leaves are
    {column: literal} (equality) or {column: {op: value}} with ops
    eq/ne/gt/gte/lt/lte/contains/starts_with/ends_with/in.
    """
    if not cond:
        return F.lit(True)
    parts: list[Column] = []
    for key, value in cond.items():
        if key == "_and":
            sub = [compile_when(c) for c in value]
            acc = sub[0]
            for s in sub[1:]:
                acc = acc & s
            parts.append(acc)
        elif key == "_or":
            sub = [compile_when(c) for c in value]
            acc = sub[0]
            for s in sub[1:]:
                acc = acc | s
            parts.append(acc)
        elif key == "_not":
            parts.append(~compile_when(value))
        elif isinstance(value, dict):
            for op, v in value.items():
                if op not in _OPS:
                    raise ValueError(f"unknown when-operator: {op}")
                parts.append(_OPS[op](F.col(key), v))
        else:
            parts.append(F.col(key) == F.lit(value))
    acc = parts[0]
    for p in parts[1:]:
        acc = acc & p
    return acc


@dataclass
class NodeConstraint:
    label: str
    key_props: list[str]                   # unique-identifier property columns
    create: str = "lookup"                 # lookup | upsert
    on_miss: str = "create"                # create | ignore | error
    when: dict[str, Any] = field(default_factory=dict)
    set_props: dict[str, Any] = field(default_factory=dict)


def resolve_nodes(candidates: DataFrame, existing: DataFrame,
                  constraint: NodeConstraint) -> dict[str, DataFrame]:
    """Apply a NodeConstraint.  Returns:
    - ``matched``: candidate rows joined to their existing node_id (col
      ``resolved_id``), with `set` assignments applied;
    - ``missed``:  candidates with no match, routed per on_miss
      (create -> rows to insert; ignore -> empty semantics handled by caller;
      error -> caller raises if non-empty — we return them either way);
    - ``upserts``: for create='upsert', the union of updated + new rows.
    """
    cand = candidates.filter(compile_when(constraint.when)) if constraint.when else candidates
    ex = existing.filter(F.col("label") == constraint.label)

    keys = constraint.key_props
    ex_keyed = ex.select(F.col("node_id").alias("resolved_id"),
                         *[F.col(k) for k in keys]).dropDuplicates(keys)
    matched = cand.join(ex_keyed, keys, "inner")
    for col, val in constraint.set_props.items():
        matched = matched.withColumn(col, F.lit(val))
    missed = cand.join(ex_keyed.select(*keys), keys, "left_anti")

    out = {"matched": matched, "missed": missed}
    if constraint.create == "upsert":
        updated_keys = cand.select(*keys).dropDuplicates(keys)
        untouched = ex.join(updated_keys, keys, "left_anti")
        out["upserts"] = untouched.unionByName(
            cand.withColumn("label", F.lit(constraint.label)), allowMissingColumns=True
        )
    return out


@dataclass
class EdgeConstraint:
    edge_type: str
    src_key: str                            # column in candidates naming src node
    dst_key: str
    create: str = "upsert"
    when: dict[str, Any] = field(default_factory=dict)
    set_props: dict[str, Any] = field(default_factory=dict)


def resolve_edges(candidates: DataFrame, nodes: DataFrame,
                  constraint: EdgeConstraint) -> DataFrame:
    """Build edges from candidate pairs, keeping only pairs whose endpoints both
    resolve (MATCH src,dst MERGE semantics of S10: memory/memory_graph.py:
    12480-12616 — an edge is never created toward a missing node)."""
    cand = candidates.filter(compile_when(constraint.when)) if constraint.when else candidates
    ids = nodes.select(F.col("node_id"))
    out = (
        cand.join(ids.withColumnRenamed("node_id", constraint.src_key), constraint.src_key, "left_semi")
        .join(ids.withColumnRenamed("node_id", constraint.dst_key), constraint.dst_key, "left_semi")
        .select(
            F.col(constraint.src_key).alias("src"),
            F.col(constraint.dst_key).alias("dst"),
            F.lit(constraint.edge_type).alias("rel_type"),
        )
        .dropDuplicates(["src", "dst", "rel_type"])
    )
    for col, val in constraint.set_props.items():
        out = out.withColumn(col, F.lit(val))
    return out
