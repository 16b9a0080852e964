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

def _full_match_regex(c: Column, pattern: str) -> Column:
    """Cypher ``=~`` is a FULL-string regex match (java Pattern.matches), while
    Spark's RLIKE is a substring find — anchor with a non-capturing group so a
    user pattern with alternation ('a|b') still anchors both branches."""
    return c.rlike(f"^(?:{pattern})$")


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
    # WhereCondition completion (models/cipher_ast.py:26-51): NOT IN keeps
    # SQL/Cypher three-valued semantics (NULL column -> NULL -> row dropped
    # by a filter), the null checks take no meaningful value (pass True),
    # and regex is Cypher's full-string ``=~``.
    "not_in": lambda c, v: ~c.isin(*v),
    "is_null": lambda c, v: c.isNull(),
    "is_not_null": lambda c, v: c.isNotNull(),
    "regex": lambda c, v: _full_match_regex(c, v),
}

# Cypher ComparisonOperator tokens (models/cipher_ast.py:26-51), operator for
# operator, mapped onto the _OPS kernel above.
_CYPHER_OPS = {
    "=": "eq", "<>": "ne",
    ">": "gt", ">=": "gte", "<": "lt", "<=": "lte",
    "CONTAINS": "contains", "STARTS WITH": "starts_with",
    "ENDS WITH": "ends_with",
    "IN": "in", "NOT IN": "not_in",
    "IS NULL": "is_null", "IS NOT NULL": "is_not_null",
    "=~": "regex",
}

_VALUELESS = {"IS NULL", "IS NOT NULL"}


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
class WhereCondition:
    """One Cypher WHERE leaf (models/cipher_ast.py:245-302): ``property
    operator value`` with the full ComparisonOperator enum (:26-51) —
    =, <>, >, >=, <, <=, CONTAINS, STARTS WITH, ENDS WITH, IN, NOT IN,
    IS NULL, IS NOT NULL, =~.

    ``and_operator`` chains this condition to the PREVIOUS one exactly as the
    AST does (:585-595): True -> AND, False -> OR, None -> the condition is
    skipped (the reference emits no connective and drops it).  The first
    condition's flag is ignored.
    """

    property: str
    operator: str = "="
    value: Any = None
    and_operator: bool | None = True


def compile_where(conditions: list[WhereCondition]) -> Column | None:
    """Compile a WhereCondition chain to one Column with CYPHER precedence.

    The reference renders the chain as a flat token string
    ``c1 AND c2 OR c3 AND c4`` (cipher_ast.py:585-600) which Neo4j parses
    with AND binding tighter than OR — i.e. OR splits the chain into
    AND-groups.  We reproduce that exactly: accumulate leaves into the
    current AND-group; ``and_operator=False`` closes the group and starts a
    new one; the groups OR together.  NULL three-valued logic rides on
    Spark's own Column semantics (identical to Cypher's: NULL CONTAINS x ->
    NULL -> filtered).

    Returns None for an empty/all-skipped chain (caller applies no filter —
    the reference emits no WHERE clause).
    """
    groups: list[list[Column]] = []
    current: list[Column] = []
    for i, cond in enumerate(conditions):
        if i > 0 and cond.and_operator is None:
            continue  # cipher_ast.py:593-595 — no connective, condition dropped
        op = _CYPHER_OPS.get(cond.operator)
        if op is None:
            raise ValueError(f"unknown Cypher operator: {cond.operator!r}")
        value = True if cond.operator in _VALUELESS else cond.value
        leaf = _OPS[op](F.col(cond.property), value)
        if current and cond.and_operator is False:
            groups.append(current)
            current = [leaf]
        else:
            current.append(leaf)
    if current:
        groups.append(current)
    if not groups:
        return None
    ors: list[Column] = []
    for group in groups:
        acc = group[0]
        for c in group[1:]:
            acc = acc & c
        ors.append(acc)
    acc = ors[0]
    for c in ors[1:]:
        acc = acc | c
    return acc


@dataclass
class SearchFilter:
    """G15 SearchOverrideFilter (models/memory_models.py:699-719): a property
    filter scoped to one endpoint label of the override pattern.  The public
    enum is CONTAINS/EQUALS/STARTS_WITH/IN; the executor's schema widens to
    the full Cypher set (chat_gpt_completion.py:5649), so any _CYPHER_OPS
    token is accepted — EQUALS is normalized to ``=``."""

    node_type: str
    property_name: str
    operator: str = "CONTAINS"  # the executor's schema default (:5651)
    value: Any = None


def compile_search_filters(filters: list[SearchFilter],
                           label: str) -> Column | None:
    """Compile the G15 filters that target ``label`` into one Column, with the
    reference's grouping semantics (chat_gpt_completion.py:5699-5744
    ``_group_filters_by_property``): filters on the SAME property OR
    together, distinct properties AND together (:5865).  Filters with an
    empty property or value are dropped (:5712-5713) — except the valueless
    null checks.  Returns None when nothing targets this label (no WHERE)."""
    by_prop: dict[str, list[Column]] = {}
    for flt in filters:
        if flt.node_type != label:
            continue
        operator = "=" if flt.operator == "EQUALS" else \
            flt.operator.replace("STARTS_WITH", "STARTS WITH").replace(
                "ENDS_WITH", "ENDS WITH")
        if not flt.property_name:
            continue
        if operator not in _VALUELESS and (flt.value is None or flt.value == ""):
            continue
        op = _CYPHER_OPS.get(operator)
        if op is None:
            raise ValueError(f"unknown G15 filter operator: {flt.operator!r}")
        value = True if operator in _VALUELESS else flt.value
        leaf = _OPS[op](F.col(flt.property_name), value)
        by_prop.setdefault(flt.property_name, []).append(leaf)
    if not by_prop:
        return None
    ands: list[Column] = []
    for leaves in by_prop.values():
        acc = leaves[0]
        for c in leaves[1:]:
            acc = acc | c
        ands.append(acc)
    acc = ands[0]
    for c in ands[1:]:
        acc = acc & c
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
