"""Graph operators (SURVEY §2.4): the reference's constrained-Cypher subset as
DataFrame joins over ``nodes`` / ``edges`` tables.

The reference's query language is a Pydantic AST (models/cipher_ast.py): exactly one
``MATCH (m:L1)-[r:TYPE]-(n:L2)`` (undirected), a property-whitelisted WHERE, mandatory
ACL on both endpoints, DISTINCT path, LIMIT k.  Spark-first translation:

- undirected edge == union of both orientations (cipher_ast.py:23-25);
- pattern match == edges ⋈ nodes(m) ⋈ nodes(n) — two equi-joins; nodes is the small
  side at typical graph shapes, so it broadcasts; at 100 TB edges shuffle-hash-join
  on id with AQE skew handling;
- DISTINCT path == dropDuplicates on (m.id, rel_type, n.id);
- bounded var-length 1..2 paths == 1-hop ∪ (edges ⋈ edges) — no recursion needed
  (chat_gpt_completion.py:2464-2553 caps at *1..2).
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Any

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


@dataclass
class PatternSpec:
    """SearchOverrideSpecification (models/memory_models.py:679-763) — the
    deterministic public query surface (G15) that compiles to a G1 match."""

    source_label: str | None = None
    relationship_type: str | None = None
    target_label: str | None = None
    direction: str = "any"  # out | in | any  (any == undirected, the AST default)
    limit: int | None = None


def undirected_edges(edges: DataFrame) -> DataFrame:
    """Both orientations (models/cipher_ast.py:23-25).  Distinct-path
    dedup downstream collapses A-B/B-A double counting per the AST's
    ``WITH DISTINCT path`` (:886-898).

    Explode-of-both-orientations instead of self-union: ONE pass over the
    edge source (a union runs the scan + upstream filters twice)."""
    both = F.array(
        F.struct(F.col("src"), F.col("dst")),
        F.struct(F.col("dst").alias("src"), F.col("src").alias("dst")),
    )
    return (edges.select(F.explode(both).alias("e"), F.col("rel_type"))
            .select(F.col("e.src").alias("src"), F.col("e.dst").alias("dst"),
                    "rel_type"))


def match_pattern(nodes: DataFrame, edges: DataFrame, spec: PatternSpec,
                  m_pred: Column | None = None, n_pred: Column | None = None,
                  node_cols: list[str] | None = None,
                  dedup: bool = True) -> DataFrame:
    """G1 single-hop pattern match (cipher_ast.py:855-900; executed
    memory/memory_graph.py:8963-9143).

    Returns one row per DISTINCT path: m_id, m_label, rel_type, n_id, n_label
    (+ requested ``node_cols`` prefixed m_/n_).

    ``dedup=False`` skips the per-path DISTINCT shuffle — for consumers that
    immediately re-aggregate on a SUBSET of the path key (e.g. the agentic
    read's ``select(m_id).distinct()``), the inner dedup is redundant work:
    distinct over a subset key gives the same set either way.
    """
    e = edges
    if spec.relationship_type:
        e = e.filter(F.col("rel_type") == spec.relationship_type)
    if spec.direction == "any":
        e = undirected_edges(e)
    elif spec.direction == "in":
        e = e.select(F.col("dst").alias("src"), F.col("src").alias("dst"), "rel_type")
    else:
        e = e.select("src", "dst", "rel_type")

    extra = node_cols or []
    m = nodes.select(F.col("node_id"), F.col("label"), *[F.col(c) for c in extra])
    n = nodes.select(F.col("node_id"), F.col("label"), *[F.col(c) for c in extra])
    if spec.source_label:
        m = m.filter(F.col("label") == spec.source_label)
    if spec.target_label:
        n = n.filter(F.col("label") == spec.target_label)
    if m_pred is not None:
        m = m.filter(m_pred)
    if n_pred is not None:
        n = n.filter(n_pred)

    m = m.select(
        F.col("node_id").alias("m_id"), F.col("label").alias("m_label"),
        *[F.col(c).alias(f"m_{c}") for c in extra],
    )
    n = n.select(
        F.col("node_id").alias("n_id"), F.col("label").alias("n_label"),
        *[F.col(c).alias(f"n_{c}") for c in extra],
    )
    out = (
        e.join(m, e.src == F.col("m_id"))
        .join(n, e.dst == F.col("n_id"))
        .drop("src", "dst")
    )
    if dedup or spec.limit:
        # dedup=False is only sound for consumers that re-aggregate on a
        # subset key with NO inner row cap: a limit over non-distinct paths
        # lets duplicate rows (self-loops under direction="any", repeated
        # edge rows) consume limit slots and silently drop distinct matches.
        #
        # DISTINCT over ALL columns, not the (m_id, rel_type, n_id) key
        # subset: labels and carried node properties are functionally
        # dependent on the endpoint ids (nodes are unique by node_id — the
        # G8 merge contract), so the row set is identical either way, but
        # the key-subset form aggregates the other columns with first() —
        # a string buffer is not UnsafeRow-mutable, which forces
        # SortAggregate (every path row sorted per task before the
        # combine).  Distinct-all has NO aggregate functions, so it plans
        # as a pure-grouping HashAggregate — and it is literally the
        # oracle's SELECT DISTINCT.  Map-typed properties are not
        # groupable; fall back to the key-subset form if a caller carries
        # one.
        if any(t.startswith("map<") for _, t in out.dtypes):
            out = out.dropDuplicates(["m_id", "rel_type", "n_id"])
        else:
            out = out.dropDuplicates()
    if spec.limit:
        out = out.orderBy("m_id", "rel_type", "n_id").limit(spec.limit)
    return out


#: SearchOverridePattern.direction tokens (models/memory_models.py:693-696)
#: -> PatternSpec.direction
_DIRECTION = {"->": "out", "<-": "in", "-": "any"}


def search_override(nodes: DataFrame, edges: DataFrame, *,
                    source_label: str, relationship_type: str,
                    target_label: str, direction: str = "->",
                    filters: list | None = None,
                    return_properties: list[str] | None = None,
                    node_cols: list[str] | None = None,
                    limit: int | None = None,
                    acl: Column | None = None) -> DataFrame:
    """The full G15 SearchOverrideSpecification surface in ONE call
    (models/memory_models.py:679-763): developer pattern
    ``(source)-[relationship]->(target)`` with direction tokens
    ``->``/``<-``/``-``, property ``filters`` (constraints.SearchFilter —
    compiled per endpoint with the executor's same-property-OR /
    cross-property-AND grouping, chat_gpt_completion.py:5699-5744,
    :5865), and ``return_properties`` (project only the requested node
    properties; None = every carried property, the reference default).

    ``node_cols`` is the set of property columns carried through the
    join (defaults to return_properties, else none); ``acl`` applies to
    BOTH endpoints (the reference's mandatory both-endpoint ACL — G15's
    defining constraint).  Everything compiles to the same
    :func:`match_pattern` join tree as G1."""
    from .constraints import compile_search_filters

    if direction not in _DIRECTION:
        raise ValueError(f"direction must be one of {sorted(_DIRECTION)}, "
                         f"got {direction!r}")
    flts = list(filters or ())
    m_pred = compile_search_filters(flts, source_label)
    n_pred = compile_search_filters(flts, target_label)
    if acl is not None:
        m_pred = acl if m_pred is None else (m_pred & acl)
        n_pred = acl if n_pred is None else (n_pred & acl)
    cols = node_cols if node_cols is not None else (return_properties or [])
    spec = PatternSpec(source_label=source_label,
                       relationship_type=relationship_type,
                       target_label=target_label,
                       direction=_DIRECTION[direction], limit=limit)
    out = match_pattern(nodes, edges, spec, m_pred=m_pred, n_pred=n_pred,
                        node_cols=cols)
    if return_properties is not None:
        keep = ["m_id", "m_label", "rel_type", "n_id", "n_label"] + \
            [f"{side}_{p}" for p in return_properties for side in ("m", "n")
             if f"{side}_{p}" in out.columns]
        out = out.select(*keep)
    return out


def two_hop_paths(nodes: DataFrame, edges: DataFrame,
                  start_pred: Column | None = None,
                  limit: int | None = None) -> DataFrame:
    """G2 bounded var-length paths *1..2 (chat_gpt_completion.py:2464-2553).

    Returns {start_id, hop1_id, end_id, depth} where depth ∈ {1,2}; depth-1 rows
    have hop1_id == end_id.  DISTINCT paths; directed edges here (the fallback
    query's second MATCH is `path=(p)-[*1..2]-(n)` — we expose direction as data
    and let callers pre-union orientations via :func:`undirected_edges`).
    """
    e1 = edges.select(F.col("src").alias("start_id"), F.col("dst").alias("hop1_id"))
    if start_pred is not None:
        starts = nodes.filter(start_pred).select(F.col("node_id").alias("start_id"))
        e1 = e1.join(starts, "start_id", "left_semi")
    one = e1.select("start_id", "hop1_id", F.col("hop1_id").alias("end_id"),
                    F.lit(1).alias("depth")).distinct()
    e2 = edges.select(F.col("src").alias("hop1_id"), F.col("dst").alias("end_id"))
    two = (
        e1.join(e2, "hop1_id")
        .filter(F.col("start_id") != F.col("end_id"))  # no trivial cycles
        .select("start_id", "hop1_id", "end_id", F.lit(2).alias("depth"))
        .distinct()
    )
    out = one.unionByName(two)
    if limit:
        out = out.orderBy("start_id", "depth", "hop1_id", "end_id").limit(limit)
    return out


def find_node_by_property(nodes: DataFrame, label: str, prop_col: str, value: Any,
                          acl: Column | None = None) -> DataFrame:
    """G3 (memory/memory_graph.py:2977-3048): exact property lookup, LIMIT 1
    deterministic (min node_id)."""
    out = nodes.filter(F.col("label") == label).filter(F.col(prop_col) == F.lit(value))
    if acl is not None:
        out = out.filter(acl)
    return out.orderBy("node_id").limit(1)


def find_node_by_fuzzy_match(nodes: DataFrame, label: str, prop_col: str, query: str,
                             acl: Column | None = None) -> DataFrame:
    """G4 (memory/memory_graph.py:3090-3162): toLower(prop) CONTAINS toLower(q)."""
    out = nodes.filter(F.col("label") == label).filter(
        F.lower(F.col(prop_col)).contains(query.lower())
    )
    if acl is not None:
        out = out.filter(acl)
    return out.orderBy("node_id").limit(1)


def find_node_by_semantic_match(mentions: DataFrame, prop_index: DataFrame,
                                nodes: DataFrame, threshold: float | None = None,
                                mention_id: str = "mention_id",
                                index_id: str = "node_id",
                                vec_col: str = "embedding",
                                k_overfetch: int = 5) -> DataFrame:
    """G5 (memory/memory_graph.py:3050-3089, find_node_by_semantic_match):
    resolve each mention by EMBEDDING similarity against the property index —
    the best hit with cosine >= threshold (Qdrant ``score_threshold`` is
    inclusive, :11557-11570) supplies the canonical node id, which then
    fetches the node row by id (the G3 lookup, :3083-3089).  Mentions whose
    best hit falls below the threshold resolve to NULL (the caller creates a
    new node), mirroring the reference's ``return None``.

    Batch form of the reference's one-mention call: ``mentions`` is
    {mention_id, embedding}; ``prop_index`` is the V8 property index
    {node_id, embedding}; ``nodes`` is the node store keyed by ``node_id``.
    Returns one row per mention: {mention_id, canonical_id (nullable), score
    (6dp, NULL for creates)} joined with the canonical node's columns.

    Determinism: candidates rank on the 6-dp-rounded score with an id
    tie-break — the reference delegates tie order to Qdrant's internals; a
    distributed engine must pin it or identical inputs could resolve to
    different canonical nodes across runs.  The kNN is budget-routed
    (broadcast-BLAS under 500k index rows, grid join past it) so the plan
    never materializes an all-pairs product."""
    from ..semantics import SEMANTIC_MATCH_THRESHOLD
    from .similarity import best_rounded_match, knn_join_auto

    thr = SEMANTIC_MATCH_THRESHOLD if threshold is None else threshold
    # distinct id domains (mention ids vs node ids) — a numeric collision must
    # not suppress a legitimate match, and the reference's Qdrant search has
    # no self-pair concept: exclude_self off
    cand = knn_join_auto(mentions, prop_index, k_overfetch,
                         left_vec=vec_col, right_vec=vec_col,
                         left_id=mention_id, right_id=index_id,
                         exclude_self=False)
    best = best_rounded_match(cand, threshold=thr).select(
        F.col("left_id").alias(mention_id),
        F.col("right_id").alias("canonical_id"),
        "score")
    out = mentions.select(mention_id).join(best, mention_id, "left")
    node_cols = [c for c in nodes.columns if c not in (index_id, vec_col)]
    canon = nodes.select(F.col(index_id).alias("canonical_id"), *node_cols)
    return out.join(canon, "canonical_id", "left").select(
        mention_id, "canonical_id", "score", *node_cols)


_TENANT_ACL_COLS = (
    "user_id", "user_read_access", "workspace_id", "workspace_read_access",
    "organization_id", "organization_read_access", "namespace_id",
    "namespace_read_access",
)


def find_node_via_relationship(nodes: DataFrame, edges: DataFrame, label: str,
                               rel_type: str, target_id: str,
                               direction: str = "out", ctx=None) -> DataFrame:
    """G6 (memory/memory_graph.py:3163-3237): neighbor of a known node through a
    typed edge, LIMIT 1 deterministic.

    With ``ctx`` (an AclContext), applies the reference's tenant + ACL
    scoping over BOTH endpoints (:3183-3208): strict tenant equality on each
    of n and t for every tenant key the request carries, and ONE shared
    OR-block spanning both endpoints' arms — access to either endpoint
    satisfies the ACL.  The target's columns join in as a single broadcast
    row; a missing target yields the reference's empty result."""
    e = edges.filter(F.col("rel_type") == rel_type)
    if direction == "out":
        e = e.filter(F.col("dst") == target_id).select(F.col("src").alias("node_id"))
    else:
        e = e.filter(F.col("src") == target_id).select(F.col("dst").alias("node_id"))
    out = nodes.filter(F.col("label") == label).join(e, "node_id", "left_semi")
    if ctx is not None:
        from .predicate import node_acl_predicate

        t = nodes.filter(F.col("node_id") == target_id).select(
            *[F.col(c).alias(f"t_{c}") for c in _TENANT_ACL_COLS])
        out = (out.crossJoin(F.broadcast(t))
               .filter(node_acl_predicate(ctx, prefixes=("", "t_")))
               .drop(*[f"t_{c}" for c in _TENANT_ACL_COLS]))
    return out.orderBy("node_id").limit(1)


def schema_discovery(nodes: DataFrame, edges: DataFrame,
                     acl: Column | None = None) -> tuple[DataFrame, DataFrame]:
    """G7 (memory/memory_graph.py:8437-8571): DISTINCT labels(n), DISTINCT type(r)
    under ACL."""
    nn = nodes.filter(acl) if acl is not None else nodes
    labels = nn.select("label").distinct()
    ee = edges.join(nn.select("node_id"), edges.src == F.col("node_id"), "left_semi")
    rels = ee.select("rel_type").distinct()
    return labels, rels


def connected_components(und_edges: DataFrame, max_rounds: int = 30,
                         report: dict | None = None) -> DataFrame:
    """Connected components via min-label propagation WITH pointer jumping,
    iterated to convergence (checked each round) — the GraphX CC algorithm as a
    DataFrame loop.  ``report`` (optional dict) receives ``{"rounds": k}``
    — probe/test instrumentation for the O(log diameter) claim.

    ``und_edges``: {src, dst} already containing both orientations.
    Returns {node_id, component} where component = min node id in the component.

    Plain neighbor-min needs O(diameter) rounds (a 2000-node chain would need
    2000); adding the pointer-jump step (label <- label-of-label) makes it
    O(log diameter).  Each round materializes via localCheckpoint so the plan
    stays finite and the convergence count is cheap.
    """
    und = und_edges.select("src", "dst").distinct().localCheckpoint(eager=True)
    labels = und.select(F.col("src").alias("node_id")).distinct().withColumn(
        "component", F.col("node_id")
    ).localCheckpoint(eager=True)

    for _ in range(max_rounds):
        neighbor_min = (
            und.join(labels, und.dst == labels.node_id)
            .select(F.col("src").alias("node_id"), F.col("component"))
            .groupBy("node_id")
            .agg(F.min("component").alias("n_min"))
        )
        stepped = labels.join(neighbor_min, "node_id", "left").select(
            "node_id",
            F.col("component").alias("_old"),
            F.least(F.col("component"), F.coalesce(F.col("n_min"), F.col("component"))).alias("component"),
        )
        # pointer jump: component <- component's own component
        parent = stepped.select(
            F.col("node_id").alias("component"), F.col("component").alias("grand"),
        )
        # r13 OPT: carry the previous label through the step and stamp a
        # changed flag INTO the checkpointed frame — the convergence count
        # then scans the checkpoint (no shuffle) instead of re-joining the
        # new labels against the old on node_id (one join + one shuffled
        # job per round, removed; label math is unchanged)
        new_c = F.least(F.col("component"),
                        F.coalesce(F.col("grand"), F.col("component")))
        jumped = stepped.join(parent, "component", "left").select(
            "node_id",
            new_c.alias("component"),
            (new_c != F.col("_old")).alias("_chg"),
        ).localCheckpoint(eager=True)
        changed = jumped.filter(F.col("_chg")).count()
        labels = jumped.select("node_id", "component")
        if report is not None:
            report["rounds"] = report.get("rounds", 0) + 1
        if changed == 0:
            break
    return labels.select("node_id", "component")


def merge_nodes(existing: DataFrame, incoming: DataFrame,
                key_cols: list[str]) -> DataFrame:
    """G8 MERGE-by-unique-props semantics (memory/memory_graph.py:11109-11270) in
    pure-DataFrame form: incoming rows matching on keys replace existing; others
    append.  (With Delta this is a MERGE INTO; parquet pipelines rewrite.)"""
    updated = existing.join(incoming.select(*key_cols), key_cols, "left_anti")
    return updated.unionByName(incoming)


def extracted_edges(memory_nodes: DataFrame, entity_nodes: DataFrame,
                    mapping: DataFrame) -> DataFrame:
    """G11 (memory/memory_graph.py:4732-4756): Memory -EXTRACTED-> entity edges
    from an extraction mapping {memory_id, entity_id}."""
    return mapping.select(
        F.col("memory_id").alias("src"),
        F.col("entity_id").alias("dst"),
        F.lit("EXTRACTED").alias("rel_type"),
    )


def related_to_edges(similarities: DataFrame, k: int = 3) -> DataFrame:
    """G12 (memory/memory_graph.py:4414-4440): RELATED_TO edges to each memory's
    top-k most-similar memories, similarity kept as edge metadata."""
    from pyspark.sql import Window

    w = Window.partitionBy("left_id").orderBy(F.col("score").desc(), F.col("right_id").asc())
    return (
        similarities.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(
            F.col("left_id").alias("src"),
            F.col("right_id").alias("dst"),
            F.lit("RELATED_TO").alias("rel_type"),
            F.col("score").alias("similarity_score"),
        )
    )


def apply_property_overrides(nodes: DataFrame, rules: list[dict],
                             label_col: str = "label",
                             props_col: str = "props") -> DataFrame:
    """Auto-mode property overrides (api_handlers/chat_gpt_completion.py:
    4246-4348, models/shared_types.py:249-263): each rule
    ``{"nodeLabel": L, "match": {...}, "set": {...}}`` applies in list order to
    nodes of label L whose ORIGINAL properties equal every match condition
    (missing key = no match); later rules overwrite earlier ones per key.

    Rules are request payload — a handful of literals — so they compile
    straight into codegen'd CASE expressions on the scan: no join, no shuffle,
    no UDF, scan-parallel at any node count.  Adds ``applied_rules`` (count of
    rules that fired per node).
    """
    props = F.col(props_col)
    preds = []
    for rule in rules:
        pred = F.col(label_col) == F.lit(rule["nodeLabel"])
        for k, v in (rule.get("match") or {}).items():
            # element_at -> NULL on a missing key; NULL comparisons are falsy
            # under when(), reproducing the reference's key-not-found FAIL
            pred = pred & (F.element_at(props, F.lit(k)) == F.lit(str(v)))
        preds.append(pred)

    keys: list[str] = []
    for rule in rules:
        for k in rule.get("set", {}):
            if k not in keys:
                keys.append(k)
    applied = sum((F.when(p, 1).otherwise(0) for p in preds), F.lit(0))
    if not keys:
        return nodes.withColumn("applied_rules", applied.cast("int"))
    # NB: merged props and the applied count must land in ONE projection —
    # chained withColumn would re-evaluate the match predicates against the
    # already-merged map instead of the original properties

    entries = []
    for k in keys:
        val = F.lit(None).cast("string")
        for pred, rule in zip(preds, rules):
            if k in rule.get("set", {}):
                # forward iteration with otherwise(prior) leaves the LAST
                # applicable rule outermost — dict.update() order semantics
                val = F.when(pred, F.lit(str(rule["set"][k]))).otherwise(val)
        entries.append(F.struct(F.lit(k).alias("key"), val.alias("value")))

    ov_entries = F.filter(F.array(*entries), lambda e: e["value"].isNotNull())
    ov_keys = F.transform(ov_entries, lambda e: e["key"])
    merged = F.map_concat(
        F.map_filter(props, lambda k, _: ~F.array_contains(ov_keys, k)),
        F.map_from_entries(ov_entries),
    )
    return nodes.withColumns({props_col: merged,
                              "applied_rules": applied.cast("int")})
