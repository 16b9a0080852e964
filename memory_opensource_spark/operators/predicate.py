"""Predicate compiler: the reference's filter algebra (F1-F4) -> a single Column.

The reference builds a Qdrant ``Filter`` tree per request
(memory/memory_graph.py:5810-6034) and re-applies the same algebra row-wise after
fetch (:6844-6912).  In Spark one declarative Column suffices — Catalyst pushes it
into the parquet scan (PushedFilters) — but the *semantics* must match exactly:

- ACL (F1, :5810-5904): OR-block
    user_id == me
    OR me IN user_read_access
    OR any(my workspaces) IN workspace_read_access
    OR any(my roles) IN role_read_access
    OR my org IN organization_read_access
    OR my ns IN namespace_read_access
  AND the namespace hard-scoping equality: whenever the request carries a
  namespace, a strict ``MatchValue(namespace_id=ns)`` MUST applies
  (:5861-5871) — NULL-namespace rows are EXCLUDED.  Organization gets NO
  MUST condition ("to allow legacy memories without organization_id",
  :5834-5844) — only the organization_read_access OR arm.
- Metadata filters (F2, :5919-5960): topics/emoji_tags/emotion_tags match-any;
  hierarchical_structures/location/conversation_id/role/category equality.
- customMetadata (F3, :5961-6026): list -> match-any; bool -> eq;
  **bare numeric -> >= lower bound** (non-obvious; :5990-5997); dict -> range
  {gte,lte,gt,lt}; str -> eq.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Any

from pyspark.sql import Column
from pyspark.sql import functions as F


@dataclass
class AclContext:
    """The caller's identity, as resolved by auth (SURVEY §1.4)."""

    user_id: str
    workspace_ids: list[str] = field(default_factory=list)
    role_ids: list[str] = field(default_factory=list)
    organization_id: str | None = None
    # namespace_id set => STRICT hard scoping applies automatically
    # (memory_graph.py:5861-5871: an unconditional Qdrant MUST
    # MatchValue(namespace_id=ns) whenever the request carries a namespace)
    namespace_id: str | None = None
    # The request's ACTIVE workspace (context["workspace_id"], a scalar) —
    # used by the direct NODE lookups (G3/G4/G6), whose tenant scoping is
    # strict equality on workspace/org/namespace (memory_graph.py:3001-3020).
    # Distinct from workspace_ids (the user's memberships, which feed the
    # memory path's workspace_read_access OR-arm).
    workspace_id: str | None = None
    # optional org narrowing (an extension — the reference deliberately has
    # NO org MUST, :5834-5844; when enabled, legacy NULL-org rows still match)
    scope_organization: bool = False


@dataclass
class FilterSpec:
    """Declarative search filters (SearchRequest, models/memory_models.py:766-962)."""

    topics: list[str] | None = None
    emoji_tags: list[str] | None = None
    emotion_tags: list[str] | None = None
    hierarchical_structures: str | None = None
    location: str | None = None
    conversation_id: str | None = None
    role: str | None = None
    category: str | None = None
    custom_metadata: dict[str, Any] | None = None
    exclude_memory_id: str | None = None
    # F7 OMO safety (services/omo_safety.py; enums shared_types.py:974-994)
    consent_allowed: list[str] | None = None   # e.g. ["explicit", "implicit"]
    risk_blocked: list[str] | None = None      # e.g. ["flagged"]


def _lit_array(values: list[str]) -> Column:
    return F.array(*[F.lit(v) for v in values])


def acl_predicate(ctx: AclContext, prefix: str = "") -> Column:
    """Compile the F1 OR-block + scoping for columns named ``{prefix}user_id`` etc."""
    c = lambda name: F.col(prefix + name)  # noqa: E731
    ors = [
        c("user_id") == ctx.user_id,
        F.array_contains(c("user_read_access"), ctx.user_id),
    ]
    # The reference only compiles the workspace/role OR-arms when the list is
    # small ("Only add ... if ... <= 10 (for speed)", memory_graph.py:
    # 5821-5827) — a speed guard with semantic effect: a caller with 11
    # workspaces gets NO workspace arm at all, so rows readable only via a
    # workspace grant disappear from their results.  Mirrored, not "fixed".
    if ctx.workspace_ids and len(ctx.workspace_ids) <= 10:
        ors.append(F.arrays_overlap(c("workspace_read_access"), _lit_array(ctx.workspace_ids)))
    if ctx.role_ids and len(ctx.role_ids) <= 10:
        ors.append(F.arrays_overlap(c("role_read_access"), _lit_array(ctx.role_ids)))
    if ctx.organization_id:
        ors.append(F.array_contains(c("organization_read_access"), ctx.organization_id))
    if ctx.namespace_id:
        ors.append(F.array_contains(c("namespace_read_access"), ctx.namespace_id))
    pred = ors[0]
    for o in ors[1:]:
        pred = pred | o
    # Coalesce each arm's NULL (null arrays on legacy rows) to false.
    pred = F.coalesce(pred, F.lit(False))
    # Namespace hard scoping is STRICT and unconditional (memory_graph.py:
    # 5861-5871): MatchValue(namespace_id=ns) excludes NULL-namespace rows —
    # tenant isolation, no legacy allowance.  (The == comparison is NULL for
    # NULL namespace_id, which a filter treats as false — exactly MatchValue.)
    if ctx.namespace_id:
        pred = pred & (c("namespace_id") == ctx.namespace_id)
    # Org narrowing stays opt-in with the legacy-NULL allowance; the
    # reference has no org MUST at all (:5834-5844).
    if ctx.scope_organization and ctx.organization_id:
        pred = pred & (
            c("organization_id").isNull() | (c("organization_id") == ctx.organization_id)
        )
    return pred


def node_acl_predicate(ctx: AclContext, prefixes: tuple[str, ...] = ("",)) -> Column:
    """The DIRECT NODE lookups' filter (G3/G4/G6: find_node_by_property /
    find_node_by_fuzzy_match / find_node_via_relationship,
    memory/memory_graph.py:3001-3048, :3111-3162, :3180-3237) — a different
    algebra than the memory search path:

    - **Tenant scoping is strict AND equality for EVERY key the request
      carries** — ``n.workspace_id = $ws AND n.organization_id = $org AND
      n.namespace_id = $ns`` (:3002-3009).  Unlike the memory path, the
      ORGANIZATION gets no legacy-NULL allowance here: a NULL-org node never
      matches an org-scoped node lookup (Cypher ``=`` excludes NULLs, as does
      the Column ``==``).
    - **The OR-block has NO role arm** (:3010-3020) and uses the request's
      single active workspace, not the membership list.
    - **Multi-node patterns share ONE OR-block** (G6, :3192-3208): the arms
      for BOTH endpoints live in the same OR, so access to EITHER endpoint
      satisfies the ACL — pass ``prefixes=("", "t_")`` and the tenant AND
      still applies per-endpoint.
    """
    c = F.col
    ors: list[Column] = []
    # every arm is CONDITIONAL on the request carrying that identity — an
    # identity-less lookup has NO acl_conditions and the reference omits the
    # OR-block entirely (unrestricted match), it does not deny (:3029-3030
    # `if acl_conditions:`; round-7 sweep fix — the r6 form always built the
    # user arms, denying everything for an identity-less context)
    for p in prefixes:
        if ctx.user_id:
            ors.append(c(p + "user_id") == ctx.user_id)
            ors.append(F.array_contains(c(p + "user_read_access"), ctx.user_id))
    for p in prefixes:
        if ctx.workspace_id:
            ors.append(F.array_contains(c(p + "workspace_read_access"), ctx.workspace_id))
        if ctx.organization_id:
            ors.append(F.array_contains(c(p + "organization_read_access"), ctx.organization_id))
        if ctx.namespace_id:
            ors.append(F.array_contains(c(p + "namespace_read_access"), ctx.namespace_id))
    if not ors:
        pred = F.lit(True)
    else:
        pred = ors[0]
        for o in ors[1:]:
            pred = pred | o
        pred = F.coalesce(pred, F.lit(False))
    for p in prefixes:
        for col_name, val in (("workspace_id", ctx.workspace_id),
                              ("organization_id", ctx.organization_id),
                              ("namespace_id", ctx.namespace_id)):
            if val:
                pred = pred & (c(p + col_name) == val)
    return pred


def _custom_metadata_cond(key: str, value: Any, map_col: str = "custom_metadata") -> Column:
    """F3 algebra on a map<string,string> column with typed promotions.

    Values in the map are stringified; typed twin columns (``cm_*``) are preferred
    when present at compile time is unknown, so this operates on the map column and
    casts as needed — mirroring the row-wise `value_matches`
    (memory/memory_graph.py:6855-6897).
    """
    v_col = F.col(map_col).getItem(key)
    if isinstance(value, bool):  # bool before int: bool is an int subclass
        return v_col == F.lit(str(value).lower())
    if isinstance(value, (int, float)):
        # bare numeric -> >= lower bound (memory_graph.py:5990-5997).
        # try_cast, not cast: under ANSI mode (Spark 4 default) cast('red' AS
        # double) THROWS mid-scan; the reference's row-wise value_matches
        # returns False for unparseable values (memory_graph.py:6884-6891) —
        # try_cast's NULL gives exactly that (found by the hypothesis model
        # test, tests/test_properties.py).
        return v_col.try_cast("double") >= F.lit(float(value))
    if isinstance(value, list):
        # match-any over list values
        cond = F.lit(False)
        for item in value:
            cond = cond | (v_col == F.lit(str(item)))
        return cond
    if isinstance(value, dict):
        # range {gte,lte,gt,lt} (memory_graph.py:6005-6020)
        cond = F.lit(True)
        num = v_col.try_cast("double")  # ANSI-safe: unparseable -> NULL -> no match
        if "gte" in value:
            cond = cond & (num >= float(value["gte"]))
        if "gt" in value:
            cond = cond & (num > float(value["gt"]))
        if "lte" in value:
            cond = cond & (num <= float(value["lte"]))
        if "lt" in value:
            cond = cond & (num < float(value["lt"]))
        return cond
    # F4 forgiving string semantics (memory_graph.py:6855-6897): a string filter
    # matches scalar equality OR membership in a list-valued entry (lists are
    # stored comma-joined in the string map).
    return (v_col == F.lit(str(value))) | F.array_contains(
        F.split(v_col, r",\s*"), str(value)
    )


def metadata_predicate(spec: FilterSpec, map_col: str = "custom_metadata") -> Column:
    """Compile F2 + F3 + F5 into one Column (True when spec is empty)."""
    pred = F.lit(True)
    for arr_field, values in (
        ("topics", spec.topics),
        ("emoji_tags", spec.emoji_tags),
        ("emotion_tags", spec.emotion_tags),
    ):
        if values:
            pred = pred & F.arrays_overlap(F.col(arr_field), _lit_array(values))
    for eq_field, value in (
        ("hierarchical_structures", spec.hierarchical_structures),
        ("location", spec.location),
        ("conversation_id", spec.conversation_id),
        ("role", spec.role),
        ("category", spec.category),
    ):
        if value is not None:
            pred = pred & (F.col(eq_field) == F.lit(value))
    if spec.custom_metadata:
        for key, value in spec.custom_metadata.items():
            pred = pred & _custom_metadata_cond(key, value, map_col)
    if spec.exclude_memory_id:
        pred = pred & (F.col("memory_id") != F.lit(spec.exclude_memory_id))
    if spec.consent_allowed:
        pred = pred & F.col("consent").isin(*spec.consent_allowed)
    if spec.risk_blocked:
        # blacklist semantics: a NULL (legacy/unlabeled) risk must PASS —
        # a bare ~isin() is NULL for NULL input and would silently drop the row
        pred = pred & (F.col("risk").isNull() | ~F.col("risk").isin(*spec.risk_blocked))
    return pred


def compile_filter(ctx: AclContext | None, spec: FilterSpec | None,
                   prefix: str = "", map_col: str = "custom_metadata") -> Column:
    """Full search predicate: ACL AND metadata (the single filter stage that
    subsumes the reference's pushdown/post-fetch split, SURVEY §4).

    ``map_col`` names the map<string,string> column the F3 customMetadata
    algebra indexes — callers whose frame stores custom_metadata as a JSON
    STRING (the engine's memories table) pass a ``from_json``-derived column
    instead (see :func:`spec_filter`)."""
    pred = F.lit(True)
    if ctx is not None:
        pred = pred & acl_predicate(ctx, prefix)
    if spec is not None:
        pred = pred & metadata_predicate(spec, map_col)
    return pred


def spec_filter(df, spec: FilterSpec | None):
    """Apply a metadata spec to ``df`` regardless of how custom_metadata is
    stored: map columns filter directly; JSON-string columns (the engine's
    MEMORY_SCHEMA) are parsed with ``from_json`` into a temporary map first
    (round-5 review finding: ``getItem`` on a StringType column raises
    INVALID_EXTRACT_BASE_FIELD_TYPE, making the documented F3 route crash on
    the engine surface).  Returns the filtered DataFrame."""
    from pyspark.sql.types import StringType

    if spec is None:
        return df
    needs_parse = (
        spec.custom_metadata
        and "custom_metadata" in df.columns
        and isinstance(df.schema["custom_metadata"].dataType, StringType)
    )
    if not needs_parse:
        return df.filter(compile_filter(None, spec))
    parsed = df.withColumn(
        "__cm_map", F.from_json("custom_metadata", "map<string,string>"))
    return (parsed.filter(compile_filter(None, spec, map_col="__cm_map"))
            .drop("__cm_map"))
