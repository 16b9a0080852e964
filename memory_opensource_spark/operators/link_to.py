"""link_to DSL (G13): the reference's entity-link shorthand, parsed fresh.

Grammar (services/link_to_parser.py:1-77 — spec only, implementation is new):

    Type:prop                      lookup node where prop == (value from payload)
    Type:prop=value                exact-match lookup
    Type:prop~value                semantic match (cosine >= threshold)
    Type:prop~value@0.9            ... with explicit threshold
    Spec.via(EDGE->Target:prop)    create/lookup through a typed edge
    Src->EDGE->Tgt:prop            explicit edge form
    $this | $previous | $context:N special memory references

parse() produces LinkSpec dataclasses; compile_lookup() turns a spec into the
corresponding DataFrame lookup (G3 exact / G4-V7 semantic), so the DSL bottoms
out in the same join operators as everything else.
"""

from __future__ import annotations

import re
from dataclasses import dataclass, field

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ..semantics import SEMANTIC_MATCH_THRESHOLD

_SPECIAL = re.compile(r"^\$(this|previous|context:(\d+))$")
_EDGE_FORM = re.compile(
    r"^(?P<src>[A-Za-z_][\w]*(?::[\w]+(?:[=~][^-.@]+(?:@[\d.]+)?)?)?)"
    r"->(?P<edge>[A-Z_][A-Z0-9_]*)->"
    r"(?P<tgt>[A-Za-z_][\w]*:[\w]+(?:[=~][^-.@]+(?:@[\d.]+)?)?)$"
)
_VIA = re.compile(r"^(?P<base>.+?)\.via\((?P<edge>[A-Z_][A-Z0-9_]*)->(?P<tgt>[^)]+)\)$")
# exact values (=) may contain anything incl. '@' (emails); semantic values (~)
# exclude '@' except a trailing numeric @threshold
_NODE_FORM = re.compile(
    r"^(?P<label>[A-Za-z_][\w]*):(?P<prop>[\w]+)"
    r"(?:"
    r"(?:=(?P<evalue>.+))"
    r"|"
    r"(?:~(?P<svalue>[^@]+)(?:@(?P<threshold>\d+(?:\.\d+)?))?)"
    r")?$"
)


@dataclass
class NodeLink:
    label: str
    prop: str | None = None
    value: str | None = None
    match: str = "payload"  # payload | exact | semantic | special
    threshold: float = SEMANTIC_MATCH_THRESHOLD
    special: str | None = None  # this | previous | context:N


@dataclass
class EdgeLink:
    src: NodeLink
    edge_type: str
    dst: NodeLink


def parse(expr: str) -> NodeLink | EdgeLink:
    """Parse one link_to expression.  Raises ValueError on malformed input
    (the reference rejects with a 422; we raise)."""
    expr = expr.strip()
    if not expr:
        raise ValueError("empty link_to expression")

    m = _SPECIAL.match(expr)
    if m:
        return NodeLink(label="Memory", match="special", special=m.group(1))

    m = _VIA.match(expr)
    if m:
        base = parse(m.group("base"))
        tgt = parse(m.group("tgt"))
        if not isinstance(base, NodeLink) or not isinstance(tgt, NodeLink):
            raise ValueError(f"via() endpoints must be node specs: {expr}")
        return EdgeLink(src=base, edge_type=m.group("edge"), dst=tgt)

    m = _EDGE_FORM.match(expr)
    if m:
        src = parse(m.group("src"))
        tgt = parse(m.group("tgt"))
        if not isinstance(src, NodeLink) or not isinstance(tgt, NodeLink):
            raise ValueError(f"edge endpoints must be node specs: {expr}")
        return EdgeLink(src=src, edge_type=m.group("edge"), dst=tgt)

    m = _NODE_FORM.match(expr)
    if m:
        evalue, svalue = m.group("evalue"), m.group("svalue")
        threshold = float(m.group("threshold") or SEMANTIC_MATCH_THRESHOLD)
        if evalue is not None:
            match, value = "exact", evalue
        elif svalue is not None:
            match, value = "semantic", svalue
        else:
            match, value = "payload", None
        return NodeLink(
            label=m.group("label"), prop=m.group("prop"),
            value=value.strip() if value else None, match=match, threshold=threshold,
        )

    raise ValueError(f"malformed link_to expression: {expr!r}")


def compile_lookup(spec: NodeLink, nodes: DataFrame,
                   prop_col: str = "prop_name",
                   payload_value: str | None = None) -> DataFrame:
    """Compile a NodeLink into its lookup DataFrame (deterministic LIMIT 1,
    G3/G4 shape).  `payload_value` supplies the value for match='payload'.
    Semantic matches degrade to case-insensitive containment here; a caller with
    an embedding column composes the V7 threshold join instead."""
    if spec.match == "special":
        # $this/$previous/$context:N resolve against the CALLER'S memory
        # context, not the node table — compiling them here would link an
        # arbitrary node (round-5 review finding; the reference rejects
        # unresolvable links with a 422)
        raise ValueError(
            f"special reference ${spec.special} must be resolved by the "
            "caller against its memory context, not compiled as a lookup"
        )
    out = nodes.filter(F.col("label") == spec.label)
    value = spec.value if spec.value is not None else payload_value
    if spec.prop and value is None:
        # a property lookup with no value (missing payload) must not degrade
        # to "first node of the label" — that silently links the wrong
        # entity; empty result = unresolvable, caller decides (422 analog)
        return out.limit(0)
    if spec.match in ("payload", "exact") and spec.prop and value is not None:
        out = out.filter(F.col(prop_col) == F.lit(value))
    elif spec.match == "semantic" and spec.prop and value is not None:
        out = out.filter(F.lower(F.col(prop_col)).contains(str(value).lower()))
    return out.orderBy("node_id").limit(1)
