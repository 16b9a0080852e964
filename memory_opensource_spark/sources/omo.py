"""Open Memory Object (OMO) v1 export/import — the reference's memory
portability surface (routers/v1/omo_routes.py:86-340, models/omo.py:72-271)
as a distributed source/sink.

The reference converts memories one-by-one in the route handler (a Python
loop over ``memory_ids``); here export is a single DataFrame projection
(struct assembly + ``to_json``) and import is a schema-applied JSON scan —
both scale with the cluster, and a ``.omo.json`` file is just a JSON-lines
sink/source.

OMO v1 shape (models/omo.py:72-105, schema omo-v1.schema.json):

    {id, createdAt (ISO), type, content, consent, risk, topics, sourceUrl,
     acl: {read, write}, ext: {"papr:metadata": {...vendor fields...}}}

- required: id, createdAt, type, content, consent
- enums: type in {text,image,audio,video,file,code}; consent in
  {explicit,implicit,terms,none}; risk in {none,sensitive,flagged}
- everything vendor-specific rides the ``ext`` namespace
  (``papr:metadata`` carries user/workspace/org/namespace + ACL arrays,
  models/omo.py:236-258).

Deliberate deviations from the reference (round-7 citation audit):

1. The reference's ``to_omo`` shadows its ``acl`` parameter
   (``acl = None; if acl:`` — models/omo.py:161-166), so exported objects
   NEVER carry the OMO-standard ``acl`` block regardless of input.  We emit
   ``acl.read`` from ``user_read_access`` — mirroring the shadowing bug
   would make every export non-portable on the field the standard exists
   for.
2. The reference's export metadata list (models/omo.py:336-343) carries
   user/workspace read-write access but silently DROPS
   role/organization/namespace read access, losing them on round-trip; we
   carry the full vendor ACL in ``ext['papr:metadata']`` (the namespace is
   vendor-extensible by design) so an export->import through this engine is
   ACL-lossless.
3. On import we merge ``acl.read`` into ``user_read_access`` (sorted-set
   semantics) so third-party OMO files — which only have the standard
   ``acl`` block — land with working ACLs; the reference's ``from_omo``
   keeps ``acl`` in a metadata dict its request model ignores.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

OMO_TYPES = ["text", "image", "audio", "video", "file", "code"]
OMO_CONSENT = ["explicit", "implicit", "terms", "none"]
OMO_RISK = ["none", "sensitive", "flagged"]

#: the JSON schema of one OMO object, used for the import scan (explicit
#: schema — never inference) and for from_json on in-memory strings
OMO_SCHEMA = T.StructType([
    T.StructField("id", T.StringType()),
    T.StructField("createdAt", T.StringType()),
    T.StructField("type", T.StringType()),
    T.StructField("content", T.StringType()),
    T.StructField("consent", T.StringType()),
    T.StructField("risk", T.StringType()),
    T.StructField("topics", T.ArrayType(T.StringType())),
    T.StructField("sourceUrl", T.StringType()),
    T.StructField("acl", T.StructType([
        T.StructField("read", T.ArrayType(T.StringType())),
        T.StructField("write", T.ArrayType(T.StringType())),
    ])),
    T.StructField("ext", T.StructType([
        T.StructField("papr:metadata", T.StructType([
            T.StructField("user_id", T.StringType()),
            T.StructField("workspace_id", T.StringType()),
            T.StructField("organization_id", T.StringType()),
            T.StructField("namespace_id", T.StringType()),
            T.StructField("user_read_access", T.ArrayType(T.StringType())),
            T.StructField("workspace_read_access", T.ArrayType(T.StringType())),
            T.StructField("role_read_access", T.ArrayType(T.StringType())),
            T.StructField("organization_read_access", T.ArrayType(T.StringType())),
            T.StructField("namespace_read_access", T.ArrayType(T.StringType())),
        ])),
    ])),
])


def _norm_enum(col, allowed: list[str], default: str):
    """Reference to_omo mapping (models/omo.py:170-187): lowercase, known
    values pass through, anything else degrades to the default."""
    low = F.lower(col)
    return F.when(low.isin(*allowed), low).otherwise(F.lit(default))


def export_omo(memories: DataFrame, memory_ids: list[str] | None = None,
               type_col: str | None = "type") -> DataFrame:
    """Memories -> one OMO v1 JSON string per row: {memory_id, omo_json}.

    Field mapping mirrors to_omo (models/omo.py:129-200): enum values
    normalize with the reference defaults (type->text, consent->implicit,
    risk->none), ``createdAt`` renders ISO-8601, user ACL arrays map to
    ``acl.read`` (the OMO-standard part) while the full vendor ACL +
    tenancy ids ride ``ext['papr:metadata']``.  The whole export is one
    projection — write with ``df.write.json(path)`` for a ``.omo.json``
    lines file at any scale."""
    m = memories
    if memory_ids is not None:
        m = m.filter(F.col("memory_id").isin(memory_ids))
    has = set(m.columns)

    def opt(name, dtype="string"):
        return F.col(name) if name in has else F.lit(None).cast(dtype)

    mtype = (_norm_enum(F.col(type_col), OMO_TYPES, "text")
             if type_col and type_col in has else F.lit("text"))
    papr_meta = F.struct(
        opt("user_id").alias("user_id"),
        opt("workspace_id").alias("workspace_id"),
        opt("organization_id").alias("organization_id"),
        opt("namespace_id").alias("namespace_id"),
        opt("user_read_access", "array<string>").alias("user_read_access"),
        opt("workspace_read_access", "array<string>").alias("workspace_read_access"),
        opt("role_read_access", "array<string>").alias("role_read_access"),
        opt("organization_read_access", "array<string>").alias("organization_read_access"),
        opt("namespace_read_access", "array<string>").alias("namespace_read_access"),
    )
    omo = F.struct(
        F.col("memory_id").alias("id"),
        F.date_format(F.col("created_at"), "yyyy-MM-dd'T'HH:mm:ss").alias("createdAt"),
        mtype.alias("type"),
        F.col("content").alias("content"),
        _norm_enum(opt("consent"), OMO_CONSENT, "implicit").alias("consent"),
        _norm_enum(opt("risk"), OMO_RISK, "none").alias("risk"),
        F.coalesce(opt("topics", "array<string>"), F.array()).alias("topics"),
        opt("source_url").alias("sourceUrl"),
        F.struct(
            F.coalesce(opt("user_read_access", "array<string>"), F.array()).alias("read"),
            F.array().cast("array<string>").alias("write"),
        ).alias("acl"),
        F.struct(papr_meta.alias("papr:metadata")).alias("ext"),
    )
    return m.select(F.col("memory_id"), F.to_json(omo).alias("omo_json"))


def parse_omo(omo_json: DataFrame, json_col: str = "omo_json",
              strict: bool = True) -> DataFrame:
    """OMO JSON strings -> typed rows (the from_omo direction,
    models/omo.py:203-268).  ``strict=True`` (the OMO model's
    ``extra='forbid'`` analog for VALUES) fails on rows whose required
    fields are missing or whose enums are invalid — a silently-defaulted
    consent level is a policy decision nobody made."""
    parsed = omo_json.withColumn("_omo", F.from_json(F.col(json_col), OMO_SCHEMA))
    meta = F.col("_omo.ext.`papr:metadata`")
    out = parsed.select(
        F.col("_omo.id").alias("memory_id"),
        F.to_timestamp("_omo.createdAt").alias("created_at"),
        F.col("_omo.type").alias("type"),
        F.col("_omo.content").alias("content"),
        F.col("_omo.consent").alias("consent"),
        F.coalesce(F.col("_omo.risk"), F.lit("none")).alias("risk"),
        F.coalesce(F.col("_omo.topics"), F.array()).alias("topics"),
        F.col("_omo.sourceUrl").alias("source_url"),
        F.coalesce(F.col("_omo.acl.read"), F.array()).alias("acl_read"),
        meta.getField("user_id").alias("user_id"),
        meta.getField("workspace_id").alias("workspace_id"),
        meta.getField("organization_id").alias("organization_id"),
        meta.getField("namespace_id").alias("namespace_id"),
        meta.getField("user_read_access").alias("user_read_access"),
        meta.getField("workspace_read_access").alias("workspace_read_access"),
        meta.getField("role_read_access").alias("role_read_access"),
        meta.getField("organization_read_access").alias("organization_read_access"),
        meta.getField("namespace_read_access").alias("namespace_read_access"),
    )
    if strict:
        # NULL-safe enum checks: isin() is NULL for a NULL value, and a NULL
        # filter condition silently drops the row from `bad` — a missing
        # required consent/type must FAIL strict, not slip through
        def invalid(name, allowed):
            return ~F.coalesce(F.col(name).isin(*allowed), F.lit(False))

        bad = out.filter(
            F.col("memory_id").isNull() | F.col("content").isNull()
            | F.col("created_at").isNull()
            | invalid("consent", OMO_CONSENT)
            | invalid("risk", OMO_RISK)
            | invalid("type", OMO_TYPES)
        )
        first = bad.select("memory_id", "consent", "risk", "type").take(1)
        if first:
            r = first[0]
            raise ValueError(
                f"invalid OMO object (id={r.memory_id!r}, consent={r.consent!r}, "
                f"risk={r.risk!r}, type={r.type!r}): required fields must be "
                "present and enums valid (omo-v1.schema.json)")
    return out


def read_omo(spark: SparkSession, path: str, strict: bool = True) -> DataFrame:
    """Read a ``.omo.json`` lines file into typed rows (explicit schema —
    no inference pass)."""
    raw = spark.read.text(path).withColumnRenamed("value", "omo_json")
    return parse_omo(raw, strict=strict)


def omo_items(parsed: DataFrame) -> list[dict]:
    """Typed OMO rows -> ``add_memory_batch`` item dicts (the import route's
    AddMemoryRequest shape, routers/v1/omo_routes.py:205+).  Driver-side by
    design: import batches are bounded by BATCH_MAX=1000 like every other
    add path."""
    items = []
    for r in parsed.collect():
        # OMO acl.read merges into the vendor read-access list (from_omo
        # keeps both; the engine's ACL model has one user read list)
        readers = sorted(set((r.user_read_access or []) + (r.acl_read or [])))
        items.append({
            "memory_id": r.memory_id,
            "content": r.content,
            "type": r.type,
            "topics": list(r.topics or []),
            "user_id": r.user_id,
            "user_read_access": readers,
            "workspace_read_access": list(r.workspace_read_access or []),
            "role_read_access": list(r.role_read_access or []),
            "organization_read_access": list(r.organization_read_access or []),
            "namespace_read_access": list(r.namespace_read_access or []),
            "organization_id": r.organization_id,
            "namespace_id": r.namespace_id,
        })
    return items
