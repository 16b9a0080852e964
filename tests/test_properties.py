"""Property-based tests (hypothesis): the invariants that must hold for ANY
input, not just fixtures — predicate algebra, id algebra, embedder, minhash."""

import re
import zlib

from hypothesis import given, settings, strategies as st
from pyspark.sql import functions as F  # noqa: F401 (property tests on Columns)

from memory_opensource_spark.api import hash_embed_py
from memory_opensource_spark.functions.ids import point_id_py

ids_st = st.text(alphabet="abcdef0123456789m_", min_size=1, max_size=24)
texts_st = st.text(
    alphabet=st.sampled_from("abc xyz "), min_size=0, max_size=80
)


@given(ids_st, st.integers(min_value=0, max_value=99))
@settings(max_examples=200, deadline=None)
def test_chunk_suffix_roundtrip(base, n):
    """strip_chunk_suffix('{base}_{n}') == base whenever base itself doesn't end
    in _digits (the reference's id contract: memory ids are hex, chunk suffix is
    appended exactly once)."""
    if re.search(r"_[0-9]+$", base):
        return  # outside the contract
    chunk_id = f"{base}_{n}"
    assert re.sub(r"_[0-9]+$", "", chunk_id) == base


@given(ids_st)
@settings(max_examples=100, deadline=None)
def test_point_id_is_valid_uuid_and_deterministic(chunk_id):
    import uuid

    a, b = point_id_py(chunk_id), point_id_py(chunk_id)
    assert a == b
    uuid.UUID(a)  # parses


@given(texts_st)
@settings(max_examples=100, deadline=None)
def test_hash_embed_unit_norm_or_zero(text):
    vec = hash_embed_py(text, dim=16)
    norm2 = sum(x * x for x in vec)
    toks = [t for t in text.lower().split(" ") if t]
    if toks:
        assert abs(norm2 - 1.0) < 1e-9
    else:
        assert norm2 == 0.0


@given(texts_st, texts_st)
@settings(max_examples=100, deadline=None)
def test_hash_embed_token_order_insensitive_up_to_counts(a, b):
    """Same multiset of tokens -> identical embedding (bag-of-words contract)."""
    ta = sorted(t for t in a.lower().split(" ") if t)
    tb = sorted(t for t in b.lower().split(" ") if t)
    va, vb = hash_embed_py(a, 16), hash_embed_py(b, 16)
    if ta == tb:
        assert va == vb


def _minhash_py(tokens: list[str], num_hashes: int = 8) -> list[str]:
    """Reference implementation of the minhash contract for the property test."""
    import hashlib

    n = 3
    if not tokens:
        return []
    if len(tokens) < n:
        shingles = {" ".join(tokens)}
    else:
        shingles = {" ".join(tokens[i:i + n]) for i in range(len(tokens) - n + 1)}
    return [
        min(hashlib.md5(f"{i}:{s}".encode()).hexdigest() for s in shingles)
        for i in range(num_hashes)
    ]


@given(st.lists(st.sampled_from(["aa", "bb", "cc", "dd"]), min_size=1, max_size=30))
@settings(max_examples=100, deadline=None)
def test_minhash_is_shingle_set_min(tokens):
    """sig[i] is the min over the shingle SET — order-insensitive and immune to
    duplicate shingles (the reason dedup.minhash_signatures can skip distinct)."""
    import hashlib

    n = 3
    if len(tokens) < n:
        shingles = [" ".join(tokens)]
    else:
        shingles = [" ".join(tokens[i:i + n]) for i in range(len(tokens) - n + 1)]
    sig = _minhash_py(tokens)
    for i, s_i in enumerate(sig):
        hashes = [hashlib.md5(f"{i}:{s}".encode()).hexdigest() for s in shingles]
        assert s_i == min(hashes)
        # duplicating or reordering shingles can't change a min
        assert s_i == min(hashes + list(reversed(hashes)))


@given(st.lists(st.sampled_from(["aa", "bb", "cc"]), min_size=3, max_size=30))
@settings(max_examples=50, deadline=None)
def test_minhash_band_collision_for_equal_docs(tokens):
    """Identical shingle sets -> identical bands (LSH recall=1 for exact dups)."""
    import hashlib

    sig1, sig2 = _minhash_py(tokens), _minhash_py(list(tokens))
    bands1 = [hashlib.md5(",".join(sig1[b * 2:(b + 1) * 2]).encode()).hexdigest()
              for b in range(4)]
    bands2 = [hashlib.md5(",".join(sig2[b * 2:(b + 1) * 2]).encode()).hexdigest()
              for b in range(4)]
    assert bands1 == bands2


@given(st.lists(st.floats(min_value=-10.0, max_value=10.0, allow_nan=False),
                min_size=1, max_size=8))
@settings(max_examples=200, deadline=None)
def test_int8_quantize_bounds(vs):
    # python twin of vector.quantize_int8 per-vector max-abs scaling
    scale = 127.0 / max(max(abs(v) for v in vs), 1e-8)
    qs = [min(max(round(v * scale), -128), 127) for v in vs]
    assert all(-128 <= q <= 127 for q in qs)
    if max(abs(v) for v in vs) >= 1e-8:  # below the floor, scale caps instead
        assert max(abs(q) for q in qs) == 127  # max element saturates exactly


# ---------------------------------------------------------------------------------
# Predicate compiler vs a row-wise Python reference model (F1 + F3/F4).
# One Spark evaluation per hypothesis example (a batch of random rows), so the
# search space is explored without paying a job per row.
# ---------------------------------------------------------------------------------

principal_st = st.sampled_from(["u1", "u2", "u3", "w1", "w2", "r1", "o1", "o2", "n1", "n2"])
arr_st = st.one_of(st.none(), st.lists(principal_st, max_size=3))
opt_st = st.one_of(st.none(), st.sampled_from(["o1", "o2", "n1", "n2"]))

acl_row_st = st.fixed_dictionaries({
    "user_id": st.one_of(st.none(), principal_st),
    "user_read_access": arr_st,
    "workspace_read_access": arr_st,
    "role_read_access": arr_st,
    "organization_read_access": arr_st,
    "namespace_read_access": arr_st,
    "organization_id": opt_st,
    "namespace_id": opt_st,
})

ctx_st = st.builds(
    lambda ws, roles, org, ns, so: dict(
        user_id="u1", workspace_ids=ws, role_ids=roles, organization_id=org,
        namespace_id=ns, scope_organization=so),
    st.lists(st.sampled_from(["w1", "w2"]), max_size=2),
    st.lists(st.sampled_from(["r1"]), max_size=1),
    st.one_of(st.none(), st.sampled_from(["o1", "o2"])),
    st.one_of(st.none(), st.sampled_from(["n1", "n2"])),
    st.booleans(),
)


def _acl_match_py(row, ctx):
    """Row-wise reference model of memory_graph.py:5810-5904 (SURVEY §1.4)."""
    def inarr(arr, v):
        return v is not None and arr is not None and v in arr

    ors = (row["user_id"] == ctx["user_id"]) or inarr(row["user_read_access"], ctx["user_id"])
    if ctx["workspace_ids"]:
        ors = ors or bool(set(ctx["workspace_ids"]) & set(row["workspace_read_access"] or []))
    if ctx["role_ids"]:
        ors = ors or bool(set(ctx["role_ids"]) & set(row["role_read_access"] or []))
    if ctx["organization_id"]:
        ors = ors or inarr(row["organization_read_access"], ctx["organization_id"])
    if ctx["namespace_id"]:
        ors = ors or inarr(row["namespace_read_access"], ctx["namespace_id"])
    ok = bool(ors)
    # STRICT namespace MUST whenever the ctx carries a namespace
    # (memory_graph.py:5861-5871): NULL-namespace rows excluded, no flag
    if ctx["namespace_id"]:
        ok = ok and row["namespace_id"] == ctx["namespace_id"]
    if ctx["scope_organization"] and ctx["organization_id"]:
        ok = ok and (row["organization_id"] is None
                     or row["organization_id"] == ctx["organization_id"])
    return ok


@given(st.lists(acl_row_st, min_size=1, max_size=25), ctx_st)
@settings(max_examples=12, deadline=None)
def test_acl_predicate_matches_python_model(spark, rows, ctx_kw):
    from pyspark.sql import types as T

    from memory_opensource_spark.operators.predicate import AclContext, acl_predicate

    arr = T.ArrayType(T.StringType())
    schema = T.StructType([
        T.StructField("user_id", T.StringType()),
        T.StructField("user_read_access", arr),
        T.StructField("workspace_read_access", arr),
        T.StructField("role_read_access", arr),
        T.StructField("organization_read_access", arr),
        T.StructField("namespace_read_access", arr),
        T.StructField("organization_id", T.StringType()),
        T.StructField("namespace_id", T.StringType()),
    ])
    schema = schema.add(T.StructField("_row", T.LongType()))
    df = spark.createDataFrame(
        [tuple(r[f.name] for f in schema.fields[:-1]) + (i,)
         for i, r in enumerate(rows)], schema)
    got = {r._row for r in df.filter(acl_predicate(AclContext(**ctx_kw))).collect()}
    want = {i for i, r in enumerate(rows) if _acl_match_py(r, ctx_kw)}
    assert got == want


cm_value_st = st.one_of(
    st.booleans(),
    st.integers(min_value=-5, max_value=5),
    st.sampled_from(["red", "blue", "7", "true"]),
    st.lists(st.sampled_from(["red", "blue", "7"]), min_size=1, max_size=2),
    st.fixed_dictionaries({"gte": st.integers(-3, 3), "lte": st.integers(-3, 3)}),
)
cm_map_st = st.dictionaries(
    st.sampled_from(["color", "size", "flag"]),
    st.sampled_from(["red", "blue", "7", "-2", "true", "false", "red,blue"]),
    max_size=3,
)


def _cm_match_py(m, key, value):
    """Row-wise reference of value_matches (memory_graph.py:6855-6897 + 5990-6020)."""
    v = m.get(key)
    if v is None:
        return False
    if isinstance(value, bool):
        return v == str(value).lower()
    if isinstance(value, (int, float)):
        try:
            return float(v) >= float(value)
        except ValueError:
            return False
    if isinstance(value, list):
        return any(v == str(i) for i in value)
    if isinstance(value, dict):
        try:
            n = float(v)
        except ValueError:
            return False
        ok = True
        if "gte" in value:
            ok = ok and n >= value["gte"]
        if "lte" in value:
            ok = ok and n <= value["lte"]
        return ok
    return v == str(value) or str(value) in [s.strip() for s in v.split(",")]


@given(st.lists(cm_map_st, min_size=1, max_size=20),
       st.sampled_from(["color", "size", "flag"]), cm_value_st)
@settings(max_examples=12, deadline=None)
def test_custom_metadata_algebra_matches_python_model(spark, maps, key, value):
    from pyspark.sql import types as T

    from memory_opensource_spark.operators.predicate import _custom_metadata_cond

    schema = T.StructType([
        T.StructField("custom_metadata", T.MapType(T.StringType(), T.StringType())),
        T.StructField("_row", T.LongType()),
    ])
    df = spark.createDataFrame([(m, i) for i, m in enumerate(maps)], schema)
    got = {r._row for r in df.filter(_custom_metadata_cond(key, value)).collect()}
    want = {i for i, m in enumerate(maps) if _cm_match_py(m, key, value)}
    assert got == want


# ---------------------------------------------------------------------------------
# Sessionization (ST2 — the operator behind the 3-round-red driver row) vs a
# pure-Python gaps-and-islands twin, over random event streams with ties,
# exact-gap boundaries, and multiple keys.
# ---------------------------------------------------------------------------------

events_st = st.lists(
    st.tuples(st.sampled_from(["a", "b"]),                    # user key
              st.integers(min_value=0, max_value=8000),       # epoch seconds
              st.integers(min_value=0, max_value=999)),       # tiebreak id
    min_size=1, max_size=40, unique_by=lambda t: (t[0], t[1], t[2]),
)


def _sessions_py(rows, gap):
    """Reference model: per key ordered by ts (Spark's lag uses ts-only order;
    for equal timestamps the gap is 0 <= gap, so ties NEVER split a session —
    tie order cannot change the outcome)."""
    out = {}
    by_key = {}
    for k, ts, i in rows:
        by_key.setdefault(k, []).append((ts, i))
    for k, evs in by_key.items():
        evs.sort()
        sid, prev = 0, None
        for ts, i in evs:
            if prev is None or ts - prev > gap:
                sid += 1
            out[(k, ts, i)] = sid
            prev = ts
    return out


@given(events_st, st.sampled_from([1, 5, 1800]))
@settings(max_examples=10, deadline=None)
def test_session_ids_matches_python_model(spark, rows, gap):
    from memory_opensource_spark.operators import windows

    df = spark.createDataFrame(
        [(k, ts, i) for k, ts, i in rows], "k string, epoch long, i int"
    ).withColumn("ts", F.timestamp_seconds(F.col("epoch")))
    got = {(r.k, r.epoch, r.i): r.session_id
           for r in windows.session_ids(df, "k", "ts", gap).collect()}
    want = _sessions_py(rows, gap)
    assert got == want
    # invariants: ids start at 1 and are contiguous per key
    for k in {r[0] for r in rows}:
        ids = sorted({v for (kk, _, _), v in got.items() if kk == k})
        assert ids == list(range(1, len(ids) + 1))


@given(st.lists(st.integers(min_value=0, max_value=120), min_size=1, max_size=8),
       st.sampled_from([4, 16, 2048]))
@settings(max_examples=10, deadline=None)
def test_chunk_text_partitions_tokens_exactly(spark, sizes, chunk_tokens):
    """V1 chunker invariants for ANY document: rejoining the chunks in
    chunk_index order reproduces the token stream exactly (no token lost,
    duplicated, or reordered); every chunk except the last holds exactly
    ``chunk_tokens`` tokens; chunk count = ceil(n/chunk_tokens) (min 1);
    total_chunks is consistent on every row."""
    import math

    from memory_opensource_spark.plans import ingest

    docs = [(f"m{j}", " ".join(f"t{j}_{i}" for i in range(n))) for j, n in enumerate(sizes)]
    df = spark.createDataFrame(docs, "memory_id string, content string")
    rows = ingest.chunk_text(df, chunk_tokens=chunk_tokens).collect()
    by_doc = {}
    for r in rows:
        by_doc.setdefault(r.memory_id, []).append(r)
    for (mid, content), n in zip(docs, sizes):
        chunks = sorted(by_doc[mid], key=lambda r: r.chunk_index)
        want_count = max(1, math.ceil(n / chunk_tokens))
        assert len(chunks) == want_count
        assert [c.chunk_index for c in chunks] == list(range(want_count))
        assert all(c.total_chunks == want_count for c in chunks)
        toks = [t for c in chunks for t in c.chunk_content.split() if t]
        assert toks == [t for t in content.split() if t]
        for c in chunks[:-1]:
            assert len(c.chunk_content.split()) == chunk_tokens
        assert [c.chunk_id for c in chunks] == [f"{mid}_{i}" for i in range(want_count)]


@given(st.lists(st.tuples(st.integers(min_value=0, max_value=30 * 86400),
                          st.floats(min_value=0.25, max_value=4.0,
                                    allow_nan=False, allow_infinity=False)),
                min_size=1, max_size=15))
@settings(max_examples=10, deadline=None)
def test_decayed_hit_sum_equals_sequential_ema_replay(spark, events):
    """R9 replay-safety invariant (the 100-TB idempotence claim): the batch
    form sum_i w_i * 0.5^((ref-t_i)/hl) must equal the ONLINE EMA fold
    prev*decay + w applied event-by-event in arrival order — for ANY event
    times (including duplicates and out-of-order arrivals, which is the
    point: replays and shuffles cannot change the answer)."""
    from memory_opensource_spark.functions.decay import decayed_hit_sum
    from memory_opensource_spark.semantics import EMA_HALF_LIFE_DAYS

    ref = 31 * 86400
    df = spark.createDataFrame(
        [(t, w) for t, w in events], "t long, w double"
    ).select(F.timestamp_seconds("t").alias("ts"), "w",
             F.timestamp_seconds(F.lit(ref)).alias("ref"))
    batch = df.agg(F.sum(decayed_hit_sum(F.col("ts"), F.col("ref"),
                                         F.col("w"))).alias("s")).first().s
    # the online fold visits events in TIME order (the reference replays from
    # storage order); the batch form is order-free by construction — agreeing
    # with the sorted fold proves replays/shuffles cannot change the answer
    ema2, prev2 = 0.0, None
    for t, w in sorted(events):
        if prev2 is not None:
            ema2 *= 0.5 ** ((t - prev2) / 86400.0 / EMA_HALF_LIFE_DAYS)
        ema2 += w
        prev2 = t
    sorted_online = ema2 * 0.5 ** ((ref - prev2) / 86400.0 / EMA_HALF_LIFE_DAYS)
    assert abs(batch - sorted_online) < 1e-6 * max(1.0, abs(batch))


merge_sources_st = st.dictionaries(
    st.sampled_from(["vec", "neo", "kw"]),
    st.lists(st.tuples(st.integers(min_value=0, max_value=30),
                       st.one_of(st.none(),
                                 st.floats(min_value=0.0, max_value=1.0,
                                           allow_nan=False, width=32))),
             min_size=0, max_size=12),
    min_size=1, max_size=3,
)


def _stratified_py(sources, top_k, quota_floor, neo_default):
    """Reference model of R2 (memory_graph.py:6567-6727): per-source quota ->
    EVEN adaptive fill across sources-with-leftovers (remaining//n + extras
    to the first sources in order, per-source take capped by availability,
    surplus not redistributed — :6630-6645) -> best-score dedup."""
    quota = max(top_k // max(len(sources), 1), quota_floor)
    ranked = {}
    for name in sorted(sources):
        # STRING ids: Spark's tie-break orders "id10" < "id2" lexicographically
        rows = [(f"id{i}", neo_default if s is None else s) for i, s in sources[name]]
        rows.sort(key=lambda t: (-t[1], t[0]))
        ranked[name] = [(i, s, name, r + 1) for r, (i, s) in enumerate(rows)]
    within = [t for name in sorted(ranked) for t in ranked[name] if t[3] <= quota]
    lo_by_src = {name: [t for t in ranked[name] if t[3] > quota]
                 for name in sorted(ranked) if any(t[3] > quota for t in ranked[name])}
    remaining = max(top_k - len(within), 0)
    merged = list(within)
    if lo_by_src and remaining:
        n = len(lo_by_src)
        per, extra = divmod(remaining, n)
        for i, name in enumerate(sorted(lo_by_src)):
            take = per + (1 if i < extra else 0)
            merged.extend(lo_by_src[name][:take])
    best = {}
    for i, s, name, _ in merged:
        cur = best.get(i)
        if cur is None or s > cur[0] or (s == cur[0] and name < cur[1]):
            best[i] = (s, name)
    return {(i, round(s, 6), name) for i, (s, name) in best.items()}


@given(merge_sources_st, st.sampled_from([3, 8, 20]))
@settings(max_examples=10, deadline=None)
def test_stratified_merge_matches_python_model(spark, sources, top_k):
    """R2 quotas, NULL->0.7 default, deterministic adaptive fill, and
    best-score dedup — vs a pure-Python reference model, for ANY mix of
    sources, duplicate ids across sources, and NULL scores."""
    from memory_opensource_spark.operators.ranking import stratified_merge
    from memory_opensource_spark.semantics import (NEO_DEFAULT_SCORE,
                                                   STRATIFIED_QUOTA_FLOOR)

    dfs = {}
    for name, rows in sources.items():
        dfs[name] = spark.createDataFrame(
            [(f"id{i}", None if s is None else float(np_round6(s))) for i, s in rows]
            or [("__none__", 0.0)], "id string, score double")
        if not rows:
            dfs[name] = dfs[name].limit(0)
    got = {(r.id, round(r.score, 6), r.source)
           for r in stratified_merge(dfs, top_k).collect()}
    want = {(i, round(s, 6), n)
            for i, s, n in _stratified_py(
                {k: [(i, None if s is None else np_round6(s)) for i, s in v]
                 for k, v in sources.items()},
                top_k, STRATIFIED_QUOTA_FLOOR, NEO_DEFAULT_SCORE)}
    assert got == want


def np_round6(x):
    import numpy as np

    return float(np.float64(x))


# ---- OMO portability roundtrip (sources/omo.py; models/omo.py:129-268) ----

_omo_text = st.text(
    alphabet=st.characters(blacklist_categories=("Cs",)),  # no lone surrogates
    min_size=1, max_size=40)
_omo_enum_or_junk = st.one_of(
    st.sampled_from(["explicit", "implicit", "terms", "none", "EXPLICIT",
                     "bogus", None]),
    _omo_text)
_omo_row_st = st.fixed_dictionaries({
    "memory_id": st.uuids().map(str),
    "content": _omo_text,
    "type": st.sampled_from(["text", "code", "image", "TEXT", "weird", None]),
    "consent": _omo_enum_or_junk,
    "risk": st.sampled_from(["none", "sensitive", "flagged", "junk", None]),
    "topics": st.one_of(st.none(), st.lists(_omo_text, max_size=3)),
    "user_id": st.one_of(st.none(), _omo_text),
    "user_read_access": st.one_of(st.none(), st.lists(_omo_text, max_size=3)),
    "namespace_id": st.one_of(st.none(), _omo_text),
    "hours": st.integers(min_value=0, max_value=10_000),
})


@given(st.lists(_omo_row_st, min_size=1, max_size=8,
                unique_by=lambda r: r["memory_id"]))
@settings(max_examples=10, deadline=None)
def test_omo_export_parse_roundtrip_preserves_fields(spark, rows):
    """export_omo -> parse_omo is lossless for every OMO v1 field under
    arbitrary unicode content and enum junk: enums normalize exactly as
    models/omo.py:170-187 (lowercase passthrough, else type->text,
    consent->implicit, risk->none), topics coalesce to [], ACL and tenancy
    ride the ext namespace, createdAt survives at second precision."""
    from datetime import datetime, timedelta

    from pyspark.sql import types as T

    from memory_opensource_spark.sources import omo

    arr = T.ArrayType(T.StringType())
    schema = T.StructType([
        T.StructField("memory_id", T.StringType()),
        T.StructField("content", T.StringType()),
        T.StructField("type", T.StringType()),
        T.StructField("consent", T.StringType()),
        T.StructField("risk", T.StringType()),
        T.StructField("topics", arr),
        T.StructField("user_id", T.StringType()),
        T.StructField("user_read_access", arr),
        T.StructField("namespace_id", T.StringType()),
        T.StructField("created_at", T.TimestampType()),
    ])
    base = datetime(2024, 1, 1)
    data = [(r["memory_id"], r["content"], r["type"], r["consent"], r["risk"],
             r["topics"], r["user_id"], r["user_read_access"],
             r["namespace_id"], base + timedelta(hours=r["hours"]))
            for r in rows]
    df = spark.createDataFrame(data, schema)
    back = {r.memory_id: r for r in
            omo.parse_omo(omo.export_omo(df), strict=True).collect()}

    def norm(v, allowed, default):
        return v.lower() if v and v.lower() in allowed else default

    assert len(back) == len(rows)
    for r in rows:
        b = back[r["memory_id"]]
        assert b.content == r["content"]
        assert b.type == norm(r["type"], omo.OMO_TYPES, "text")
        assert b.consent == norm(r["consent"], omo.OMO_CONSENT, "implicit")
        assert b.risk == norm(r["risk"], omo.OMO_RISK, "none")
        assert list(b.topics) == (r["topics"] or [])
        assert b.user_id == r["user_id"]
        assert list(b.user_read_access or []) == (r["user_read_access"] or [])
        assert list(b.acl_read) == (r["user_read_access"] or [])
        assert b.namespace_id == r["namespace_id"]
        assert b.created_at == base + timedelta(hours=r["hours"])


# ---------------------------------------------------------------------------------
# Rolling-hash span ops vs a brute-force Python reference (r8: the rolling
# polynomial hash replaced string spans — equal windows MUST collide, shifted
# ones must not, and the dup algebra must match exact counting).  A tiny
# alphabet forces heavy genuine span collisions; one Spark evaluation per
# example (a whole corpus of random docs).
# ---------------------------------------------------------------------------------

_doc_st = st.lists(st.sampled_from(list("abc")), min_size=0, max_size=12)


@settings(max_examples=12, deadline=None)
@given(st.lists(_doc_st, min_size=1, max_size=8),
       st.integers(min_value=2, max_value=4))
def test_span_dup_fraction_matches_bruteforce(spark, docs_tokens, k):
    from collections import Counter

    from memory_opensource_spark.operators import dedup

    rows = [(i, " ".join(toks)) for i, toks in enumerate(docs_tokens)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {r.id: (r.n_spans, r.dup_spans)
           for r in dedup.span_dup_fraction(df, k=k).collect()}

    spans = Counter()
    per_doc = {}
    for i, toks in enumerate(docs_tokens):
        grams = [tuple(toks[j:j + k]) for j in range(len(toks) - k + 1)]
        per_doc[i] = grams
        spans.update(grams)
    want = {i: (len(g), sum(1 for s in g if spans[s] > 1))
            for i, g in per_doc.items() if g}
    assert got == want


@settings(max_examples=10, deadline=None)
@given(st.lists(_doc_st, min_size=1, max_size=6),
       st.integers(min_value=2, max_value=3))
def test_remove_duplicate_spans_matches_bruteforce(spark, docs_tokens, k):
    from memory_opensource_spark.operators import dedup

    rows = [(i, " ".join(toks)) for i, toks in enumerate(docs_tokens)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {r.id: (r.n_tokens, r.removed_tokens, r.text_dedup)
          for r in dedup.remove_duplicate_spans(df, k=k).collect()}

    first = {}
    for i, toks in enumerate(docs_tokens):
        for j in range(len(toks) - k + 1):
            first.setdefault(tuple(toks[j:j + k]), (i, j))
    want = {}
    for i, toks in enumerate(docs_tokens):
        cut = set()
        for j in range(len(toks) - k + 1):
            if first[tuple(toks[j:j + k])] != (i, j):
                cut.update(range(j, j + k))
        kept = [t for p, t in enumerate(toks) if p not in cut]
        want[i] = (len(toks), len(toks) - len(kept), " ".join(kept))
    assert got == want


# ---------------------------------------------------------------------------------
# Distributed-rank machinery vs single-window twins (r8): quality_buckets'
# composite (score, id) boundaries and cap_rows_per_group's per-group
# range-bucket ranks must be EXACT under random ties, NULLs and quotas.
# ---------------------------------------------------------------------------------

@settings(max_examples=10, deadline=None)
@given(st.lists(st.one_of(st.none(), st.sampled_from([0.1, 0.2, 0.5])),
                min_size=1, max_size=40),
       st.integers(min_value=2, max_value=5))
def test_quality_buckets_matches_ntile_under_random_ties(spark, scores, n):
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    from memory_opensource_spark.functions import lm

    rows = [(i, 10, s) for i, s in enumerate(scores)]
    df = spark.createDataFrame(rows, "id int, n_bigrams int, avg_nll double")
    got = {r.id: r.bucket
           for r in lm.quality_buckets(df, n, rows_per_bucket=5).collect()}
    w = Window.orderBy(F.col("avg_nll").asc(), F.col("id").asc())
    want = {r.id: r.b
            for r in df.withColumn("b", F.ntile(n).over(w)).collect()}
    assert got == want


@settings(max_examples=10, deadline=None)
@given(st.lists(
           st.tuples(st.sampled_from(["a", "b", None]),
                     st.one_of(st.none(), st.integers(0, 3))),
           min_size=1, max_size=30),
       st.integers(min_value=1, max_value=4))
def test_cap_rows_per_group_matches_window_under_random_ties(
        spark, rows, cap):
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    from memory_opensource_spark.operators.sampling import cap_rows_per_group

    data = [(i, g, None if o is None else float(o))
            for i, (g, o) in enumerate(rows)]
    df = spark.createDataFrame(data, "doc_id long, g string, ord double")
    got = sorted((r.doc_id, r.g)
                 for r in cap_rows_per_group(df, "g", cap, "ord",
                                             range_buckets=3).collect())
    w = (Window.partitionBy("g")
         .orderBy(F.col("ord").asc(), F.col("doc_id").asc()))
    want = sorted((r.doc_id, r.g)
                  for r in df.withColumn("_rn", F.row_number().over(w))
                  .filter(F.col("_rn") <= cap).collect())
    assert got == want
