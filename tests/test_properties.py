"""Property-based tests (hypothesis): the invariants that must hold for ANY
input, not just fixtures — predicate algebra, id algebra, embedder, minhash."""

import re
import zlib

from hypothesis import given, settings, strategies as st

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
