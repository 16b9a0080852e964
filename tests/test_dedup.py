"""Dedup family tests, incl. parity between the expression-form and the
explode-form MinHash (same signatures bit-for-bit)."""

import pytest
from pyspark.sql import functions as F

from memory_opensource_spark.functions import text as T
from memory_opensource_spark.operators import dedup


@pytest.fixture(scope="module")
def docs(spark):
    rows = [
        (1, "the quick brown fox jumps over the lazy dog"),
        (2, "the quick brown fox jumps over the lazy dog"),          # exact dup of 1
        (3, "the quick brown fox jumps over the lazy cat"),          # near dup
        (4, "dog lazy the over jumps fox brown quick the"),          # shuffled (same token set)
        (5, "completely different content about spark engines"),
    ]
    return spark.createDataFrame(rows, "doc_id int, text string")


def test_exact_duplicates(docs):
    out = dedup.exact_duplicates(docs).collect()
    assert len(out) == 1
    assert out[0].canonical_id == 1 and out[0].dup_count == 2


def test_fingerprint_catches_shuffled(docs):
    out = dedup.fingerprint_duplicates(docs).collect()
    # 1, 2, 4 share the same token set
    assert len(out) == 1 and out[0].dup_count == 3 and out[0].canonical_id == 1


def test_minhash_explode_matches_expression_form(spark, docs):
    fast = {r.id: r.sig for r in dedup.minhash_signatures(docs).collect()}
    slow = {
        r.doc_id: r.sig
        for r in docs.select("doc_id", T.minhash_signature(F.col("text")).alias("sig")).collect()
    }
    assert fast == {k: list(v) for k, v in slow.items()}


def test_minhash_lsh_finds_near_dups(docs):
    cands = dedup.minhash_lsh_candidates(docs).collect()
    pairs = {(r.left_id, r.right_id) for r in cands}
    assert (1, 2) in pairs  # exact dups always collide on every band
    refined = dedup.jaccard_pairs(docs, dedup.minhash_lsh_candidates(docs), threshold=0.5)
    got = {(r.left_id, r.right_id) for r in refined.collect()}
    assert (1, 2) in got and (1, 3) in got


def test_simhash_identical_docs_equal(docs):
    fp = {r.id: r.simhash for r in dedup.simhash_fingerprints(docs).collect()}
    assert fp[1] == fp[2]
    assert fp[1] != fp[5]
    dups = dedup.simhash_duplicates(docs).collect()
    assert any(r.canonical_id == 1 and r.dup_count >= 2 for r in dups)


def test_embedding_near_duplicates(spark):
    rows = [
        (1, [1.0, 0.0, 0.0]),
        (2, [0.999, 0.01, 0.0]),   # near dup of 1
        (3, [0.0, 1.0, 0.0]),
    ]
    df = spark.createDataFrame(rows, "vec_id int, embedding array<double>")
    out = dedup.embedding_near_duplicates(df, threshold=0.95).collect()
    assert {(r.left_id, r.right_id) for r in out} == {(1, 2)}


def test_ingest_dedup_reuse_threshold(spark):
    existing = spark.createDataFrame(
        [("e1", [1.0, 0.0]), ("e2", [0.0, 1.0])], "chunk_id string, embedding array<double>"
    )
    new = spark.createDataFrame(
        [("n1", [0.9999, 0.01]), ("n2", [0.7, 0.7])], "chunk_id string, embedding array<double>"
    )
    out = dedup.ingest_dedup_reuse(new, existing, 0.97).collect()
    # n1 reuses e1 (cosine > 0.97); n2 is genuinely new (cos ~= 0.707)
    assert len(out) == 1 and out[0].new_id == "n1" and out[0].reuse_id == "e1"


def test_simhash_hamming_banding(spark):
    from memory_opensource_spark.operators import dedup as dd

    docs = spark.createDataFrame([
        (1, "spark engine for big data processing at scale"),
        (2, "spark engine for big data processing at scale"),   # identical -> d=0
        (3, "completely different text about gardening tulips"),
    ], "doc_id bigint, text string")
    out = {(r.left_id, r.right_id): r.hamming
           for r in dd.simhash_hamming_duplicates(docs).collect()}
    assert out.get((1, 2)) == 0
    assert not any(3 in k for k in out)  # unrelated doc not within 3 bits
    with pytest.raises(ValueError, match="recall"):
        dd.simhash_hamming_duplicates(docs, n_bands=4, max_hamming=4)


def test_simhash_explode_matches_expression_form(spark, docs):
    fast = {r.id: r.simhash for r in dedup.simhash_fingerprints(docs).collect()}
    slow = {
        r.doc_id: r.fp
        for r in docs.select("doc_id", T.simhash(F.col("text")).alias("fp")).collect()
    }
    assert fast == slow


def test_minhash_xxhash64_fast_path_parity(spark):
    """hash_fn='xxhash64' (production: 2.4x faster signatures, 8-byte band
    keys) must agree with the md5 oracle path wherever LSH physics says they
    should: identical very-high-similarity pairs (with 4 bands x 4 rows the
    per-family capture probability is 1-(1-j^4)^4 — ~0.999 at j=0.95 but
    only ~0.67 at j=0.7, so the guarantee only binds near j=1), >=90%
    overlap overall (borderline pairs may differ between hash families —
    inherent to LSH, not a defect of either)."""
    from memory_opensource_spark.sources import tables

    docs = tables.load(spark, "/root/testdata/sf0.01", "documents")
    md5_pairs = {(r.left_id, r.right_id): r.jaccard
                 for r in dedup.minhash_near_duplicates(docs).collect()}
    xx_pairs = {(r.left_id, r.right_id): r.jaccard
                for r in dedup.minhash_near_duplicates(
                    docs, hash_fn="xxhash64").collect()}
    assert md5_pairs  # fixture contains planted near-dups
    strong = {p for p, j in md5_pairs.items() if j >= 0.95}
    assert strong <= set(xx_pairs)
    inter = len(set(md5_pairs) & set(xx_pairs))
    union = len(set(md5_pairs) | set(xx_pairs))
    assert inter / union >= 0.9
    # refined jaccard values are exact-set math: identical on shared pairs
    for p in set(md5_pairs) & set(xx_pairs):
        assert abs(md5_pairs[p] - xx_pairs[p]) < 1e-12


def test_minhash_band_table_xxhash64_is_long_typed(spark):
    """The xxhash64 band table carries LONG bucket keys (the 4x-smaller
    shuffle payload claim), md5 carries hex strings."""
    from memory_opensource_spark.sources import tables

    docs = tables.load(spark, "/root/testdata/sf0.001", "documents").limit(50)
    xx = dedup.minhash_band_table(docs, hash_fn="xxhash64")
    md = dedup.minhash_band_table(docs)
    assert dict(xx.dtypes)["band_hash"] == "bigint"
    assert dict(md.dtypes)["band_hash"] == "string"
    n = docs.count()
    assert xx.count() == n * 4 and md.count() == n * 4


def test_semantic_cluster_dedup_prunes_within_cluster(spark):
    # Two clusters along axes e0 / e1.  In cluster 0: vectors 10 and 11 are
    # near-identical (cos > 0.99); 12 is distinct.  SemDeDup keeps the member
    # with the LOWEST centroid similarity of each dup group and prunes the rest.
    cents = spark.createDataFrame(
        [(0, [1.0, 0.0, 0.0]), (1, [0.0, 1.0, 0.0])],
        "centroid_id int, embedding array<double>")
    vecs = spark.createDataFrame(
        [(10, [1.0, 0.01, 0.0]),     # cluster 0, dup pair with 11
         (11, [1.0, 0.011, 0.0]),    # cluster 0, nearly identical to 10
         (12, [0.8, 0.0, 0.6]),      # cluster 0, distinct (cos(10,12) ~ 0.8)
         (20, [0.01, 1.0, 0.0])],    # cluster 1, alone
        "vec_id int, embedding array<double>")
    out = {r.id: r for r in dedup.semantic_cluster_dedup(
        vecs, cents, eps=0.99).collect()}
    assert {r.cluster_id for r in out.values()} == {0, 1}
    # 12 has the lowest centroid sim in cluster 0 -> rank 1, never a dup;
    # 10 vs 11: both ~equal centroid sim, but whichever ranks first is kept
    # and the other (cos(10,11) > 0.99) pruned.
    assert out[12].is_dup == 0 and out[20].is_dup == 0
    assert out[10].is_dup + out[11].is_dup == 1


def test_semantic_cluster_dedup_ignores_cross_cluster_pairs(spark):
    # The method's deliberate locality: near-identical vectors assigned to
    # DIFFERENT clusters are never compared (that is what removes the global
    # pair join).  Both survive.
    cents = spark.createDataFrame(
        [(0, [1.0, 0.05, 0.0]), (1, [1.0, -0.05, 0.0])],
        "centroid_id int, embedding array<double>")
    vecs = spark.createDataFrame(
        [(10, [1.0, 0.04, 0.0]),    # nearest centroid 0
         (11, [1.0, -0.04, 0.0])],  # nearest centroid 1; cos(10,11) ~ 0.997
        "vec_id int, embedding array<double>")
    out = {r.id: r for r in dedup.semantic_cluster_dedup(
        vecs, cents, eps=0.99).collect()}
    assert out[10].cluster_id == 0 and out[11].cluster_id == 1
    assert out[10].is_dup == 0 and out[11].is_dup == 0


def test_semantic_cluster_dedup_self_centroid_assignment(spark):
    # A vector that IS a codebook entry (same id + same vector) must assign to
    # itself with sim 1.0 — pinned because the kNN family's default
    # exclude_self=True silently broke exactly this (caught by the oracle).
    cents = spark.createDataFrame(
        [(4, [1.0, 0.0]), (7, [0.0, 1.0])], "centroid_id int, embedding array<double>")
    vecs = spark.createDataFrame(
        [(4, [1.0, 0.0]), (9, [0.9, 0.1])], "vec_id int, embedding array<double>")
    out = {r.id: r for r in dedup.semantic_cluster_dedup(
        vecs, cents, eps=0.999).collect()}
    assert out[4].cluster_id == 4 and out[4].centroid_sim == 1.0
    assert out[9].cluster_id == 4


def test_semantic_cluster_dedup_matches_python_model(spark):
    # Randomized model parity: the operator's distributed plan must reproduce
    # a brute-force single-process implementation of the SemDeDup rules
    # (assignment argmax on 6-dp-rounded cosine with centroid-id tie-break,
    # rank by (centroid_sim asc, id asc), prune on earlier-ranked >= eps).
    import numpy as np

    rng = np.random.default_rng(7)
    n, dim, n_cents, eps = 80, 8, 5, 0.6
    mat = rng.normal(size=(n, dim))
    mat /= np.linalg.norm(mat, axis=1, keepdims=True)
    cent_idx = list(range(n_cents))
    cmat = mat[cent_idx]

    # model
    sims = np.round(mat @ cmat.T, 6)
    assign = {}
    for i in range(n):
        best = min(range(n_cents), key=lambda c: (-sims[i, c], cent_idx[c]))
        assign[i] = (cent_idx[best], sims[i, best])
    expect = {}
    for cid in set(c for c, _ in assign.values()):
        members = sorted((s, i) for i, (c, s) in assign.items() if c == cid)
        kept = []
        for s, i in members:
            dup = any(np.round(float(mat[i] @ mat[j]), 6) >= eps for _, j in kept)
            expect[i] = (cid, s, int(dup))
            kept.append((s, i))

    vecs = spark.createDataFrame(
        [(i, [float(x) for x in mat[i]]) for i in range(n)],
        "vec_id int, embedding array<double>")
    cents = spark.createDataFrame(
        [(i, [float(x) for x in cmat[k]]) for k, i in enumerate(cent_idx)],
        "centroid_id int, embedding array<double>")
    got = {r.id: (r.cluster_id, r.centroid_sim, r.is_dup)
           for r in dedup.semantic_cluster_dedup(vecs, cents, eps=eps).collect()}
    assert got == expect


def test_semantic_cluster_dedup_string_ids(spark):
    # The id/centroid columns keep their INPUT types (string doc ids are the
    # normal key shape for corpus dedup) — pinned because the first cut
    # hardcoded long ids in the applyInPandas schema.
    cents = spark.createDataFrame(
        [("c-a", [1.0, 0.0]), ("c-b", [0.0, 1.0])],
        "centroid_id string, embedding array<double>")
    vecs = spark.createDataFrame(
        [("d1", [1.0, 0.02]), ("d2", [1.0, 0.021]), ("d3", [0.1, 1.0])],
        "vec_id string, embedding array<double>")
    out = {r.id: r for r in dedup.semantic_cluster_dedup(
        vecs, cents, eps=0.99).collect()}
    assert out["d1"].cluster_id == "c-a" and out["d3"].cluster_id == "c-b"
    assert out["d1"].is_dup + out["d2"].is_dup == 1 and out["d3"].is_dup == 0


def test_line_dedup_keeps_first_occurrence_and_reassembles(spark):
    """C4/RefinedWeb line dedup: repeated boilerplate drops everywhere but
    its first (id, pos) occurrence; surviving lines reassemble in original
    order; a document whose every line was seen before keeps empty text."""
    docs = spark.createDataFrame(
        [(1, "cookie banner\nunique one\ncookie banner"),
         (2, "cookie banner\nunique two"),
         (3, "unique one\ncookie banner")],
        "doc_id long, text string")
    out = {r.id: r for r in dedup.line_dedup(docs).collect()}
    # doc 1: keeps 'cookie banner' (first occurrence, pos 0) + 'unique one';
    # its OWN second 'cookie banner' (pos 2) is a dup of pos 0
    assert out[1].text_deduped == "cookie banner\nunique one"
    assert (out[1].kept_lines, out[1].dropped_lines) == (2, 1)
    # doc 2: banner already seen in doc 1
    assert out[2].text_deduped == "unique two"
    assert (out[2].kept_lines, out[2].dropped_lines) == (1, 1)
    # doc 3: both lines seen before -> explicit empty survivor
    assert out[3].text_deduped == ""
    assert (out[3].kept_lines, out[3].dropped_lines) == (0, 2)


def test_line_dedup_is_layout_independent(spark):
    """The keep-rule is lexicographic (id, pos), not partition order."""
    rows = [(i, f"shared line\nonly-{i}") for i in range(20)]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    a = sorted(map(tuple, dedup.line_dedup(docs).collect()))
    b = sorted(map(tuple, dedup.line_dedup(docs.repartition(7)).collect()))
    assert a == b
    keeper = [r for r in a if "shared line" in r[3]]
    assert len(keeper) == 1 and keeper[0][0] == 0


def test_span_dup_fraction_finds_partial_overlap(spark):
    """Lee et al. ExactSubstr signal: a doc sharing a k-token run with
    another doc (or repeating one internally) counts those spans as dups;
    fully unique docs score 0; docs shorter than k are absent (length
    filter's job)."""
    shared = "a b c d e"                       # 5 tokens, k=3 -> 3 spans
    docs = spark.createDataFrame(
        [(1, shared + " x y"),                 # spans of 'a b c d e' dup'd
         (2, "p q " + shared),                 # same run, different offset
         (3, "u v w z1 z2 z3"),                # fully unique
         (4, "t1 t2")],                        # < k tokens -> absent
        "doc_id long, text string")
    out = {r.id: r for r in dedup.span_dup_fraction(docs, k=3).collect()}
    assert 4 not in out and len(out) == 3
    assert out[3].dup_spans == 0 and out[3].is_flagged == 0
    # both docs share the 3 spans inside 'a b c d e'
    assert out[1].dup_spans == 3 and out[2].dup_spans == 3
    assert out[1].n_spans == 5 and out[2].n_spans == 5
    assert out[1].dup_fraction == 0.6 and out[1].is_flagged == 1
    # internal repetition also counts (self-repeat of 'r s t')
    rep = spark.createDataFrame([(9, "r s t r s t")],
                                "doc_id long, text string")
    r9 = dedup.span_dup_fraction(rep, k=3).collect()[0]
    assert r9.n_spans == 4 and r9.dup_spans == 2   # 'r s t' twice; middles unique


def test_line_dedup_null_text_and_regex_sep(spark):
    """Review r7: NULL text must keep its output row (one empty line, deduped
    against other empties), and a regex-metacharacter separator must split
    LITERALLY (split() takes a Java regex; '|' unescaped splits every char)."""
    docs = spark.createDataFrame(
        [(1, None), (2, ""), (3, "ab|cd")], "doc_id long, text string")
    out = {r.id: r for r in dedup.line_dedup(docs, sep="|").collect()}
    assert set(out) == {1, 2, 3}                  # nothing dropped
    assert out[1].kept_lines + out[2].kept_lines == 1   # '' kept once
    assert out[3].text_deduped == "ab|cd"         # literal split + rejoin
    assert out[3].kept_lines == 2


def test_remove_duplicate_spans_keeps_first_occurrence(spark):
    """ExactSubstr removal: a k-run repeated across docs survives only at its
    first (id, pos); overlapping repeats merge into one cut; short docs and
    unique docs pass through byte-identical."""
    run = "a b c"                                 # k=3 span
    docs = spark.createDataFrame(
        [(1, run + " x " + run),                  # self-repeat at pos 4
         (2, "p " + run + " q"),                  # cross-doc repeat at pos 1
         (3, "u v w z"),                          # unique -> untouched
         (4, "s t")],                             # < k -> untouched
        "doc_id long, text string")
    out = {r.id: r for r in dedup.remove_duplicate_spans(docs, k=3).collect()}
    assert out[1].text_dedup == "a b c x"         # pos 4..6 cut
    assert (out[1].n_tokens, out[1].removed_tokens) == (7, 3)
    assert out[2].text_dedup == "p q"             # middle run cut
    assert out[3].text_dedup == "u v w z" and out[3].removed_tokens == 0
    assert out[4].text_dedup == "s t" and out[4].removed_tokens == 0


def test_remove_duplicate_spans_overlap_union(spark):
    """Tokens covered by SEVERAL removed spans are cut once (coverage union),
    and a doc that is entirely a repeat of an earlier doc empties out."""
    docs = spark.createDataFrame(
        [(1, "a b c d e"), (2, "a b c d e")], "doc_id long, text string")
    out = {r.id: r for r in dedup.remove_duplicate_spans(docs, k=3).collect()}
    assert out[1].text_dedup == "a b c d e" and out[1].removed_tokens == 0
    assert out[2].text_dedup == "" and out[2].removed_tokens == 5


def test_remove_duplicate_spans_null_text_keeps_row(spark):
    """NULL text keeps its output row (0 tokens, empty rebuild) — the same
    one-row-per-document contract line_dedup pins."""
    docs = spark.createDataFrame(
        [(1, None), (2, "a b c d")], "doc_id long, text string")
    out = {r.id: r for r in dedup.remove_duplicate_spans(docs, k=3).collect()}
    assert set(out) == {1, 2}
    assert (out[1].n_tokens, out[1].removed_tokens, out[1].text_dedup) == (0, 0, "")


def test_rolling_span_hash_udf_edge_shapes(spark):
    """The rolling-hash UDF is module-level reusable: rows shorter than k,
    empty arrays (including batch-final — the gather-index edge), and NULLs
    must yield empty span lists, and equal token windows must collide while
    shifted ones don't."""
    from pyspark.sql import functions as F

    from memory_opensource_spark.operators.dedup import _rolling_span_hash

    df = spark.createDataFrame(
        [(1, [11, 22, 33, 44]),       # 2 spans at k=3
         (2, [11, 22, 33]),           # 1 span, equal to doc 1's first
         (3, [22, 33, 44]),           # equal to doc 1's second
         (4, [22, 11, 33]),           # permuted -> different hash
         (5, [7]),                    # shorter than k
         (6, None),                   # NULL array
         (7, [])],                    # empty, LAST in batch
        "id int, th array<long>")
    out = {r.id: r.h for r in df.repartition(1).select(
        "id", _rolling_span_hash(3)(F.col("th")).alias("h")).collect()}
    assert len(out[1]) == 2 and len(out[2]) == 1 and len(out[3]) == 1
    assert out[1][0] == out[2][0] and out[1][1] == out[3][0]
    assert out[4][0] not in (out[1][0], out[1][1])
    assert out[5] == [] and out[6] == [] and out[7] == []


def test_exact_duplicates_negative_max_ids_raises(spark):
    """r9 (ADVICE): -1 'expecting unlimited' must raise, not silently act
    like max_ids=0 (no dup_ids column)."""
    df = spark.createDataFrame([(1, "a"), (2, "a")], "doc_id long, text string")
    with pytest.raises(ValueError, match="max_ids"):
        dedup.exact_duplicates(df, max_ids=-1)


def test_dup_ngram_char_coverage_union_semantics(spark):
    """r9: Gopher dup-5..10-gram char coverage with the DEFINED semantics —
    union of token positions under any duplicated n-gram (first occurrence
    counts, overlaps count once), weighted by token char length, separators
    excluded.  Hand-computed fixtures pin every clause."""
    rows = [
        # "a b c d e" occurs at pos 0 and 5 -> positions 0..9 covered,
        # 10 of 11 unit-length tokens -> 10/11
        (1, "a b c d e a b c d e x"),
        # overlapping occurrences of "w w w w w" (pos 0 and 1) cover all 6
        # tokens ONCE -> exactly 1.0, never >1 (the sum-form would give 10/6)
        (2, "w w w w w w"),
        (3, "q r s t u v"),          # no duplicated n-gram -> all 0.0
        (4, None),                    # NULL text -> row present, all 0.0
        (5, ""),
        # mixed token lengths: "aa b cc d ee" twice + unique 7-char tail
        # -> covered chars = (2+1+2+1+2) x 2 = 16, total = 16 + 7 = 23
        (6, "aa b cc d ee aa b cc d ee zzzzzzz"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = {r.doc_id: r for r in dedup.dup_ngram_char_coverage(df).collect()}
    assert len(out) == len(rows)                    # one row per input doc
    assert out[1].dup5_char_frac == pytest.approx(round(10 / 11, 6))
    assert out[1].dup6_char_frac == 0.0             # no duplicated 6-gram
    assert out[2].dup5_char_frac == 1.0
    assert out[2].dup6_char_frac == 0.0
    for i in (3, 4, 5):
        for n in range(5, 11):
            assert getattr(out[i], f"dup{n}_char_frac") == 0.0, (i, n)
    assert out[6].dup5_char_frac == pytest.approx(round(16 / 23, 6))


def test_gopher_ngram_stats_top_gram_values_and_tie(spark):
    """r9: the single-kernel top-{2,3,4}-gram fractions — hand-computed
    values, and the DOCUMENTED tie rule: among equally-most-frequent
    n-grams the LONGER gram wins (max char mass)."""
    rows = [
        # "aa bb aa bb aa" -> 2-grams: "aa bb" x2, "bb aa" x2 (tie, equal
        # length 5) -> top2 = 2*5 / len("aa bb aa bb aa")=14 -> 10/14
        (1, "aa bb aa bb aa"),
        # tie with DIFFERENT lengths: "cc d" x1... craft: "cc d cc ee"
        # 2-grams: "cc d", "d cc", "cc ee" all count 1 -> tie at mc=1;
        # longest is "cc ee" (5 chars) -> top2 = 1*5 / 10
        (2, "cc d cc ee"),
        (3, None),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = {r.doc_id: r for r in
           dedup.gopher_ngram_stats(df, cover_ns=(5,), top_ns=(2,))
           .collect()}
    assert out[1].top2_char_frac == pytest.approx(round(10 / 14, 6))
    assert out[2].top2_char_frac == pytest.approx(round(5 / 10, 6))
    assert out[3].top2_char_frac == 0.0 and out[3].dup5_char_frac == 0.0
    assert len(out) == 3


def test_keep_best_in_clusters_families_singletons_ties(spark):
    """r12 operators/dedup.keep_best_in_clusters: a CHAINED family (a-b,
    b-c) keeps its highest-scored member, singletons keep themselves,
    NULL scores rank below every real score, and exact score ties break
    to the smaller id."""
    from pyspark.sql import functions as F

    from memory_opensource_spark.operators.dedup import (
        keep_best_in_clusters)

    docs = spark.createDataFrame([(i,) for i in range(7)],
                                 "doc_id long")
    pairs = spark.createDataFrame(
        [(0, 1), (1, 2),        # chain family {0,1,2}
         (3, 4),                # tie family {3,4}
         (5, 6)],               # NULL-score member family {5,6}
        "left_id long, right_id long")
    scores = spark.createDataFrame(
        [(0, 0.1), (1, 0.9), (2, 0.5),
         (3, 0.7), (4, 0.7),
         (5, None), (6, -0.2)],
        "doc_id long, q double")
    out = {r.doc_id: (r.cluster_id, r.keeper_id, r.retained)
           for r in keep_best_in_clusters(
               docs, pairs, scores, score_col="q").collect()}
    assert len(out) == 7
    for d in (0, 1, 2):
        assert out[d] == (0, 1, int(d == 1))   # best score wins the chain
    for d in (3, 4):
        assert out[d] == (3, 3, int(d == 3))   # tie -> smaller id
    for d in (5, 6):
        assert out[d] == (5, 6, int(d == 6))   # NULL ranks below -0.2


def test_keep_best_in_clusters_string_ids(spark):
    """r13 ADVICE fix: the id-asc tie-break must be TYPE-GENERIC — the old
    struct-argmax negated the id (analysis error on strings, overflow on
    Long.MIN_VALUE).  String/UUID doc ids now work end-to-end, including
    the exact-tie and NULL-score paths."""
    from memory_opensource_spark.operators.dedup import (
        keep_best_in_clusters)

    docs = spark.createDataFrame(
        [("ua",), ("ub",), ("uc",), ("ud",), ("ue",)], "doc_id string")
    pairs = spark.createDataFrame(
        [("ua", "ub"), ("ub", "uc"),   # chain family
         ("ud", "ue")],                # tie family
        "left_id string, right_id string")
    scores = spark.createDataFrame(
        [("ua", 0.2), ("ub", 0.9), ("uc", None),
         ("ud", 0.5), ("ue", 0.5)],
        "doc_id string, q double")
    out = {r.doc_id: (r.keeper_id, r.retained)
           for r in keep_best_in_clusters(
               docs, pairs, scores, score_col="q").collect()}
    assert len(out) == 5
    for d in ("ua", "ub", "uc"):
        assert out[d] == ("ub", int(d == "ub"))
    for d in ("ud", "ue"):
        assert out[d] == ("ud", int(d == "ud"))   # tie -> lexicographic min


def test_keep_best_in_clusters_long_min_value(spark):
    """r14 type dispatch: the integral path negates the id through
    decimal(20,0) inside the struct-argmax — Long.MIN_VALUE (whose bare
    long negation silently wraps to itself in non-ANSI mode) must still
    win an exact-score tie as the smaller id."""
    from memory_opensource_spark.operators.dedup import (
        keep_best_in_clusters)

    lo = -(2 ** 63)             # Long.MIN_VALUE
    docs = spark.createDataFrame([(lo,), (lo + 1,), (7,)], "doc_id long")
    pairs = spark.createDataFrame([(lo, lo + 1)],
                                  "left_id long, right_id long")
    scores = spark.createDataFrame(
        [(lo, 0.5), (lo + 1, 0.5), (7, 0.1)], "doc_id long, q double")
    out = {r.doc_id: (r.keeper_id, r.retained)
           for r in keep_best_in_clusters(
               docs, pairs, scores, score_col="q").collect()}
    assert out[lo] == (lo, 1)          # MIN_VALUE wins the tie
    assert out[lo + 1] == (lo, 0)
    assert out[7] == (7, 1)            # singleton keeps itself
