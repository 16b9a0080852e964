"""Text-analysis expression builders (north-star LLM-pipeline ops).

Everything here is a pure Catalyst Column expression (split / transform / aggregate /
md5) — no Python UDFs — so the operators scale linearly over 100 TB of documents and
are exactly reproducible in the DuckDB oracle (md5 and string ops are engine-portable).

Tokenization contract (shared with the oracle): lowercase, split on single spaces,
drop empty tokens.  The fixture documents are space-separated words, and keeping the
contract trivial keeps Spark/DuckDB parity exact.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

from ..semantics import MINHASH_BANDS, MINHASH_NUM_HASHES, SHINGLE_SIZE

# Small multilingual stopword lists for the language-ID heuristic.  The heuristic —
# count token hits per language, argmax with language-name tiebreak — is the operator
# spec; the oracle replicates it verbatim.
LANG_STOPWORDS: dict[str, list[str]] = {
    "en": ["the", "a", "and", "of", "to", "in", "is", "it", "that", "for"],
    "de": ["der", "die", "das", "und", "ist", "nicht", "ein", "mit", "für", "von"],
    "es": ["el", "la", "los", "las", "es", "un", "una", "por", "para", "con"],
    "fr": ["le", "la", "les", "et", "est", "un", "une", "pour", "dans", "avec"],
}

STOPWORDS_EN = LANG_STOPWORDS["en"]


def tokens(text: Column) -> Column:
    """lowercase whitespace tokens, empties dropped."""
    return F.filter(F.split(F.lower(text), " "), lambda t: t != "")


def token_count(text: Column) -> Column:
    return F.size(tokens(text))


def bpe_ish_token_count(text: Column) -> Column:
    """Sub-word-ish token count via regex: alpha runs, digit runs, other symbols."""
    return F.regexp_count(F.lower(text), F.lit(r"[a-z]+|[0-9]+|[^a-z0-9\s]"))


def stopword_ratio(text: Column, stopwords: list[str] | None = None) -> Column:
    toks = tokens(text)
    sw = F.array(*[F.lit(w) for w in (stopwords or STOPWORDS_EN)])
    hits = F.size(F.filter(toks, lambda t: F.array_contains(sw, t)))
    return hits.cast("double") / F.greatest(F.size(toks), F.lit(1)).cast("double")


def punct_ratio(text: Column) -> Column:
    n_punct = F.regexp_count(text, F.lit(r"[.,!?;:]"))
    return n_punct.cast("double") / F.greatest(F.length(text), F.lit(1)).cast("double")


def avg_token_len(text: Column) -> Column:
    toks = tokens(text)
    total = F.aggregate(toks, F.lit(0), lambda acc, t: acc + F.length(t))
    return total.cast("double") / F.greatest(F.size(toks), F.lit(1)).cast("double")


def quality_score(text: Column) -> Column:
    """Heuristic document quality in [0,1]:
    0.4*min(tokens/100,1) + 0.3*(1-punct_ratio*5 clipped) + 0.3*min(stopword_ratio*4,1).
    (Beyond-reference op; spec chosen deterministic + oracle-expressible.)"""
    length_part = F.least(token_count(text).cast("double") / 100.0, F.lit(1.0))
    punct_part = F.greatest(F.lit(0.0), F.lit(1.0) - punct_ratio(text) * 5.0)
    sw_part = F.least(stopword_ratio(text) * 4.0, F.lit(1.0))
    return 0.4 * length_part + 0.3 * punct_part + 0.3 * sw_part


def lang_scores(text: Column) -> dict[str, Column]:
    toks = tokens(text)
    out = {}
    for lang, words in LANG_STOPWORDS.items():
        sw = F.array(*[F.lit(w) for w in words])
        out[lang] = F.size(F.filter(toks, lambda t: F.array_contains(sw, t)))
    return out


def lang_id(text: Column) -> Column:
    """argmax language by stopword hits; ties -> lexicographically-first language;
    zero hits everywhere -> 'und' (undetermined)."""
    scores = lang_scores(text)
    langs = sorted(scores)  # deterministic tiebreak: language code asc
    best_lang = F.lit("und")
    best_score = F.lit(0)
    for lang in reversed(langs):  # reversed so earlier langs win ties via >=
        cond = scores[lang] >= best_score
        best_lang = F.when((scores[lang] > 0) & cond, F.lit(lang)).otherwise(best_lang)
        best_score = F.greatest(best_score, scores[lang])
    return best_lang


def shingle_grams(text: Column, n: int = SHINGLE_SIZE) -> Column:
    """Word n-gram shingles as strings ('w1 w2 w3'), multiset (duplicates kept).
    Short docs yield one truncated gram; an empty doc yields ['']."""
    toks = tokens(text)
    idx = F.sequence(F.lit(1), F.greatest(F.size(toks) - (n - 1), F.lit(1)))
    return F.transform(idx, lambda i: F.concat_ws(" ", F.slice(toks, i, n)))


def shingles(text: Column, n: int = SHINGLE_SIZE) -> Column:
    """Word n-gram shingles as strings ('w1 w2 w3'), distinct."""
    return F.array_distinct(shingle_grams(text, n))


def minhash_signature(text: Column, num_hashes: int = MINHASH_NUM_HASHES) -> Column:
    """MinHash over md5-hashed shingles: sig[i] = min over shingles of
    md5(i || ':' || shingle) (hex, lexicographic min).  md5 is identical across
    Spark and DuckDB so the signature is oracle-checkable."""
    sh = shingles(text)
    return F.transform(
        F.sequence(F.lit(0), F.lit(num_hashes - 1)),
        lambda i: F.array_min(
            F.transform(sh, lambda s: F.md5(F.concat(i.cast("string"), F.lit(":"), s)))
        ),
    )


def minhash_bands(sig: Column, bands: int = MINHASH_BANDS,
                  num_hashes: int = MINHASH_NUM_HASHES) -> Column:
    """LSH band keys: md5 of each band's concatenated signature slice."""
    rows = num_hashes // bands
    return F.transform(
        F.sequence(F.lit(0), F.lit(bands - 1)),
        lambda b: F.md5(F.concat_ws(",", F.slice(sig, b * rows + 1, rows))),
    )


def fingerprint(text: Column) -> Column:
    """Document fingerprint: md5 over the sorted distinct token set (canonical
    content hash, order-insensitive — catches shuffled near-copies)."""
    canon = F.array_join(F.array_sort(F.array_distinct(tokens(text))), " ")
    return F.md5(canon)


def simhash(text: Column, bits: int = 32) -> Column:
    """SimHash over tokens: per bit b, sum +-1 by bit b of md5(token); sign -> bit.
    Returns a bigint.  Bits are read from the md5 hex string 4 at a time so the
    same arithmetic is expressible in the DuckDB oracle."""
    toks = tokens(text)
    acc = F.lit(0).cast("bigint")
    for b in range(bits):
        hex_pos = b // 4 + 1
        shift = 3 - (b % 4)
        # value of hex char at hex_pos, bit `shift`
        def bit_of(t, hp=hex_pos, sh=shift):
            c = F.substring(F.md5(t), hp, 1)
            v = F.instr(F.lit("0123456789abcdef"), c) - 1
            return F.shiftright(v, sh) % 2
        votes = F.aggregate(
            toks, F.lit(0), lambda a, t: a + F.when(bit_of(t) == 1, 1).otherwise(-1)
        )
        acc = acc + F.when(votes > 0, F.shiftleft(F.lit(1).cast("bigint"), b)).otherwise(F.lit(0).cast("bigint"))
    return acc
