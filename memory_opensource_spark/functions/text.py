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


def tokenizer_count_udf(loader):
    """REAL-tokenizer token counting seam (r9, VERDICT r8 task 8): a batched
    Arrow UDF over a PLUGGABLE tokenizer, so shard/pack budgets
    (sources/writers.py ``tokens_col``) can come from the tokenizer the
    model will actually train with instead of the ``bpe_ish_token_count``
    regex estimate.

    ``loader`` is a zero-arg picklable callable returning
    ``counts(texts: list[str]) -> list[int]``; it runs ONCE per executor
    (lazy-initialized and cached), so heavyweight tokenizers (HF fast
    tokenizers, sentencepiece) load once, then count Arrow-batch-at-a-time.
    NULL text counts 0.  Deterministic as long as the tokenizer is."""
    import pandas as pd
    from pyspark.sql.functions import pandas_udf

    state: dict = {}

    @pandas_udf("long")
    def cnt(s):
        fn = state.get("fn")
        if fn is None:
            fn = state["fn"] = loader()
        texts = ["" if x is None else x for x in s.tolist()]
        return pd.Series([int(c) for c in fn(texts)], dtype="int64")

    return cnt


def hf_token_count(tokenizer_file: str):
    """``tokenizer_count_udf`` wired to a HuggingFace ``tokenizers`` fast
    tokenizer file — the production twin of ``bpe_ish_token_count``.  The
    sandbox ships no tokenizer library, so construction only *defers* the
    import: the UDF raises ImportError on first executor batch when the
    library is genuinely absent (callers skip-guard, like the
    sentence-transformers path in tests/test_real_encoder.py)."""
    def loader():
        from tokenizers import Tokenizer

        tok = Tokenizer.from_file(tokenizer_file)

        def counts(texts):
            return [len(e.ids) for e in tok.encode_batch(texts)]

        return counts

    return tokenizer_count_udf(loader)


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


GOPHER_STOPWORDS = ["the", "be", "to", "of", "and", "that", "have", "with"]


def gopher_flags(text: Column) -> dict[str, Column]:
    """The Gopher document-quality rule set (arXiv:2112.11446 Appendix A1.1,
    the filter table most open corpus recipes copy — MassiveText/RefinedWeb/
    Dolma variants), computed scan-side as named columns:

    - word_count in [50, 100 000]
    - mean word length in [3, 10]
    - symbol-to-word ratio ('#' or '...') <= 0.1
    - <= 90% of lines start with a bullet ('-' / '*'; the unicode bullet is
      omitted to keep the DuckDB-oracle byte semantics identical)
    - <= 30% of lines end with an ellipsis
    - >= 80% of words contain an alphabetic character
    - >= 2 of the 8 Gopher stop words appear

    Returns {word_count, mean_word_len, symbol_ratio, bullet_line_frac,
    ellipsis_line_frac, alpha_word_frac, stop_word_hits, gopher_pass} —
    distinct from :func:`quality_score` (a composite scalar) and
    text_repetition_stats (n-gram repetition): these are the PUBLISHED
    hard thresholds, each exposed so a pipeline can loosen one without
    re-deriving the rest.  All ratios round to 6dp for oracle parity.

    NULL text coalesces to '' up front: without it size(split(NULL)) yields
    word_count -1 (legacy sizeOfNull) and NULL ratios, diverging from the
    DuckDB oracle on null-text docs."""
    text = F.coalesce(text, F.lit(""))
    tk = tokens(text)
    n_words = F.size(tk)
    d_words = F.greatest(n_words, F.lit(1)).cast("double")
    total_len = F.aggregate(tk, F.lit(0), lambda a, t: a + F.length(t))
    mean_len = F.round(total_len.cast("double") / d_words, 6)
    symbols = (F.regexp_count(text, F.lit("#"))
               + F.regexp_count(text, F.lit(r"\.\.\.")))
    symbol_ratio = F.round(symbols.cast("double") / d_words, 6)
    lines = F.split(text, "\n")
    d_lines = F.greatest(F.size(lines), F.lit(1)).cast("double")
    bullet = F.size(F.filter(
        lines, lambda ln: F.ltrim(ln).startswith("-")
        | F.ltrim(ln).startswith("*")))
    ellipsis = F.size(F.filter(
        lines, lambda ln: F.rtrim(ln).endswith("...")))
    bullet_frac = F.round(bullet.cast("double") / d_lines, 6)
    ellipsis_frac = F.round(ellipsis.cast("double") / d_lines, 6)
    alpha = F.size(F.filter(tk, lambda t: t.rlike("[a-z]")))
    alpha_frac = F.round(alpha.cast("double") / d_words, 6)
    sw = F.array(*[F.lit(w) for w in GOPHER_STOPWORDS])
    hits = F.size(F.filter(tk, lambda t: F.array_contains(sw, t)))
    gopher_pass = ((n_words >= 50) & (n_words <= 100_000)
                   & (mean_len >= 3.0) & (mean_len <= 10.0)
                   & (symbol_ratio <= 0.1)
                   & (bullet_frac <= 0.9) & (ellipsis_frac <= 0.3)
                   & (alpha_frac >= 0.8) & (hits >= 2))
    return {
        "word_count": n_words.cast("long"),
        "mean_word_len": mean_len,
        "symbol_ratio": symbol_ratio,
        "bullet_line_frac": bullet_frac,
        "ellipsis_line_frac": ellipsis_frac,
        "alpha_word_frac": alpha_frac,
        "stop_word_hits": hits.cast("long"),
        "gopher_pass": gopher_pass.cast("int"),
    }


def dup_segment_fractions(text: Column, sep: str) -> dict[str, Column]:
    """Within-doc duplicate-segment signals (Gopher arXiv:2112.11446 A1.1
    repetition table, the line/paragraph half): fraction of segments that
    are repeats of an earlier one, and the fraction of CHARACTERS those
    repeats contain.  Pure array-local expressions — no explode, no shuffle:
    distinct-segment counts/charsums come from ``array_distinct``, so
    repeats = totals - firsts."""
    import re as _re

    segs = F.split(F.coalesce(text, F.lit("")), _re.escape(sep))
    n = F.size(segs)
    d = F.greatest(n, F.lit(1)).cast("double")
    firsts = F.array_distinct(segs)
    chars = F.aggregate(segs, F.lit(0), lambda a, s: a + F.length(s))
    chars_first = F.aggregate(firsts, F.lit(0), lambda a, s: a + F.length(s))
    return {
        "dup_frac": F.round((n - F.size(firsts)).cast("double") / d, 6),
        "dup_char_frac": F.round(
            (chars - chars_first).cast("double")
            / F.greatest(chars, F.lit(1)).cast("double"), 6),
    }


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


# Unicode punctuation folding (r12) — the pre-dedup normalization every
# crawl pipeline runs so typographic variants never split duplicate
# detection: curly quotes/apostrophes -> ASCII, dashes -> '-', exotic
# spaces -> ' ', zero-width characters deleted, fullwidth ASCII folded.
# One replace (ellipsis, the only 1->many case) + one translate — both
# engines delete characters that map past the end of the 'to' string,
# so the zero-width set folds away inside the same translate call.
_FOLD_ELLIPSIS = "…"
_FOLD_FROM = (
    "‘’‚′"          # single quotes/prime -> '
    "“”„″"          # double quotes/prime -> "
    "–—―−"          # dashes/minus -> -
    "   　"          # no-break/figure/narrow/ideographic spaces
    + "".join(chr(c) for c in range(0xFF01, 0xFF5F))   # fullwidth ASCII
    + "​‌‍﻿"        # zero-width: DELETED (past 'to')
)
_FOLD_TO = (
    "''''" + '""""' + "----" + "    "
    + "".join(chr(c) for c in range(0x21, 0x7F))
)


def fold_punctuation(text: Column) -> Column:
    """``text`` with typographic unicode folded to ASCII (table above).
    Pure Column expression — scan-side; NULL stays NULL.  Run BEFORE
    exact/MinHash dedup so re-typeset copies of one document hash
    identically."""
    return F.translate(
        F.replace(text, F.lit(_FOLD_ELLIPSIS), F.lit("...")),
        _FOLD_FROM, _FOLD_TO)


def fold_punctuation_sql(expr: str) -> str:
    """DuckDB twin of :func:`fold_punctuation` — same tables, same
    replace-then-translate order, same delete-past-end semantics."""
    def q(s):
        return s.replace("'", "''")

    return (f"translate(replace({expr}, '{_FOLD_ELLIPSIS}', '...'), "
            f"'{q(_FOLD_FROM)}', '{q(_FOLD_TO)}')")
