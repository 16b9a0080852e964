"""Byte-pair-encoding vocabulary training + subword encoding (round-12).

The tokenization layer between the whitespace/`bpe_ish` approximations
(functions/text.py) and the optional real-HF-tokenizer seam
(tokenizer_count_udf): train a REAL merge table on the corpus itself and
encode with it — the classic Sennrich subword-nmt algorithm, Spark-first.
Reference analog: none (LLM-data-pipeline family, like the Gopher tables).

Split of labor for 100 TB:

- **Training** (:func:`train_bpe`): the corpus-sized work is ONE
  combinable word-count groupBy (tokens explode -> count) — scan-parallel,
  map-side combined.  The merge loop itself runs driver-side over the
  BOUNDED distinct-word count table (``max_words`` most frequent words —
  the standard practice; the table is a KB-to-MB sidecar like the IVF
  codebook, NOT corpus-sized).  Ties break deterministically (count desc,
  pair lexicographic asc), so the merge table is a pure function of the
  corpus.
- **Encoding** (:func:`apply_bpe` / :func:`bpe_token_count`): a pure
  Column expression — each learned merge is ONE string replace over a
  sentinel-wrapped representation, applied in rank order (the subword-nmt
  encoder semantics), so the whole encode stays JVM-side with a DuckDB
  twin (:func:`apply_bpe_sql`) built from the SAME merge literals.

Representation: tokenization mirrors functions/quality_clf (lowercase,
non-``[a-z ]`` -> space, split on runs).  Each word's characters are
individually wrapped in the sentinel ``\\x1f`` (``hi`` ->
``\\x1fh\\x1f\\x1fi\\x1f``) and the word ends with the ``</w>`` symbol.
A merge (a, b) is then the literal replacement
``\\x1fa\\x1f\\x1fb\\x1f -> \\x1fab\\x1f``: occurrences are adjacent and
share no boundary characters, so leftmost non-overlapping string
replacement (both engines' semantics) EQUALS the pairwise BPE merge scan.
Cross-word merges cannot fire: ``</w>`` is always word-final, so no
learned pair has it on the left.  Token count = sentinel count / 2.

The registered oracle row encodes with SEED_MERGES (trained at import
from the quality classifier's embedded seed prose — deterministic, no
Spark needed), keeping the row fully oracle-gated; the distributed
trainer is pinned in tests against a naive reference implementation and
for partition-layout independence (iterative training itself is not
SQL-expressible).
"""

from __future__ import annotations

from functools import lru_cache

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

SEP = "\x1f"
EOW = "</w>"


def _words(text: str) -> list[str]:
    return "".join(c if "a" <= c <= "z" else " "
                   for c in text.lower()).split()


def train_bpe_from_counts(counts: dict[str, int],
                          n_merges: int) -> list[tuple[str, str]]:
    """The deterministic driver-side merge loop over a word-count table —
    pure function, shared by :func:`train_bpe`, the seed-vocab build and
    the reference-parity tests.  Stops early when no pair occurs twice."""
    words: list[tuple[list[str], int]] = [
        (list(w) + [EOW], c) for w, c in sorted(counts.items())]
    merges: list[tuple[str, str]] = []
    for _ in range(n_merges):
        pairs: dict[tuple[str, str], int] = {}
        for syms, c in words:
            for a, b in zip(syms, syms[1:]):
                pairs[(a, b)] = pairs.get((a, b), 0) + c
        if not pairs:
            break
        best = min(pairs.items(), key=lambda kv: (-kv[1], kv[0]))
        if best[1] < 2:
            break
        (a, b), _ = best
        merges.append((a, b))
        ab = a + b
        for syms, _c in words:
            i = 0
            while i < len(syms) - 1:
                if syms[i] == a and syms[i + 1] == b:
                    syms[i:i + 2] = [ab]
                i += 1
    return merges


def train_bpe(df: DataFrame, text_col: str = "text", n_merges: int = 200,
              max_words: int = 50_000) -> list[tuple[str, str]]:
    """Train a BPE merge table on a corpus: ONE distributed word-count
    groupBy (the only corpus-sized pass), then the driver-side merge loop
    over the ``max_words`` most frequent words (ties: word asc — fully
    deterministic and partition-layout independent)."""
    t = F.lower(F.coalesce(F.col(text_col), F.lit("")))
    toks = F.filter(F.split(F.regexp_replace(t, "[^a-z ]", " "), " +"),
                    lambda x: x != "")
    wc = (df.select(F.explode(toks).alias("word"))
          .groupBy("word").agg(F.count("*").alias("c"))
          .orderBy(F.col("c").desc(), F.col("word").asc())
          .limit(max_words)
          .collect())
    return train_bpe_from_counts({r.word: r.c for r in wc}, n_merges)


@lru_cache(maxsize=1)
def seed_merges(n_merges: int = 200) -> tuple[tuple[str, str], ...]:
    """Merge table trained at import from the quality classifier's
    embedded seed prose — deterministic without Spark, used by the
    oracle-gated registry row."""
    from .quality_clf import NEG_SEED, POS_SEED

    counts: dict[str, int] = {}
    for w in _words(POS_SEED + " " + NEG_SEED):
        counts[w] = counts.get(w, 0) + 1
    return tuple(train_bpe_from_counts(counts, n_merges))


def _wrapped(col: Column) -> Column:
    """The sentinel-wrapped symbol representation of a text column
    (module docstring): chars wrapped in SEP, words terminated by EOW."""
    t = F.lower(F.coalesce(col, F.lit("")))
    cleaned = F.trim(F.regexp_replace(t, "[^a-z ]", " "))
    collapsed = F.regexp_replace(cleaned, " +", " ")
    wrapped = F.regexp_replace(collapsed, "([a-z])", f"{SEP}$1{SEP}")
    eow = f"{SEP}{EOW}{SEP}"
    return F.when(collapsed == "", F.lit("")).otherwise(
        F.concat(F.replace(wrapped, F.lit(" "), F.lit(eow)), F.lit(eow)))


def apply_bpe(col: Column, merges) -> Column:
    """Encode ``col`` with the learned ``merges`` (rank order) — a chain
    of JVM string replaces over the wrapped representation; whole-stage
    codegen, zero UDF, zero shuffle."""
    s = _wrapped(col)
    for a, b in merges:
        s = F.replace(s, F.lit(f"{SEP}{a}{SEP}{SEP}{b}{SEP}"),
                      F.lit(f"{SEP}{a}{b}{SEP}"))
    return s


def bpe_token_count(col: Column, merges) -> Column:
    """Subword token count under ``merges`` = sentinel count / 2."""
    s = apply_bpe(col, merges)
    return ((F.length(s) - F.length(F.replace(s, F.lit(SEP), F.lit(""))))
            / 2).cast("long")


def apply_bpe_sql(expr: str, merges) -> str:
    """DuckDB twin of :func:`apply_bpe` — same merge literals, same
    sentinel scheme, same rank order.  The fold runs through
    ``list_reduce`` over ['<wrapped text>', 'pat\\0rep', ...] (a naive
    nested-replace chain exceeds DuckDB's 128 expression-depth cap past
    ~120 merges; the reduce keeps depth constant at any vocab size)."""
    t = f"lower(coalesce({expr}, ''))"
    cleaned = f"trim(regexp_replace({t}, '[^a-z ]', ' ', 'g'))"
    collapsed = f"regexp_replace({cleaned}, ' +', ' ', 'g')"
    wrapped = (f"regexp_replace({collapsed}, '([a-z])', "
               f"chr(31) || '\\1' || chr(31), 'g')")
    eow = f"chr(31) || '{EOW}' || chr(31)"
    s0 = (f"(CASE WHEN {collapsed} = '' THEN '' ELSE "
          f"replace({wrapped}, ' ', {eow}) || {eow} END)")
    items = ", ".join(
        f"chr(31) || '{a}' || chr(31) || chr(31) || '{b}' || chr(31) || "
        f"chr(0) || chr(31) || '{a}{b}' || chr(31)"
        for a, b in merges)
    if not items:
        return s0
    return (f"list_reduce(list_prepend({s0}, [{items}]), "
            f"(acc, m) -> replace(acc, split_part(m, chr(0), 1), "
            f"split_part(m, chr(0), 2)))")


def bpe_token_count_sql(expr: str, merges) -> str:
    """DuckDB twin of :func:`bpe_token_count`."""
    s = apply_bpe_sql(expr, merges)
    return (f"((length({s}) - length(replace({s}, chr(31), ''))) / 2)"
            f"::BIGINT")
