"""Real-tokenizer token-accounting seam (r9, VERDICT r8 task 8): pluggable
batched tokenizer counts driving shard/pack budgets, with the bpe_ish regex
estimate's fixture-parity bound documented and pinned."""

import re
import sys

import pytest
from pyspark.sql import functions as F

# the loader closes over this test module's globals; executors cannot import
# a pytest test module by name, so force cloudpickle to serialize it by value
from pyspark import cloudpickle as _cp

_cp.register_pickle_by_value(sys.modules[__name__])

from memory_opensource_spark.functions.text import (
    bpe_ish_token_count,
    tokenizer_count_udf,
)
from memory_opensource_spark.sources import tables, writers

# GPT-2-style pre-tokenization (the published regex, ASCII-simplified for
# stdlib `re`): contraction suffixes, space-prefixed alpha/digit/symbol runs
GPT2ISH = re.compile(
    r"'s|'t|'re|'ve|'m|'ll|'d| ?[A-Za-z]+| ?[0-9]+| ?[^\sA-Za-z0-9]+"
    r"|\s+(?!\S)|\s+")


def _loader():
    return lambda texts: [len(GPT2ISH.findall(t)) for t in texts]


def test_tokenizer_count_udf_matches_driver(spark):
    """The Arrow seam must count exactly what the same tokenizer counts
    driver-side, including NULL -> 0."""
    docs = tables.load(spark, "/root/testdata/sf0.001", "documents")
    rows = docs.select("doc_id", "text",
                       tokenizer_count_udf(_loader)(F.col("text"))
                       .alias("n")).collect()
    for r in rows:
        assert r.n == len(GPT2ISH.findall(r.text)), r.doc_id
    null_row = (spark.createDataFrame([(1, None)], "doc_id int, text string")
                .select(tokenizer_count_udf(_loader)(F.col("text"))
                        .alias("n")).collect()[0])
    assert null_row.n == 0


def test_shard_by_real_tokenizer_counts(spark):
    """Shard the corpus by REAL-tokenizer counts (the production budget
    path): shard assignment must equal the driver-recomputed exclusive
    prefix-sum rule floor(prior/budget) over doc_id order."""
    budget = 2_000
    docs = tables.load(spark, "/root/testdata/sf0.001", "documents")
    sized = docs.select(
        "doc_id", tokenizer_count_udf(_loader)(F.col("text")).alias("n_tok"))
    out = {r.doc_id: r.shard for r in writers.shard_by_token_budget(
        sized, budget, id_col="doc_id", tokens_col="n_tok").collect()}
    rows = sorted(sized.collect(), key=lambda r: r.doc_id)
    prior = 0
    for r in rows:
        assert out[r.doc_id] == prior // budget, r.doc_id
        prior += r.n_tok
    assert len(out) == len(rows)


def test_bpe_ish_fixture_parity_bound(spark):
    """DOCUMENTED PARITY BOUND: on the fixture corpus (plain lowercase
    prose) the bpe_ish regex estimate equals the GPT-2-style pre-tokenizer
    count EXACTLY (rel diff 0.0, measured over all sf0.001 docs) — budgets
    computed either way shard identically there.  On contraction/punctuation
    text they genuinely diverge (shown below), which is why production
    budgets should use the seam."""
    docs = tables.load(spark, "/root/testdata/sf0.001", "documents")
    rows = docs.select(
        bpe_ish_token_count(F.col("text")).alias("b"),
        tokenizer_count_udf(_loader)(F.col("text")).alias("r")).collect()
    assert all(r.b == r.r for r in rows)
    # divergence case: "don't" -> bpe_ish [don, ', t] = 3; gpt2-ish
    # [don, 't] = 2 (contraction suffix merged)
    div = (spark.createDataFrame([(1, "don't stop")], "i int, text string")
           .select(bpe_ish_token_count(F.col("text")).alias("b"),
                   tokenizer_count_udf(_loader)(F.col("text")).alias("r"))
           .collect()[0])
    assert div.b != div.r


def test_hf_token_count_when_library_present(spark):
    """The HF-backed constructor end-to-end — skip-guarded: the sandbox
    ships no `tokenizers`; environments that do train a 30-second BPE and
    shard by its real counts."""
    pytest.importorskip("tokenizers")
    import os
    import tempfile

    from tokenizers import Tokenizer
    from tokenizers.models import BPE
    from tokenizers.pre_tokenizers import Whitespace
    from tokenizers.trainers import BpeTrainer

    from memory_opensource_spark.functions.text import hf_token_count

    tok = Tokenizer(BPE(unk_token="[UNK]"))
    tok.pre_tokenizer = Whitespace()
    tok.train_from_iterator(
        ["the quick brown fox jumps over the lazy dog"] * 50,
        BpeTrainer(special_tokens=["[UNK]"], vocab_size=200))
    path = os.path.join(tempfile.mkdtemp(), "tok.json")
    tok.save(path)
    docs = tables.load(spark, "/root/testdata/sf0.001", "documents")
    rows = docs.limit(20).select(
        "text", hf_token_count(path)(F.col("text")).alias("n")).collect()
    for r in rows:
        assert r.n == len(tok.encode(r.text).ids)
