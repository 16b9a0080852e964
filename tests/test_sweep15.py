"""Fifteenth adversarial sweep (VERDICT r10 task 5): r12-new code vs
pathological inputs — media prober edge bytes, CC chain families, BPE
sentinel collisions, astral-plane text through the fold/langid twins."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from memory_opensource_spark.sources.multimodal import (probe_media_meta,
                                                        write_mp3_stub,
                                                        write_wav)


def test_mp3_no_false_positive_on_random_bytes():
    """2 MB of seeded random bytes: the 11-bit sync pattern appears ~1000
    times, but the two-frame validation must reject every one (or accept
    only a run whose computed frame length lands on another sync — the
    rng makes that astronomically unlikely)."""
    rng = np.random.default_rng(42)
    blob = bytes([0xFF, 0xE0]) + rng.integers(
        0, 256, 2_000_000, dtype=np.uint8).tobytes()
    assert probe_media_meta(blob) is None


def test_mp3_real_frame_after_garbage_syncs():
    """False syncs before the first real frame must be scanned PAST, not
    fatal (the pre-r13 prober returned None at the first false sync)."""
    real = write_mp3_stub(6, with_id3=False)
    junk = bytes([0xFF, 0xFB, 0x00, 0x00,      # field-invalid (bitrate 0)
                  0xFF, 0xE0, 0x01, 0x02,      # wrong version/layer bits
                  0x41, 0x42])
    meta = probe_media_meta(junk + real)
    assert meta is not None and meta["container"] == "mp3"
    assert meta["sample_rate"] == 44100 and meta["channels"] == 2


def test_wav_odd_chunks_and_empty_data():
    """RIFF chunks pad to even sizes (the fmt walk must skip the pad
    byte), and a PRESENT-but-empty data chunk is duration 0, not
    unknown."""
    # odd-sized junk chunk before fmt: alignment must hold
    fmtc = (b"fmt " + (16).to_bytes(4, "little")
            + (1).to_bytes(2, "little") + (2).to_bytes(2, "little")
            + (8000).to_bytes(4, "little") + (32000).to_bytes(4, "little")
            + (4).to_bytes(2, "little") + (16).to_bytes(2, "little"))
    odd = b"junk" + (3).to_bytes(4, "little") + b"abc\x00"  # 3 + pad
    data = b"data" + (0).to_bytes(4, "little")
    body = odd + fmtc + data
    wav = b"RIFF" + (4 + len(body)).to_bytes(4, "little") + b"WAVE" + body
    meta = probe_media_meta(wav)
    assert meta == {"container": "wav", "width": None, "height": None,
                    "duration_ms": 0, "sample_rate": 8000, "channels": 2,
                    "codec": "pcm16"}
    # builder round-trip unchanged by the r13 edits
    good = probe_media_meta(write_wav(16000, 1, 16, 8000))
    assert good["duration_ms"] == 500 and good["sample_rate"] == 16000


def test_mp4_truncated_v1_mvhd_and_bad_largesize():
    """A version-1 mvhd whose body is cut before the 64-bit duration must
    NOT silently misread (pre-r13 it int.from_bytes'd a short slice);
    a largesize below the 16-byte header must stop the box walk."""
    short_mvhd = b"\x01" + b"\x00" * 23                  # 24-byte v1 body
    mvhd = (8 + len(short_mvhd)).to_bytes(4, "big") + b"mvhd" + short_mvhd
    moov = (8 + len(mvhd)).to_bytes(4, "big") + b"moov" + mvhd
    ftyp = (16).to_bytes(4, "big") + b"ftyp" + b"isom" + b"\x00" * 4
    meta = probe_media_meta(ftyp + moov)
    assert meta is not None and meta["duration_ms"] is None
    # largesize 12 (< 16): walk terminates instead of yielding garbage
    bad = ftyp + (1).to_bytes(4, "big") + b"moov" + (12).to_bytes(8, "big")
    assert probe_media_meta(bad) is None  # no moov parsed


def test_keep_best_long_chain_family(spark):
    """A 40-node path family (worst diameter for CC) resolves in the
    pointer-jumping loop's O(log d) rounds and elects exactly one
    keeper — the highest score, at the far end of the chain."""
    from memory_opensource_spark.operators.dedup import (
        keep_best_in_clusters)

    n = 40
    docs = spark.createDataFrame([(i,) for i in range(n)], "doc_id long")
    pairs = spark.createDataFrame([(i, i + 1) for i in range(n - 1)],
                                  "left_id long, right_id long")
    scores = spark.createDataFrame(
        [(i, float(i)) for i in range(n)], "doc_id long, q double")
    out = keep_best_in_clusters(docs, pairs, scores,
                                score_col="q").collect()
    assert len(out) == n
    assert all(r.cluster_id == 0 for r in out)
    assert all(r.keeper_id == n - 1 for r in out)
    assert sum(r.retained for r in out) == 1


def test_bpe_sentinel_and_markup_in_input(spark):
    """Input text containing the literal sentinel byte, the </w> symbol
    and regex metacharacters must encode exactly like its [a-z ]
    projection — the tokenization firewall (functions/bpe module
    docstring) makes sentinel/EOW INJECTION impossible (the symbols'
    non-letter characters become spaces; only the residual letter 'w'
    survives, as a legitimate word), and the encoded form must contain
    no unwrapped sentinel sequences."""
    from memory_opensource_spark.functions.bpe import (SEP, apply_bpe,
                                                       bpe_token_count,
                                                       seed_merges)

    merges = seed_merges(50)
    df = spark.createDataFrame(
        [("the data\x1f pipeline</w> (.*+?) runs",),
         ("the data pipeline w runs",)], "text string")  # the projection
    out = df.select(
        apply_bpe(F.col("text"), merges).alias("enc"),
        bpe_token_count(F.col("text"), merges).alias("n")).collect()
    assert out[0].enc == out[1].enc
    assert out[0].n == out[1].n > 0
    # every sentinel is structural: symbols alternate SEP<sym>SEP with
    # no free-floating SEP runs longer than 2
    assert SEP * 3 not in out[0].enc


def test_fold_punctuation_astral_parity(spark):
    """Astral-plane codepoints (surrogate pairs in the JVM) adjacent to
    fold characters: Spark translate and the DuckDB twin must agree —
    surrogate halves never match the BMP fold tables."""
    import duckdb

    from memory_opensource_spark.functions.text import (fold_punctuation,
                                                        fold_punctuation_sql)

    rows = [("\U0001F600“smile”—\U0001D11E music…",),
            ("𝄞“𝕏”– ‘𝒜’ \U0001F680（ﬀｕｌｌ）",),
            ("plain ascii stays",), (None,)]
    df = spark.createDataFrame(rows, "t string")
    got = [r.f for r in df.select(
        fold_punctuation(F.col("t")).alias("f")).collect()]
    con = duckdb.connect()
    want = []
    for (t,) in rows:
        if t is None:
            want.append(None)
            continue
        want.append(con.execute(
            "SELECT " + fold_punctuation_sql("?"), [t]).fetchone()[0])
    assert got == want
    assert got[0] == '\U0001F600"smile"-\U0001D11E music...'


def test_langid_arrow_kernel_non_bmp_parity(spark):
    """The packed-trigram Arrow kernel vs the Column spec on non-BMP
    text: both are codepoint-based (21-bit packing / UTF8String
    lengths), so rows with astral chars must agree exactly."""
    from memory_opensource_spark.functions.langid import (
        lang_id_ngram, lang_id_ngram_arrow)

    rows = [(0, "the quick brown fox jumps over the lazy dog again"),
            (1, "the \U0001F600 quick \U0001D11E brown fox jumps high"),
            (2, "\U0001F600\U0001F601\U0001F602"),
            (3, "der schnelle braune fuchs springt \U0001F680 hoch"),
            (4, "\U0001D49C\U0001D49E\U0001D4A2 the committee report")]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    a = {r.doc_id: (r.lang, r.lang_score)
         for r in lang_id_ngram(df).collect()}
    b = {r.doc_id: (r.lang, r.lang_score)
         for r in lang_id_ngram_arrow(df).collect()}
    assert a == b
