"""Multimodal plumbing tests: schema, batch shapes, frame sampling, search."""

import pytest
from pyspark.sql import functions as F

from memory_opensource_spark.sources import multimodal, tables

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def media(spark):
    docs = tables.load(spark, SF, "documents").filter(F.col("doc_id") < 30)
    return multimodal.build_media_table(docs)


def test_media_table_schema(media):
    assert dict(media.dtypes)["content"] == "binary"
    mods = {r.modality for r in media.select("modality").distinct().collect()}
    assert mods == {"image", "audio", "video"}
    audio = media.filter(F.col("modality") == "audio").first()
    assert audio.meta_width is None and audio.meta_duration_ms is not None


def test_decode_shapes_and_determinism(media):
    feats = multimodal.decode_features(media, frames_per_video=4)
    rows = feats.collect()
    by_mod = {}
    for r in rows:
        by_mod.setdefault(r.modality, []).append(r)
        assert len(r.feature) == multimodal.FEATURE_DIM
        assert all(0.0 <= x < 1.0 for x in r.feature)
    # video rows explode to 4 frames; image/audio to 1
    vids = {}
    for r in by_mod["video"]:
        vids.setdefault(r.media_id, []).append(r.frame_index)
    assert all(sorted(v) == [0, 1, 2, 3] for v in vids.values())
    assert all(r.frame_index == 0 for r in by_mod["image"])
    # deterministic across runs
    again = {(r.media_id, r.frame_index): r.feature
             for r in multimodal.decode_features(media).collect()}
    for r in rows:
        assert again[(r.media_id, r.frame_index)] == r.feature


def test_real_decode_rejects_library_formats(media):
    """The fixture media bytes are utf-8 text, not a container-decodable
    format: real=True must fail LOUDLY at execution (the libjpeg/ffmpeg
    seam), never silently fall back to the fake."""
    with pytest.raises(Exception, match="decodable|NotImplemented|seam"):
        multimodal.decode_features(media, real=True).collect()


def test_media_feature_search(media, spark):
    one = multimodal.decode_features(media).filter(
        (F.col("media_id") == "media0") & (F.col("frame_index") == 0)
    ).first()
    out = multimodal.media_feature_search(media, [float(x) for x in one.feature], 3).collect()
    assert out[0].feat_id == "media0#0"  # self-match ranks first
    assert len(out) == 3


def _ppm(w, h, rgb):
    """Binary P6 PPM with a constant color."""
    return (f"P6\n{w} {h}\n255\n".encode()
            + bytes(rgb) * (w * h))


def _wav(samples, rate=8000):
    """16-bit mono PCM WAV from float samples in [-1, 1]."""
    import struct

    import numpy as np

    pcm = (np.clip(np.asarray(samples), -1, 1) * 32767).astype("<i2").tobytes()
    hdr = (b"RIFF" + struct.pack("<I", 36 + len(pcm)) + b"WAVE"
           + b"fmt " + struct.pack("<IHHIIHH", 16, 1, 1, rate, rate * 2, 2, 16)
           + b"data" + struct.pack("<I", len(pcm)))
    return hdr + pcm


def test_real_decode_ppm_and_wav(spark):
    """real=True ACTUALLY decodes PPM images and PCM WAV audio (pure numpy,
    no codecs): bright vs dark images separate on luma features; loud vs
    quiet audio separates on energy — the features carry real signal, which
    the content-hash fake cannot."""
    import numpy as np

    from memory_opensource_spark.sources.multimodal import decode_features

    rows = [
        ("bright", "image", _ppm(8, 8, (250, 250, 250)), "image/x-portable-pixmap",
         8, 8, None),
        ("dark", "image", _ppm(8, 8, (5, 5, 5)), "image/x-portable-pixmap",
         8, 8, None),
        ("loud", "audio", _wav(np.sin(np.linspace(0, 60, 4000)) * 0.9),
         "audio/wav", None, None, 500),
        ("quiet", "audio", _wav(np.sin(np.linspace(0, 60, 4000)) * 0.05),
         "audio/wav", None, None, 500),
    ]
    media = spark.createDataFrame(rows, schema="media_id string, modality string, "
                                  "content binary, mime_type string, meta_width int, "
                                  "meta_height int, meta_duration_ms int")
    feats = {r.media_id: list(r.feature)
             for r in decode_features(media, real=True).collect()}
    assert all(f > 0.9 for f in feats["bright"])      # luma ~250/256
    assert all(f < 0.1 for f in feats["dark"])        # luma ~5/256
    assert np.mean(feats["loud"][:8]) > 5 * np.mean(feats["quiet"][:8])


def test_real_decode_video_container_and_unsupported(spark):
    """PAPRVID0 frame containers decode per-frame; non-decodable bytes under
    real=True fail LOUDLY (the library seam), never silently fake."""
    import struct

    import pytest

    from memory_opensource_spark.sources.multimodal import decode_features

    frames = [_ppm(4, 4, (200, 200, 200)), _ppm(4, 4, (10, 10, 10))]
    vid = (b"PAPRVID0" + struct.pack("<I", len(frames))
           + b"".join(struct.pack("<I", len(f)) + f for f in frames))
    media = spark.createDataFrame(
        [("v1", "video", vid, "video/x-paprvid", 4, 4, 1000)],
        schema="media_id string, modality string, content binary, mime_type string, "
               "meta_width int, meta_height int, meta_duration_ms int")
    out = decode_features(media, frames_per_video=2, real=True).collect()
    assert len(out) == 2 and {r.frame_index for r in out} == {0, 1}

    junk = spark.createDataFrame(
        [("j1", "image", b"\xff\xd8\xff\xe0 jpeg bytes", "image/jpeg",
          2, 2, None)],
        schema="media_id string, modality string, content binary, mime_type string, "
               "meta_width int, meta_height int, meta_duration_ms int")
    with pytest.raises(Exception, match="decodable|NotImplemented|seam"):
        decode_features(junk, real=True).collect()


def test_real_video_sampling_is_uniform(spark):
    """8 source frames sampled at frames_per_video=4 must hit source frames
    0,2,4,6 — evenly spread, no duplicates (the pre-fix stride duplicated
    middle frames). Frame luma encodes the source index so the picked frame
    is observable in the feature values."""
    import struct

    from memory_opensource_spark.sources.multimodal import decode_features

    frames = [_ppm(4, 4, (i * 32, i * 32, i * 32)) for i in range(8)]
    vid = (b"PAPRVID0" + struct.pack("<I", len(frames))
           + b"".join(struct.pack("<I", len(f)) + f for f in frames))
    media = spark.createDataFrame(
        [("v8", "video", vid, "video/x-paprvid", 4, 4, 1000)],
        schema="media_id string, modality string, content binary, mime_type string, "
               "meta_width int, meta_height int, meta_duration_ms int")
    out = decode_features(media, frames_per_video=4, real=True).collect()
    # luma of source frame i is i*32/256 = i/8
    picked = sorted(round(r.feature[0] * 8) for r in out)
    assert picked == [0, 2, 4, 6], picked


def test_malformed_ppm_falls_back_to_seam_error(spark):
    """A truncated/corrupt P6 header must surface the decoder-seam
    NotImplementedError, not a raw parse crash."""
    import pytest

    from memory_opensource_spark.sources.multimodal import decode_features

    rows = [("t1", "image", b"P6 not numbers", "image/x-portable-pixmap", 2, 2, None),
            ("t2", "image", b"P6 4 4 255 short", "image/x-portable-pixmap", 4, 4, None)]
    media = spark.createDataFrame(
        rows, schema="media_id string, modality string, content binary, "
                     "mime_type string, meta_width int, meta_height int, "
                     "meta_duration_ms int")
    with pytest.raises(Exception, match="decodable|seam"):
        decode_features(media, real=True).collect()


def test_malformed_wav_and_video_fall_back_to_seam_error(spark):
    """ADVICE r6: malformed WAV bytes (fmt chunk < 16 B, data size field past
    the buffer, odd-length 16-bit payload) and a truncated PAPRVID0 container
    must hit the decoder-seam NotImplementedError, not struct.error /
    np.frombuffer ValueError from inside the executor."""
    import struct

    import pytest

    from memory_opensource_spark.sources.multimodal import decode_features

    short_fmt = (b"RIFF" + struct.pack("<I", 20) + b"WAVE"
                 + b"fmt " + struct.pack("<I", 4) + b"\x01\x00\x01\x00")
    base = _wav([0.1, -0.2, 0.3])
    oversized = base.replace(struct.pack("<I", 6), struct.pack("<I", 1 << 20), 1)
    odd = base[:-1]  # odd-length int16 payload
    rows = [("w1", "audio", short_fmt), ("w2", "audio", oversized),
            ("w3", "audio", odd), ("v1", "video", b"PAPRVID0\x04")]
    media = spark.createDataFrame(
        [(i, m, c, "x", None, None, None) for i, m, c in rows],
        schema="media_id string, modality string, content binary, "
               "mime_type string, meta_width int, meta_height int, "
               "meta_duration_ms int")
    for mid in ["w1", "w3", "v1"]:
        one = media.filter(F.col("media_id") == mid)
        with pytest.raises(Exception, match="decodable|seam"):
            decode_features(one, real=True).collect()
    # oversized data-size field: slice truncates to the real payload, decode
    # still succeeds on what's actually there (no crash either way)
    got = decode_features(media.filter(F.col("media_id") == "w2"),
                          real=True).collect()
    assert len(got) == 1


def _png(pixels, ctype=2, filters=None):
    """Pure-Python PNG ENCODER for the decoder test (struct+zlib+crc32):
    8-bit, color type 2 (RGB) or 0 (gray), one chosen filter type per row —
    encoding is the exact inverse of the decoder's unfilter, so every
    filter path (None/Sub/Up/Average/Paeth) gets exercised."""
    import struct
    import zlib
    from binascii import crc32

    import numpy as np

    px = np.asarray(pixels, dtype=np.uint8)
    if ctype == 0 and px.ndim == 2:
        px = px[:, :, None]
    h, w, ch = px.shape
    bpp = ch
    filters = filters or [0] * h
    raw = bytearray()
    prev = np.zeros(w * ch, dtype=np.int32)
    for y in range(h):
        rec = px[y].reshape(-1).astype(np.int32)
        ft = filters[y % len(filters)]
        raw.append(ft)
        for x in range(w * ch):
            a = int(rec[x - bpp]) if x >= bpp else 0
            b = int(prev[x])
            c = int(prev[x - bpp]) if x >= bpp else 0
            if ft == 0:
                pred = 0
            elif ft == 1:
                pred = a
            elif ft == 2:
                pred = b
            elif ft == 3:
                pred = (a + b) // 2
            else:                              # Paeth
                p = a + b - c
                pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
                pred = a if pa <= pb and pa <= pc else (b if pb <= pc else c)
            raw.append((int(rec[x]) - pred) & 0xFF)
        prev = rec

    def chunk(cid, body):
        return (struct.pack(">I", len(body)) + cid + body
                + struct.pack(">I", crc32(cid + body) & 0xFFFFFFFF))

    ihdr = struct.pack(">IIBBBBB", w, h, 8, ctype, 0, 0, 0)
    return (b"\x89PNG\r\n\x1a\n" + chunk(b"IHDR", ihdr)
            + chunk(b"IDAT", zlib.compress(bytes(raw)))
            + chunk(b"IEND", b""))


def test_png_decoder_roundtrip_all_filters(spark):
    """r9 (VERDICT r8 task 9): the zlib PNG decoder recovers exact pixels
    through every scanline filter type, RGB and grayscale, and produces
    the SAME luma features as the identical pixels encoded as PPM."""
    import numpy as np

    from memory_opensource_spark.sources.multimodal import (
        _decode_png,
        decode_features,
    )

    rng = np.random.RandomState(3)
    px = rng.randint(0, 256, size=(12, 10, 3)).astype(np.uint8)
    for filters in ([0], [1], [2], [3], [4], [0, 1, 2, 3, 4]):
        got = _decode_png(_png(px, filters=filters))
        assert got is not None and np.array_equal(got, px), filters
    gray = rng.randint(0, 256, size=(6, 7)).astype(np.uint8)
    got = _decode_png(_png(gray, ctype=0, filters=[0, 1, 2]))
    assert np.array_equal(got, np.repeat(gray[:, :, None], 3, axis=2))

    # feature parity with the PPM path on identical pixels
    ppm = b"P6\n10 12\n255\n" + px.tobytes()
    rows = [("as_png", "image", _png(px, filters=[4, 3, 1]), "image/png",
             10, 12, None),
            ("as_ppm", "image", ppm, "image/x-portable-pixmap", 10, 12, None)]
    media = spark.createDataFrame(
        rows, schema="media_id string, modality string, content binary, "
        "mime_type string, meta_width int, meta_height int, "
        "meta_duration_ms int")
    feats = {r.media_id: list(r.feature)
             for r in decode_features(media, real=True).collect()}
    assert feats["as_png"] == feats["as_ppm"]


def test_png_unsupported_variants_stay_behind_seam(spark):
    """16-bit, palette and interlaced PNGs must return None from the
    decoder (and thus fail LOUDLY under real=True), never mis-decode."""
    import struct
    import zlib
    from binascii import crc32

    from memory_opensource_spark.sources.multimodal import _decode_png

    def png_with_ihdr(depth, ctype, interlace):
        ihdr = struct.pack(">IIBBBBB", 4, 4, depth, ctype, 0, 0, interlace)
        def chunk(cid, body):
            return (struct.pack(">I", len(body)) + cid + body
                    + struct.pack(">I", crc32(cid + body) & 0xFFFFFFFF))
        return (b"\x89PNG\r\n\x1a\n" + chunk(b"IHDR", ihdr)
                + chunk(b"IDAT", zlib.compress(b"\x00" * 100))
                + chunk(b"IEND", b""))

    assert _decode_png(png_with_ihdr(16, 2, 0)) is None    # 16-bit
    assert _decode_png(png_with_ihdr(8, 3, 0)) is None     # palette
    assert _decode_png(png_with_ihdr(8, 2, 1)) is None     # interlaced
    assert _decode_png(b"\x89PNG\r\n\x1a\nnot-a-chunk") is None
    assert _decode_png(b"GIF89a") is None


def _gif(px, local_table=False, version=b"89a", with_gce=False):
    """Pure-Python GIF encoder for the decoder roundtrip: quantizes the
    RGB pixels to their distinct colors (test images use few), writes a
    global or local color table, and emits the LZW stream in its simplest
    valid form — CLEAR first, one literal (root) code per pixel, CLEAR
    again whenever the implied decoder table hits 4096 — while mirroring
    the decoder's code-width growth schedule exactly."""
    import struct

    import numpy as np

    h, w, _ = px.shape
    flat = px.reshape(-1, 3)
    colors, idx = np.unique(flat, axis=0, return_inverse=True)
    n = len(colors)
    assert n <= 256, "GIF palettes hold at most 256 colors"
    # color-table size = 2^(s+1) >= max(n, 4); min_code >= 2
    s = 1
    while (2 << s) < max(n, 4):
        s += 1
    tbl_n = 2 << s
    table = np.zeros((tbl_n, 3), np.uint8)
    table[:n] = colors
    min_code = max(2, s + 1)
    clear, end = 1 << min_code, (1 << min_code) + 1

    bits, acc, nacc = bytearray(), 0, 0

    def emit(code, cs):
        nonlocal acc, nacc
        acc |= code << nacc
        nacc += cs
        while nacc >= 8:
            bits.append(acc & 0xFF)
            acc >>= 8
            nacc -= 8

    cs, nxt = min_code + 1, end + 1
    emit(clear, cs)
    prev_emitted = False
    for v in idx:
        emit(int(v), cs)
        if prev_emitted:                 # decoder adds an entry per code
            nxt += 1                     # (except the first after CLEAR)
            if nxt == (1 << cs) and cs < 12:
                cs += 1
        prev_emitted = True
        if nxt >= 4095:                  # keep clear margin before overflow
            emit(clear, cs)
            cs, nxt, prev_emitted = min_code + 1, end + 1, False
    emit(end, cs)
    if nacc:
        bits.append(acc & 0xFF)

    out = bytearray(b"GIF" + version)
    gct_flag = 0 if local_table else (0x80 | s)
    out += struct.pack("<HHBBB", w, h, gct_flag, 0, 0)
    if not local_table:
        out += table.tobytes()
    if with_gce:                         # graphic control extension skipped
        out += b"\x21\xf9\x04\x00\x00\x00\x00\x00"
    out += struct.pack("<BHHHHB", 0x2C, 0, 0, w, h,
                       (0x80 | s) if local_table else 0)
    if local_table:
        out += table.tobytes()
    out.append(min_code)
    for i in range(0, len(bits), 255):
        sub = bits[i:i + 255]
        out.append(len(sub))
        out += sub
    out += b"\x00\x3b"
    return bytes(out)


def test_gif_decoder_roundtrip(spark):
    """r10: the LZW GIF decoder recovers exact pixels (global and local
    color tables, 87a/89a, extension skipping, multi-sub-block streams,
    code-width growth past 2^cs) and produces the SAME luma features as
    identical pixels encoded as PPM."""
    import numpy as np

    from memory_opensource_spark.sources.multimodal import (
        _decode_gif,
        decode_features,
    )

    rng = np.random.RandomState(5)
    # few-color image (exercises small code sizes)
    pal = np.array([[0, 0, 0], [255, 0, 0], [0, 255, 0], [10, 20, 200]],
                   np.uint8)
    px = pal[rng.randint(0, 4, size=(12, 10))]
    for kwargs in ({}, {"local_table": True}, {"version": b"87a"},
                   {"with_gce": True}):
        got = _decode_gif(_gif(px, **kwargs))
        assert got is not None and np.array_equal(got, px), kwargs

    # 256-color image: forces the code width to GROW mid-stream (9 -> 10+)
    # and the stream across multiple 255-byte sub-blocks
    pal256 = rng.randint(0, 256, size=(256, 3)).astype(np.uint8)
    big = pal256[rng.randint(0, 256, size=(40, 30))]
    got = _decode_gif(_gif(big))
    assert got is not None and np.array_equal(got, big)

    # feature parity with the PPM path on identical pixels
    ppm = b"P6\n10 12\n255\n" + px.tobytes()
    rows = [("as_gif", "image", _gif(px), "image/gif", 10, 12, None),
            ("as_ppm", "image", ppm, "image/x-portable-pixmap", 10, 12,
             None)]
    media = spark.createDataFrame(
        rows, schema="media_id string, modality string, content binary, "
        "mime_type string, meta_width int, meta_height int, "
        "meta_duration_ms int")
    feats = {r.media_id: list(r.feature)
             for r in decode_features(media, real=True).collect()}
    assert feats["as_gif"] == feats["as_ppm"]


def test_gif_unsupported_variants_stay_behind_seam():
    """Interlace flag, missing color table, truncated streams and trailing
    garbage codes return None (fail loudly at the seam, never garbage)."""
    import struct

    import numpy as np

    from memory_opensource_spark.sources.multimodal import _decode_gif

    pal = np.array([[0, 0, 0], [255, 255, 255]], np.uint8)
    px = pal[np.zeros((4, 4), int)]
    good = _gif(px)
    assert _decode_gif(good) is not None
    assert _decode_gif(b"NOTGIF" + good[6:]) is None
    assert _decode_gif(good[:20]) is None            # truncated
    # set the interlace bit in the image descriptor
    i = good.index(b"\x2c")
    bad = bytearray(good)
    bad[i + 9] |= 0x40
    assert _decode_gif(bytes(bad)) is None
    # no global AND no local color table
    hdr = b"GIF89a" + struct.pack("<HHBBB", 4, 4, 0, 0, 0)
    assert _decode_gif(hdr + good[i:]) is None


def _jpeg(px, subsample=False, restart_interval=0, gray=False):
    """Pure-Python baseline JPEG encoder for the decoder roundtrip (r12) —
    the same role the in-test PNG/GIF encoders play: FDCT via the
    orthonormal 8x8 basis, ALL-ONES quantization tables (so the only loss
    is DCT/YCbCr rounding and, under ``subsample``, the 2x2 chroma box
    mean), simple canonical Huffman tables written into DHT (the decoder
    reads whatever tables the stream declares), FF byte-stuffing, optional
    4:2:0 subsampling and DRI/RSTn restart markers."""
    import math
    import struct

    import numpy as np

    px = np.asarray(px, dtype=np.float64)
    h_img, w_img = px.shape[:2]
    if gray:
        planes = [0.299 * px[:, :, 0] + 0.587 * px[:, :, 1]
                  + 0.114 * px[:, :, 2]] if px.ndim == 3 else [px]
        samp = [(1, 1)]
    else:
        y = 0.299 * px[:, :, 0] + 0.587 * px[:, :, 1] + 0.114 * px[:, :, 2]
        cb = 128.0 - 0.168736 * px[:, :, 0] - 0.331264 * px[:, :, 1] \
            + 0.5 * px[:, :, 2]
        cr = 128.0 + 0.5 * px[:, :, 0] - 0.418688 * px[:, :, 1] \
            - 0.081312 * px[:, :, 2]
        if subsample:
            def box2(p):
                hh = (p.shape[0] + 1) // 2 * 2
                ww = (p.shape[1] + 1) // 2 * 2
                q = np.pad(p, ((0, hh - p.shape[0]), (0, ww - p.shape[1])),
                           mode="edge")
                return q.reshape(hh // 2, 2, ww // 2, 2).mean(axis=(1, 3))
            planes, samp = [y, box2(cb), box2(cr)], [(2, 2), (1, 1), (1, 1)]
        else:
            planes, samp = [y, cb, cr], [(1, 1), (1, 1), (1, 1)]

    A = np.zeros((8, 8))
    for u in range(8):
        cu = (1.0 / math.sqrt(2.0)) if u == 0 else 1.0
        for x in range(8):
            A[u, x] = 0.5 * cu * math.cos((2 * x + 1) * u * math.pi / 16)
    zz = [0, 1, 8, 16, 9, 2, 3, 10, 17, 24, 32, 25, 18, 11, 4, 5,
          12, 19, 26, 33, 40, 48, 41, 34, 27, 20, 13, 6, 7, 14, 21, 28,
          35, 42, 49, 56, 57, 50, 43, 36, 29, 22, 15, 23, 30, 37, 44, 51,
          58, 59, 52, 45, 38, 31, 39, 46, 53, 60, 61, 54, 47, 55, 62, 63]

    # canonical Huffman tables: DC cats 0..11 at 4 bits; AC = EOB, ZRL and
    # every (run 0-15, size 1-10) symbol at 8 bits (162 codes, no all-ones)
    dc_counts = [0, 0, 0, 12] + [0] * 12
    dc_vals = list(range(12))
    ac_vals = [0x00, 0xF0] + [(r << 4) | s for r in range(16)
                              for s in range(1, 11)]
    ac_counts = [0] * 7 + [len(ac_vals)] + [0] * 8

    def canon(counts, vals):
        enc, code, vi = {}, 0, 0
        for ln in range(1, 17):
            for _ in range(counts[ln - 1]):
                enc[vals[vi]] = (ln, code)
                vi += 1
                code += 1
            code <<= 1
        return enc

    dc_enc, ac_enc = canon(dc_counts, dc_vals), canon(ac_counts, ac_vals)

    out = bytearray(b"\xff\xd8")                       # SOI

    def seg(marker, body):
        out.extend(bytes([0xFF, marker]) + struct.pack(">H", len(body) + 2)
                   + body)

    seg(0xDB, bytes([0]) + bytes([1] * 64))            # DQT id0, all ones
    nf = len(planes)
    sof = bytes([8]) + struct.pack(">HH", h_img, w_img) + bytes([nf])
    for ci, (hs, vs) in enumerate(samp):
        sof += bytes([ci + 1, (hs << 4) | vs, 0])
    seg(0xC0, sof)
    seg(0xC4, bytes([0x00]) + bytes(dc_counts) + bytes(dc_vals))
    seg(0xC4, bytes([0x10]) + bytes(ac_counts) + bytes(ac_vals))
    if restart_interval:
        seg(0xDD, struct.pack(">H", restart_interval))
    sos = bytes([nf])
    for ci in range(nf):
        sos += bytes([ci + 1, 0x00])
    seg(0xDA, sos + bytes([0, 63, 0]))

    class W:
        def __init__(self):
            self.buf, self.acc, self.nb = bytearray(), 0, 0

        def put(self, code, ln):
            self.acc = (self.acc << ln) | code
            self.nb += ln
            while self.nb >= 8:
                self.nb -= 8
                b = (self.acc >> self.nb) & 0xFF
                self.buf.append(b)
                if b == 0xFF:
                    self.buf.append(0x00)

        def flush(self):
            if self.nb:
                self.put((1 << (8 - self.nb)) - 1, 8 - self.nb)

    def cat(v):
        a, t = abs(v), 0
        while a:
            a >>= 1
            t += 1
        return t

    hmax = max(s[0] for s in samp)
    vmax = max(s[1] for s in samp)
    mx = -(-w_img // (8 * hmax))
    my = -(-h_img // (8 * vmax))
    padded = []
    for pl, (hs, vs) in zip(planes, samp):
        th, tw = my * vs * 8, mx * hs * 8
        padded.append(np.pad(pl, ((0, th - pl.shape[0]),
                                  (0, tw - pl.shape[1])), mode="edge"))

    w = W()
    pred = [0] * nf
    count = 0
    for myi in range(my):
        for mxi in range(mx):
            if restart_interval and count and count % restart_interval == 0:
                w.flush()
                out.extend(w.buf)
                w = W()
                out.extend(bytes([0xFF,
                                  0xD0 + ((count // restart_interval - 1)
                                          % 8)]))
                pred = [0] * nf
            count += 1
            for ci, (pl, (hs, vs)) in enumerate(zip(padded, samp)):
                for by in range(vs):
                    for bx in range(hs):
                        y0, x0 = (myi * vs + by) * 8, (mxi * hs + bx) * 8
                        blk = pl[y0:y0 + 8, x0:x0 + 8] - 128.0
                        co = A @ blk @ A.T
                        qz = np.round(co).astype(np.int64)
                        d = int(qz.flat[0]) - pred[ci]
                        pred[ci] = int(qz.flat[0])
                        t = cat(d)
                        ln, code = dc_enc[t]
                        w.put(code, ln)
                        if t:
                            w.put(d if d >= 0 else d + (1 << t) - 1, t)
                        run = 0
                        flat = qz.reshape(-1)
                        nz = [(k, int(flat[zz[k]])) for k in range(1, 64)
                              if flat[zz[k]]]
                        kprev = 0
                        for k, v in nz:
                            run = k - kprev - 1
                            kprev = k
                            while run > 15:
                                ln, code = ac_enc[0xF0]
                                w.put(code, ln)
                                run -= 16
                            s = cat(v)
                            ln, code = ac_enc[(run << 4) | s]
                            w.put(code, ln)
                            w.put(v if v >= 0 else v + (1 << s) - 1, s)
                        if kprev < 63:
                            ln, code = ac_enc[0x00]
                            w.put(code, ln)
    w.flush()
    out.extend(w.buf)
    out.extend(b"\xff\xd9")                            # EOI
    return bytes(out)


def test_jpeg_decoder_roundtrip_444(spark):
    """r12: the baseline-JPEG decoder recovers all-ones-quantized 4:4:4
    pixels within DCT/YCbCr rounding error, and produces luma features
    close to the identical pixels encoded as PPM (lossy codec — tolerance,
    where PNG/GIF pin exact)."""
    import numpy as np

    from memory_opensource_spark.sources.multimodal import (
        _decode_jpeg,
        decode_features,
    )

    rng = np.random.RandomState(7)
    px = rng.randint(0, 256, size=(13, 11, 3)).astype(np.uint8)
    got = _decode_jpeg(_jpeg(px))
    assert got is not None and got.shape == (13, 11, 3)
    err = np.abs(got.astype(np.int64) - px.astype(np.int64))
    assert err.max() <= 10 and err.mean() <= 2.5, (err.max(), err.mean())

    ppm = b"P6\n11 13\n255\n" + px.tobytes()
    rows = [("as_jpeg", "image", _jpeg(px), "image/jpeg", 11, 13, None),
            ("as_ppm", "image", ppm, "image/x-portable-pixmap", 11, 13,
             None)]
    media = spark.createDataFrame(
        rows, schema="media_id string, modality string, content binary, "
        "mime_type string, meta_width int, meta_height int, "
        "meta_duration_ms int")
    feats = {r.media_id: np.array(r.feature)
             for r in decode_features(media, real=True).collect()}
    assert np.abs(feats["as_jpeg"] - feats["as_ppm"]).max() < 0.02


def test_jpeg_decoder_420_restart_and_gray():
    """4:2:0 subsampling (chroma = replicated 2x2 box means), restart
    markers (predictors reset per interval), and 1-component grayscale."""
    import numpy as np

    from memory_opensource_spark.sources.multimodal import _decode_jpeg

    rng = np.random.RandomState(11)
    # smooth-ish image so 4:2:0 chroma loss stays bounded
    base = rng.randint(0, 256, size=(4, 4, 3)).astype(np.float64)
    px = np.clip(np.round(
        np.repeat(np.repeat(base, 8, axis=0), 8, axis=1)), 0,
        255).astype(np.uint8)                          # 32x32
    got = _decode_jpeg(_jpeg(px, subsample=True))
    assert got is not None and got.shape == px.shape
    err = np.abs(got.astype(np.int64) - px.astype(np.int64))
    assert err.max() <= 12, err.max()                  # constant 8x8 cells

    got_r = _decode_jpeg(_jpeg(px, subsample=True, restart_interval=1))
    assert got_r is not None
    assert np.array_equal(got_r, got)                  # restarts are lossless

    gray = rng.randint(0, 256, size=(9, 17, 3)).astype(np.uint8)
    got_g = _decode_jpeg(_jpeg(gray, gray=True))
    assert got_g is not None and got_g.shape == (9, 17, 3)
    luma = (0.299 * gray[:, :, 0] + 0.587 * gray[:, :, 1]
            + 0.114 * gray[:, :, 2])
    assert np.abs(got_g[:, :, 0].astype(np.float64) - luma).max() <= 4
    assert np.array_equal(got_g[:, :, 0], got_g[:, :, 1])


def test_jpeg_unsupported_variants_stay_behind_seam():
    """Progressive (SOF2), 12-bit, CMYK and truncated streams must return
    None (and thus fail LOUDLY under real=True), never mis-decode."""
    import numpy as np

    from memory_opensource_spark.sources.multimodal import _decode_jpeg

    rng = np.random.RandomState(3)
    px = rng.randint(0, 256, size=(8, 8, 3)).astype(np.uint8)
    good = _jpeg(px)
    assert _decode_jpeg(good) is not None

    prog = bytearray(good)
    i = prog.find(b"\xff\xc0")
    prog[i + 1] = 0xC2                                 # SOF2 progressive
    assert _decode_jpeg(bytes(prog)) is None

    twelve = bytearray(good)
    twelve[i + 4] = 12                                 # precision byte
    assert _decode_jpeg(bytes(twelve)) is None

    cmyk = bytearray(good)
    cmyk[i + 9] = 4                                    # Nf = 4
    assert _decode_jpeg(bytes(cmyk)) is None

    assert _decode_jpeg(good[:len(good) // 2]) is None  # truncated entropy
    assert _decode_jpeg(b"\xff\xd8\xff\xd9") is None    # no scan
    assert _decode_jpeg(b"GIF89a") is None


def _mp4_box(typ, body):
    import struct
    return struct.pack(">I", 8 + len(body)) + typ + body


def _mp4_fixture(width=640, height=360, timescale=1000, duration=7500,
                 codec=b"avc1"):
    import struct
    ftyp = _mp4_box(b"ftyp", b"isom\x00\x00\x02\x00isomiso2")
    mvhd = _mp4_box(b"mvhd", bytes(4) + bytes(8)
                    + struct.pack(">II", timescale, duration) + bytes(80))
    tkhd = _mp4_box(b"tkhd", bytes(4) + bytes(72)
                    + struct.pack(">II", width << 16, height << 16))
    stsd = _mp4_box(b"stsd", bytes(8) + _mp4_box(codec, bytes(70)))
    stbl = _mp4_box(b"stbl", stsd)
    minf = _mp4_box(b"minf", stbl)
    mdia = _mp4_box(b"mdia", minf)
    trak = _mp4_box(b"trak", tkhd + mdia)
    moov = _mp4_box(b"moov", mvhd + trak)
    return ftyp + moov + _mp4_box(b"mdat", b"\x00" * 32)


def _mp3_fixture(n_frames=10, with_id3=True):
    # MPEG1 Layer III, 128 kbps, 44100 Hz, joint stereo: FF FB 90 40
    frame_len = int(144 * 128000 / 44100)      # 417 bytes
    frame = b"\xff\xfb\x90\x40" + b"\x00" * (frame_len - 4)
    id3 = b"ID3\x03\x00\x00\x00\x00\x00\x0a" + b"\x00" * 10 \
        if with_id3 else b""
    return id3 + frame * n_frames


def test_probe_media_meta_all_containers(spark):
    """r12: probe_media_meta extracts real header/box facts for every
    supported container — including MP4 and MP3, whose PAYLOAD decode
    stays behind the library seam — and returns None for unknown bytes."""
    import numpy as np

    from memory_opensource_spark.sources.multimodal import (
        extract_media_meta,
        probe_media_meta,
    )

    rng = np.random.RandomState(5)
    px = rng.randint(0, 256, size=(12, 10, 3)).astype(np.uint8)
    ppm = b"P6\n10 12\n255\n" + px.tobytes()
    png = _png(px, filters=[0])
    jpg = _jpeg(px)
    gif = _gif(np.zeros((4, 6, 3), dtype=np.uint8))
    # 16-bit mono 8000 Hz WAV, 1 second
    import struct
    data = b"\x00\x00" * 8000
    wav = (b"RIFF" + struct.pack("<I", 36 + len(data)) + b"WAVE"
           + b"fmt " + struct.pack("<IHHIIHH", 16, 1, 1, 8000,
                                   16000, 2, 16)
           + b"data" + struct.pack("<I", len(data)) + data)
    mp4 = _mp4_fixture()
    mp3 = _mp3_fixture()

    m = probe_media_meta(ppm)
    assert (m["container"], m["width"], m["height"]) == ("ppm", 10, 12)
    m = probe_media_meta(png)
    assert (m["container"], m["width"], m["height"]) == ("png", 10, 12)
    m = probe_media_meta(jpg)
    assert (m["container"], m["width"], m["height"],
            m["codec"]) == ("jpeg", 10, 12, "baseline")
    m = probe_media_meta(gif)
    assert (m["container"], m["width"], m["height"]) == ("gif", 6, 4)
    m = probe_media_meta(wav)
    assert (m["container"], m["sample_rate"], m["channels"],
            m["duration_ms"], m["codec"]) == ("wav", 8000, 1, 1000,
                                              "pcm16")
    m = probe_media_meta(mp4)
    assert (m["container"], m["width"], m["height"], m["duration_ms"],
            m["codec"]) == ("mp4", 640, 360, 7500, "avc1")
    m = probe_media_meta(mp3)
    assert (m["container"], m["sample_rate"], m["channels"],
            m["codec"]) == ("mp3", 44100, 2, "mp3")
    assert 200 <= m["duration_ms"] <= 300      # 10 x 417B at 128 kbps
    assert probe_media_meta(b"not a known container") is None
    assert probe_media_meta(b"\xff\xd8truncated") is None

    rows = [("m_mp4", "video", mp4, "video/mp4", None, None, None),
            ("m_mp3", "audio", mp3, "audio/mpeg", None, None, None),
            ("m_png", "image", png, "image/png", None, None, None),
            ("m_bad", "image", b"junk", "application/octet-stream",
             None, None, None)]
    media = spark.createDataFrame(
        rows, schema="media_id string, modality string, content binary, "
        "mime_type string, meta_width int, meta_height int, "
        "meta_duration_ms int")
    got = {r.media_id: r.asDict() for r in
           extract_media_meta(media).collect()}
    assert got["m_mp4"]["width"] == 640 and got["m_mp4"]["codec"] == "avc1"
    assert got["m_mp3"]["sample_rate"] == 44100
    assert got["m_png"]["height"] == 12
    assert got["m_bad"]["container"] is None


def test_probe_media_meta_malformed_mp4_edges():
    """Box-walk robustness: missing moov, truncated largesize, zero-size
    box to end, and version-1 mvhd all behave (facts or None, no raise)."""
    import struct

    from memory_opensource_spark.sources.multimodal import probe_media_meta

    ftyp = _mp4_box(b"ftyp", b"isom\x00\x00\x02\x00")
    assert probe_media_meta(ftyp) is None                  # no moov
    # version-1 mvhd (64-bit times)
    mvhd1 = _mp4_box(b"mvhd", b"\x01" + bytes(3) + bytes(16)
                     + struct.pack(">I", 1000) + struct.pack(">Q", 2500)
                     + bytes(80))
    m = probe_media_meta(ftyp + _mp4_box(b"moov", mvhd1))
    assert m["duration_ms"] == 2500
    # truncated box claims more than the buffer: walk stops cleanly
    bad = ftyp + struct.pack(">I", 4096) + b"moov" + b"\x00" * 8
    assert probe_media_meta(bad) is None
