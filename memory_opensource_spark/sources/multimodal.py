"""Multimodal columns (north-star op): image/audio/video as opaque binary columns
with typed metadata, processed via Arrow-batched mapInPandas.

The container has no codec libraries, so decode coverage is split: PPM (P6),
PNG (stdlib zlib, r9), GIF (stdlib LZW, r10), baseline JPEG (pure-numpy
Huffman + IDCT, r12), PCM WAV and the PAPRVID0 frame container decode FOR
REAL (pure numpy/struct/zlib); formats that need a library decoder
(progressive/arithmetic JPEG, MP3/MP4) raise NotImplementedError when
`real=True` is requested — a
deterministic fake decoder (seeded from the content hash) stands in behind
the same signature otherwise.  Container METADATA, however, extracts for
real across the whole set including MP4 (ISO-BMFF box tree) and MP3
(frame header): ``probe_media_meta`` / ``extract_media_meta`` (r12) parse
headers only, never payloads.  Everything Spark-side — schema, partition
sizing, UDF signatures, batch shapes — is real and tested.

Design for 100 TB of media:
- binaryFile source with `spark.sql.files.maxPartitionBytes` tuned so one task
  holds a handful of blobs, not thousands (decode is CPU-bound, not IO-bound);
- metadata (width/height/duration/codec) lives in a sibling struct column so
  filters prune on parquet stats without touching bytes;
- features come back as fixed-width array<float> ready for the similarity ops.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    ArrayType,
    BinaryType,
    FloatType,
    IntegerType,
    StringType,
    StructField,
    StructType,
)

MEDIA_SCHEMA = StructType([
    StructField("media_id", StringType()),
    StructField("modality", StringType()),          # image | audio | video
    StructField("content", BinaryType()),            # opaque encoded bytes
    StructField("mime_type", StringType()),
    StructField("meta_width", IntegerType()),        # image/video
    StructField("meta_height", IntegerType()),
    StructField("meta_duration_ms", IntegerType()),  # audio/video
])

FEATURE_DIM = 16

DECODED_SCHEMA = StructType([
    StructField("media_id", StringType()),
    StructField("modality", StringType()),
    StructField("feature", ArrayType(FloatType())),   # pooled feature vector
    StructField("frame_index", IntegerType()),        # 0 for image/audio
])


def _fake_decode(content: bytes, modality: str, frame: int = 0) -> list[float]:
    """Deterministic stand-in for decode+feature-extract: FEATURE_DIM floats in
    [0,1) derived from sha256(content || ascii(frame)).  Replace with a real
    torchvision/librosa pipeline by swapping this function only.

    The frame suffix is ASCII decimal (not packed bytes) so the identical hash
    is expressible in the DuckDB oracle (``sha256(text || frame::VARCHAR)`` —
    its sha256 takes VARCHAR only); each b/256.0 is an exact binary fraction,
    so features — and the cosine scores built from them — are bit-identical
    across engines regardless of summation order."""
    h = hashlib.sha256(content + str(frame).encode("ascii")).digest()
    return [b / 256.0 for b in h[:FEATURE_DIM]]


def _decode_ppm(content: bytes):
    """Real decoder for binary PPM (P6) images — pure numpy, no codecs.
    Returns an (H, W, 3) uint8 array or None if not a P6 stream."""
    import numpy as np

    if not content.startswith(b"P6"):
        return None
    # header: magic, width, height, maxval — whitespace/comment separated
    fields, i = [], 2
    while len(fields) < 3 and i < len(content):
        while i < len(content) and content[i : i + 1].isspace():
            i += 1
        if content[i : i + 1] == b"#":  # comment to end of line
            while i < len(content) and content[i : i + 1] != b"\n":
                i += 1
            continue
        j = i
        while j < len(content) and not content[j : j + 1].isspace():
            j += 1
        try:
            fields.append(int(content[i:j]))
        except ValueError:
            return None  # non-numeric header token: not a valid P6 stream
        i = j
    i += 1  # single whitespace after maxval
    if len(fields) < 3:
        return None  # truncated header
    w, h, maxval = fields
    if maxval > 255 or w <= 0 or h <= 0 or len(content) - i < w * h * 3:
        return None  # 16-bit or truncated PPM stays behind the seam
    pix = np.frombuffer(content, dtype=np.uint8, count=w * h * 3, offset=i)
    return pix.reshape(h, w, 3)


def _decode_png(content: bytes):
    """Real decoder for PNG (r9, VERDICT r8 task 9) — stdlib zlib + numpy,
    no libpng: 8-bit depth, color types 0/2/4/6 (gray, RGB, gray+alpha,
    RGBA), non-interlaced, all five scanline filters (None/Sub/Up/Average/
    Paeth).  Returns an (H, W, 3) uint8 array (gray broadcast to 3 channels,
    alpha dropped) or None when the bytes are not a supported PNG (16-bit,
    palette, interlaced stay behind the library seam).  Sub unfilters via a
    strided cumsum; Average/Paeth are inherently left+up sequential and loop
    per byte — fine for the audit/test path this decoder serves."""
    import struct
    import zlib

    import numpy as np

    if not content.startswith(b"\x89PNG\r\n\x1a\n"):
        return None
    i, ihdr, idat = 8, None, []
    while i + 8 <= len(content):
        ln, cid = struct.unpack(">I4s", content[i:i + 8])
        body = content[i + 8:i + 8 + ln]
        if len(body) < ln:
            return None                      # truncated chunk
        if cid == b"IHDR":
            ihdr = struct.unpack(">IIBBBBB", body[:13])
        elif cid == b"IDAT":
            idat.append(body)
        elif cid == b"IEND":
            break
        i += 12 + ln                         # len + type + body + crc
    if ihdr is None or not idat:
        return None
    w, h, depth, ctype, comp, filt, interlace = ihdr
    channels = {0: 1, 2: 3, 4: 2, 6: 4}.get(ctype)
    if (depth != 8 or channels is None or comp != 0 or filt != 0
            or interlace != 0 or w <= 0 or h <= 0):
        return None
    try:
        raw = zlib.decompress(b"".join(idat))
    except zlib.error:
        return None
    stride = w * channels
    if len(raw) < h * (stride + 1):
        return None
    out = np.zeros((h, stride), dtype=np.uint8)
    prev = np.zeros(stride, dtype=np.uint8)
    bpp = channels
    pos = 0
    for y in range(h):
        ft = raw[pos]
        line = np.frombuffer(raw, dtype=np.uint8,
                             count=stride, offset=pos + 1).copy()
        pos += stride + 1
        if ft == 0:
            rec = line
        elif ft == 1:                        # Sub: strided cumsum per phase
            rec = line
            for p in range(bpp):
                rec[p::bpp] = np.cumsum(rec[p::bpp], dtype=np.uint64) \
                    .astype(np.uint8)
        elif ft == 2:                        # Up
            rec = line + prev
        elif ft == 3:                        # Average: left+up sequential
            rec = line
            for x in range(stride):
                left = int(rec[x - bpp]) if x >= bpp else 0
                rec[x] = (int(rec[x]) + (left + int(prev[x])) // 2) & 0xFF
        elif ft == 4:                        # Paeth
            rec = line
            for x in range(stride):
                a = int(rec[x - bpp]) if x >= bpp else 0
                b = int(prev[x])
                c = int(prev[x - bpp]) if x >= bpp else 0
                p = a + b - c
                pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
                pred = a if pa <= pb and pa <= pc else (b if pb <= pc else c)
                rec[x] = (int(rec[x]) + pred) & 0xFF
        else:
            return None                      # unknown filter type
        out[y] = rec
        prev = rec
    px = out.reshape(h, w, channels)
    if ctype == 0:
        return np.repeat(px, 3, axis=2)
    if ctype == 2:
        return px
    if ctype == 4:
        return np.repeat(px[:, :, :1], 3, axis=2)
    return px[:, :, :3]                      # RGBA -> RGB


def _lzw_decode_gif(min_code: int, data: bytes, npix: int):
    """GIF-variant LZW decode (LSB-first bit packing, CLEAR/END codes,
    code width grows when the next table slot reaches 2^width, capped at
    12 bits).  Returns a list of color-table indices (length <= npix) or
    None on a malformed stream — decode-tolerant like the PNG path."""
    if not 2 <= min_code <= 11:
        return None
    clear = 1 << min_code
    end = clear + 1
    table = {i: (i,) for i in range(clear)}
    cs = min_code + 1
    nxt = end + 1
    prev = None
    out: list[int] = []
    pos, total_bits = 0, len(data) * 8
    while pos + cs <= total_bits and len(out) < npix:
        bi, bo = pos >> 3, pos & 7
        chunk = int.from_bytes(data[bi:bi + 4], "little")
        code = (chunk >> bo) & ((1 << cs) - 1)
        pos += cs
        if code == clear:
            table = {i: (i,) for i in range(clear)}
            cs, nxt, prev = min_code + 1, end + 1, None
            continue
        if code == end:
            break
        if prev is None:
            entry = table.get(code)
            if entry is None:
                return None
        else:
            if code in table:
                entry = table[code]
            elif code == nxt:
                entry = prev + (prev[0],)    # the KwKwK case
            else:
                return None                  # code beyond the table
            if nxt < 4096:
                table[nxt] = prev + (entry[0],)
                nxt += 1
                if nxt == (1 << cs) and cs < 12:
                    cs += 1
        out.extend(entry)
        prev = entry
    return out[:npix]


def _decode_gif(content: bytes):
    """Real decoder for GIF (r10 — the second compressed codec behind the
    seam, after r9's PNG): stdlib-only LZW over the FIRST image descriptor,
    global or local color table, 87a and 89a, extension blocks skipped.
    Returns an (H, W, 3) uint8 array or None when the bytes are not a
    supported GIF (interlaced frames and streams without any color table
    stay behind the library seam; animations: the first frame IS the image
    — multi-frame media belongs in the video modality/container)."""
    import struct

    import numpy as np

    if content[:6] not in (b"GIF87a", b"GIF89a") or len(content) < 13:
        return None
    sw, sh, packed, _bg, _ar = struct.unpack("<HHBBB", content[6:13])
    i = 13
    gct = None
    if packed & 0x80:
        n = 2 << (packed & 0x07)
        if i + 3 * n > len(content):
            return None
        gct = np.frombuffer(content, np.uint8, 3 * n, i).reshape(n, 3)
        i += 3 * n
    while i < len(content):
        b = content[i]
        if b == 0x3B:                        # trailer
            return None                      # no image descriptor seen
        if b == 0x21:                        # extension: label + sub-blocks
            i += 2
            while i < len(content) and content[i] != 0:
                i += 1 + content[i]
            i += 1
            continue
        if b != 0x2C:                        # not an image descriptor
            return None
        if i + 10 > len(content):
            return None
        _l, _t, w, h, ip = struct.unpack("<HHHHB", content[i + 1:i + 10])
        i += 10
        if ip & 0x40:                        # interlaced: behind the seam
            return None
        ct = gct
        if ip & 0x80:                        # local color table
            n = 2 << (ip & 0x07)
            if i + 3 * n > len(content):
                return None
            ct = np.frombuffer(content, np.uint8, 3 * n, i).reshape(n, 3)
            i += 3 * n
        if ct is None or w <= 0 or h <= 0 or i >= len(content):
            return None
        min_code = content[i]
        i += 1
        data = bytearray()                   # concatenate the sub-blocks
        while i < len(content) and content[i] != 0:
            ln = content[i]
            data += content[i + 1:i + 1 + ln]
            i += 1 + ln
        idx = _lzw_decode_gif(min_code, bytes(data), w * h)
        if idx is None or len(idx) < w * h:
            return None
        arr = np.asarray(idx, dtype=np.int64)
        if arr.max() >= len(ct):
            return None                      # index past the color table
        return ct[arr].reshape(h, w, 3)
    return None


# natural coefficient index for each zigzag position (ITU-T T.81 fig. 5)
_JPEG_ZZ = [
    0, 1, 8, 16, 9, 2, 3, 10, 17, 24, 32, 25, 18, 11, 4, 5,
    12, 19, 26, 33, 40, 48, 41, 34, 27, 20, 13, 6, 7, 14, 21, 28,
    35, 42, 49, 56, 57, 50, 43, 36, 29, 22, 15, 23, 30, 37, 44, 51,
    58, 59, 52, 45, 38, 31, 39, 46, 53, 60, 61, 54, 47, 55, 62, 63,
]


class _JpegTrunc(Exception):
    """Entropy data ran out mid-block — decode-tolerant None, never a
    task failure."""


class _JpegBits:
    """MSB-first bit reader over one entropy-coded segment (byte-stuffing
    already removed)."""
    __slots__ = ("d", "p", "acc", "nb")

    def __init__(self, d: bytes):
        self.d, self.p, self.acc, self.nb = d, 0, 0, 0

    def get(self, k: int) -> int:
        while self.nb < k:
            if self.p >= len(self.d):
                raise _JpegTrunc
            self.acc = (self.acc << 8) | self.d[self.p]
            self.p += 1
            self.nb += 8
        self.nb -= k
        return (self.acc >> self.nb) & ((1 << k) - 1)


def _jpeg_hdecode(bits: _JpegBits, table: dict) -> int:
    code = 0
    for ln in range(1, 17):
        code = (code << 1) | bits.get(1)
        v = table.get((ln, code))
        if v is not None:
            return v
    raise _JpegTrunc


def _jpeg_extend(v: int, t: int) -> int:
    """ITU-T T.81 EXTEND: map the t received magnitude bits to the signed
    coefficient value."""
    if t and v < (1 << (t - 1)):
        return v - (1 << t) + 1
    return v


def _decode_jpeg(content: bytes):
    """Real decoder for baseline JPEG (r12) — pure numpy, no libjpeg:
    sequential DCT with Huffman coding (SOF0/SOF1), 8-bit precision,
    grayscale or 3-component YCbCr (JFIF full-range BT.601), sampling
    factors 1/2/4 per axis (4:4:4, 4:2:2, 4:2:0, ...), 8- and 16-bit
    quantization tables, restart markers (DRI/RSTn), chroma upsampled by
    pixel replication.  Progressive (SOF2), lossless, arithmetic-coded,
    12-bit and CMYK streams return None — they stay behind the
    documented library seam, like 16-bit PNG — as do truncated or
    malformed streams (decode-tolerant, CRC-free like the PNG path).
    Returns an (H, W, 3) uint8 array or None."""
    import math

    import numpy as np

    if not content.startswith(b"\xff\xd8"):
        return None
    n = len(content)
    qt: dict[int, "np.ndarray"] = {}
    huff: dict[tuple, dict] = {}
    comps = None                         # [(cid, h, v, tq), ...]
    height = width = 0
    ri = 0
    smap = None                          # [(cid, td, ta), ...]
    dstart = -1
    i = 2
    try:
        while i < n:
            if content[i] != 0xFF:
                return None
            while i < n and content[i] == 0xFF:
                i += 1                   # fill bytes before the marker
            if i >= n:
                return None
            m = content[i]
            i += 1
            if m == 0xD9:                # EOI before any scan
                return None
            if m == 0x01 or 0xD0 <= m <= 0xD7:
                continue                 # standalone markers
            if i + 2 > n:
                return None
            ln = int.from_bytes(content[i:i + 2], "big")
            seg = content[i + 2:i + ln]
            if ln < 2 or len(seg) != ln - 2:
                return None
            if m == 0xDB:                # DQT (tables arrive zigzagged)
                p = 0
                while p < len(seg):
                    pq, tq = seg[p] >> 4, seg[p] & 15
                    p += 1
                    if pq == 0:
                        vals = np.frombuffer(seg[p:p + 64], dtype=np.uint8)
                        p += 64
                    else:
                        vals = np.frombuffer(seg[p:p + 128], dtype=">u2")
                        p += 128
                    if len(vals) != 64:
                        return None
                    qt[tq] = vals.astype(np.int64)
            elif m in (0xC0, 0xC1):      # baseline / ext. sequential DCT
                if seg[0] != 8:
                    return None          # 12-bit precision: behind the seam
                height = int.from_bytes(seg[1:3], "big")
                width = int.from_bytes(seg[3:5], "big")
                nf = seg[5]
                if nf not in (1, 3) or len(seg) < 6 + 3 * nf:
                    return None          # CMYK/unknown: behind the seam
                comps = []
                for c in range(nf):
                    cid, hv, tq_ = seg[6 + 3 * c], seg[7 + 3 * c], seg[8 + 3 * c]
                    h, v = hv >> 4, hv & 15
                    if h not in (1, 2, 4) or v not in (1, 2, 4):
                        return None
                    comps.append((cid, h, v, tq_))
            elif m in (0xC2, 0xC3, 0xC5, 0xC6, 0xC7,
                       0xC9, 0xCA, 0xCB, 0xCD, 0xCE, 0xCF):
                return None              # progressive/lossless/arithmetic
            elif m == 0xC4:              # DHT
                p = 0
                while p + 17 <= len(seg):
                    tc, th = seg[p] >> 4, seg[p] & 15
                    counts = seg[p + 1:p + 17]
                    p += 17
                    table = {}
                    code = 0
                    for lbits in range(1, 17):
                        for _ in range(counts[lbits - 1]):
                            if p >= len(seg):
                                return None
                            table[(lbits, code)] = seg[p]
                            p += 1
                            code += 1
                        code <<= 1
                    huff[(tc, th)] = table
            elif m == 0xDD:              # DRI
                ri = int.from_bytes(seg[0:2], "big")
            elif m == 0xDA:              # SOS — entropy data follows
                ns = seg[0]
                if comps is None or ns != len(comps):
                    return None          # multi-scan: not baseline
                smap = []
                for c in range(ns):
                    cs, tt = seg[1 + 2 * c], seg[2 + 2 * c]
                    smap.append((cs, tt >> 4, tt & 15))
                dstart = i + ln
                break
            i += ln                      # APPn/COM/unknown: skip
        if comps is None or smap is None or height <= 0 or width <= 0:
            return None

        # split entropy data on restart markers, unstuffing FF00 -> FF
        segs, cur, p = [], bytearray(), dstart
        while p < n:
            b = content[p]
            if b != 0xFF:
                cur.append(b)
                p += 1
                continue
            nb = content[p + 1] if p + 1 < n else 0xD9
            if nb == 0x00:
                cur.append(0xFF)
                p += 2
            elif 0xD0 <= nb <= 0xD7:
                segs.append(bytes(cur))
                cur = bytearray()
                p += 2
            else:
                break                    # EOI / next marker ends the scan
        segs.append(bytes(cur))

        # orthonormal 8x8 DCT basis: spatial = A.T @ coeffs @ A
        A = np.zeros((8, 8))
        for u in range(8):
            cu = (1.0 / math.sqrt(2.0)) if u == 0 else 1.0
            for x in range(8):
                A[u, x] = 0.5 * cu * math.cos((2 * x + 1) * u * math.pi / 16)

        hmax = max(c[1] for c in comps)
        vmax = max(c[2] for c in comps)
        mx = -(-width // (8 * hmax))
        my = -(-height // (8 * vmax))
        planes = {cid: np.zeros((my * v * 8, mx * h * 8))
                  for cid, h, v, _ in comps}
        by_id = {cid: (h, v, tq_) for cid, h, v, tq_ in comps}
        for cs, td, ta in smap:
            if cs not in by_id:
                return None
            h, v, tq_ = by_id[cs]
            if tq_ not in qt or (0, td) not in huff or (1, ta) not in huff:
                return None
        pred = {cid: 0 for cid, *_ in comps}
        seg_idx = 0
        bits = _JpegBits(segs[0])
        count = 0
        zz = _JPEG_ZZ
        for myi in range(my):
            for mxi in range(mx):
                if ri and count and count % ri == 0:
                    seg_idx += 1
                    if seg_idx >= len(segs):
                        return None      # missing restart segment
                    bits = _JpegBits(segs[seg_idx])
                    pred = {cid: 0 for cid, *_ in comps}
                count += 1
                for cs, td, ta in smap:
                    h, v, tq_ = by_id[cs]
                    q = qt[tq_]
                    dct, act = huff[(0, td)], huff[(1, ta)]
                    for by in range(v):
                        for bx in range(h):
                            coef = np.zeros(64)
                            t = _jpeg_hdecode(bits, dct)
                            if t > 11:
                                return None
                            diff = _jpeg_extend(bits.get(t), t) if t else 0
                            pred[cs] += diff
                            coef[0] = pred[cs] * q[0]
                            k = 1
                            while k < 64:
                                rs = _jpeg_hdecode(bits, act)
                                r, s = rs >> 4, rs & 15
                                if s == 0:
                                    if r == 15:
                                        k += 16
                                        continue
                                    break            # EOB
                                k += r
                                if k > 63:
                                    return None
                                coef[zz[k]] = (_jpeg_extend(bits.get(s), s)
                                               * q[k])
                                k += 1
                            block = A.T @ coef.reshape(8, 8) @ A + 128.0
                            y0 = (myi * v + by) * 8
                            x0 = (mxi * h + bx) * 8
                            planes[cs][y0:y0 + 8, x0:x0 + 8] = block
        chans = []
        for cid, h, v, _ in comps:
            pl = np.repeat(np.repeat(planes[cid], vmax // v, axis=0),
                           hmax // h, axis=1)
            chans.append(pl[:height, :width])
        if len(chans) == 1:
            g = np.clip(np.round(chans[0]), 0, 255).astype(np.uint8)
            return np.repeat(g[:, :, None], 3, axis=2)
        yy, cb, cr = chans
        rgb = np.stack([yy + 1.402 * (cr - 128.0),
                        yy - 0.344136 * (cb - 128.0)
                        - 0.714136 * (cr - 128.0),
                        yy + 1.772 * (cb - 128.0)], axis=2)
        return np.clip(np.round(rgb), 0, 255).astype(np.uint8)
    except (_JpegTrunc, IndexError, ValueError):
        return None


def _decode_wav(content: bytes):
    """Real decoder for PCM WAV (RIFF, 8/16-bit) — pure struct/numpy.
    Returns a float64 mono signal in [-1, 1] or None if not PCM WAV."""
    import struct

    import numpy as np

    if content[:4] != b"RIFF" or content[8:12] != b"WAVE":
        return None
    i, fmt, data = 12, None, None
    while i + 8 <= len(content):
        cid, size = content[i : i + 4], struct.unpack("<I", content[i + 4 : i + 8])[0]
        body = content[i + 8 : i + 8 + size]
        if cid == b"fmt ":
            if len(body) < 16:  # malformed fmt chunk: stay behind the seam
                return None
            fmt = struct.unpack("<HHIIHH", body[:16])
        elif cid == b"data":
            data = body  # slice already truncates a size field past the buffer
        i += 8 + size + (size % 2)
    if fmt is None or data is None or fmt[0] != 1:  # PCM only
        return None
    n_channels, bits = fmt[1], fmt[5]
    if bits == 16:
        if len(data) % 2:  # odd-length int16 payload: malformed, stay behind seam
            return None
        sig = np.frombuffer(data, dtype="<i2").astype("float64") / 32768.0
    elif bits == 8:
        sig = (np.frombuffer(data, dtype=np.uint8).astype("float64") - 128.0) / 128.0
    else:
        return None
    if n_channels > 1:
        sig = sig[: len(sig) // n_channels * n_channels]
        sig = sig.reshape(-1, n_channels).mean(axis=1)
    return sig


def _real_features(content: bytes, modality: str, frame: int = 0,
                   total_frames: int = 1):
    """REAL feature extraction for container-decodable formats:

    - image (PPM P6, PNG via zlib, GIF via LZW, baseline JPEG via
      Huffman+IDCT): resize to 4x4 via
      box-averaging (area interpolation),
      luma of each cell -> 16 features in [0, 1).
    - audio (PCM WAV): 8-bin energy envelope + 8-bin amplitude histogram.
    - video (concatenated PPM frames, ``PAPRVID0`` container): per-frame
      image features over uniformly-sampled frames.

    Returns None when the bytes are not a supported format (caller falls
    back to the deterministic fake — compressed formats stay behind the
    library seam)."""
    import numpy as np

    if modality == "video" and content.startswith(b"PAPRVID0"):
        # trivial container: u32 frame count, then length-prefixed P6 frames
        import struct

        if len(content) < 12:
            return None  # magic but no frame count: truncated container
        n = struct.unpack("<I", content[8:12])[0]
        frames, i = [], 12
        for _ in range(n):
            if i + 4 > len(content):
                return None  # truncated container
            ln = struct.unpack("<I", content[i : i + 4])[0]
            frames.append(content[i + 4 : i + 4 + ln])
            i += 4 + ln
        if not frames:
            return None
        # uniform sampling: requested frame f of total_frames maps to source
        # frame f*n/total — evenly spread, no duplicates while n >= total
        pick = frames[min(frame * len(frames) // max(total_frames, 1),
                          len(frames) - 1)]
        return _real_features(pick, "image", 0)
    if modality == "image":
        img = _decode_ppm(content)
        if img is None:
            img = _decode_png(content)       # r9: compressed-codec coverage
        if img is None:
            img = _decode_gif(content)       # r10: LZW coverage
        if img is None:
            img = _decode_jpeg(content)      # r12: baseline DCT coverage
        if img is None:
            return None
        h, w, _ = img.shape
        # luma then 4x4 box-average resize (crop to divisible grid)
        luma = (0.299 * img[:, :, 0] + 0.587 * img[:, :, 1]
                + 0.114 * img[:, :, 2])
        gh, gw = max(1, h // 4), max(1, w // 4)
        luma = luma[: gh * 4, : gw * 4].reshape(4, gh, 4, gw)
        cells = luma.mean(axis=(1, 3)) / 256.0
        return [float(x) for x in cells.flatten()[:FEATURE_DIM]]
    if modality == "audio":
        sig = _decode_wav(content)
        if sig is None or len(sig) == 0:
            return None
        seg = np.array_split(sig, 8)
        energy = [float(np.sqrt((s ** 2).mean())) if len(s) else 0.0 for s in seg]
        hist, _ = np.histogram(np.abs(sig), bins=8, range=(0.0, 1.0))
        hist = (hist / max(1, len(sig))).tolist()
        return [min(x, 0.999999) for x in energy + hist][:FEATURE_DIM]
    return None


def decode_features(media: DataFrame, frames_per_video: int = 4,
                    real: bool = False) -> DataFrame:
    """Decode/feature-extract every media row via mapInPandas.

    - image/audio -> one feature row (frame_index 0)
    - video       -> ``frames_per_video`` uniformly-sampled frame rows

    ``real=True`` decodes container-supported formats FOR REAL (PPM P6,
    PNG, GIF and baseline JPEG images, PCM WAV audio, the PAPRVID0 frame
    container — stdlib zlib/numpy, no external codecs) and raises on bytes
    that need a library decoder (progressive/arithmetic JPEG, MP3/MP4 —
    the libjpeg/ffmpeg seam, swap ``_real_features``).
    Default keeps the deterministic fake (oracle-checkable)."""

    def compute(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            # column-zip, not iterrows: avoids a Series per row
            for media_id, modality, raw in zip(
                    pdf["media_id"], pdf["modality"], pdf["content"]):
                content = bytes(raw) if raw is not None else b""
                n_frames = frames_per_video if modality == "video" else 1
                for f_idx in range(n_frames):
                    if real:
                        feat = _real_features(content, modality, f_idx,
                                              total_frames=n_frames)
                        if feat is None:
                            raise NotImplementedError(
                                f"media {media_id}: bytes are not a "
                                "container-decodable format (PPM/PNG/GIF/"
                                "baseline-JPEG/WAV/PAPRVID0) — remaining "
                                "compressed formats need the "
                                "libjpeg/ffmpeg seam (_real_features)")
                        feat = feat + [0.0] * (FEATURE_DIM - len(feat))
                    else:
                        feat = _fake_decode(content, modality, f_idx)
                    rows.append((media_id, modality, feat, f_idx))
            yield pd.DataFrame(rows, columns=["media_id", "modality", "feature", "frame_index"])

    return media.mapInPandas(compute, DECODED_SCHEMA)


def build_media_table(docs: DataFrame, id_col: str = "doc_id",
                      text_col: str = "text") -> DataFrame:
    """Derive a synthetic media table from documents (test fixture): bytes are
    the utf-8 text, modality round-robins image/audio/video, metadata derived
    arithmetically."""
    i = F.col(id_col)
    modality = F.element_at(
        F.array(F.lit("image"), F.lit("audio"), F.lit("video")), (i % 3 + 1).cast("int")
    )
    return docs.select(
        F.concat(F.lit("media"), i.cast("string")).alias("media_id"),
        modality.alias("modality"),
        F.encode(F.col(text_col), "utf-8").alias("content"),
        F.when(modality == "image", "image/jpeg")
        .when(modality == "audio", "audio/wav")
        .otherwise("video/mp4")
        .alias("mime_type"),
        F.when(modality != "audio", (i % 1920).cast("int")).alias("meta_width"),
        F.when(modality != "audio", (i % 1080).cast("int")).alias("meta_height"),
        F.when(modality != "image", (i * 100 % 60000).cast("int")).alias("meta_duration_ms"),
    )


def media_feature_search(media: DataFrame, query_feature: list[float], k: int,
                         modality: str | None = None) -> DataFrame:
    """Compose decode -> cosine top-k over features (the multimodal read path)."""
    from ..operators.similarity import topk_search

    feats = decode_features(media)
    if modality:
        feats = feats.filter(F.col("modality") == modality)
    feats = feats.withColumn(
        "feat_id", F.concat_ws("#", "media_id", F.col("frame_index").cast("string"))
    )
    return topk_search(feats, query_feature, k, vec_col="feature", id_col="feat_id",
                       score_threshold=None)


# MPEG1 Layer III bitrate (kbps) and sample-rate tables (ISO 11172-3)
_MP3_BITRATES = [0, 32, 40, 48, 56, 64, 80, 96, 112, 128,
                 160, 192, 224, 256, 320]
_MP3_RATES = [44100, 48000, 32000]


def probe_media_meta(content: bytes) -> dict | None:
    """REAL container-metadata extraction WITHOUT any codec work (r12):
    parse just the headers/box tree and return
    ``{container, width, height, duration_ms, sample_rate, channels,
    codec}`` (absent facts None).  Pure struct/int parsing — this is the
    piece that populates the typed ``meta_*`` sibling columns so filters
    prune on parquet stats without ever touching payload bytes, INCLUDING
    for the formats whose payload decode stays behind the library seam
    (MP4 box tree, MP3 frame header).  Formats: PPM/PNG/GIF/baseline-JPEG
    dims, WAV audio facts, ISO-BMFF (MP4) movie/track facts, MPEG1
    Layer III frame facts.  Unknown/malformed bytes -> None
    (decode-tolerant, like the pixel decoders)."""
    import struct

    if content.startswith(b"P6"):
        img = _decode_ppm(content)
        if img is None:
            return None
        h, w, _ = img.shape
        return {"container": "ppm", "width": w, "height": h,
                "duration_ms": None, "sample_rate": None,
                "channels": None, "codec": "rawrgb"}
    if content.startswith(b"\x89PNG\r\n\x1a\n") and len(content) >= 24:
        w, h = struct.unpack(">II", content[16:24])
        return {"container": "png", "width": w, "height": h,
                "duration_ms": None, "sample_rate": None,
                "channels": None, "codec": "deflate"}
    if content[:6] in (b"GIF87a", b"GIF89a") and len(content) >= 10:
        w, h = struct.unpack("<HH", content[6:10])
        return {"container": "gif", "width": w, "height": h,
                "duration_ms": None, "sample_rate": None,
                "channels": None, "codec": "lzw"}
    if content.startswith(b"\xff\xd8"):
        # walk markers to the first SOFn for dimensions — no entropy decode
        i, n = 2, len(content)
        while i + 4 <= n:
            if content[i] != 0xFF:
                return None
            while i < n and content[i] == 0xFF:
                i += 1
            if i >= n:
                return None
            m = content[i]
            i += 1
            if m in (0x01, 0xD9) or 0xD0 <= m <= 0xD7:
                continue
            if i + 2 > n:
                return None
            ln = int.from_bytes(content[i:i + 2], "big")
            if m in (0xC0, 0xC1, 0xC2, 0xC3, 0xC5, 0xC6, 0xC7,
                     0xC9, 0xCA, 0xCB, 0xCD, 0xCE, 0xCF):
                if i + 7 > n:
                    return None
                h = int.from_bytes(content[i + 3:i + 5], "big")
                w = int.from_bytes(content[i + 5:i + 7], "big")
                return {"container": "jpeg", "width": w, "height": h,
                        "duration_ms": None, "sample_rate": None,
                        "channels": None,
                        "codec": ("baseline" if m in (0xC0, 0xC1)
                                  else "progressive")}
            if m == 0xDA:
                return None                     # scan before any SOF
            i += ln
        return None
    if content[:4] == b"RIFF" and content[8:12] == b"WAVE":
        # fmt chunk: channels/sample-rate/bits; data chunk: duration
        i, n = 12, len(content)
        ch = sr = bits = None
        data_len = None
        while i + 8 <= n:
            cid = content[i:i + 4]
            ln = int.from_bytes(content[i + 4:i + 8], "little")
            if cid == b"fmt " and i + 24 <= n:
                ch = int.from_bytes(content[i + 10:i + 12], "little")
                sr = int.from_bytes(content[i + 12:i + 16], "little")
                bits = int.from_bytes(content[i + 22:i + 24], "little")
            elif cid == b"data":
                data_len = ln
            i += 8 + ln + (ln & 1)
        if not (ch and sr and bits):
            return None
        # data_len == 0 is a real (empty) data chunk: duration 0, not
        # unknown — only a MISSING data chunk yields None (r13 sweep)
        dur = (int(data_len * 8000 / (ch * sr * bits))
               if data_len is not None else None)
        return {"container": "wav", "width": None, "height": None,
                "duration_ms": dur, "sample_rate": sr, "channels": ch,
                "codec": f"pcm{bits}"}
    if len(content) >= 12 and content[4:8] == b"ftyp":
        return _probe_mp4(content)
    if content.startswith(b"ID3") or (
            len(content) >= 2 and content[0] == 0xFF
            and (content[1] & 0xE0) == 0xE0):
        return _probe_mp3(content)
    return None


def _mp4_boxes(data: bytes, start: int, end: int):
    i = start
    while i + 8 <= end:
        ln = int.from_bytes(data[i:i + 4], "big")
        typ = data[i + 4:i + 8]
        if ln == 1:                 # 64-bit largesize
            if i + 16 > end:
                return
            ln = int.from_bytes(data[i + 8:i + 16], "big")
            if ln < 16:             # header alone is 16 bytes (r13 sweep)
                return
            body = i + 16
        elif ln == 0:               # to end of enclosing box
            ln = end - i
            body = i + 8
        else:
            body = i + 8
        if ln < 8 or i + ln > end:
            return
        yield typ, body, i + ln
        i += ln


def _probe_mp4(content: bytes) -> dict | None:
    """ISO-BMFF box-tree walk: mvhd timescale/duration, first video
    trak's tkhd dims + stsd codec fourcc.  No sample data is touched."""
    out = {"container": "mp4", "width": None, "height": None,
           "duration_ms": None, "sample_rate": None, "channels": None,
           "codec": None}
    seen_moov = False
    for typ, b, e in _mp4_boxes(content, 0, len(content)):
        if typ != b"moov":
            continue
        seen_moov = True
        for t2, b2, e2 in _mp4_boxes(content, b, e):
            if t2 == b"mvhd" and e2 - b2 >= 20:
                ver = content[b2]
                if ver == 1:
                    if e2 - b2 < 32:   # truncated v1 body would silently
                        continue       # misread duration (r13 sweep)
                    ts = int.from_bytes(content[b2 + 20:b2 + 24], "big")
                    dur = int.from_bytes(content[b2 + 24:b2 + 32], "big")
                else:
                    ts = int.from_bytes(content[b2 + 12:b2 + 16], "big")
                    dur = int.from_bytes(content[b2 + 16:b2 + 20], "big")
                if ts:
                    out["duration_ms"] = int(dur * 1000 / ts)
            elif t2 == b"trak":
                for t3, b3, e3 in _mp4_boxes(content, b2, e2):
                    if t3 == b"tkhd" and e3 - b3 >= 84 \
                            and out["width"] is None:
                        # 16.16 fixed-point width/height at the box tail
                        w = int.from_bytes(content[e3 - 8:e3 - 4],
                                           "big") >> 16
                        h = int.from_bytes(content[e3 - 4:e3], "big") >> 16
                        if w and h:
                            out["width"], out["height"] = w, h
                    elif t3 == b"mdia":
                        for t4, b4, e4 in _mp4_boxes(content, b3, e3):
                            if t4 != b"minf":
                                continue
                            for t5, b5, e5 in _mp4_boxes(content, b4, e4):
                                if t5 != b"stbl":
                                    continue
                                for t6, b6, e6 in _mp4_boxes(
                                        content, b5, e5):
                                    if (t6 == b"stsd"
                                            and e6 - b6 >= 16
                                            and out["codec"] is None):
                                        out["codec"] = content[
                                            b6 + 12:b6 + 16].decode(
                                            "latin-1")
    return out if seen_moov else None


def _probe_mp3(content: bytes) -> dict | None:
    """MPEG1 Layer III: skip a leading ID3v2 tag (syncsafe size), parse
    the first frame header's bitrate/sample-rate/channel fields, estimate
    duration from the audio byte count at that bitrate (CBR estimate —
    the standard headerless approximation)."""
    i = 0
    if content.startswith(b"ID3") and len(content) >= 10:
        sz = 0
        for byte in content[6:10]:
            sz = (sz << 7) | (byte & 0x7F)
        i = 10 + sz
    n = len(content)
    while i + 4 <= n:
        if content[i] == 0xFF and (content[i + 1] & 0xE0) == 0xE0:
            b1, b2, b3 = content[i + 1], content[i + 2], content[i + 3]
            # a sync pattern is only 11 bits — random bytes fake it about
            # once per 2 KB, so an invalid candidate means KEEP SCANNING,
            # and a field-valid candidate is accepted only if the frame
            # length lands on another sync (or EOF) — the standard
            # two-frame validation (r13 sweep; was: give up at the first
            # false sync)
            if (b1 & 0x18) != 0x18 or (b1 & 0x06) != 0x02:
                i += 1                 # not MPEG1 Layer III: false sync
                continue
            br_idx = (b2 >> 4) & 0x0F
            sr_idx = (b2 >> 2) & 0x03
            if br_idx in (0, 15) or sr_idx == 3:
                i += 1                 # free/bad bitrate, reserved rate
                continue
            bitrate = _MP3_BITRATES[br_idx]
            sr = _MP3_RATES[sr_idx]
            pad = (b2 >> 1) & 0x01
            flen = (144 * bitrate * 1000) // sr + pad
            nxt = i + flen
            if not (nxt >= n or (nxt + 1 < n and content[nxt] == 0xFF
                                 and (content[nxt + 1] & 0xE0) == 0xE0)):
                i += 1                 # next frame doesn't sync: false hit
                continue
            ch = 1 if ((b3 >> 6) & 0x03) == 3 else 2
            dur = int((n - i) * 8 / bitrate) if bitrate else None
            return {"container": "mp3", "width": None, "height": None,
                    "duration_ms": dur, "sample_rate": sr,
                    "channels": ch, "codec": "mp3"}
        i += 1
    return None


def extract_media_meta(media: DataFrame) -> DataFrame:
    """Populate typed metadata columns from the content bytes via one
    Arrow kernel — ``{media_id, container, width, height, duration_ms,
    sample_rate, channels, codec}`` (all parse-derived; NULL row facts
    for unknown formats).  The write-side companion of the decode path:
    run once at ingest, persist beside the binary column, and every later
    filter prunes on parquet stats instead of touching bytes."""

    def kern(batches):
        for pdf in batches:
            rows = []
            for mid, content in zip(pdf["media_id"], pdf["content"]):
                meta = probe_media_meta(bytes(content)) \
                    if content is not None else None
                meta = meta or {"container": None, "width": None,
                                "height": None, "duration_ms": None,
                                "sample_rate": None, "channels": None,
                                "codec": None}
                rows.append((mid, meta["container"], meta["width"],
                             meta["height"], meta["duration_ms"],
                             meta["sample_rate"], meta["channels"],
                             meta["codec"]))
            yield pd.DataFrame(rows, columns=[
                "media_id", "container", "width", "height",
                "duration_ms", "sample_rate", "channels", "codec"])

    return media.mapInPandas(
        kern, "media_id string, container string, width int, height int, "
              "duration_ms long, sample_rate int, channels int, "
              "codec string")


def write_wav(sample_rate: int, channels: int, bits: int,
              n_samples: int) -> bytes:
    """Serialize a silent PCM WAV — the fixture/export twin of the WAV
    branch of :func:`probe_media_meta` (kept beside the parser like
    sources/warc.write_wet, so builder/parser asymmetry turns the gated
    row red)."""
    import struct

    data = bytes(n_samples * channels * (bits // 8))
    byte_rate = sample_rate * channels * bits // 8
    return (b"RIFF" + struct.pack("<I", 36 + len(data)) + b"WAVE"
            + b"fmt " + struct.pack("<IHHIIHH", 16, 1, channels,
                                    sample_rate, byte_rate,
                                    channels * bits // 8, bits)
            + b"data" + struct.pack("<I", len(data)) + data)


def write_mp4_stub(width: int, height: int, duration_ms: int,
                   codec: bytes = b"avc1") -> bytes:
    """Serialize a minimal ISO-BMFF container (ftyp + moov box tree with
    mvhd/tkhd/stsd, empty mdat) — metadata-true, payload-free: the
    fixture twin of the MP4 branch of :func:`probe_media_meta`."""
    import struct

    def box(typ, body):
        return struct.pack(">I", 8 + len(body)) + typ + body

    ftyp = box(b"ftyp", b"isom\x00\x00\x02\x00isomiso2")
    mvhd = box(b"mvhd", bytes(4) + bytes(8)
               + struct.pack(">II", 1000, duration_ms) + bytes(80))
    tkhd = box(b"tkhd", bytes(4) + bytes(72)
               + struct.pack(">II", width << 16, height << 16))
    stsd = box(b"stsd", bytes(8) + box(codec, bytes(70)))
    trak = box(b"trak", tkhd + box(b"mdia", box(b"minf", box(b"stbl",
                                                             stsd))))
    return (ftyp + box(b"moov", mvhd + trak)
            + box(b"mdat", b"\x00" * 16))


def write_mp3_stub(n_frames: int, with_id3: bool = True) -> bytes:
    """Serialize MPEG1 Layer III frame headers (128 kbps / 44.1 kHz /
    joint stereo, zero payload) behind an optional ID3v2 tag — the
    fixture twin of the MP3 branch of :func:`probe_media_meta`."""
    frame_len = int(144 * 128000 / 44100)          # 417 bytes
    frame = b"\xff\xfb\x90\x40" + b"\x00" * (frame_len - 4)
    id3 = (b"ID3\x03\x00\x00\x00\x00\x00\x0a" + b"\x00" * 10
           if with_id3 else b"")
    return id3 + frame * n_frames
