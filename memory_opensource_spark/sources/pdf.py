"""PDF text-layer extraction (round-13).

Reference analog: ``services/processPDF.py:117``
``extract_text_from_pdf_async`` (PyMuPDF per-page text) and
``process_pdf`` (:38 — PyPDFLoader pages -> one memory per page with
``{file, page: "N of M"}`` metadata, routed through the normal
add-memory path by ``background_tasks/pdf_processing.py:16``).  The
Spark engine re-expresses the WHAT — PDF binary -> ordered per-page
text rows feeding the document ingest chain — with a pure-Python
text-layer parser (the PNG/JPEG-decoder genre: no PyMuPDF/pypdf in the
container, and the parse is per-file embarrassingly parallel anyway).

Two halves, kept in ONE module so they cannot drift (the
``mm_media_meta`` builder/parser-twin pattern — the oracle row builds
PDFs executor-side from table text and parses them back; any asymmetry
turns the row red):

``write_pdf(pages)``
    A real classic-xref PDF 1.4 writer: catalog -> page tree -> one
    content stream per page (optionally FlateDecoded, optionally SPLIT
    into multiple streams — the /Contents-array form), text shown as
    ``BT .. (line) Tj T* .. ET`` with literal-escaped or hex-encoded
    strings.  Non-latin-1 text is written as UTF-16BE-with-BOM hex
    strings (see *encoding semantics* below).

``extract_pdf_pages(data)``
    The text-layer parser:

    1. **Object index** by full-file scan for ``N G obj`` (tolerates
       broken/absent classic xref tables AND cross-reference-stream
       PDFs without implementing PNG-predictor xref decoding; the
       LAST definition of an object number wins — the incremental-
       update rule).  ``/Type /ObjStm`` object streams are unpacked
       (header pairs + FlateDecode) so compressed-object PDFs parse.
    2. **Page tree walk** from the ``/Type /Catalog`` object through
       ``/Pages`` -> ``/Kids`` recursively, in declaration order
       (the document's page order); falls back to ``/Type /Page``
       objects in object-number order when no catalog resolves.
    3. **Content streams** (single ref or array, concatenated in
       order) decoded via ``/Filter``: none or ``FlateDecode`` (zlib —
       already a dependency of the PNG decoder); any other filter and
       ``/Encrypt`` raise :class:`PdfParseError` LOUDLY (the
       multimodal codec-seam discipline — never silently emit wrong
       text).
    4. **Text operators** inside BT..ET: ``Tj`` shows a string; ``TJ``
       shows each string element of its array (kerning numbers are
       positioning, not text — ignored); ``'`` and ``"`` move to the
       next line then show; ``T*`` and ``Td``/``TD`` with a non-zero
       ty operand emit a newline.  Everything else (graphics, fonts,
       positioning on the same line) is skipped.

**Encoding semantics** (documented, deterministic): a show string
shown under a font that carries a **/ToUnicode CMap** decodes through
it (r14, VERDICT r11 task 4): ``begincodespacerange`` fixes the code
width (1 or 2 bytes), ``beginbfchar`` pairs and ``beginbfrange``
triples (incrementing-destination form per PDF 32000-1 §9.10.3 — the
LAST BYTE of the destination increments — and the array-destination
form) map codes to UTF-16BE strings; unmapped codes fall back to
latin-1 of their raw bytes (best-effort, never a crash).  The current
font is tracked via the ``Tf`` operator against the page's
``/Resources /Font`` table (inherited through ``/Parent`` when the
page dict omits it).  Without a CMap the r13 rules stand: latin-1
unless the string begins with the UTF-16BE BOM ``FE FF``.  The writer
twin's ``cmap_font=True`` emits a deliberately NON-identity byte
encoding (codes assigned per distinct character) whose text only a
correct CMap decode recovers — gibberish under latin-1 — so the
oracle row pins the real decode path.  A font WITHOUT a ToUnicode but
WITH a simple-font **/Encoding /Differences** array decodes through
the Differences (r14): integers set the current code, each following
glyph NAME assigns that code and increments; glyph names resolve to
unicode via ``uniXXXX``/``uXXXXX[X]`` forms plus the common-AGL subset
(letters, digits, space/punctuation names); unresolvable names and
unmapped codes fall back to latin-1 of the raw byte.  ToUnicode wins
when both are present (it is the authoritative text mapping per
PDF 32000-1 §9.10.2).  Remaining seam: named base encodings
(/WinAnsiEncoding et al.) are approximated by the latin-1 fallback
rather than their exact tables — the same honest-seam class as the
progressive-JPEG note in sources/multimodal.
"""

from __future__ import annotations

import re
import zlib

from pyspark.sql import DataFrame, SparkSession


class PdfParseError(ValueError):
    """Raised loudly for PDFs outside the documented surface (encryption,
    non-Flate filters, malformed structure) — never silent wrong text."""


# --------------------------------------------------------------------------
# builder twin
# --------------------------------------------------------------------------

_ESC = {ord("("): b"\\(", ord(")"): b"\\)", ord("\\"): b"\\\\",
        ord("\n"): b"\\n", ord("\r"): b"\\r", ord("\t"): b"\\t"}


def _pdf_string(s: str, hex_strings: bool = False) -> bytes:
    """One show-string token for ``s``: literal latin-1 with escapes by
    default; hex form on request; UTF-16BE-with-BOM hex whenever ``s``
    does not fit latin-1 (module-docstring encoding semantics)."""
    try:
        raw = s.encode("latin-1")
    except UnicodeEncodeError:
        return b"<" + (b"\xfe\xff" + s.encode("utf-16-be")).hex().encode() + b">"
    if hex_strings:
        return b"<" + raw.hex().encode() + b">"
    return b"(" + b"".join(_ESC.get(c, bytes([c])) for c in raw) + b")"


#: common-AGL glyph-name subset (Adobe Glyph List): name -> character.
#: Letters map to themselves and digits to their word names below; this
#: table carries the punctuation both twins use.
_AGL = {
    "space": " ", "exclam": "!", "quotedbl": '"', "numbersign": "#",
    "dollar": "$", "percent": "%", "ampersand": "&", "quotesingle": "'",
    "parenleft": "(", "parenright": ")", "asterisk": "*", "plus": "+",
    "comma": ",", "hyphen": "-", "period": ".", "slash": "/",
    "colon": ":", "semicolon": ";", "less": "<", "equal": "=",
    "greater": ">", "question": "?", "at": "@", "bracketleft": "[",
    "backslash": "\\", "bracketright": "]", "asciicircum": "^",
    "underscore": "_", "grave": "`", "braceleft": "{", "bar": "|",
    "braceright": "}", "asciitilde": "~",
    "zero": "0", "one": "1", "two": "2", "three": "3", "four": "4",
    "five": "5", "six": "6", "seven": "7", "eight": "8", "nine": "9",
}
_AGL_REV = {c: n for n, c in _AGL.items()}
_UNI_NAME_RE = re.compile(r"^uni([0-9A-Fa-f]{4})$")
_U_NAME_RE = re.compile(r"^u([0-9A-Fa-f]{5,6})$")


def _glyph_to_unicode(name: str) -> str | None:
    """Glyph name (no leading slash) -> unicode char, or None when the
    name is outside the documented surface (the caller falls back)."""
    if len(name) == 1 and (name.isalpha() or name.isdigit()):
        return name
    if name in _AGL:
        return _AGL[name]
    m = _UNI_NAME_RE.match(name)
    if m:
        return chr(int(m.group(1), 16))
    m = _U_NAME_RE.match(name)
    if m:
        cp = int(m.group(1), 16)
        return chr(cp) if cp <= 0x10FFFF else None
    return None


def _glyph_name(c: str) -> str:
    """Writer twin of :func:`_glyph_to_unicode`."""
    if c.isascii() and c.isalpha():
        return c
    if c in _AGL_REV:
        return _AGL_REV[c]
    cp = ord(c)
    return f"uni{cp:04X}" if cp <= 0xFFFF else f"u{cp:05X}"


def _differences_array(table: dict[str, int]) -> bytes:
    """The /Differences array for ``table`` (char -> code): integers set
    the current code, names assign consecutive codes — runs of
    consecutive codes omit the repeated integers."""
    out = []
    prev = None
    for code, ch in sorted((v, k) for k, v in table.items()):
        if prev is None or code != prev + 1:
            out.append(str(code).encode())
        out.append(b"/" + _glyph_name(ch).encode("ascii"))
        prev = code
    return b"[ " + b" ".join(out) + b" ]"


def _parse_differences(diffs: list) -> dict[int, str]:
    """/Differences array -> {code: unicode}.  Integers set the current
    code; each following name assigns it and increments.  Names outside
    the glyph surface are SKIPPED (their codes keep the latin-1
    fallback), malformed entries raise loudly."""
    mapping: dict[int, str] = {}
    code = None
    for el in diffs:
        if isinstance(el, int):
            if not 0 <= el <= 255:
                raise PdfParseError(
                    f"/Differences: code {el} outside one byte")
            code = el
        elif isinstance(el, str) and el.startswith("/"):
            if code is None:
                raise PdfParseError("/Differences: name before any code")
            if code > 255:
                raise PdfParseError("/Differences: ran past code 255")
            u = _glyph_to_unicode(el[1:])
            if u is not None:
                mapping[code] = u
            code += 1
        else:
            raise PdfParseError(
                f"/Differences: unexpected element {el!r}")
    return mapping


def _content_stream(lines: list[str], hex_strings: bool,
                    encoder=None) -> bytes:
    ops = [b"BT /F1 12 Tf 72 720 Td"]
    for i, line in enumerate(lines):
        if i:
            ops.append(b"T*")
        tok = (b"<" + encoder(line).hex().encode() + b">") if encoder \
            else _pdf_string(line, hex_strings)
        ops.append(tok + b" Tj")
    ops.append(b"ET")
    return b" ".join(ops)


def _build_code_table(pages: list[str]) -> tuple[dict[str, int], int]:
    """char -> code assignment for the CMap'd font: distinct characters
    across all pages (newlines excluded — they become T* ops), codes
    assigned in sorted-character order from 1, width 2 bytes once the
    alphabet outgrows one byte.  Sorted order makes consecutive
    codepoints land on consecutive codes, so the CMap writer can emit
    real bfrange runs, not just bfchar pairs."""
    alphabet = sorted({c for t in pages for c in t if c != "\n"})
    table = {c: i + 1 for i, c in enumerate(alphabet)}
    width = 1 if len(alphabet) <= 0xFE else 2
    if len(alphabet) > 0xFFFE:
        raise PdfParseError("cmap_font: alphabet exceeds 2-byte codespace")
    return table, width


def _tounicode_cmap(table: dict[str, int], width: int) -> bytes:
    """The /ToUnicode CMap stream for ``table``: codespacerange fixing
    the code width, then bfrange runs (consecutive codes AND consecutive
    BMP codepoints, never overflowing the destination's LAST byte — the
    PDF 32000-1 §9.10.3 increment rule) with bfchar leftovers, both
    chunked at the spec's 100-entries-per-block cap."""
    hexw = width * 2
    by_code = sorted((code, ch) for ch, code in table.items())
    runs: list[tuple[int, int, str]] = []   # (lo_code, hi_code, lo_char)
    chars: list[tuple[int, str]] = []
    i = 0
    while i < len(by_code):
        code, ch = by_code[i]
        cp = ord(ch)
        j = i
        # extend while codes and codepoints both increment and the
        # destination low byte does not wrap (increment rule)
        while (j + 1 < len(by_code)
               and by_code[j + 1][0] == by_code[j][0] + 1
               and len(by_code[j + 1][1]) == 1
               and ord(by_code[j + 1][1]) == ord(by_code[j][1]) + 1
               and ord(by_code[j + 1][1]) <= 0xFFFF
               and (ord(by_code[j][1]) & 0xFF) != 0xFF
               and (code & ((1 << (8 * width)) - 1)) + (j + 1 - i)
               <= (1 << (8 * width)) - 1):
            j += 1
        if j - i >= 2 and cp <= 0xFFFF:
            runs.append((code, by_code[j][0], ch))
            i = j + 1
        else:
            chars.append((code, ch))
            i += 1

    def u16(s: str) -> bytes:
        return b"<" + s.encode("utf-16-be").hex().encode() + b">"

    def chex(c: int) -> bytes:
        return b"<" + format(c, f"0{hexw}x").encode() + b">"

    out = [b"/CIDInit /ProcSet findresource begin\n12 dict begin\n"
           b"begincmap\n/CMapName /Custom-UCS def\n/CMapType 2 def\n"
           b"1 begincodespacerange\n"
           + chex(0) + b" " + chex((1 << (8 * width)) - 1)
           + b"\nendcodespacerange\n"]
    for k in range(0, len(chars), 100):
        block = chars[k:k + 100]
        out.append(b"%d beginbfchar\n" % len(block))
        for code, ch in block:
            out.append(chex(code) + b" " + u16(ch) + b"\n")
        out.append(b"endbfchar\n")
    for k in range(0, len(runs), 100):
        block = runs[k:k + 100]
        out.append(b"%d beginbfrange\n" % len(block))
        for lo, hi, ch in block:
            out.append(chex(lo) + b" " + chex(hi) + b" " + u16(ch) + b"\n")
        out.append(b"endbfrange\n")
    out.append(b"endcmap\nCMapName currentdict /CMap defineresource pop\n"
               b"end\nend")
    return b"".join(out)


def write_pdf(pages: list[str], *, compress: bool = True,
              hex_strings: bool = False,
              split_streams: bool = False,
              cmap_font: bool = False,
              diff_encoding: bool = False,
              scanned: bool | set[int] = False,
              scan_raster: bool = False) -> bytes:
    """A complete single-font PDF 1.4 file showing ``pages`` (one
    MediaBox'd page per element; lines split on ``\\n`` become
    ``Tj``/``T*`` pairs, so :func:`extract_pdf_pages` round-trips the
    page text EXACTLY).  ``compress`` flate-encodes content streams;
    ``hex_strings`` writes hex show-strings; ``split_streams`` splits
    each page's content into a two-stream ``/Contents`` array;
    ``cmap_font`` (r14) shows text in a NON-identity per-document byte
    encoding under a font carrying a /ToUnicode CMap — the bytes are
    gibberish under latin-1, so only a real CMap decode round-trips;
    ``diff_encoding`` (r14) uses the same non-identity byte code but
    publishes it as a simple-font /Encoding /Differences array (glyph
    names) instead — single-byte codes only.  With BOTH set, the font
    carries both tables (the reader must prefer ToUnicode).
    ``scanned`` (r14) renders the given page indices (or all pages,
    ``True``) as IMAGE-ONLY pages: no text operators, one /XObject
    /Image drawn by ``Do`` whose stream bytes are the page text in the
    deterministic fake-scan format :func:`ocr_stub` reads back — the
    scanned-page/OCR seam twin.  ``scan_raster`` (r15) upgrades the
    scanned pages from the marker format to REAL PIXELS: the image
    stream becomes an 8-bit grayscale raster of the page text rendered
    by sources/rasterocr.render_text_image, with /Width and /Height set
    from the raster — the ``raster_ocr`` template-matching engine in
    the same ``ocr=`` seam decodes it back from pixel math alone.  All
    are parser-surface variations oracle rows sweep."""
    objs: dict[int, bytes] = {}
    n_pages = len(pages)
    font_num = 3
    page_nums = []
    next_num = 4
    encoder = None
    cmap_obj: bytes | None = None
    diff_arr: bytes | None = None
    if cmap_font or diff_encoding:
        table, cwidth = _build_code_table(pages)
        if diff_encoding and cwidth != 1:
            raise PdfParseError(
                "diff_encoding: alphabet exceeds one byte — "
                "/Differences codes are single-byte; use cmap_font")

        def encoder(line: str, _t=table, _w=cwidth) -> bytes:
            return b"".join(_t[c].to_bytes(_w, "big") for c in line)

        if cmap_font:
            cmap_obj = _tounicode_cmap(table, cwidth)
        if diff_encoding:
            diff_arr = _differences_array(table)
    scanned_set = (set(range(n_pages)) if scanned is True
                   else set(scanned or ()))
    for page_idx, text in enumerate(pages):
        if page_idx in scanned_set:
            # a SCANNED page: no text operators at all — one image
            # XObject whose stream is the page "scan" (marker format
            # ocr_stub reads back, or — scan_raster — real grayscale
            # pixels the raster_ocr template matcher decodes)
            if scan_raster:
                from .rasterocr import IMAGE_W, render_text_image
                img = render_text_image(text)
                w, h = IMAGE_W, len(img) // IMAGE_W
            else:
                img = text.encode("utf-8")
                w, h = 612, 792
            data = zlib.compress(img) if compress else img
            filt = b"/Filter /FlateDecode " if compress else b""
            objs[next_num] = (b"<< /Type /XObject /Subtype /Image "
                              b"/Width " + str(w).encode()
                              + b" /Height " + str(h).encode()
                              + b" /ColorSpace /DeviceGray "
                              b"/BitsPerComponent 8 " + filt
                              + b"/Length " + str(len(data)).encode()
                              + b" >>\nstream\n" + data + b"\nendstream")
            img_num = next_num
            next_num += 1
            body = b"q 612 0 0 792 0 0 cm /Im1 Do Q"
            cdata = zlib.compress(body) if compress else body
            objs[next_num] = (b"<< " + filt + b"/Length "
                              + str(len(cdata)).encode()
                              + b" >>\nstream\n" + cdata + b"\nendstream")
            objs[next_num + 1] = (
                b"<< /Type /Page /Parent 2 0 R "
                b"/MediaBox [0 0 612 792] "
                b"/Resources << /XObject << /Im1 "
                + str(img_num).encode() + b" 0 R >> >> "
                b"/Contents " + str(next_num).encode() + b" 0 R >>")
            page_nums.append(next_num + 1)
            next_num += 2
            continue
        lines = text.split("\n")
        body = _content_stream(lines, hex_strings, encoder)
        if split_streams and len(lines) > 1:
            # a BT..ET block per stream — concatenation is still valid
            mid = len(lines) // 2
            parts = [_content_stream(lines[:mid], hex_strings, encoder)
                     + b"\n",
                     _content_stream([""] + lines[mid:], hex_strings,
                                     encoder)]
        else:
            parts = [body]
        content_nums = []
        for part in parts:
            data = zlib.compress(part) if compress else part
            filt = b"/Filter /FlateDecode " if compress else b""
            objs[next_num] = (b"<< " + filt + b"/Length "
                              + str(len(data)).encode() + b" >>\nstream\n"
                              + data + b"\nendstream")
            content_nums.append(next_num)
            next_num += 1
        contents = (str(content_nums[0]).encode() + b" 0 R"
                    if len(content_nums) == 1 else
                    b"[" + b" ".join(b"%d 0 R" % n for n in content_nums)
                    + b"]")
        objs[next_num] = (b"<< /Type /Page /Parent 2 0 R "
                          b"/MediaBox [0 0 612 792] "
                          b"/Resources << /Font << /F1 "
                          + str(font_num).encode() + b" 0 R >> >> "
                          b"/Contents " + contents + b" >>")
        page_nums.append(next_num)
        next_num += 1
    objs[1] = b"<< /Type /Catalog /Pages 2 0 R >>"
    objs[2] = (b"<< /Type /Pages /Kids ["
               + b" ".join(b"%d 0 R" % n for n in page_nums)
               + b"] /Count " + str(n_pages).encode() + b" >>")
    if cmap_obj is not None or diff_arr is not None:
        extra = b""
        if cmap_obj is not None:
            data = zlib.compress(cmap_obj) if compress else cmap_obj
            filt = b"/Filter /FlateDecode " if compress else b""
            objs[next_num] = (b"<< " + filt + b"/Length "
                              + str(len(data)).encode() + b" >>\nstream\n"
                              + data + b"\nendstream")
            extra += b"/ToUnicode " + str(next_num).encode() + b" 0 R "
            next_num += 1
        if diff_arr is not None:
            extra += (b"/Encoding << /Type /Encoding /Differences "
                      + diff_arr + b" >> ")
        objs[font_num] = (b"<< /Type /Font /Subtype /TrueType "
                          b"/BaseFont /Custom " + extra + b">>")
    else:
        objs[font_num] = (b"<< /Type /Font /Subtype /Type1 "
                          b"/BaseFont /Helvetica >>")

    out = bytearray(b"%PDF-1.4\n%\xe2\xe3\xcf\xd3\n")
    offsets = {}
    for num in sorted(objs):
        offsets[num] = len(out)
        out += b"%d 0 obj\n" % num + objs[num] + b"\nendobj\n"
    xref_at = len(out)
    max_num = max(objs)
    out += b"xref\n0 %d\n" % (max_num + 1)
    out += b"0000000000 65535 f \n"
    for num in range(1, max_num + 1):
        out += b"%010d 00000 n \n" % offsets[num]
    out += (b"trailer\n<< /Size %d /Root 1 0 R >>\nstartxref\n%d\n%%%%EOF\n"
            % (max_num + 1, xref_at))
    return bytes(out)


# --------------------------------------------------------------------------
# object-level parser
# --------------------------------------------------------------------------

_WS = b"\x00\t\n\x0c\r "
_DELIM = b"()<>[]{}/%"
_OBJ_RE = re.compile(rb"(\d+)[\x00\t\n\x0c\r ]+(\d+)[\x00\t\n\x0c\r ]+obj\b")


class Ref:
    __slots__ = ("num",)

    def __init__(self, num: int):
        self.num = num

    def __repr__(self):  # pragma: no cover - debug aid
        return f"Ref({self.num})"


class _Lexer:
    """Minimal PDF object tokenizer over ``data`` starting at ``pos``."""

    def __init__(self, data: bytes, pos: int = 0):
        self.data = data
        self.pos = pos

    def _skip_ws(self):
        d, n = self.data, len(self.data)
        while self.pos < n:
            c = self.data[self.pos]
            if c in _WS:
                self.pos += 1
            elif c == 0x25:  # % comment to EOL
                while self.pos < n and d[self.pos] not in b"\r\n":
                    self.pos += 1
            else:
                return

    def parse_object(self):
        """One object at the cursor: dict/array/name/number/ref/string/
        bool/null.  Raises PdfParseError on malformed input."""
        self._skip_ws()
        d = self.data
        if self.pos >= len(d):
            raise PdfParseError("unexpected end of PDF object data")
        c = d[self.pos]
        if d.startswith(b"<<", self.pos):
            return self._parse_dict()
        if c == ord("<"):
            return self._parse_hex_string()
        if c == ord("("):
            return self._parse_literal_string()
        if c == ord("["):
            return self._parse_array()
        if c == ord("/"):
            return self._parse_name()
        if d.startswith(b"true", self.pos):
            self.pos += 4
            return True
        if d.startswith(b"false", self.pos):
            self.pos += 5
            return False
        if d.startswith(b"null", self.pos):
            self.pos += 4
            return None
        return self._parse_number_or_ref()

    def _parse_dict(self):
        self.pos += 2
        out = {}
        while True:
            self._skip_ws()
            if self.data.startswith(b">>", self.pos):
                self.pos += 2
                return out
            key = self.parse_object()
            if not isinstance(key, str) or not key.startswith("/"):
                raise PdfParseError(f"dict key is not a name: {key!r}")
            out[key] = self.parse_object()

    def _parse_array(self):
        self.pos += 1
        out = []
        while True:
            self._skip_ws()
            if self.pos < len(self.data) and self.data[self.pos] == ord("]"):
                self.pos += 1
                return out
            out.append(self.parse_object())

    def _parse_name(self):
        d, n = self.data, len(self.data)
        start = self.pos
        self.pos += 1
        while self.pos < n and d[self.pos] not in _WS \
                and d[self.pos] not in _DELIM:
            self.pos += 1
        raw = d[start:self.pos]
        # #xx hex escapes in names (PDF 1.2+)
        return re.sub(rb"#([0-9A-Fa-f]{2})",
                      lambda m: bytes([int(m.group(1), 16)]),
                      raw).decode("latin-1")

    def _parse_number_or_ref(self):
        d = self.data
        m = re.compile(rb"[+-]?(\d+\.?\d*|\.\d+)").match(d, self.pos)
        if not m:
            raise PdfParseError(
                f"unparseable token at offset {self.pos}: "
                f"{d[self.pos:self.pos + 16]!r}")
        self.pos = m.end()
        tok = m.group(0)
        if b"." not in tok:
            # lookahead for "G R" -> indirect reference
            m2 = re.compile(rb"[\x00\t\n\x0c\r ]+\d+[\x00\t\n\x0c\r ]+R\b") \
                .match(d, self.pos)
            if m2:
                self.pos = m2.end()
                return Ref(int(tok))
            return int(tok)
        return float(tok)

    def _parse_hex_string(self):
        end = self.data.find(b">", self.pos + 1)
        if end < 0:
            raise PdfParseError("unterminated hex string")
        hx = re.sub(rb"[\x00\t\n\x0c\r ]", b"", self.data[self.pos + 1:end])
        if len(hx) % 2:
            hx += b"0"  # spec: odd final digit pads with 0
        self.pos = end + 1
        try:
            return bytes.fromhex(hx.decode("ascii"))
        except (ValueError, UnicodeDecodeError) as e:
            # invalid hex digits are structural damage: LOUD, and in the
            # module's own exception type (r13 fuzz finding — raw
            # ValueError/UnicodeDecodeError leaked past the contract)
            raise PdfParseError(f"invalid hex string: {e}") from e

    def _parse_literal_string(self):
        d, n = self.data, len(self.data)
        self.pos += 1
        out = bytearray()
        depth = 1
        while self.pos < n:
            c = d[self.pos]
            if c == ord("\\"):
                self.pos += 1
                if self.pos >= n:
                    break
                e = d[self.pos]
                if e in b"nrtbf":
                    out += {ord("n"): b"\n", ord("r"): b"\r",
                            ord("t"): b"\t", ord("b"): b"\x08",
                            ord("f"): b"\x0c"}[e]
                    self.pos += 1
                elif e in b"()\\":
                    out.append(e)
                    self.pos += 1
                elif e in b"\r\n":  # line continuation
                    self.pos += 1
                    if e == ord("\r") and self.pos < n \
                            and d[self.pos] == ord("\n"):
                        self.pos += 1
                elif 0x30 <= e <= 0x37:  # 1-3 octal digits
                    oct_ = bytearray([e])
                    self.pos += 1
                    while len(oct_) < 3 and self.pos < n \
                            and 0x30 <= d[self.pos] <= 0x37:
                        oct_.append(d[self.pos])
                        self.pos += 1
                    out.append(int(oct_.decode(), 8) & 0xFF)
                else:  # unknown escape: backslash dropped (spec)
                    out.append(e)
                    self.pos += 1
                continue
            if c == ord("("):
                depth += 1
            elif c == ord(")"):
                depth -= 1
                if depth == 0:
                    self.pos += 1
                    return bytes(out)
            out.append(c)
            self.pos += 1
        raise PdfParseError("unterminated literal string")


def _decode_stream(data: bytes, sdict: dict, resolve) -> bytes:
    filt = resolve(sdict.get("/Filter"))
    filters = filt if isinstance(filt, list) else ([filt] if filt else [])
    for f in filters:
        f = resolve(f)
        if f == "/FlateDecode":
            try:
                data = zlib.decompress(data)
            except zlib.error as e:
                raise PdfParseError(f"bad FlateDecode stream: {e}") from e
        else:
            raise PdfParseError(
                f"unsupported stream filter {f} — only FlateDecode and "
                "unfiltered streams are in the documented surface")
    return data


class _PdfDoc:
    """Scan-indexed PDF document: object number -> parsed object, with
    stream payloads resolved through /Length and /Filter."""

    def __init__(self, data: bytes):
        if re.search(rb"/Encrypt[\x00\t\n\x0c\r ]+\d+[\x00\t\n\x0c\r ]+\d+"
                     rb"[\x00\t\n\x0c\r ]+R", data):
            # trailer-level encryption: loud refusal (documented seam)
            raise PdfParseError("encrypted PDF — decryption is outside "
                                "the documented text-layer surface")
        self.data = data
        self._offsets: dict[int, int] = {}
        for m in _OBJ_RE.finditer(data):
            # last definition wins: the incremental-update rule
            self._offsets[int(m.group(1))] = m.end()
        self._root_ref: Ref | None = None
        try:
            # a VALID classic xref overrides the scan (a scan can
            # false-positive on "N G obj" bytes inside a binary stream
            # payload; the xref is authoritative when present and sane)
            self._apply_classic_xref()
        except (PdfParseError, ValueError, IndexError):
            pass  # xref-stream or damaged xref: scan index stands
        self._cache: dict[int, object] = {}
        self._streams: dict[int, bytes] = {}
        self._unpack_object_streams()

    def _apply_classic_xref(self):
        d = self.data
        at = d.rfind(b"startxref")
        if at < 0:
            return
        m = re.compile(rb"startxref[\x00\t\n\x0c\r ]+(\d+)").match(d, at)
        if not m:
            return
        pos = int(m.group(1))
        seen_tables = set()
        xref_off: dict[int, int] = {}
        while pos not in seen_tables:
            seen_tables.add(pos)
            lex = _Lexer(d, pos)
            lex._skip_ws()
            if not d.startswith(b"xref", lex.pos):
                return  # cross-reference STREAM: scan index stands
            lex.pos += 4
            while True:
                lex._skip_ws()
                if d.startswith(b"trailer", lex.pos):
                    lex.pos += 7
                    trailer = lex.parse_object()
                    if isinstance(trailer, dict):
                        if self._root_ref is None and isinstance(
                                trailer.get("/Root"), Ref):
                            self._root_ref = trailer["/Root"]
                        prev = trailer.get("/Prev")
                        if isinstance(prev, int):
                            pos = prev
                            break
                    self._offsets.update(xref_off)
                    return
                sub = re.compile(
                    rb"(\d+)[\x00\t\n\x0c\r ]+(\d+)").match(d, lex.pos)
                if not sub:
                    return
                start, count = int(sub.group(1)), int(sub.group(2))
                lex.pos = sub.end()
                for i in range(count):
                    lex._skip_ws()
                    ent = d[lex.pos:lex.pos + 18]
                    if len(ent) < 18:
                        return
                    lex.pos += 18
                    if ent[17:18] not in b"n" or (start + i) in xref_off:
                        # chains run newest table FIRST: the first entry
                        # seen per object number wins (incremental update)
                        continue
                    off = int(ent[:10])
                    om = _OBJ_RE.match(d, off)
                    # only trust entries that really point at this object
                    if om and int(om.group(1)) == start + i:
                        xref_off[start + i] = om.end()

    # -- object access ----------------------------------------------------
    def resolve(self, obj):
        seen: set[int] = set()
        while isinstance(obj, Ref):
            if obj.num in seen:  # reference cycle (5 0 obj -> 5 0 R)
                return None
            seen.add(obj.num)
            obj = self.get(obj.num)
        return obj

    def get(self, num: int):
        if num in self._cache:
            return self._cache[num]
        if num not in self._offsets:
            self._cache[num] = None
            return None
        lex = _Lexer(self.data, self._offsets[num])
        obj = lex.parse_object()
        self._cache[num] = obj
        if isinstance(obj, dict):
            lex._skip_ws()
            if self.data.startswith(b"stream", lex.pos):
                p = lex.pos + 6
                if self.data.startswith(b"\r\n", p):
                    p += 2
                elif self.data.startswith(b"\n", p):
                    p += 1
                length = self.resolve(obj.get("/Length"))
                if not isinstance(length, int):
                    # broken /Length: scan for endstream
                    end = self.data.find(b"endstream", p)
                    if end < 0:
                        raise PdfParseError(f"object {num}: unterminated "
                                            "stream")
                    length = end - p
                    if self.data[p:end].endswith(b"\r\n"):
                        length -= 2
                    elif self.data[p:end].endswith(b"\n"):
                        length -= 1
                self._streams[num] = self.data[p:p + length]
        return obj

    def stream_bytes(self, num: int) -> bytes | None:
        obj = self.get(num)
        if num not in self._streams or not isinstance(obj, dict):
            return None
        return _decode_stream(self._streams[num], obj, self.resolve)

    # -- /ObjStm ----------------------------------------------------------
    def _unpack_object_streams(self):
        # last-definition-wins across BOTH definition kinds: a packed
        # object is only authoritative if no full "N 0 obj" definition
        # (and no other ObjStm packing it) appears LATER in the file —
        # offsets, not iteration order, decide (an incremental update can
        # redefine an originally-packed object with a full def that sits
        # after the ObjStm container in the byte stream).
        packed_src: dict[int, int] = {}  # onum -> winning container offset
        for num in list(self._offsets):
            try:
                obj = self.get(num)
            except PdfParseError:
                continue
            if not (isinstance(obj, dict)
                    and self.resolve(obj.get("/Type")) == "/ObjStm"):
                continue
            payload = self.stream_bytes(num)
            if payload is None:
                continue
            cont_off = self._offsets[num]
            n = self.resolve(obj.get("/N"))
            first = self.resolve(obj.get("/First"))
            if not isinstance(n, int) or not isinstance(first, int):
                raise PdfParseError(f"object stream {num}: bad /N//First")
            head = _Lexer(payload)
            pairs = []
            for _ in range(n):
                onum = head.parse_object()
                off = head.parse_object()
                if not isinstance(onum, int) or not isinstance(off, int):
                    raise PdfParseError(
                        f"object stream {num}: malformed header")
                pairs.append((onum, off))
            for onum, off in pairs:
                full_off = self._offsets.get(onum)
                if full_off is not None and full_off > cont_off:
                    continue  # a later full "N 0 obj" redefinition wins
                prev = packed_src.get(onum)
                if prev is not None and prev > cont_off:
                    continue  # a later ObjStm already packed this object
                inner = _Lexer(payload, first + off)
                self._cache[onum] = inner.parse_object()
                # packed objects cannot carry streams: drop any payload a
                # superseded earlier full definition registered
                self._streams.pop(onum, None)
                packed_src[onum] = cont_off

    # -- page tree --------------------------------------------------------
    def pages(self) -> list[dict]:
        catalog = None
        if self._root_ref is not None:
            root = self.resolve(self._root_ref)
            if isinstance(root, dict):
                catalog = root
        if catalog is None:
            for num in sorted(set(self._offsets) | set(self._cache)):
                obj = self._cache.get(num) if num in self._cache \
                    else self.get(num)
                if isinstance(obj, dict) \
                        and self.resolve(obj.get("/Type")) == "/Catalog":
                    catalog = obj
        out: list[dict] = []
        if catalog is not None:
            root = self.resolve(catalog.get("/Pages"))
            seen: set[int] = set()

            def walk(node):
                if not isinstance(node, dict):
                    return
                t = self.resolve(node.get("/Type"))
                if t == "/Page":
                    out.append(node)
                    return
                for kid in self.resolve(node.get("/Kids")) or []:
                    if isinstance(kid, Ref):
                        if kid.num in seen:  # cycle guard
                            continue
                        seen.add(kid.num)
                    walk(self.resolve(kid))

            walk(root)
        if not out:  # no catalog resolved: every /Page in numeric order
            nums = sorted(set(self._offsets) | set(self._cache))
            for num in nums:
                obj = self.get(num) if num in self._offsets \
                    else self._cache.get(num)
                if isinstance(obj, dict) \
                        and self.resolve(obj.get("/Type")) == "/Page":
                    out.append(obj)
        return out

    def page_content(self, page: dict) -> bytes:
        contents = page.get("/Contents")
        resolved = self.resolve(contents)
        if isinstance(resolved, list):
            refs = resolved
        elif isinstance(contents, Ref):
            refs = [contents]
        else:
            refs = []
        parts = []
        for ref in refs:
            if isinstance(ref, Ref):
                payload = self.stream_bytes(ref.num)
                if payload is not None:
                    parts.append(payload)
        # spec: an array of streams is equivalent to their concatenation
        # with a whitespace byte between
        return b"\n".join(parts)

    def _page_resources(self, page: dict) -> dict | None:
        """The page's /Resources dict, inherited through /Parent when
        the page dict omits it (PDF 32000-1 §7.7.3.4)."""
        node: object = page
        seen: set[int] = set()
        while isinstance(node, dict):
            r = self.resolve(node.get("/Resources"))
            if isinstance(r, dict):
                return r
            par = node.get("/Parent")
            if isinstance(par, Ref):
                if par.num in seen:     # malformed parent cycle
                    return None
                seen.add(par.num)
            node = self.resolve(par)
        return None

    def page_images(self, page: dict) -> list[bytes]:
        """Decoded stream bytes of every /Subtype /Image XObject in the
        page's resources, in resource-name order (the scanned-page leg:
        these are the bytes an OCR engine would read)."""
        res = self._page_resources(page)
        out: list[bytes] = []
        if isinstance(res, dict):
            xdict = self.resolve(res.get("/XObject"))
            if isinstance(xdict, dict):
                for _name, xref in sorted(xdict.items()):
                    if not isinstance(xref, Ref):
                        continue
                    xobj = self.resolve(xref)
                    if isinstance(xobj, dict) \
                            and self.resolve(
                                xobj.get("/Subtype")) == "/Image":
                        payload = self.stream_bytes(xref.num)
                        if payload is not None:
                            out.append(payload)
        return out

    def page_cmaps(self, page: dict) -> dict:
        """Font name -> parsed /ToUnicode CMap (or /Differences map)
        for ``page`` (fonts with neither are absent — they keep the
        latin-1/BOM rules)."""
        res = self._page_resources(page)
        fonts: dict = {}
        if isinstance(res, dict):
            fdict = self.resolve(res.get("/Font"))
            if isinstance(fdict, dict):
                for name, fref in fdict.items():
                    fobj = self.resolve(fref)
                    if not isinstance(fobj, dict):
                        continue
                    tu = fobj.get("/ToUnicode")
                    if isinstance(tu, Ref):
                        payload = self.stream_bytes(tu.num)
                        if payload is not None:
                            fonts[name] = _parse_tounicode(payload)
                            continue  # ToUnicode is authoritative
                    enc = self.resolve(fobj.get("/Encoding"))
                    if isinstance(enc, dict):
                        diffs = self.resolve(enc.get("/Differences"))
                        if isinstance(diffs, list):
                            # any element may be indirect (sweep-17): a
                            # resolvable ref substitutes its object; a
                            # DANGLING one resolves to None and fails
                            # _parse_differences loudly (error row,
                            # never silently shifted codes)
                            diffs = [self.resolve(el)
                                     if isinstance(el, Ref) else el
                                     for el in diffs]
                            fonts[name] = (1, _parse_differences(diffs))
        return fonts


# --------------------------------------------------------------------------
# /ToUnicode CMap (r14, VERDICT r11 task 4)
# --------------------------------------------------------------------------

_CSPACE_RE = re.compile(rb"begincodespacerange(.*?)endcodespacerange", re.S)
_BFCHAR_RE = re.compile(rb"beginbfchar(.*?)endbfchar", re.S)
_BFRANGE_RE = re.compile(rb"beginbfrange(.*?)endbfrange", re.S)
_CTOK_RE = re.compile(rb"<([0-9A-Fa-f]+)>|(\[)|(\])")


def _parse_tounicode(payload: bytes) -> tuple[int, dict[int, str]]:
    """Minimal /ToUnicode CMap reader: ``(code_width_bytes, code ->
    unicode string)``.  Covers the surface real ToUnicode CMaps use —
    codespacerange (code width), bfchar pairs, bfrange in both the
    incrementing-destination form (the LAST BYTE of the destination
    increments, PDF 32000-1 §9.10.3) and the array-destination form.
    Malformed sections raise :class:`PdfParseError` loudly."""
    width = 1
    widths = set()
    for m in _CSPACE_RE.finditer(payload):
        for tok in _CTOK_RE.finditer(m.group(1)):
            if tok.group(1):
                widths.add(max(1, len(tok.group(1)) // 2))
    if len(widths) > 1:
        # sweep-17 guard: MIXED code widths (a CID-style multi-range
        # codespace like <00><80> <8140><9ffc>) cannot decode through a
        # single fixed-width show-string walk — silently picking the
        # first range's width would emit garbage text for every code of
        # the other width.  Out of the documented simple-ToUnicode
        # surface: refuse the FILE loudly (the error-isolation rows turn
        # this into an error row, never silent text).
        raise PdfParseError(
            f"ToUnicode: mixed codespace widths {sorted(widths)} — "
            f"multi-width CMaps are outside the simple-font surface")
    if widths:
        width = widths.pop()
    mapping: dict[int, str] = {}

    def u16(hx: bytes) -> str:
        try:
            return bytes.fromhex(hx.decode("ascii")).decode(
                "utf-16-be", errors="replace")
        except ValueError as e:
            raise PdfParseError(f"ToUnicode: bad hex <{hx!r}>") from e

    for m in _BFCHAR_RE.finditer(payload):
        toks = [t.group(1) for t in _CTOK_RE.finditer(m.group(1))
                if t.group(1)]
        if len(toks) % 2:
            raise PdfParseError("ToUnicode: odd bfchar token count")
        for i in range(0, len(toks), 2):
            mapping[int(toks[i], 16)] = u16(toks[i + 1])
    for m in _BFRANGE_RE.finditer(payload):
        toks = list(_CTOK_RE.finditer(m.group(1)))
        i = 0
        while i < len(toks):
            if not (i + 2 < len(toks) and toks[i].group(1)
                    and toks[i + 1].group(1)):
                raise PdfParseError("ToUnicode: malformed bfrange")
            lo = int(toks[i].group(1), 16)
            hi = int(toks[i + 1].group(1), 16)
            if hi < lo:
                raise PdfParseError("ToUnicode: descending bfrange")
            if toks[i + 2].group(2):            # [ <d1> <d2> ... ]
                i += 3
                code = lo
                while i < len(toks) and not toks[i].group(3):
                    if not toks[i].group(1):
                        raise PdfParseError(
                            "ToUnicode: bad bfrange array")
                    mapping[code] = u16(toks[i].group(1))
                    code += 1
                    i += 1
                if i >= len(toks):
                    raise PdfParseError(
                        "ToUnicode: unterminated bfrange array")
                i += 1                           # the closing ]
            else:                                # incrementing dst
                # sweep-16 guard: a hostile <000000> <ffffff> range would
                # materialize millions of entries (a task-stalling DoS on
                # a poison PDF); no real codespace exceeds 2 bytes, so no
                # legit CMap maps more than 0x10000 codes
                if hi - lo + 1 > 0x10000 \
                        or len(mapping) + (hi - lo + 1) > 0x10000:
                    raise PdfParseError(
                        "ToUnicode: bfrange wider than the 2-byte "
                        "codespace — refusing a hostile/corrupt CMap")
                dst = bytearray.fromhex(
                    toks[i + 2].group(1).decode("ascii"))
                if not dst:
                    raise PdfParseError("ToUnicode: empty bfrange dst")
                if dst[-1] + (hi - lo) > 0xFF:
                    # sweep-17 guard: §9.10.3 increments the LAST BYTE of
                    # the destination; a range crossing the byte boundary
                    # is invalid (Adobe CMap rule) and the old masked
                    # wrap-around silently mapped the overflowing codes
                    # BACKWARDS (<00FF> + 1 -> <0000>) — garbage text.
                    # Refuse loudly instead.
                    raise PdfParseError(
                        "ToUnicode: bfrange destination crosses a byte "
                        "boundary — invalid per the CMap increment rule")
                for off in range(hi - lo + 1):
                    d = bytearray(dst)
                    d[-1] = d[-1] + off           # last-byte increment
                    mapping[lo + off] = bytes(d).decode(
                        "utf-16-be", errors="replace")
                i += 3
    return width, mapping


# --------------------------------------------------------------------------
# content-stream text extraction
# --------------------------------------------------------------------------

def _decode_show_string(raw: bytes,
                        cmap: tuple[int, dict[int, str]] | None = None
                        ) -> str:
    if cmap is not None:
        width, mapping = cmap
        out = []
        for i in range(0, len(raw), width):
            chunk = raw[i:i + width]
            s = mapping.get(int.from_bytes(chunk, "big"))
            # unmapped code: best-effort latin-1 of the raw bytes
            out.append(s if s is not None else chunk.decode("latin-1"))
        return "".join(out)
    if raw.startswith(b"\xfe\xff"):
        return raw[2:].decode("utf-16-be", errors="replace")
    return raw.decode("latin-1")


_NUM_RE = re.compile(rb"[+-]?(\d+\.?\d*|\.\d+)")

#: TJ kern (thousandths of an em, negative = rightward gap) at or beyond
#: which a space is emitted — ~0.18 em is the conventional word-gap
#: threshold (tight tracking stays well under it)
_TJ_SPACE_KERN = 180


def _extract_page_text(content: bytes,
                       fonts: dict[str, tuple[int, dict[int, str]]]
                       | None = None) -> str:
    """Module-docstring text-operator semantics over one page's
    (concatenated) content stream.  ``fonts`` maps resource font names
    (``/F1``) to parsed /ToUnicode CMaps; the ``Tf`` operator selects
    the current one for show-string decode."""
    out: list[str] = []
    lex = _Lexer(content)
    d = content
    n = len(d)
    operands: list[object] = []
    cmap: tuple[int, dict[int, str]] | None = None
    # newline ops (T*, Td/TD, ', ") only EMIT once a show op has run in
    # the current BT block — the initial cursor positioning after BT is
    # layout, not a line break (otherwise every page starts with "\n")
    shown = False
    while True:
        lex._skip_ws()
        if lex.pos >= n:
            break
        c = d[lex.pos]
        if c in b"(<[/" or (c in b"+-.0123456789"):
            if d.startswith(b"<<", lex.pos):
                operands.append(lex._parse_dict())
                continue
            try:
                operands.append(lex.parse_object())
            except PdfParseError:
                lex.pos += 1
            continue
        # operator token
        start = lex.pos
        while lex.pos < n and d[lex.pos] not in _WS \
                and d[lex.pos] not in _DELIM:
            lex.pos += 1
        op = d[start:lex.pos]
        if op == b"Tj":
            if operands and isinstance(operands[-1], bytes):
                out.append(_decode_show_string(operands[-1], cmap))
                shown = True
        elif op == b"TJ":
            if operands and isinstance(operands[-1], list):
                for el in operands[-1]:
                    if isinstance(el, bytes):
                        out.append(_decode_show_string(el, cmap))
                        shown = True
                    elif isinstance(el, (int, float)) \
                            and el <= -_TJ_SPACE_KERN and shown \
                            and out and not out[-1].endswith((" ", "\n")):
                        # a large negative kern is an inter-word gap in
                        # the wild (words are rarely written with space
                        # glyphs in kerned PDFs) — emit one space
                        out.append(" ")
        elif op in (b"'", b'"'):
            if shown:
                out.append("\n")
            if operands and isinstance(operands[-1], bytes):
                out.append(_decode_show_string(operands[-1], cmap))
                shown = True
        elif op == b"T*":
            if shown:
                out.append("\n")
        elif op in (b"Td", b"TD"):
            if shown and len(operands) >= 2 \
                    and isinstance(operands[-1], (int, float)) \
                    and operands[-1] != 0:
                out.append("\n")
        elif op == b"Tf":
            if fonts and len(operands) >= 2 \
                    and isinstance(operands[-2], str):
                cmap = fonts.get(operands[-2])
        elif op == b"BT":
            shown = False
        elif op == b"BI":
            # inline image: skip to EI (binary payload would desync the lexer)
            end = d.find(b"EI", lex.pos)
            lex.pos = n if end < 0 else end + 2
        operands = []
    return "".join(out)


def ocr_stub(image_bytes: bytes) -> str:
    """Deterministic OCR stand-in (the embedder-seam pattern,
    core/document_processing provider OCR analog): reads back the
    fake-scan format :func:`write_pdf` ``scanned=`` emits — the image
    stream IS the page text's utf-8 bytes.  A real deployment passes
    pytesseract/a provider client through the same ``ocr=`` slot; the
    plumbing (scanned-page detection, XObject resolution, per-page
    image extraction) is identical and fully tested."""
    return image_bytes.decode("utf-8", errors="replace")


def extract_pdf_pages(data: bytes, ocr=None) -> list[str]:
    """Ordered per-page text of ``data`` (module docstring semantics).
    Raises :class:`PdfParseError` for encrypted input, non-Flate filters,
    or structurally unparseable files.

    ``ocr`` (r14): optional ``Callable[[bytes], str]`` for SCANNED
    pages — a page whose text layer is EMPTY but whose resources carry
    /Image XObjects routes each image through ``ocr`` and joins the
    results (the reference's provider-OCR path in
    services/processPDF.py).  Without ``ocr`` such pages stay empty —
    the r13 behavior, honest and silent-wrong-free (no text exists in
    the text layer)."""
    if not data.startswith(b"%PDF-"):
        raise PdfParseError("not a PDF: missing %PDF- header")
    doc = _PdfDoc(data)
    pages = doc.pages()
    if not pages:
        raise PdfParseError("no pages found in PDF")
    out = []
    for p in pages:
        text = _extract_page_text(doc.page_content(p), doc.page_cmaps(p))
        if text == "" and ocr is not None:
            images = doc.page_images(p)
            if images:
                text = "\n".join(ocr(img) for img in images)
        out.append(text)
    return out


# --------------------------------------------------------------------------
# Spark source + per-page memory projection
# --------------------------------------------------------------------------

PDF_SCHEMA = ("path string, page int, total_pages int, text string, "
              "error string")


def make_pdf_extract_kernel(ocr=None):
    """Kernel factory: a mapInPandas kernel over {path|doc-id column
    first, content binary} — one output row per page; files outside the
    documented surface emit a single row with ``error`` set and NULL
    text (decode-tolerant like the WARC reader — one poison file must
    not kill a 100 TB scan, but the failure is VISIBLE, never silent
    empty text).  ``ocr`` plugs the scanned-page seam
    (:func:`extract_pdf_pages`)."""

    def kernel(batches):
        import pandas as pd

        for pdf in batches:
            key_col = pdf.columns[0]
            rows = []
            for key, content in zip(pdf[key_col], pdf["content"]):
                try:
                    pages = extract_pdf_pages(bytes(content), ocr=ocr)
                    total = len(pages)
                    for i, text in enumerate(pages):
                        rows.append((key, i + 1, total, text, None))
                except Exception as e:  # noqa: BLE001 — decode-tolerant
                    rows.append((key, None, None, None,
                                 f"{type(e).__name__}: {e}"))
            yield pd.DataFrame(rows, columns=[
                key_col, "page", "total_pages", "text", "error"])

    return kernel


#: the default (no-OCR) kernel — the r13 surface, unchanged
pdf_extract_kernel = make_pdf_extract_kernel()


def read_pdf(spark: SparkSession, path: str, glob: str = "*.pdf") -> DataFrame:
    """Read PDF files under ``path`` into ``{path, page, total_pages,
    text, error}`` — one ``binaryFile`` scan (file-level parallelism; a
    1000-executor cluster assigns files round-robin) + one Arrow kernel;
    ``content`` is pruned into the kernel and never shuffled."""
    files = (spark.read.format("binaryFile")
             .option("pathGlobFilter", glob).load(path)
             .select("path", "content"))
    return files.mapInPandas(pdf_extract_kernel, PDF_SCHEMA)


def pdf_pages_to_memories(pages: DataFrame) -> DataFrame:
    """The reference's per-page memory shape (processPDF.process_pdf:38 —
    one memory per page, metadata ``{file, page: "N of M"}``): parsed
    page rows -> ``{memory_id, content, file, page_label}`` ready for the
    S11 ingest chain (sources/documents.hierarchical_chunk downstream).
    Error rows (unparseable files) are excluded — they carry no text."""
    from pyspark.sql import functions as F

    key = pages.columns[0]
    fname = F.element_at(F.split(F.col(key).cast("string"), "/"), -1)
    return (pages.filter(F.col("error").isNull())
            .select(F.concat(F.lit("pdf_"),
                             F.sha2(F.concat_ws(
                                 "#", F.col(key).cast("string"),
                                 F.col("page").cast("string")), 256)
                             .substr(1, 16)).alias("memory_id"),
                    F.col("text").alias("content"),
                    fname.alias("file"),
                    F.concat(F.col("page").cast("string"), F.lit(" of "),
                             F.col("total_pages").cast("string"))
                    .alias("page_label")))
