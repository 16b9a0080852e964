"""PDF text-layer extraction (sources/pdf): builder/parser round-trip,
object-model edge cases, real-world files, and the S11 composition."""

import os

import pytest

from memory_opensource_spark.sources.pdf import (PdfParseError,
                                                 extract_pdf_pages,
                                                 write_pdf)

PAGES = ["hello world\nsecond line", "page two text", "",
         "unicode: café — “curly” ±5°", "trailing newline\n"]


@pytest.mark.parametrize("kw", [
    {}, {"compress": False}, {"hex_strings": True},
    {"split_streams": True},
    {"compress": False, "hex_strings": True, "split_streams": True}])
def test_round_trip_exact_across_builder_variants(kw):
    """Every builder surface variant (flate on/off, literal/hex strings,
    single/array /Contents) must round-trip the page list EXACTLY —
    including the empty page, embedded newlines and non-latin-1 text
    (the UTF-16BE-with-BOM leg)."""
    assert extract_pdf_pages(write_pdf(PAGES, **kw)) == PAGES


def test_string_escapes_and_delimiters_round_trip():
    tricky = ["a(b)c\\d", "(((nested)))", "tab\there",
              "%not a comment (x)", "octal\x08bell", "<angle> [brack]"]
    assert extract_pdf_pages(write_pdf(tricky)) == tricky
    assert extract_pdf_pages(write_pdf(tricky, hex_strings=True)) == tricky


def test_literal_string_escape_forms():
    """Hand-written content streams: octal escapes (1-3 digits),
    line continuations, unknown escapes (backslash dropped), and
    odd-digit hex strings (spec: pad with 0)."""
    from memory_opensource_spark.sources.pdf import _Lexer

    assert _Lexer(rb"(\101\102\60)").parse_object() == b"AB0"
    assert _Lexer(b"(a\\\nb)").parse_object() == b"ab"      # continuation
    assert _Lexer(b"(a\\\r\nb)").parse_object() == b"ab"
    assert _Lexer(rb"(\q)").parse_object() == b"q"          # unknown escape
    assert _Lexer(b"<414>").parse_object() == b"A@"         # odd hex pads 0
    assert _Lexer(b"<41 42\n43>").parse_object() == b"ABC"  # ws inside hex
    assert _Lexer(b"/Na#6de").parse_object() == "/Name"     # #xx name escape


def test_tj_kerning_emits_word_gaps():
    """A TJ array with a large negative kern emits one space (the wild-PDF
    word gap); small kerns do not."""
    from memory_opensource_spark.sources.pdf import _extract_page_text

    content = b"BT (Hel) Tj [(lo) -250 (world) -40 (!)] TJ ET"
    assert _extract_page_text(content) == "Hello world!"


def test_incremental_update_last_definition_wins():
    """Appending a redefinition of a page's content stream (the PDF
    incremental-update form: new object + new xref with /Prev) must make
    the parser read the NEW text."""
    base = write_pdf(["old text"], compress=False)
    new_stream = (b"4 0 obj\n<< /Length 24 >>\nstream\n"
                  b"BT (replacement) Tj ET\n\nendstream\nendobj\n")
    at = len(base)
    xref_at = at + len(new_stream)
    update = (new_stream
              + b"xref\n0 1\n0000000000 65535 f \n4 1\n"
              + b"%010d 00000 n \n" % at
              + b"trailer\n<< /Size 6 /Root 1 0 R /Prev "
              + str(base.rfind(b"xref")).encode() + b" >>\nstartxref\n"
              + str(xref_at).encode() + b"\n%%EOF\n")
    assert extract_pdf_pages(base + update) == ["replacement"]


def test_object_stream_objects_parse():
    """/Type /ObjStm compressed objects (the modern-PDF form): page and
    catalog dicts packed into one flate stream must still be indexed and
    the page tree walked."""
    import zlib

    content = b"BT (objstm text) Tj ET"
    inner = (b"<< /Type /Catalog /Pages 2 0 R >>"
             b"<< /Type /Pages /Kids [3 0 R] /Count 1 >>"
             b"<< /Type /Page /Parent 2 0 R /Contents 4 0 R >>")
    off1 = 0
    off2 = off1 + 33
    off3 = off2 + 41
    header = b"1 %d 2 %d 3 %d " % (off1, off2, off3)
    payload = zlib.compress(header + inner)
    body = (b"%PDF-1.5\n"
            b"5 0 obj\n<< /Type /ObjStm /N 3 /First " +
            str(len(header)).encode() +
            b" /Length " + str(len(payload)).encode() +
            b" /Filter /FlateDecode >>\nstream\n" + payload +
            b"\nendstream\nendobj\n"
            b"4 0 obj\n<< /Length " + str(len(content)).encode() +
            b" >>\nstream\n" + content + b"\nendstream\nendobj\n")
    assert extract_pdf_pages(body) == ["objstm text"]


def _objstm_body(content: bytes, contents_ref: bytes = b"4 0 R") -> bytes:
    """Minimal ObjStm-packed PDF: catalog/pages/page packed in object 5,
    content stream as full object 4."""
    import zlib

    inner = (b"<< /Type /Catalog /Pages 2 0 R >>"
             b"<< /Type /Pages /Kids [3 0 R] /Count 1 >>"
             b"<< /Type /Page /Parent 2 0 R /Contents " + contents_ref
             + b" >>")
    header = b"1 0 2 33 3 74 "
    payload = zlib.compress(header + inner)
    return (b"%PDF-1.5\n"
            b"5 0 obj\n<< /Type /ObjStm /N 3 /First " +
            str(len(header)).encode() +
            b" /Length " + str(len(payload)).encode() +
            b" /Filter /FlateDecode >>\nstream\n" + payload +
            b"\nendstream\nendobj\n"
            b"4 0 obj\n<< /Length " + str(len(content)).encode() +
            b" >>\nstream\n" + content + b"\nendstream\nendobj\n")


def test_objstm_then_full_redefinition_wins():
    """ADVICE r11 (pdf.py _unpack_object_streams): an incremental update
    that appends a FULL 'N 0 obj' redefinition of an object originally
    packed in an object stream must win — the packed version is stale.
    Pre-fix the ObjStm cache was consulted before _offsets and the new
    definition was silently ignored."""
    base = _objstm_body(b"BT (objstm text) Tj ET")
    new_content = b"BT (updated text) Tj ET"
    update = (b"6 0 obj\n<< /Length " + str(len(new_content)).encode() +
              b" >>\nstream\n" + new_content + b"\nendstream\nendobj\n"
              b"3 0 obj\n<< /Type /Page /Parent 2 0 R /Contents 6 0 R >>"
              b"\nendobj\n")
    assert extract_pdf_pages(base + update) == ["updated text"]


def test_full_then_objstm_redefinition_wins():
    """Symmetric case: the ObjStm container sits AFTER an earlier full
    definition in the byte stream, so the PACKED version is the newest
    and must win (plain last-definition-wins, either definition kind)."""
    stale_page = (b"%PDF-1.5\n"
                  b"3 0 obj\n<< /Type /Page /Parent 2 0 R /Contents 6 0 R"
                  b" >>\nendobj\n"
                  b"6 0 obj\n<< /Length 21 >>\nstream\n"
                  b"BT (stale text) Tj ET\nendstream\nendobj\n")
    body = _objstm_body(b"BT (packed wins) Tj ET")
    assert extract_pdf_pages(
        stale_page + body[len(b"%PDF-1.5\n"):]) == ["packed wins"]


def test_cmap_font_roundtrip_variants():
    """r14 /ToUnicode CMap: cmap_font=True writes show strings in a
    non-identity byte code (gibberish under latin-1) that only a real
    CMap decode recovers — swept across compression, split streams,
    1-byte and 2-byte codespaces, and astral (surrogate-pair) chars."""
    pages = ["hello CMap world", "naïve — ünïcode\nsecond line"]
    for compress in (True, False):
        for split in (True, False):
            data = write_pdf(pages, compress=compress,
                             split_streams=split, cmap_font=True)
            assert extract_pdf_pages(data) == pages
    # the encoding is really non-identity: neither the literal nor the
    # hex form of the plain text appears in an uncompressed build
    data = write_pdf(["abc"], compress=False, cmap_font=True)
    assert b"(abc)" not in data
    assert b"616263" not in data.lower()
    # >254 distinct chars forces the 2-byte codespace
    big = "".join(chr(0x100 + i) for i in range(300)) + " mixed ascii"
    assert extract_pdf_pages(write_pdf([big], cmap_font=True)) == [big]
    # astral chars ride bfchar with surrogate-pair destinations
    emoji = "astral: \U0001F600\U0001F680 end"
    assert extract_pdf_pages(write_pdf([emoji], cmap_font=True)) == [emoji]


def test_cmap_parser_forms_and_fallback():
    """_parse_tounicode covers both bfrange forms (incrementing dst with
    the LAST-BYTE rule; array dst), bfchar, code width from the
    codespacerange — and unmapped codes fall back to latin-1 bytes."""
    from memory_opensource_spark.sources.pdf import (_decode_show_string,
                                                     _parse_tounicode)

    cmap = (b"/CIDInit /ProcSet findresource begin\nbegincmap\n"
            b"1 begincodespacerange\n<00> <ff>\nendcodespacerange\n"
            b"2 beginbfchar\n<01> <0041>\n<02> <D83DDE00>\nendbfchar\n"
            b"1 beginbfrange\n<10> <12> <0061>\nendbfrange\n"
            b"1 beginbfrange\n<20> <21> [<005A> <0059>]\nendbfrange\n"
            b"endcmap\nend")
    width, m = _parse_tounicode(cmap)
    assert width == 1
    assert m[0x01] == "A" and m[0x02] == "\U0001F600"
    assert (m[0x10], m[0x11], m[0x12]) == ("a", "b", "c")
    assert (m[0x20], m[0x21]) == ("Z", "Y")
    # decode with fallback: code 0x7A unmapped -> latin-1 'z'
    assert _decode_show_string(b"\x01\x7a\x10", (width, m)) == "Aza"
    # 2-byte codespace
    w2, m2 = _parse_tounicode(
        b"1 begincodespacerange\n<0000> <ffff>\nendcodespacerange\n"
        b"1 beginbfchar\n<0105> <0106>\nendbfchar\n")
    assert w2 == 2 and m2[0x105] == "Ć"
    # last-byte increment rule stays within the byte: dst <00FD> + range
    # of 3 -> FD, FE, FF (§9.10.3)
    _, m3 = _parse_tounicode(
        b"1 beginbfrange\n<01> <03> <00FD>\nendbfrange\n")
    assert (m3[1], m3[2], m3[3]) == ("ý", "þ", "ÿ")
    # sweep-17: a destination that would cross the byte boundary is
    # invalid per the CMap increment rule — the old masked wrap mapped
    # the overflow BACKWARDS (<00FE> + 2 -> <0000>), silent garbage;
    # now refused loudly
    with pytest.raises(PdfParseError, match="crosses a byte boundary"):
        _parse_tounicode(
            b"1 beginbfrange\n<01> <03> <00FE>\nendbfrange\n")


def test_cmap_resources_inherited_from_parent():
    """/Resources may live on the Pages NODE, not the page dict — the
    CMap must still be found through /Parent inheritance."""
    import zlib

    text = "parent resources"
    base = write_pdf([text], compress=False, cmap_font=True)
    # move the /Resources dict from the page object to the Pages node
    assert b"/Resources" in base
    import re as _re
    m = _re.search(rb"(\d+) 0 obj\n<< /Type /Page /Parent 2 0 R "
                   rb"/MediaBox \[0 0 612 792\] "
                   rb"(/Resources << /Font << /F1 3 0 R >> >>) ", base)
    assert m, "writer layout changed — update this test"
    res = m.group(2)
    moved = base.replace(res + b" ", b"", 1).replace(
        b"2 0 obj\n<< /Type /Pages",
        b"2 0 obj\n<< " + res + b" /Type /Pages", 1)
    # offsets shifted: strip the xref so the scan index is used
    moved = moved[:moved.rfind(b"xref")] + b"%%EOF\n"
    assert extract_pdf_pages(moved) == [text]


def test_loud_refusals():
    with pytest.raises(PdfParseError, match="missing %PDF"):
        extract_pdf_pages(b"not a pdf at all")
    with pytest.raises(PdfParseError, match="unsupported stream filter"):
        extract_pdf_pages(
            write_pdf(["x"]).replace(b"/FlateDecode", b"/LZWDecode"))
    with pytest.raises(PdfParseError, match="encrypted"):
        extract_pdf_pages(
            write_pdf(["x"]).replace(b"/Root 1 0 R", b"/Root 1 0 R "
                                     b"/Encrypt 9 0 R"))
    with pytest.raises(PdfParseError, match="no pages"):
        extract_pdf_pages(b"%PDF-1.4\njunk only\n%%EOF")


@pytest.mark.parametrize("path", [
    "/usr/share/doc/libtasn1-doc/libtasn1.pdf",
    "/usr/share/doc/shared-mime-info/shared-mime-info-spec.pdf"])
def test_real_world_pdfs_extract_nonempty_pages(path):
    """Foreign PDFs (different producers, xref-stream era) must parse with
    every page non-empty — the best-effort leg of the documented
    surface."""
    if not os.path.exists(path):
        pytest.skip(f"{path} not in container")
    pages = extract_pdf_pages(open(path, "rb").read())
    assert len(pages) > 5
    assert all(t.strip() for t in pages)


def test_read_pdf_and_s11_composition(spark, tmp_path):
    """The full reference chain (processPDF -> per-page memories ->
    hierarchical chunking): read_pdf over a binaryFile dir, error file
    flagged not fatal, pdf_pages_to_memories shapes match, and
    hierarchical_chunk consumes the pages."""
    from pyspark.sql import functions as F

    from memory_opensource_spark.sources.documents import hierarchical_chunk
    from memory_opensource_spark.sources.pdf import (pdf_pages_to_memories,
                                                     read_pdf)

    d = tmp_path / "pdfs"
    d.mkdir()
    (d / "a.pdf").write_bytes(write_pdf(
        ["1. Title\nintro text body", "2. Methods\nmore body text"]))
    (d / "b.pdf").write_bytes(write_pdf(["single page doc"]))
    (d / "broken.pdf").write_bytes(b"%PDF-1.4\ngarbage")

    out = read_pdf(spark, str(d)).cache()
    rows = {(r.path.rsplit("/", 1)[-1], r.page): r for r in out.collect()}
    assert rows[("a.pdf", 1)].total_pages == 2
    assert rows[("a.pdf", 2)].text == "2. Methods\nmore body text"
    assert rows[("b.pdf", 1)].text == "single page doc"
    err = [r for r in rows.values() if r.error is not None]
    assert len(err) == 1 and "broken.pdf" in err[0].path
    assert err[0].text is None

    mems = pdf_pages_to_memories(out)
    got = {r.page_label: r for r in mems.collect()}
    assert set(got) == {"1 of 2", "2 of 2", "1 of 1"}
    assert got["2 of 2"].file == "a.pdf"
    assert got["2 of 2"].content.startswith("2. Methods")
    assert len({r.memory_id for r in got.values()}) == 3  # unique ids

    chunks = hierarchical_chunk(mems, id_col="memory_id",
                                content_col="content")
    by_mem = (chunks.groupBy("memory_id")
              .agg(F.count("*").alias("n"),
                   F.max("section_title").alias("title")).collect())
    assert len(by_mem) == 3
    titles = {r.title for r in by_mem}
    assert "1. Title" in titles and "2. Methods" in titles


def test_reference_cycle_terminates():
    """A self/mutually-referencing indirect object must not hang the
    resolver (pre-r13-hardening: resolve() looped forever)."""
    body = (b"%PDF-1.4\n"
            b"1 0 obj\n<< /Type /Catalog /Pages 2 0 R >>\nendobj\n"
            b"2 0 obj\n3 0 R\nendobj\n"
            b"3 0 obj\n2 0 R\nendobj\n")
    with pytest.raises(PdfParseError, match="no pages"):
        extract_pdf_pages(body)


def test_fuzzed_mutations_never_hang_or_crash_uncontrolled():
    """300 seeded random byte-mutations of a valid PDF: the parser must
    terminate with either extracted pages or PdfParseError — never an
    infinite loop and never a non-PdfParseError leak for structural
    damage the module claims to handle loudly.  (Kernel callers catch
    everything anyway; this pins the pure-fn contract.)"""
    import random

    base = write_pdf(["page one text\nsecond line", "page two"],
                     compress=False)
    rng = random.Random(1337)
    outcomes = {"ok": 0, "parse_err": 0, "other": 0}
    for _ in range(300):
        data = bytearray(base)
        for _ in range(rng.randint(1, 8)):
            data[rng.randrange(len(data))] = rng.randrange(256)
        try:
            pages = extract_pdf_pages(bytes(data))
            assert isinstance(pages, list)
            outcomes["ok"] += 1
        except PdfParseError:
            outcomes["parse_err"] += 1
        except Exception:
            outcomes["other"] += 1
    # every mutation terminates as pages or PdfParseError — the r13 fuzz
    # pass found (and fixed) hex-string decode leaking raw ValueError/
    # UnicodeDecodeError past the module contract
    assert outcomes["other"] == 0, outcomes
    assert outcomes["ok"] + outcomes["parse_err"] == 300


def test_diff_encoding_roundtrip_and_precedence():
    """r14 simple-font /Encoding /Differences: a non-identity byte code
    published as glyph names (letters/digits/AGL punctuation/uniXXXX/
    uXXXXX) round-trips; with BOTH tables present ToUnicode wins (a
    deliberately damaged Differences array must be ignored); alphabets
    past one byte refuse loudly."""
    import re

    pages = ["hello Differences 123!", "naïve — ünïcode\nsecond (line)"]
    for compress in (True, False):
        for split in (True, False):
            data = write_pdf(pages, compress=compress,
                             split_streams=split, diff_encoding=True)
            assert extract_pdf_pages(data) == pages
    data = write_pdf(["abc"], compress=False, diff_encoding=True)
    assert b"(abc)" not in data and b"616263" not in data.lower()
    emoji = "astral: \U0001F600 end"   # -> uXXXXX glyph-name form
    assert extract_pdf_pages(
        write_pdf([emoji], diff_encoding=True)) == [emoji]
    both = write_pdf(["precedence"], compress=False,
                     cmap_font=True, diff_encoding=True)
    assert extract_pdf_pages(both) == ["precedence"]
    evil = re.sub(rb"/Differences \[ [^\]]*\]",
                  b"/Differences [ 1 /Z ]", both)
    assert extract_pdf_pages(evil) == ["precedence"]
    big = "".join(chr(0x100 + i) for i in range(300))
    with pytest.raises(PdfParseError, match="single-byte"):
        write_pdf([big], diff_encoding=True)


def test_parse_differences_semantics():
    """Integers set the current code, names assign consecutively,
    unknown glyph names are SKIPPED (fallback codes), malformed
    entries raise."""
    from memory_opensource_spark.sources.pdf import (_decode_show_string,
                                                     _parse_differences)

    m = _parse_differences([65, "/a", "/b", 100, "/uni0416",
                            "/mystery.glyph", "/space"])
    assert m == {65: "a", 66: "b", 100: "Ж", 102: " "}
    # decode with fallback: unmapped 0x43 -> latin-1 'C'
    assert _decode_show_string(b"\x41\x43\x64", (1, m)) == "aCЖ"
    with pytest.raises(PdfParseError, match="name before any code"):
        _parse_differences(["/a"])
    with pytest.raises(PdfParseError, match="outside one byte"):
        _parse_differences([300, "/a"])
    with pytest.raises(PdfParseError, match="ran past"):
        _parse_differences([255, "/a", "/b"])


def test_scanned_pages_and_ocr_seam():
    """r14 scanned-page seam: image-only pages (no text operators, one
    /Image XObject drawn by Do) yield '' without ocr= and route their
    image bytes through the callable with it; mixed text/scanned and
    cmap+scanned docs compose; a legitimately empty TEXT page (no
    images) never triggers OCR."""
    from memory_opensource_spark.sources.pdf import ocr_stub

    pages = ["scan one text", "scan two — ünïcode"]
    for compress in (True, False):
        data = write_pdf(pages, compress=compress, scanned=True)
        assert extract_pdf_pages(data, ocr=ocr_stub) == pages
        assert extract_pdf_pages(data) == ["", ""]
    mixed = write_pdf(["text layer", "scanned page"], scanned={1})
    assert extract_pdf_pages(mixed, ocr=ocr_stub) == \
        ["text layer", "scanned page"]
    assert extract_pdf_pages(mixed) == ["text layer", ""]
    both = write_pdf(["cmap text", "scanned"], cmap_font=True,
                     scanned={1})
    assert extract_pdf_pages(both, ocr=ocr_stub) == \
        ["cmap text", "scanned"]
    empty_text = write_pdf(["", "x"])
    assert extract_pdf_pages(empty_text, ocr=ocr_stub) == ["", "x"]
    # the seam takes ANY callable — a custom engine sees the raw bytes
    seen = []

    def fake_engine(b):
        seen.append(b)
        return "ENGINE"

    assert extract_pdf_pages(
        write_pdf(["payload"], scanned=True, compress=False),
        ocr=fake_engine) == ["ENGINE"]
    assert seen == [b"payload"]
