"""Sixteenth adversarial sweep (VERDICT r11 task 5): r13-new code vs
hostile inputs — PDF object-index scan on lying bytes, ToUnicode CMap
bombs, robots precedence/metachar edges, connector unicode keys, magic
sniff false positives — plus the r14-new crawl_frontier edges.

Bugs found and fixed this sweep (each pinned below):
- _parse_tounicode materialized a hostile <000000><ffffff> bfrange as
  16.7M dict entries (~18 s, a task-stalling DoS on a poison PDF) —
  now refused loudly past the 2-byte codespace.
- sniff_mime routed NUL-bearing binaries whose bytes happen to be valid
  UTF-8 (RIFF/AVI headers) to text/plain — real text never contains
  NUL (the libmagic convention).
- sniff_mime matched "P6" without the required whitespace, routing
  ordinary text starting "P6x..." to the image prober.
"""

import pytest

from memory_opensource_spark.sources.pdf import (PdfParseError,
                                                 extract_pdf_pages,
                                                 write_pdf)


# --- PDF object-index scan on hostile bytes --------------------------------

def test_phantom_obj_tokens_inside_stream_payloads():
    """'N G obj' byte sequences inside an UNCOMPRESSED content stream
    create scan-index phantoms; with a valid xref present the phantoms
    must not add pages or shadow real objects."""
    evil_page = "99 0 obj << /Type /Page /Contents 4 0 R >> endobj"
    data = write_pdf([evil_page, "real second page"], compress=False)
    assert extract_pdf_pages(data) == [evil_page, "real second page"]
    # phantom REDEFINITION of a real object (the font) inside the stream
    evil_redef = "3 0 obj << /Type /Font >> endobj"
    assert extract_pdf_pages(
        write_pdf([evil_redef], compress=False)) == [evil_redef]


def _rewrite_xref_entry(data: bytes, obj_idx: int, new_off: int) -> bytes:
    import re

    xref_at = int(re.search(rb"startxref\n(\d+)", data).group(1))
    trailer_at = data.rfind(b"trailer")
    parts = data[xref_at:trailer_at].split(b"\n", 2)
    rows = [parts[2][i:i + 20] for i in range(0, len(parts[2]), 20)]
    rows[obj_idx] = b"%010d 00000 n \n" % new_off
    return (data[:xref_at] + parts[0] + b"\n" + parts[1] + b"\n"
            + b"".join(rows) + data[trailer_at:])


def test_lying_xref_entries_are_distrusted():
    """An xref entry whose offset does not actually point at its object
    ('4 0 obj' expected, finds '1 0 obj' or void) must be ignored — the
    scan index stands for that object and the text still parses."""
    import re

    data = write_pdf(["trusted text"], compress=False)
    at_obj1 = re.search(rb"1 0 obj", data).start()
    assert extract_pdf_pages(
        _rewrite_xref_entry(data, 4, at_obj1)) == ["trusted text"]
    assert extract_pdf_pages(
        _rewrite_xref_entry(data, 4, 9_999_999)) == ["trusted text"]


# --- ToUnicode CMap bombs ----------------------------------------------------

def test_cmap_bfrange_bomb_refused():
    """sweep-16 fix: a bfrange wider than the 2-byte codespace is a
    hostile/corrupt CMap — refused loudly instead of materializing
    millions of entries (pre-fix: 16.7M dict entries, ~18 s)."""
    from memory_opensource_spark.sources.pdf import _parse_tounicode

    with pytest.raises(PdfParseError, match="bfrange wider"):
        _parse_tounicode(
            b"1 beginbfrange\n<000000> <ffffff> <0041>\nendbfrange\n")
    # and cumulative ranges that together exceed the codespace — each
    # range here is individually byte-boundary-legal (sweep-17 added
    # that stricter guard, which now fires FIRST on the old 2-range
    # vector), so the cumulative bomb needs many small ranges
    ranges = b"".join(b"<%06x> <%06x> <0100>\n" % (k * 255, k * 255 + 254)
                      for k in range(258))
    with pytest.raises(PdfParseError, match="bfrange wider"):
        _parse_tounicode(
            b"258 beginbfrange\n" + ranges + b"endbfrange\n")
    # a full single 2-byte-codespace range is legitimate and bounded
    from memory_opensource_spark.sources.pdf import _parse_tounicode as p
    _, m = p(b"1 beginbfrange\n<0000> <00ff> <0100>\nendbfrange\n")
    assert len(m) == 256


def test_hostile_cmap_fails_the_file_loudly():
    """A structurally hostile CMap attached to a page font makes the
    FILE fail with PdfParseError (the per-file error row in the scan
    kernel) — never silent wrong text."""
    base = write_pdf(["some text"], compress=False, cmap_font=True)
    # blow up the CMap stream body: replace its bfchar section with a bomb
    import re

    m = re.search(rb"begincodespacerange", base)
    assert m
    evil = base.replace(
        b"begincodespacerange",
        b"begincodespacerange ", 1)  # keep structure; now damage ranges
    evil = evil.replace(b"beginbfchar",
                        b"beginbfrange\n<000000> <ffffff> <0041>\n"
                        b"endbfrange\n1 beginbfchar", 1)
    with pytest.raises(PdfParseError):
        extract_pdf_pages(evil)


# --- robots pattern compilation edges ---------------------------------------

def test_robots_pattern_metacharacters_and_anchors():
    """Regex metacharacters in patterns are literal; '$' anchors ONLY at
    the end; '*' runs collapse harmlessly; precedence picks the
    most-specific agent group."""
    import re

    from memory_opensource_spark.functions.robots import (_pattern_regex,
                                                          parse_robots)

    cases = [("/a.b", "/axb", False), ("/a.b", "/a.b", True),
             ("/a*b", "/aXXXb", True), ("/a**b", "/ab", True),
             ("/a$b", "/a$b", True),          # mid-$ is literal
             ("/a$", "/a", True), ("/a$", "/ab", False),
             ("/(x)", "/(x)", True),
             ("/a+b", "/a+b", True), ("/a+b", "/aab", False)]
    for pat, path, want in cases:
        assert bool(re.search(_pattern_regex(pat), path)) is want, \
            (pat, path)
    body = ("User-agent: *\nDisallow: /all\n"
            "User-agent: mybot\nDisallow: /mine\n")
    assert parse_robots(body, agent="MyBot/1.0") == [("/mine", False)]
    # percent-encoding stays byte-literal (documented: both sides of the
    # match use the bytes as given; no decode/normalize pass)
    assert parse_robots("User-agent: *\nDisallow: /a%20b\n",
                        agent="x") == [("/a%20b", False)]


# --- connector transposition unicode/nesting edges ---------------------------

def test_connector_ts_substring_unicode_and_deep_lists():
    """The ts-substring drop is a PYTHON substring test: ASCII 'ts'
    anywhere in the key drops it ('points', 'tsar'); a Cyrillic
    lookalike does not; recursion reaches dicts inside lists inside
    lists; flatten leaves lists as values."""
    from memory_opensource_spark.operators.connector import (
        flatten_dict, remove_ts_fields)

    obj = {"poinтs": 1,          # Cyrillic т — NOT 'ts'
           "points": 2, "tsar": 3,
           "ok": {"nested_ts_key": 4, "keep": 5},
           "lst": [{"ts": 1, "a": 2}, [{"counts": 3}], "plain"]}
    assert remove_ts_fields(obj) == {
        "poinтs": 1, "ok": {"keep": 5},
        "lst": [{"a": 2}, [{}], "plain"]}
    deep = {"a": [[[{"ts": 1, "b": [[[1, 2], [3]]]}]]]}
    assert remove_ts_fields(deep) == {"a": [[[{"b": [[[1, 2], [3]]]}]]]}
    assert flatten_dict({"a": {"b": {"c": 1}}, "l": [1, [2, 3]]}) == \
        {"a_b_c": 1, "l": [1, [2, 3]]}


# --- magic sniff false positives ---------------------------------------------

def test_sniff_mime_false_positive_guards():
    """Mid-file magic does not match; RIFF non-WAV and NUL-bearing
    'valid UTF-8' binaries fall to octet-stream (sweep-16 fix); P6
    needs its whitespace (sweep-16 fix); prefix rules still hit."""
    from memory_opensource_spark.sources.filetype import sniff_mime

    assert sniff_mime(b"text then %PDF-1.4 mid-file") == "text/plain"
    assert sniff_mime(b"%PDF") == "text/plain"        # no version dash
    assert sniff_mime(
        b"RIFF\x10\x00\x00\x00AVI LIST") == "application/octet-stream"
    assert sniff_mime(b"RIFF\x10\x00\x00\x00WAVEfmt ") == "audio/wav"
    assert sniff_mime(b"P6x not a ppm") == "text/plain"
    assert sniff_mime(b"P6 2 2 255 ...") == "image/x-portable-pixmap"
    assert sniff_mime(b"nul\x00text") == "application/octet-stream"
    assert sniff_mime(b"  <HtMl><body>") == "text/html"
    assert sniff_mime(b"\xff\xfb\x90\x00") == "audio/mpeg"
    assert sniff_mime(b"") == "text/plain"


# --- crawl_frontier edges ------------------------------------------------------

def test_crawl_frontier_null_dead_and_zero_rounds(spark):
    """NULL seed URLs vanish (canonical_url -> NULL -> fetch join drops),
    dead seeds (no page) vanish, rounds=0 returns only the gated seeds,
    and an empty seed set yields an empty result."""
    from memory_opensource_spark.plans.crawl import crawl_frontier

    pages = spark.createDataFrame(
        [("https://a.example/x", "<html></html>")],
        "url string, html string")
    seeds = spark.createDataFrame(
        [("https://a.example/x",), ("https://dead.example/y",), (None,)],
        "url string")
    out = crawl_frontier(seeds, pages, rounds=0)
    assert sorted((r.url, r.round) for r in out.collect()) == \
        [("https://a.example/x", 0)]
    empty = spark.createDataFrame([], "url string")
    assert crawl_frontier(empty, pages, rounds=2).count() == 0


# --- r14-late additions (fuzzy decon, politeness, sitemap directives) --------

def test_r14_late_edges(spark):
    """Newest-code edges: politeness_waves survives NULL host/url (the
    null-safe struct group; NULL order keys rank deterministically);
    fuzzy decon treats two EMPTY documents as identical (the shingle
    set of empty text is [""] across the whole dedup family, mirrored
    by the oracle) and never flags real text against empty evals;
    Sitemap directives tolerate space-before-colon, strip '#'
    fragments as comments (the REP rule), and ignore bare keys."""
    from pyspark.sql import functions as F

    from memory_opensource_spark.functions.robots import robots_sitemaps
    from memory_opensource_spark.operators.bloom import (
        fuzzy_contamination_flags)
    from memory_opensource_spark.plans.crawl import politeness_waves

    df = spark.createDataFrame(
        [("h.example", "https://h.example/1"),
         (None, "https://x.example/2"),
         ("h.example", None), (None, None)],
        "host string, url string")
    out = politeness_waves(df, 2).collect()
    assert len(out) == 4 and all(r.wave == 0 for r in out)

    c = spark.createDataFrame(
        [(1, ""), (2, None), (3, "real content here with words")],
        "doc_id long, text string")
    e = spark.createDataFrame([(9, ""), (8, None)],
                              "eval_id long, text string")
    flags = {r.doc_id: r.contaminated
             for r in fuzzy_contamination_flags(c, e).collect()}
    assert flags == {1: 1, 2: 1, 3: 0}

    rows = spark.createDataFrame(
        [("Sitemap:",), ("Sitemap: https://x/a.xml#frag",),
         ("  sitemap :https://y/b.xml",), (None,)],
        "content string").select(
        robots_sitemaps(F.col("content")).alias("s")).collect()
    assert [r.s for r in rows] == [
        [], ["https://x/a.xml"], ["https://y/b.xml"], []]
