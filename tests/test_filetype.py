"""File-type sniffing + multi-format ingest routing (sources/filetype):
the processPDF save_uploaded_file/loader-switch analog."""

import pytest

from memory_opensource_spark.sources.filetype import sniff_mime


@pytest.mark.parametrize("content,mime", [
    (b"%PDF-1.4\n...", "application/pdf"),
    (b"\x89PNG\r\n\x1a\n" + b"\x00" * 16, "image/png"),
    (b"GIF89a" + b"\x00" * 8, "image/gif"),
    (b"\xff\xd8\xff\xe0junk", "image/jpeg"),
    (b"P6\n2 2\n255\n" + b"\x00" * 12, "image/x-portable-pixmap"),
    (b"RIFF\x04\x00\x00\x00WAVE", "audio/wav"),
    (b"\x00\x00\x00\x18ftypisom" + b"\x00" * 8, "video/mp4"),
    (b"ID3\x04\x00\x00\x00\x00\x00\x00", "audio/mpeg"),
    (b"\xff\xfb\x90\x00frame", "audio/mpeg"),
    (b"<html><body>x</body></html>", "text/html"),
    (b"  \n\t<HTML>upper</HTML>", "text/html"),
    (b"\xef\xbb\xbf<!DOCTYPE html><html>", "text/html"),
    (b"just some plain prose", "text/plain"),
    ("unicode café text".encode(), "text/plain"),
    (b"\x00\x01\x02\xfe\xff\x80", "application/octet-stream"),
])
def test_sniff_mime_rule_table(content, mime):
    assert sniff_mime(content) == mime


def test_sniff_order_binary_magic_beats_text():
    """A PDF whose body is pure ASCII must still sniff as PDF (magic
    rules run before the UTF-8 fallback)."""
    assert sniff_mime(b"%PDF-1.4 plain ascii body") == "application/pdf"
    # html detection requires the tag at the (whitespace-stripped) head
    assert sniff_mime(b"prose mentioning <html> later") == "text/plain"


def test_route_documents_mixed_directory(spark, tmp_path):
    """ingest_files over a mixed dir: PDF pages explode, html extracts
    through the Column twin, txt decodes, wav skips typed, a corrupt
    PDF flags loudly per-row."""
    from memory_opensource_spark.sources.filetype import ingest_files
    from memory_opensource_spark.sources.multimodal import write_wav
    from memory_opensource_spark.sources.pdf import write_pdf

    d = tmp_path / "mixed"
    d.mkdir()
    (d / "doc.pdf").write_bytes(write_pdf(["page one", "page two"]))
    (d / "page.html").write_bytes(
        b"<html><body><h1>T</h1><p>body text</p></body></html>")
    (d / "note.txt").write_bytes(b"plain note")
    (d / "tone.wav").write_bytes(write_wav(8000, 1, 16, 100))
    (d / "bad.pdf").write_bytes(b"%PDF-1.4\ntruncated garbage")

    rows = ingest_files(spark, str(d)).collect()
    by = {}
    for r in rows:
        by.setdefault(r.path.rsplit("/", 1)[-1], []).append(r)
    assert [r.text for r in sorted(by["doc.pdf"], key=lambda r: r.page)] \
        == ["page one", "page two"]
    assert by["doc.pdf"][0].mime == "application/pdf"
    assert by["page.html"][0].text == "T\nbody text"
    assert by["note.txt"][0].text == "plain note"
    assert by["note.txt"][0].mime == "text/plain"
    assert by["tone.wav"][0].mime == "audio/wav"
    assert by["tone.wav"][0].text is None
    assert by["bad.pdf"][0].error is not None
    assert by["bad.pdf"][0].mime == "application/pdf"
