"""File-type detection + multi-format document ingest routing (round-13).

Reference analogs: ``services/processPDF.py:104`` ``save_uploaded_file``
(libmagic MIME sniff of every upload) and ``:43-50`` ``process_pdf``'s
loader switch (``.pdf`` -> PyPDFLoader pages, ``.html`` ->
UnstructuredHTMLLoader, ``.txt`` -> TextLoader, anything else ignored
with a log).  The Spark engine sniffs CONTENT (magic bytes, not file
extensions — the reference's libmagic behavior) and routes each file to
the matching extractor in ONE pass:

- ``application/pdf``  -> sources/pdf.extract_pdf_pages (one row/page)
- ``text/html``        -> functions/html.html_to_text (zero-UDF Column
  form, applied AFTER the kernel so extraction stays JVM-side)
- ``text/plain``       -> decoded body
- everything else      -> typed skip row (mime recorded, text NULL) —
  the reference logs-and-ignores; the engine keeps the row so audits
  can count what a 100 TB drop actually contained.

``sniff_mime`` is deliberately a CLOSED rule table (documented below),
not a libmagic port: deterministic, oracle-mirrorable, and covering
exactly the formats the engine has real parsers for plus the two text
types the reference routes."""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

#: sniff rules in match order (first hit wins); text checks run last
MAGIC_RULES = (
    ("application/pdf", "%PDF- prefix"),
    ("image/png", "PNG signature"),
    ("image/gif", "GIF87a/GIF89a"),
    ("image/jpeg", "FFD8 SOI"),
    ("image/x-portable-pixmap", "P6 + whitespace"),
    ("audio/wav", "RIFF....WAVE"),
    ("video/mp4", "ftyp at offset 4"),
    ("audio/mpeg", "ID3 tag or MPEG frame sync"),
    ("text/html", "optional BOM/ws then <html or <!doctype"),
    ("text/plain", "valid UTF-8 with no NUL byte"),
    ("application/octet-stream", "fallback"),
)


def sniff_mime(b: bytes) -> str:
    """Magic-byte MIME sniff (MAGIC_RULES order)."""
    if b.startswith(b"%PDF-"):
        return "application/pdf"
    if b.startswith(b"\x89PNG\r\n\x1a\n"):
        return "image/png"
    if b[:6] in (b"GIF87a", b"GIF89a"):
        return "image/gif"
    if b.startswith(b"\xff\xd8"):
        return "image/jpeg"
    # sweep-16: the PPM magic is "P6" + WHITESPACE — a text file that
    # merely starts "P6x..." must not route to the image prober
    if b.startswith(b"P6") and b[2:3] in (b" ", b"\t", b"\r", b"\n"):
        return "image/x-portable-pixmap"
    if b[:4] == b"RIFF" and b[8:12] == b"WAVE":
        return "audio/wav"
    if len(b) >= 12 and b[4:8] == b"ftyp":
        return "video/mp4"
    if b.startswith(b"ID3") or (
            len(b) >= 2 and b[0] == 0xFF and (b[1] & 0xE0) == 0xE0):
        return "audio/mpeg"
    head = b[:256]
    if head.startswith(b"\xef\xbb\xbf"):
        head = head[3:]
    stripped = head.lstrip(b" \t\r\n").lower()
    if stripped.startswith(b"<html") or stripped.startswith(b"<!doctype"):
        return "text/html"
    # sweep-16: NUL bytes are valid UTF-8 but never appear in real text
    # (the libmagic convention) — without this, binary containers whose
    # bytes happen to decode (e.g. RIFF/AVI headers) would route to the
    # text leg and emit control-char garbage as "text"
    try:
        if b"\x00" not in b:
            b.decode("utf-8")
            return "text/plain"
    except UnicodeDecodeError:
        pass
    return "application/octet-stream"


ROUTED_SCHEMA = ("path string, mime string, page int, total_pages int, "
                 "text string, error string")


def route_kernel(batches):
    """mapInPandas kernel over {key-col, content binary}: sniff + route.
    PDF -> one row per page; text/plain and text/html -> one row whose
    ``text`` is the decoded body (html EXTRACTION happens downstream in
    the Column form); other mimes -> typed skip row.  Parse failures are
    per-row loud (``error``), never fatal to the scan."""
    import pandas as pd

    from .pdf import extract_pdf_pages

    for pdf in batches:
        key_col = pdf.columns[0]
        rows = []
        for key, content in zip(pdf[key_col], pdf["content"]):
            b = bytes(content)
            mime = sniff_mime(b)
            try:
                if mime == "application/pdf":
                    pages = extract_pdf_pages(b)
                    for i, text in enumerate(pages):
                        rows.append((key, mime, i + 1, len(pages), text,
                                     None))
                elif mime in ("text/plain", "text/html"):
                    rows.append((key, mime, 1, 1,
                                 b.decode("utf-8", errors="replace"),
                                 None))
                else:
                    rows.append((key, mime, None, None, None, None))
            except Exception as e:  # noqa: BLE001 — loud per-row
                rows.append((key, mime, None, None, None,
                             f"{type(e).__name__}: {e}"))
        yield pd.DataFrame(rows, columns=[
            key_col, "mime", "page", "total_pages", "text", "error"])


def route_documents(files: DataFrame) -> DataFrame:
    """Route a ``{<key>, content}`` binary frame through the sniffer and
    extractors; html rows finish through the zero-UDF Column extractor.
    Returns {<key>, mime, page, total_pages, text, error}."""
    key = files.columns[0]
    schema = f"`{key}` " + files.schema[key].dataType.simpleString() + \
        ", mime string, page int, total_pages int, text string, " \
        "error string"
    routed = files.mapInPandas(route_kernel, schema)
    from ..functions.html import html_to_text

    return routed.withColumn(
        "text", F.when(F.col("mime") == "text/html",
                       html_to_text(F.col("text")))
        .otherwise(F.col("text")))


def ingest_files(spark: SparkSession, path: str,
                 glob: str = "*") -> DataFrame:
    """The processPDF upload path over a directory: one ``binaryFile``
    scan (file-level parallelism), sniff, route, extract.  Compose the
    text rows with sources/documents.hierarchical_chunk or
    sources/pdf.pdf_pages_to_memories downstream."""
    files = (spark.read.format("binaryFile")
             .option("pathGlobFilter", glob).load(path)
             .select("path", "content"))
    return route_documents(files)
