"""WARC / WET ingestion (round-10) — the Common Crawl container format, the
canonical source for a 100 TB web-scale training corpus.

Reference analog: none (the memory service ingests via its API) — this is
LLM-data-pipeline surface, like the Gopher tables: a crawl-scale pipeline's
FIRST stage is "read WARC segments into (url, date, text) rows", and every
stage this engine already ships (URL dedup, exact/MinHash/ExactSubstr,
Gopher quality, lang-ID, sharding) consumes exactly those rows.

Format (ISO 28500, public): a WARC file is a sequence of records —

    WARC/1.0\\r\\n
    <header-name>: <value>\\r\\n ...
    \\r\\n
    <Content-Length bytes of payload>\\r\\n\\r\\n

``.warc.gz`` files concatenate one gzip MEMBER per record (the spec's
record-at-time compression), so a member-wise ``zlib.decompressobj`` loop
recovers the stream without any library decoder.  WET ("conversion"
records) carry extracted plain text payloads; "response" records carry
HTTP bytes (returned raw — HTML extraction is a downstream stage).

Spark shape (100 TB): files arrive via the built-in ``binaryFile`` source —
one task per file, so the FILE is the parallelism unit, matching how Common
Crawl ships ~1 GB segments (tens of thousands of files per crawl spread
across executors).  Parsing is one Arrow-batched ``mapInPandas`` kernel;
records never leave the executor that read their file, and downstream
repartitioning is the consumer's choice.  Header names are matched
case-insensitively; malformed records end their FILE's parse (decode-
tolerant: rows parsed so far are kept) rather than failing the job.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

WARC_SCHEMA = ("path string, record_index int, warc_type string, "
               "target_uri string, warc_date string, payload binary, "
               "text string")


def _gunzip_members(data: bytes) -> bytes:
    """Decompress concatenated gzip members (the per-record .warc.gz
    layout); plain (non-gzip) bytes pass through."""
    import zlib

    if not data.startswith(b"\x1f\x8b"):
        return data
    out = bytearray()
    rest = data
    while rest:
        d = zlib.decompressobj(wbits=47)          # gzip wrapper
        try:
            out += d.decompress(rest)
            out += d.flush()
        except zlib.error:
            # Corrupt/truncated member: keep the bytes recovered so far —
            # the file's parse ends decode-tolerantly (parse_warc_bytes
            # already stops cleanly on a truncated record) instead of
            # failing the Spark task and with it the whole read_warc job.
            break
        if not d.unused_data or d.unused_data == rest:
            break
        rest = d.unused_data
    return bytes(out)


def parse_warc_bytes(data: bytes) -> list[dict]:
    """Parse one WARC file's bytes into record dicts — pure function, unit-
    testable without Spark.  Stops at the first malformed record (returns
    what parsed so far)."""
    data = _gunzip_members(data)
    out = []
    i, n = 0, len(data)
    idx = 0
    while i < n:
        # skip inter-record blank lines
        while i < n and data[i:i + 2] == b"\r\n":
            i += 2
        if i >= n:
            break
        if not data[i:i + 5] == b"WARC/":
            break                                  # malformed: stop the file
        hdr_end = data.find(b"\r\n\r\n", i)
        if hdr_end < 0:
            break
        headers = {}
        for line in data[i:hdr_end].split(b"\r\n")[1:]:
            k, _, v = line.partition(b":")
            headers[k.strip().lower().decode("latin-1")] = \
                v.strip().decode("latin-1")
        try:
            ln = int(headers.get("content-length", ""))
        except ValueError:
            break
        payload = data[hdr_end + 4:hdr_end + 4 + ln]
        if len(payload) < ln:
            break                                  # truncated record
        out.append({
            "record_index": idx,
            "warc_type": headers.get("warc-type", ""),
            "target_uri": headers.get("warc-target-uri", ""),
            "warc_date": headers.get("warc-date", ""),
            "payload": payload,
        })
        idx += 1
        i = hdr_end + 4 + ln
    return out


def http_response_to_html(payload: bytes) -> str:
    """Decode one WARC "response" payload into its HTML string — the leg a
    real Common Crawl run uses (WARC files carry raw HTTP exchanges;
    only the derived WET files carry pre-extracted text):

    1. strip the HTTP header block (up to the first CRLFCRLF; a payload
       that does not start with ``HTTP/`` is treated as headerless body)
    2. sniff the charset: ``charset=`` in the Content-Type header, else a
       ``<meta charset>`` / http-equiv declaration in the first 4096 body
       bytes, else UTF-8
    3. decode with ``errors='replace'`` (decode-tolerant, like the WET
       leg); an unknown declared charset falls back to UTF-8

    Pure function — unit-testable without Spark; the read_warc kernel
    applies it per record (``http_text_types``).  Transfer-Encoding is NOT
    un-chunked (Common Crawl stores payloads de-chunked; a stray chunked
    body degrades to replaced characters, never a task failure)."""
    import re

    head, sep, body = payload.partition(b"\r\n\r\n")
    if not sep or not head[:5].upper().startswith(b"HTTP/"):
        head, body = b"", payload
    charset = None
    m = re.search(rb"(?i)charset=\"?'?([A-Za-z0-9_.:-]+)", head)
    if m:
        charset = m.group(1).decode("latin-1")
    if not charset:
        m = re.search(
            rb"(?i)<meta[^>]+charset\s*=\s*[\"']?([A-Za-z0-9_.:-]+)",
            body[:4096])
        if m:
            charset = m.group(1).decode("latin-1")
    try:
        return body.decode(charset or "utf-8", errors="replace")
    except LookupError:
        return body.decode("utf-8", errors="replace")


def read_warc(spark: SparkSession, path: str,
              record_types: tuple = ("conversion", "response"),
              with_text_types: tuple = ("conversion",),
              http_text_types: tuple = ("response",)) -> DataFrame:
    """Read WARC/WET files (plain or ``.warc.gz``) under ``path`` into

        {path, record_index, warc_type, target_uri, warc_date,
         payload (binary), text (string | NULL)}

    keeping only ``record_types``; ``with_text_types`` records additionally
    decode their payload as UTF-8 text (errors replaced) — the WET
    convention — and ``http_text_types`` records decode through
    :func:`http_response_to_html` (HTTP header strip + charset sniff —
    the raw-crawl leg, r11).  One ``binaryFile`` scan + one mapInPandas
    kernel; the ``content`` column is pruned into the kernel and never
    shuffled."""
    files = (spark.read.format("binaryFile").load(path)
             .select("path", "content"))
    return files.mapInPandas(
        _parse_kernel(record_types, with_text_types, http_text_types),
        WARC_SCHEMA)


def _parse_kernel(record_types, with_text_types, http_text_types):
    """The shared batch/streaming parse kernel (one implementation — the
    two read paths must never fork)."""
    import pandas as pd

    keep = tuple(record_types)
    text_types = tuple(with_text_types)
    http_types = tuple(http_text_types)

    def kernel(batches):
        for pdf in batches:
            rows = []
            for path_, content in zip(pdf["path"], pdf["content"]):
                for r in parse_warc_bytes(bytes(content)):
                    if r["warc_type"] not in keep:
                        continue
                    txt = None
                    if r["warc_type"] in text_types:
                        txt = r["payload"].decode("utf-8", errors="replace")
                    elif r["warc_type"] in http_types:
                        txt = http_response_to_html(r["payload"])
                    rows.append((path_, r["record_index"], r["warc_type"],
                                 r["target_uri"], r["warc_date"],
                                 r["payload"], txt))
            yield pd.DataFrame(rows, columns=[
                "path", "record_index", "warc_type", "target_uri",
                "warc_date", "payload", "text"])

    return kernel


def read_warc_stream(spark: SparkSession, path: str,
                     record_types: tuple = ("conversion", "response"),
                     with_text_types: tuple = ("conversion",),
                     http_text_types: tuple = ("response",),
                     max_files_per_trigger: int | None = None) -> DataFrame:
    """Streaming twin of :func:`read_warc` (r11): the same parse kernel
    over a ``binaryFile`` FILE STREAM — new ``.warc``/``.warc.gz``
    segments landing under ``path`` become micro-batches (the crawl-ingest
    shape: Common Crawl publishes segments incrementally).  Feed the
    result to ``foreachBatch`` (streaming/pipelines.
    foreach_batch_crawl_ingest composes the full front-end).
    ``max_files_per_trigger`` caps segment count per micro-batch."""
    reader = (spark.readStream.format("binaryFile")
              .schema("path string, modificationTime timestamp, "
                      "length long, content binary"))
    if max_files_per_trigger is not None:
        reader = reader.option("maxFilesPerTrigger",
                               str(max_files_per_trigger))
    files = reader.load(path).select("path", "content")
    return files.mapInPandas(
        _parse_kernel(record_types, with_text_types, http_text_types),
        WARC_SCHEMA)


def write_warc_records(rows, out_path: str,
                       warc_type: str = "response") -> bytes:
    """Serialize (uri, date, payload_bytes) tuples as WARC records of the
    given type — the fixture/export twin for the raw-crawl ("response")
    leg, kept beside the parser like :func:`write_wet`.  Returns the
    bytes; writes them to ``out_path`` when given."""
    out = bytearray()
    for uri, date, payload in rows:
        hdr = (f"WARC/1.0\r\n"
               f"WARC-Type: {warc_type}\r\n"
               f"WARC-Target-URI: {uri}\r\n"
               f"WARC-Date: {date}\r\n"
               f"Content-Length: {len(payload)}\r\n\r\n").encode("latin-1")
        out += hdr + payload + b"\r\n\r\n"
    if out_path:
        with open(out_path, "wb") as f:
            f.write(bytes(out))
    return bytes(out)


def write_wet(rows, out_path: str) -> bytes:
    """Serialize (uri, date, text) tuples as WET ("conversion") records —
    the deterministic fixture/export twin of :func:`read_warc` (kept beside
    the parser so the two cannot drift).  Returns the bytes; writes them to
    ``out_path`` when given."""
    out = bytearray()
    for uri, date, text in rows:
        payload = text.encode("utf-8")
        hdr = (f"WARC/1.0\r\n"
               f"WARC-Type: conversion\r\n"
               f"WARC-Target-URI: {uri}\r\n"
               f"WARC-Date: {date}\r\n"
               f"Content-Length: {len(payload)}\r\n\r\n").encode("latin-1")
        out += hdr + payload + b"\r\n\r\n"
    if out_path:
        with open(out_path, "wb") as f:
            f.write(bytes(out))
    return bytes(out)
