"""Multi-format source layer: parquet / JSON-lines / CSV must yield identical
DataFrames for the same logical table."""

import shutil
import tempfile

from pyspark.sql import functions as F

SF_DIR = "/root/testdata/sf0.001"


def _canon(df):
    rows = df.select("event_id", F.date_format("ts", "yyyy-MM-dd HH:mm:ss.SSSSSS")
                     .alias("ts_s"), "user_id", "event_type",
                     F.round("value", 6).alias("value")).collect()
    return sorted(tuple(r) for r in rows)


def test_json_and_csv_match_parquet(spark):
    from memory_opensource_spark.sources import formats, tables

    ev = tables.load(spark, SF_DIR, "events")
    d = tempfile.mkdtemp()
    try:
        (ev.coalesce(1).write.mode("overwrite")
         .option("timestampFormat", "yyyy-MM-dd'T'HH:mm:ss.SSSSSSXXX")
         .json(f"{d}/ev_json"))
        (ev.withColumn("ts", F.date_format("ts", "yyyy-MM-dd HH:mm:ss.SSSSSS"))
         .coalesce(1).write.mode("overwrite").option("header", "true")
         .csv(f"{d}/ev_csv"))

        want = _canon(ev)
        got_json = _canon(formats.read_table(spark, f"{d}/ev_json", "events", "json"))
        got_csv = _canon(formats.read_table(spark, f"{d}/ev_csv", "events", "csv"))
        assert got_json == want
        assert got_csv == want
    finally:
        shutil.rmtree(d, ignore_errors=True)


def test_schema_is_explicit_not_inferred(spark):
    """JSON reads must use the declared schema (no inference pass)."""
    from memory_opensource_spark.sources import formats

    d = tempfile.mkdtemp()
    try:
        spark.createDataFrame(
            [(1, "2024-01-01 00:00:00", 5, "retrieval", 1.5, "{}")],
            "event_id long, ts string, user_id long, event_type string, "
            "value double, props string",
        ).withColumn("ts", F.to_timestamp("ts")).write.json(f"{d}/j")
        df = formats.read_table(spark, f"{d}/j", "events", "json")
        assert [f.dataType.simpleString() for f in df.schema.fields] == [
            "bigint", "timestamp", "bigint", "string", "double", "string"]
    finally:
        shutil.rmtree(d, ignore_errors=True)


def test_parquet_events_read_from_noncanonical_path(spark):
    """ADVICE r4: read_table(fmt='parquet') must honor the CALLER'S path — a
    round-tripped/compacted events parquet at a non-fixture basename reads
    correctly (ts normalized), instead of silently rerouting to
    {dir}/events.parquet."""
    from memory_opensource_spark.sources import formats, tables

    ev = tables.load(spark, SF_DIR, "events")
    d = tempfile.mkdtemp()
    try:
        # round-trip writes TIMESTAMP(US) parquet under a non-canonical name;
        # no file named events.parquet exists in d
        ev.limit(500).coalesce(1).write.mode("overwrite").parquet(f"{d}/ev_compacted")
        got = formats.read_table(spark, f"{d}/ev_compacted", "events", "parquet")
        assert got.count() == 500
        assert dict(got.dtypes)["ts"] == "timestamp"
        want = _canon(ev.limit(500))
        assert _canon(got) == want
    finally:
        shutil.rmtree(d, ignore_errors=True)


def test_warc_parse_edges():
    """r10 sources/warc.py: pure-parser edges — case-insensitive headers,
    response+conversion mixing, truncated payloads, malformed headers,
    multi-member gzip, empty input."""
    import zlib

    from memory_opensource_spark.sources.warc import (_gunzip_members,
                                                      parse_warc_bytes,
                                                      write_wet)

    data = write_wet([("https://a/1", "2024-01-01T00:00:00Z", "hello wörld"),
                      ("https://a/2", "2024-01-01T00:00:00Z", "")], "")
    recs = parse_warc_bytes(data)
    assert [r["target_uri"] for r in recs] == ["https://a/1", "https://a/2"]
    assert recs[0]["payload"].decode("utf-8") == "hello wörld"
    assert recs[0]["record_index"] == 0 and recs[1]["record_index"] == 1

    # case-insensitive header names + a response record
    raw = (b"WARC/1.0\r\nwarc-type: response\r\nWARC-TARGET-URI: https://b\r\n"
           b"content-length: 4\r\n\r\nHTTP\r\n\r\n")
    r = parse_warc_bytes(raw)
    assert len(r) == 1 and r[0]["warc_type"] == "response"
    assert r[0]["target_uri"] == "https://b" and r[0]["payload"] == b"HTTP"

    # truncated payload: keep earlier records, stop at the bad one
    assert len(parse_warc_bytes(data + raw[:-10])) == 2
    # malformed content-length
    bad = raw.replace(b"content-length: 4", b"content-length: x")
    assert parse_warc_bytes(bad) == []
    # garbage prefix
    assert parse_warc_bytes(b"NOT A WARC" + data) == []
    assert parse_warc_bytes(b"") == []

    # per-record gzip members (the .warc.gz layout)
    gz = bytearray()
    for rec in [data[:len(write_wet([("https://a/1",
                                      "2024-01-01T00:00:00Z",
                                      "hello wörld")], ""))],
                raw]:
        c = zlib.compressobj(9, zlib.DEFLATED, 31)
        gz += c.compress(rec) + c.flush()
    out = parse_warc_bytes(bytes(gz))
    assert [x["target_uri"] for x in out] == ["https://a/1", "https://b"]
    assert _gunzip_members(b"plain") == b"plain"

    # r10 (ADVICE): a corrupt/truncated gzip member must NOT raise — the
    # bytes recovered so far are kept (decode-tolerant contract), so the
    # records before the bad member still parse
    first_member = zlib.compressobj(9, zlib.DEFLATED, 31)
    rec1 = write_wet([("https://a/1", "2024-01-01T00:00:00Z", "ok")], "")
    good = first_member.compress(rec1) + first_member.flush()
    corrupt = good + b"\x1f\x8b\x08\x00garbage-not-a-member"
    assert [r["target_uri"] for r in parse_warc_bytes(corrupt)] \
        == ["https://a/1"]
    # cut mid-deflate inside the SECOND member (header is 10 bytes): the
    # first record survives, the second ends the parse, no exception
    truncated = bytes(gz[: len(good) + 14])
    assert [r["target_uri"] for r in parse_warc_bytes(truncated)] \
        == ["https://a/1"]
    # a lone corrupt member yields no rows, still no exception
    assert parse_warc_bytes(b"\x1f\x8b\x08\x00junkjunkjunk") == []


def test_read_warc_spark_roundtrip(spark, tmp_path):
    """r10: binaryFile + kernel path — plain and gzipped files in one glob,
    record-type filtering, WET text decode, non-WET payload passthrough."""
    import zlib

    from memory_opensource_spark.sources.warc import read_warc, write_wet

    write_wet([("https://x/1", "2024-01-01T00:00:00Z", "alpha beta"),
               ("https://x/2", "2024-01-01T00:00:00Z", "gamma")],
              str(tmp_path / "a.warc"))
    rec = write_wet([("https://x/3", "2024-01-01T00:00:00Z", "delta")], "")
    c = zlib.compressobj(9, zlib.DEFLATED, 31)
    (tmp_path / "b.warc.gz").write_bytes(c.compress(rec) + c.flush())

    out = read_warc(spark, str(tmp_path / "*")).collect()
    got = {r.target_uri: r for r in out}
    assert set(got) == {"https://x/1", "https://x/2", "https://x/3"}
    assert got["https://x/1"].text == "alpha beta"
    assert got["https://x/3"].text == "delta"
    assert all(r.warc_type == "conversion" for r in out)

    # record-type filter: nothing survives a response-only read of WET data
    assert read_warc(spark, str(tmp_path / "*"),
                     record_types=("response",)).count() == 0


def test_http_response_to_html_edges():
    """r11 sources/warc.http_response_to_html: header strip, charset
    precedence (Content-Type > meta > utf-8), real latin-1 high bytes,
    unknown charset fallback, headerless payloads, quoted charset forms."""
    from memory_opensource_spark.sources.warc import http_response_to_html

    # Content-Type charset wins, latin-1 high bytes decode
    p = (b"HTTP/1.1 200 OK\r\nContent-Type: text/html; charset=iso-8859-1"
         b"\r\n\r\n<p>caf\xe9</p>")
    assert http_response_to_html(p) == "<p>café</p>"
    # header charset BEATS a conflicting meta
    p = (b"HTTP/1.1 200 OK\r\nContent-Type: text/html; charset=iso-8859-1"
         b"\r\n\r\n<meta charset='utf-8'><p>\xe9</p>")
    assert http_response_to_html(p) == "<meta charset='utf-8'><p>é</p>"
    # meta sniff when the header is silent (utf-8 bytes would mojibake
    # under latin-1)
    p = (b"HTTP/1.1 200 OK\r\nContent-Type: text/html\r\n\r\n"
         b'<meta charset="utf-8"><p>caf\xc3\xa9</p>')
    assert http_response_to_html(p) == '<meta charset="utf-8"><p>café</p>'
    # http-equiv style meta
    p = (b"HTTP/1.1 200 OK\r\n\r\n<meta http-equiv=Content-Type "
         b"content='text/html; charset=iso-8859-1'>x \xe9")
    assert http_response_to_html(p).endswith("x é")
    # unknown charset falls back to utf-8 (errors replaced, no raise)
    p = (b"HTTP/1.1 200 OK\r\nContent-Type: text/html; charset=bogus-enc"
         b"\r\n\r\nok caf\xc3\xa9")
    assert http_response_to_html(p) == "ok café"
    # headerless payload: whole thing is body
    assert http_response_to_html(b"<p>plain</p>") == "<p>plain</p>"
    # a blank line but no HTTP/ start: still headerless
    assert http_response_to_html(b"X: y\r\n\r\nbody") == "X: y\r\n\r\nbody"
    # invalid bytes under the declared charset degrade, never raise
    p = (b"HTTP/1.1 200 OK\r\nContent-Type: text/html; charset=utf-8"
         b"\r\n\r\nbad \xff\xfe tail")
    assert "bad" in http_response_to_html(p)
    # quoted charset form
    p = (b'HTTP/1.1 200 OK\r\nContent-Type: text/html; charset="utf-8"'
         b"\r\n\r\nca\xc3\xaf")
    assert http_response_to_html(p) == "caï"
