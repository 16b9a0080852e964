"""Binary document ingestion tests: binaryFile source -> stub provider ->
chunk/embed/dedup."""

import pytest
from pyspark.sql import functions as F

from memory_opensource_spark.sources import documents


@pytest.fixture()
def doc_dir(tmp_path):
    (tmp_path / "a.txt").write_text("alpha beta gamma delta epsilon")
    (tmp_path / "b.txt").write_text("totally different words here now")
    (tmp_path / "junk.bin").write_bytes(b"\xff\xfe\x00binary")
    return str(tmp_path)


def test_read_and_parse(spark, doc_dir):
    files = documents.read_binary_documents(spark, doc_dir)
    assert files.count() == 2  # glob excludes .bin
    parsed = documents.parse_documents(files)
    rows = {r.memory_id: r.content for r in parsed.collect()}
    by_name = {m.rsplit("_", 1)[0]: c for m, c in rows.items()}
    assert by_name["doc_a"] == "alpha beta gamma delta epsilon"
    assert by_name["doc_b"].startswith("totally different")
    # ids carry a full-path hash suffix so same-named files in different
    # directories never collide (round-5 review finding)
    assert all(len(m.rsplit("_", 1)[1]) == 8 for m in rows)


def test_same_basename_different_dirs_do_not_collide(spark, tmp_path):
    (tmp_path / "x").mkdir(); (tmp_path / "y").mkdir()
    (tmp_path / "x" / "notes.txt").write_text("content from directory x")
    (tmp_path / "y" / "notes.txt").write_text("content from directory y")
    files = documents.read_binary_documents(spark, str(tmp_path) + "/*")
    parsed = documents.parse_documents(files).collect()
    assert len(parsed) == 2
    assert len({r.memory_id for r in parsed}) == 2  # distinct ids
    assert {r.content for r in parsed} == {
        "content from directory x", "content from directory y"}


def test_binary_junk_degrades_not_fails(spark, doc_dir):
    files = documents.read_binary_documents(spark, doc_dir, glob="*.bin")
    parsed = documents.parse_documents(files).collect()
    assert len(parsed) == 1  # replacement chars, no exception
    assert "binary" in parsed[0].content


def test_ingest_documents_end_to_end(spark, doc_dir):
    existing = spark.createDataFrame([], "chunk_id string, embedding array<double>")
    out = documents.ingest_documents(spark, doc_dir, existing, dim=16)
    chunks = out["chunks"].collect()
    assert {r.chunk_id.rsplit("_", 2)[0] for r in chunks} == {"doc_a", "doc_b"}
    assert all(abs(sum(x * x for x in r.embedding) - 1.0) < 1e-9 for r in chunks)
    # a NEW file with duplicate content dedups against the stored chunks
    # (V4: same content under a new id -> reuse the existing memory)
    import pathlib

    dup_dir = pathlib.Path(doc_dir) / "second_batch"
    dup_dir.mkdir()
    (dup_dir / "c.txt").write_text("alpha beta gamma delta epsilon")  # dup of a
    (dup_dir / "d.txt").write_text("genuinely novel content appears")
    stored = out["chunks"].select("chunk_id", "embedding").localCheckpoint(eager=True)
    again = documents.ingest_documents(spark, str(dup_dir), stored, dim=16)
    reused = again["reused"].collect()
    assert len(reused) == 1 and reused[0].new_id.startswith("doc_c_") \
        and reused[0].reuse_id.startswith("doc_a_")
    only = [r.chunk_id for r in again["chunks"].collect()]
    assert len(only) == 1 and only[0].startswith("doc_d_")


def test_hierarchical_chunk_structure(spark):
    """Full hierarchy: header patterns, stack-parent rule, size buckets, context."""
    from memory_opensource_spark.sources.documents import hierarchical_chunk

    page1 = ("1. Overview\n"
             "alpha beta gamma\n"
             "1.1 Detail Notes\n"
             "delta epsilon\n"
             "SUMMARY FINDINGS\n"
             "zeta eta theta")
    page2 = ("intro line before any header\n"
             "A. Appendix\n"
             "appendix body text\n"
             "\n"
             "Closing Remarks\n"
             "iota kappa")
    df = spark.createDataFrame([("m1", page1 + "\f" + page2)],
                               "memory_id string, content string")
    rows = {r.chunk_id: r for r in hierarchical_chunk(df, target_chars=1000).collect()}

    # page1: three header sections at levels 1/2/1
    s1 = rows["m1_p1_s1_c0"]
    assert (s1.level, s1.section_title, s1.chunk_content) == (1, "1. Overview", "alpha beta gamma")
    assert s1.parent_id == "m1_p1"                     # level-1 -> page root
    s2 = rows["m1_p1_s2_c0"]
    assert (s2.level, s2.section_title) == (2, "1.1 Detail Notes")
    assert s2.parent_id == "m1_p1_s1"                  # nested under 1.
    s3 = rows["m1_p1_s3_c0"]
    assert (s3.level, s3.section_title) == (1, "SUMMARY FINDINGS")  # ALL-CAPS
    # page2: implicit Page-2 root section for pre-header content
    s0 = rows["m1_p2_s0_c0"]
    assert (s0.level, s0.section_title) == (1, "Page 2")
    # A. Appendix is level 3; the most recent preceding lower-level section is
    # the implicit Page-2 root (level 1), not page-1's SUMMARY -> stack parity
    appendix = [r for r in rows.values() if r.section_title == "A. Appendix"]
    assert appendix and appendix[0].level == 3
    assert appendix[0].parent_id == "m1_p2_s0"
    closing = [r for r in rows.values() if r.section_title == "Closing Remarks"]
    assert closing and closing[0].level == 2           # title case + blank neighbor
    assert closing[0].chunk_content == "iota kappa"
    # context: chunk after s1 sees its text as context_before
    assert s2.context_before.endswith("alpha beta gamma")
    assert s1.context_after.startswith("delta")


def test_hierarchical_chunk_size_buckets(spark):
    from memory_opensource_spark.sources.documents import hierarchical_chunk

    body = "\n".join(f"line {i:02d} padding padding" for i in range(10))  # 10 x ~23 chars
    df = spark.createDataFrame([("m1", "1. Sec\n" + body)],
                               "memory_id string, content string")
    out = hierarchical_chunk(df, target_chars=60).collect()
    by_idx = sorted((r.chunk_index, len(r.chunk_content)) for r in out)
    assert len(by_idx) > 2                              # split into several chunks
    assert all(n <= 60 + 24 for _, n in by_idx)         # bucket ~target + one line
    joined = "\n".join(r.chunk_content for r in sorted(out, key=lambda r: r.chunk_index))
    assert joined == body                               # lossless, order preserved


def test_domain_header_rules(spark):
    """Domain-aware header detection (hierarchical_chunker.py:389-429): with
    domain='finance' the keyword lines become section headers (lvl 1/2); with
    no domain they are plain content — the reference's default-off behavior."""
    from memory_opensource_spark.sources.documents import hierarchical_chunk

    text = "\n".join([
        "intro words here",
        "risk factors",              # finance lvl-1 keyword (not ALL-CAPS)
        "we discuss dangers",
        "operating expenses",        # finance lvl-2 keyword
        "numbers go here",
    ])
    docs = spark.createDataFrame([("d1", text)], "memory_id string, content string")

    plain = hierarchical_chunk(docs).select("section_title", "level").distinct().collect()
    assert {(r.section_title, r.level) for r in plain} == {("Page 1", 1)}

    fin = hierarchical_chunk(docs, domain="finance").select(
        "section_title", "level").distinct().collect()
    got = {(r.section_title, r.level) for r in fin}
    assert ("risk factors", 1) in got
    assert ("operating expenses", 2) in got
    # alias accepted like the reference (:397)
    fin2 = hierarchical_chunk(docs, domain="financial").select("level").collect()
    assert any(r.level == 1 for r in fin2)
