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
    assert rows["doc_a"] == "alpha beta gamma delta epsilon"
    assert rows["doc_b"].startswith("totally different")


def test_binary_junk_degrades_not_fails(spark, doc_dir):
    files = documents.read_binary_documents(spark, doc_dir, glob="*.bin")
    parsed = documents.parse_documents(files).collect()
    assert len(parsed) == 1  # replacement chars, no exception
    assert "binary" in parsed[0].content


def test_ingest_documents_end_to_end(spark, doc_dir):
    existing = spark.createDataFrame([], "chunk_id string, embedding array<double>")
    out = documents.ingest_documents(spark, doc_dir, existing, dim=16)
    chunks = out["chunks"].collect()
    assert {r.chunk_id for r in chunks} == {"doc_a_0", "doc_b_0"}
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
    assert len(reused) == 1 and reused[0].new_id == "doc_c_0" \
        and reused[0].reuse_id == "doc_a_0"
    assert {r.chunk_id for r in again["chunks"].collect()} == {"doc_d_0"}
