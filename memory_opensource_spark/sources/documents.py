"""Binary-document ingestion (S11 end-to-end): file source -> parse provider ->
hierarchical chunks -> memories.

Mirrors routers/v1/document_routes_v2.py:75 + core/document_processing/*:
uploaded files go to an OCR/parse provider (Reducto/Gemini/PaddleOCR in the
reference — network services), whose pages then flow through the hierarchical
chunker.  Here the provider is a STUB (bytes -> utf-8 text, deterministic) kept
behind the provider-adapter signature; everything Spark-side is production
shaped:

- ``spark.read.format("binaryFile")`` — each file one row {path, content};
  ``spark.sql.files.maxPartitionBytes`` governs blobs/task (decode is CPU-bound);
- parse runs in mapInPandas (Arrow batches of whole files);
- chunking/embedding reuse plans.ingest (pure Column expressions).
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import StringType, StructField, StructType

PARSED_SCHEMA = StructType([
    StructField("doc_path", StringType()),
    StructField("memory_id", StringType()),
    StructField("content", StringType()),
])


def stub_parse_provider(content: bytes, path: str) -> str:
    """Provider-adapter stand-in (core/document_processing/provider_adapter.py):
    a real adapter would call Reducto/Gemini/PaddleOCR here.  The stub decodes
    utf-8 (deterministic); binary junk degrades to replacement chars rather
    than failing the pipeline — matching the reference's per-file error
    isolation."""
    return content.decode("utf-8", errors="replace")


def read_binary_documents(spark: SparkSession, path: str,
                          glob: str = "*.txt") -> DataFrame:
    return (
        spark.read.format("binaryFile")
        .option("pathGlobFilter", glob)
        .load(path)
        .select("path", "content")
    )


def parse_documents(files: DataFrame, provider=stub_parse_provider) -> DataFrame:
    """files: {path, content(binary)} -> {doc_path, memory_id, content(text)}."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for _, r in pdf.iterrows():
                text = provider(bytes(r["content"]), r["path"])
                name = r["path"].rsplit("/", 1)[-1].rsplit(".", 1)[0]
                rows.append((r["path"], f"doc_{name}", text))
            yield pd.DataFrame(rows, columns=["doc_path", "memory_id", "content"])

    return files.mapInPandas(run, PARSED_SCHEMA)


def ingest_documents(spark: SparkSession, path: str, existing_chunks: DataFrame,
                     dim: int = 64, glob: str = "*.txt") -> dict[str, DataFrame]:
    """The full S11 write path: binary files -> parse -> chunk -> embed ->
    near-dup reuse -> {chunks, reused} (plans.ingest contract)."""
    from ..plans.ingest import ingest

    files = read_binary_documents(spark, path, glob)
    parsed = parse_documents(files)
    return ingest(parsed.select("memory_id", "content"), existing_chunks, dim=dim)
