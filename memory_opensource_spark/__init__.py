"""memory_opensource_spark — a PySpark-native analytics engine with the query and
data-processing capabilities of Papr-ai/memory-opensource.

The reference (read-only snapshot at /root/reference) is a FastAPI service over
MongoDB/Qdrant/Neo4j/Redis.  This package re-expresses its entire query surface —
filtered vector search, semantic dedup, entity resolution, constrained graph pattern
matching, deterministic ranking formulas, and time-decayed counters — as idiomatic
Spark DataFrame programs, plus the LLM-data-pipeline operators (dedup families,
ANN search, text analysis, multimodal plumbing) needed at 100 TB scale.

Layout
------
- ``semantics``  — every magic constant/threshold of the reference, with citations.
- ``functions``  — column-level expression builders (vector math, ids, text, decay).
- ``operators``  — DataFrame->DataFrame operators (predicate compiler, similarity
                   joins, dedup, graph pattern matching, ranking).
- ``sources``    — table loaders / writers for the parquet test tables and the
                   derived memory-domain tables.
- ``plans``      — end-to-end pipelines (search, ingest) composed from operators.
- ``streaming``  — Structured Streaming variants (session windows, counters).
"""

__version__ = "0.1.0"
