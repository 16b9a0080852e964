"""Driver contract for the spark-graft builder (PySpark target).

entry()      — flagship search pipeline (SURVEY §3.1) at sf0.001.
queries()    — operator battery from memory_opensource_spark.queries.
oracle_sql() — DuckDB twins for the correctness gate.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query at sf0.001: the full /v1/memory/search read path —
    ACL-filtered cosine top-k over chunks, chunk→memory dedup, row fetch,
    final top-k (memory/memory_graph.py:5721-7118 re-expressed as one DAG)."""
    from pyspark.sql import functions as F

    from memory_opensource_spark.operators.predicate import AclContext
    from memory_opensource_spark.plans.search import search
    from memory_opensource_spark.sources import tables

    sf_dir = "/root/testdata/sf0.001"
    chunks = tables.build_chunks(tables.load(spark, sf_dir, "embeddings"))
    memories = tables.build_memories(tables.load(spark, sf_dir, "documents"))
    qvec = [float(x) for x in
            chunks.filter(F.col("chunk_id") == "m0_0").select("embedding").first()[0]]
    ctx = AclContext(user_id="u5", workspace_ids=["w1", "w3"], role_ids=["r2"],
                     organization_id="o1", namespace_id="ns3")
    out = search(chunks, memories, qvec, ctx=ctx, top_k=20, score_threshold=0.0)
    return out.select("memory_id", "score", "content", "user_id", "created_at")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    from memory_opensource_spark.queries import QUERIES

    return dict(QUERIES)


def oracle_sql() -> dict[str, str]:
    from memory_opensource_spark.queries import ORACLE

    return dict(ORACLE)
