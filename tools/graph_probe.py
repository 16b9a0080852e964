"""Agentic-search scale probe: the vector+graph merged read path at 10x bench.

Reuses the engine probe's 600k-chunk corpus and builds a 650k-node / 1.2M-edge
graph over it (each memory EXTRACTED-linked to one of 50k entities, plus
RELATED_TO edges between neighbor memories), then measures:

1. the raw G1 pattern match (Memory -EXTRACTED-> Entity, ACL on the m side);
2. the full agentic read (`plans.search.search_with_graph`): vector leg +
   graph leg -> stratified merge -> fetch.

Usage: python tools/graph_probe.py [n_rows] [dim]
Results recorded in PERF.md (round-6 graph probe section).
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, ".")

SCRATCH = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                       ".scratch")


def main():
    from pyspark.sql import functions as F

    from memory_opensource_spark.operators.graph import PatternSpec, match_pattern
    from memory_opensource_spark.operators.predicate import AclContext
    from memory_opensource_spark.plans.search import search_with_graph
    from memory_opensource_spark.session import get_spark
    from memory_opensource_spark.sources import tables

    n = int(sys.argv[1]) if len(sys.argv) > 1 else 600_000
    dim = int(sys.argv[2]) if len(sys.argv) > 2 else 64
    spark = get_spark("graph-probe")
    emb_path = os.path.join(SCRATCH, f"probe_emb_{n}_{dim}.parquet")
    doc_path = os.path.join(SCRATCH, f"probe_doc_{n}.parquet")
    if not os.path.exists(emb_path):
        print("run tools/engine_probe.py first (generates the corpus)")
        sys.exit(1)

    chunks = tables.build_chunks(spark.read.parquet(emb_path))
    memories = tables.build_memories(spark.read.parquet(doc_path))

    n_entities = 50_000
    mem_nodes = spark.range(n).select(
        F.concat(F.lit("m"), F.col("id").cast("string")).alias("node_id"),
        F.lit("Memory").alias("label"),
        F.concat(F.lit("memory "), F.col("id").cast("string")).alias("prop_name"),
        F.lit("active").alias("prop_status"),
    )
    ent_nodes = spark.range(n_entities).select(
        F.concat(F.lit("e"), F.col("id").cast("string")).alias("node_id"),
        F.lit("Entity").alias("label"),
        F.concat(F.lit("entity "), F.col("id").cast("string")).alias("prop_name"),
        F.lit("active").alias("prop_status"),
    )
    nodes = mem_nodes.unionByName(ent_nodes)
    extracted = spark.range(n).select(
        F.concat(F.lit("m"), F.col("id").cast("string")).alias("src"),
        F.concat(F.lit("e"), (F.col("id") % n_entities).cast("string")).alias("dst"),
        F.lit("EXTRACTED").alias("rel_type"),
        F.lit(None).cast("double").alias("similarity_score"),
    )
    related = spark.range(n).select(
        F.concat(F.lit("m"), F.col("id").cast("string")).alias("src"),
        F.concat(F.lit("m"), ((F.col("id") + 7) % n).cast("string")).alias("dst"),
        F.lit("RELATED_TO").alias("rel_type"),
        (F.col("id") % 100 / 100.0).alias("similarity_score"),
    )
    edges = extracted.unionByName(related)
    print(f"graph: {n + n_entities} nodes, {2 * n} edges")

    ctx = AclContext(user_id="u5", workspace_ids=["w1", "w3"], role_ids=["r2"],
                     organization_id="o1")
    spec = PatternSpec(source_label="Memory", relationship_type="EXTRACTED",
                       target_label="Entity", direction="out")

    t0 = time.time()
    n_match = match_pattern(nodes, edges, spec).count()
    t_match = time.time() - t0
    print(f"G1 pattern match: {t_match:.2f}s  ({n_match} paths)")

    qvec = [float(x) for x in
            chunks.filter(F.col("chunk_id") == "m7_0").select("embedding").first()[0]]
    t0 = time.time()
    out = search_with_graph(chunks, memories, nodes, edges, qvec, ctx=ctx,
                            graph_spec=spec, top_k=20, score_threshold=0.0)
    rows = out.collect()
    t_agentic = time.time() - t0
    srcs = {r.source for r in rows}
    print(f"agentic search: {t_agentic:.2f}s  ({len(rows)} rows, sources={sorted(srcs)})")

    import json
    print(json.dumps({"n_nodes": n + n_entities, "n_edges": 2 * n,
                      "t_match_s": round(t_match, 2),
                      "t_agentic_s": round(t_agentic, 2),
                      "match_paths": n_match, "rows": len(rows)}))


if __name__ == "__main__":
    main()
