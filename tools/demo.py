"""End-to-end demo: the full memory-engine lifecycle in one script.

    python tools/demo.py

add (with near-dup reuse) -> enrich (graph extraction) -> search (ACL) ->
agentic search (graph leg) -> rerank -> feedback -> tier-1 list -> SQL surface
-> custom schemas (validation + schema-keyed MERGE) -> TOON response format.
"""

from __future__ import annotations

import sys

sys.path.insert(0, ".")


def main():
    from memory_opensource_spark.api import MemoryEngine
    from memory_opensource_spark.operators.graph import PatternSpec
    from memory_opensource_spark.operators.predicate import AclContext
    from memory_opensource_spark.operators.rerank import rerank_stage
    from memory_opensource_spark.session import get_spark

    spark = get_spark("demo", shuffle_partitions=8)
    spark.sparkContext.setLogLevel("ERROR")
    eng = MemoryEngine(spark, dim=32)

    print("== 1. add memories (batch, with V4 near-dup reuse) ==")
    results = eng.add_memory_batch([
        {"memory_id": "m1", "content": "spark structured streaming handles late events with watermarks",
         "user_id": "alice", "user_read_access": ["alice", "bob"]},
        {"memory_id": "m2", "content": "vector similarity search retrieves relevant memories quickly",
         "user_id": "alice", "user_read_access": ["alice"]},
        {"memory_id": "m3", "content": "graph pattern matching traverses typed relationships",
         "user_id": "carol", "user_read_access": ["carol"]},
    ])
    print("   added:", [(r.memory_id, r.reused) for r in results])
    dup = eng.add_memory(memory_id="m4", user_id="dave",
                         content="spark structured streaming handles late events with watermarks")
    print(f"   duplicate content -> reused={dup.reused} from={dup.reused_from}")

    print("== 2. background enrichment (graph extraction + related edges) ==")
    print("  ", eng.enrich_memories())
    print("   schema:", eng.schema())

    print("== 3. ACL-filtered search ==")
    hits = eng.search("streaming watermarks late events",
                      ctx=AclContext(user_id="bob"), score_threshold=0.0, log_query=True)
    rows = hits.collect()
    print("   bob sees:", [(r.memory_id, round(r.score, 3)) for r in rows])

    print("== 4. agentic search (vector + graph legs, stratified merge) ==")
    ag = eng.search_agentic(
        "relationships between entities",
        graph_spec=PatternSpec(source_label="Memory", relationship_type="EXTRACTED",
                               target_label="Entity", direction="any"),
        score_threshold=None,
    ).collect()
    print("   merged sources:", sorted({r.source for r in ag}),
          "| top:", [(r.memory_id, r.source) for r in ag[:3]])

    print("== 5. rerank stage (pluggable scorer) ==")
    rr = rerank_stage(hits, "streaming watermarks late events").collect()
    print("   reranked:", [(r.memory_id, round(r.final_score, 3)) for r in rr])

    print("== 6. feedback -> tier-1 precomputed ranking ==")
    eng.record_feedback(["m2"], kind="citation", confidence=0.9)
    top = eng.tier1_list(3).collect()
    print("   tier1:", [(r.memory_id, round(r.final_score, 3)) for r in top])

    print("== 7. SQL surface ==")
    eng.register_views()
    n = eng.sql("SELECT count(*) AS n FROM memories m JOIN chunks c USING (memory_id)").first().n
    print(f"   memories x chunks join via SQL: {n} rows")

    print("== 8. dynamic schema: validation + schema-keyed MERGE ==")
    from memory_opensource_spark.operators.schema_registry import NodeTypeDef

    eng.register_schema("crm", [NodeTypeDef(
        name="Person", properties={"name": "string", "status": "string"},
        required=["name"], unique_identifiers=["name"],
    )])
    eng.add_graph([{"node_id": "p1", "label": "Person", "prop_name": "Ada",
                    "prop_status": "active"}], [])
    eng.add_graph([{"node_id": "p2", "label": "Person", "prop_name": "Ada",
                    "prop_status": "promoted"}], [])  # same name -> replaces
    person = eng.nodes.filter("label = 'Person'").collect()
    print("   Person rows after name-keyed merge:",
          [(r.node_id, r.prop_status) for r in person])
    try:
        eng.add_graph([{"node_id": "p3", "label": "Person"}], [])
    except ValueError as exc:
        print("   required-property violation rejected:", exc)

    print("== 9. TOON response format (response_format=toon) ==")
    toon = eng.search_formatted("streaming watermarks", response_format="toon",
                                ctx=AclContext(user_id="alice"),
                                score_threshold=None)
    print("   " + "\n   ".join(toon.splitlines()[:4]))

    print("== done ==")
    spark.stop()


if __name__ == "__main__":
    main()
