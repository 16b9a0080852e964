"""Write-path probe: add_memory_batch throughput at the reference's caps.

Measures consecutive 1000-item batches (BATCH_MAX — the reference Temporal
path's unit, config/opensource.yaml batch_processing) through the REAL
engine write path: validate -> policy resolve -> chunk -> embed -> V4
near-dup reuse -> 3-table MERGE.  Then one enrichment pass and a persisted
save, so every §3.2 stage gets a number.

Usage: python tools/ingest_probe.py [n_batches] [batch_size]
Results recorded in PERF.md (round-6 ingest probe section).
"""

from __future__ import annotations

import sys
import time

sys.path.insert(0, ".")


def main():
    from memory_opensource_spark.api import MemoryEngine
    from memory_opensource_spark.session import get_spark

    n_batches = int(sys.argv[1]) if len(sys.argv) > 1 else 3
    size = int(sys.argv[2]) if len(sys.argv) > 2 else 1000
    spark = get_spark("ingest-probe")
    eng = MemoryEngine(spark, dim=64)

    totals = []
    for b in range(n_batches):
        items = [{
            "memory_id": f"b{b}_m{i}",
            # token-disjoint contents so V4 reuse never collapses the batch
            "content": " ".join(f"tok{b}x{i}y{j}" for j in range(24)),
            "user_id": f"u{i % 50}",
            "user_read_access": [f"u{i % 50}", "auditor"],
            "topics": [f"topic{i % 7}"],
            "namespace_id": f"ns{i % 3}",
        } for i in range(size)]
        t0 = time.time()
        res = eng.add_memory_batch(items)
        dt = time.time() - t0
        totals.append(dt)
        print(f"batch {b}: {dt:.2f}s  ({size / dt:.0f} memories/s, "
              f"{sum(1 for r in res if r.reused)} reused)")

    t0 = time.time()
    counts = eng.enrich_memories()
    t_enrich = time.time() - t0
    print(f"enrich ({counts['related_edges']} related, "
          f"{counts['entities']} entities): {t_enrich:.2f}s")

    import tempfile
    with tempfile.TemporaryDirectory() as d:
        t0 = time.time()
        eng.save(d)
        t_save = time.time() - t0
    n_total = n_batches * size
    print(f"save ({n_total} memories, {eng.chunks.count()} chunks): {t_save:.2f}s")

    import json
    print(json.dumps({
        "batch_size": size, "n_batches": n_batches,
        "batch_secs": [round(t, 2) for t in totals],
        "memories_per_s_steady": round(size / totals[-1], 1),
        "enrich_s": round(t_enrich, 2), "save_s": round(t_save, 2),
    }))


if __name__ == "__main__":
    main()
