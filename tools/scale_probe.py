"""Scale-routing proof: generate a corpus PAST the 500k-row broadcast budget,
confirm the auto-routed similarity family actually crosses to the grid path,
and measure both routes on the SAME data with the SAME results.

Usage: python tools/scale_probe.py [n_rows] [dim]

What it runs (results recorded in PERF.md round-6 section):
1. routing check — `route_rows` estimate for the generated parquet and the
   branch `embedding_near_duplicates` / `knn_join_auto` take at that size;
2. grid duplicate sweep over all N rows (threshold 0.95) — wall time + stage
   shuffle bytes from the Spark REST API;
3. forced-BLAS sweep on the same data (`approx_rows` hint under the budget —
   the 600k x 16 matrix is ~75 MB, safely broadcastable HERE; the budget is a
   conservative row bound for 1024-dim production vectors) — wall time +
   result parity with the grid run;
4. ingest-shaped kNN: 1000 new rows vs the N-row corpus through
   `ingest_dedup_reuse` (auto -> grid_knn_join), wall time.
"""

from __future__ import annotations

import json
import os
import sys
import time
import urllib.request

sys.path.insert(0, ".")

SCRATCH = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                       ".scratch")


def shuffle_bytes(spark) -> tuple[int, int]:
    """(total shuffle write, max single-stage shuffle write) via the UI REST API."""
    try:
        ui = spark.sparkContext.uiWebUrl
        app = spark.sparkContext.applicationId
        with urllib.request.urlopen(f"{ui}/api/v1/applications/{app}/stages") as r:
            stages = json.load(r)
        writes = [s.get("shuffleWriteBytes", 0) for s in stages]
        return sum(writes), max(writes, default=0)
    except Exception as e:  # headless UI quirks must not fail the probe
        print(f"  (shuffle metrics unavailable: {e})")
        return -1, -1


def main():
    import numpy as np

    from memory_opensource_spark.session import get_spark

    n = int(sys.argv[1]) if len(sys.argv) > 1 else 600_000
    dim = int(sys.argv[2]) if len(sys.argv) > 2 else 16
    path = os.path.join(SCRATCH, f"emb_{n}_{dim}.parquet")

    spark = get_spark("scale-probe")
    spark.sparkContext.setLogLevel("ERROR")

    if not os.path.exists(path):
        print(f"generating {n} x {dim} corpus -> {path}")
        import pyarrow as pa
        import pyarrow.parquet as pq

        os.makedirs(SCRATCH, exist_ok=True)
        rng = np.random.default_rng(42)
        mat = rng.normal(size=(n, dim)).astype("float32")
        mat /= np.linalg.norm(mat, axis=1, keepdims=True)
        tbl = pa.table({"vec_id": pa.array(range(n), type=pa.int64()),
                        "embedding": pa.array(mat.tolist(),
                                              type=pa.list_(pa.float32()))})
        pq.write_table(tbl, path)

    from memory_opensource_spark.operators import dedup
    from memory_opensource_spark.operators.similarity import (
        BLAS_BROADCAST_BUDGET_ROWS, _auto_blocks, route_rows)

    vecs = spark.read.parquet(path)
    est = route_rows(vecs)
    routed_grid = est > BLAS_BROADCAST_BUDGET_ROWS
    print(f"route_rows estimate: {est} (budget {BLAS_BROADCAST_BUDGET_ROWS}) "
          f"-> {'GRID' if routed_grid else 'BLAS'}; "
          f"auto n_blocks={_auto_blocks(est)}")

    # 2. grid sweep (the auto route at this size)
    before_total, _ = shuffle_bytes(spark)
    t0 = time.time()
    grid_pairs = dedup.embedding_near_duplicates(vecs, threshold=0.95).count()
    t_grid = time.time() - t0
    after_total, stage_max = shuffle_bytes(spark)
    shuf = (after_total - before_total) if after_total >= 0 else -1
    print(f"grid sweep:  {grid_pairs} pairs in {t_grid:.1f}s  "
          f"shuffle={shuf/1e6:.0f}MB (max stage {stage_max/1e6:.0f}MB)")

    # 3. forced BLAS on the same data (hint under budget); parity check
    t0 = time.time()
    blas_pairs = dedup.embedding_near_duplicates(
        vecs, threshold=0.95, approx_rows=1).count()
    t_blas = time.time() - t0
    print(f"blas sweep:  {blas_pairs} pairs in {t_blas:.1f}s  "
          f"parity={'OK' if blas_pairs == grid_pairs else 'MISMATCH'}")

    # 4. ingest-shaped kNN: 1000 new rows vs the full corpus
    new = vecs.limit(1000)
    t0 = time.time()
    hits = dedup.ingest_dedup_reuse(new, vecs, threshold=0.99,
                                    new_id="vec_id", existing_id="vec_id").count()
    t_knn = time.time() - t0
    print(f"ingest kNN (1000 new vs {n}): {hits} reuse hits in {t_knn:.1f}s")

    # 5. SemDeDup at the same scale: C = N/500 trained-shaped centroids
    # (deterministic slice stands in for train_centroids — the assignment and
    # per-cluster prune cost is what's being measured), then the full
    # assign -> per-cluster pairwise prune pipeline
    n_cents = max(64, n // 500)
    from pyspark.sql import functions as _F0
    cents = (vecs.filter(_F0.col("vec_id") < n_cents)
             .selectExpr("vec_id as centroid_id", "embedding"))
    t0 = time.time()
    out = dedup.semantic_cluster_dedup(vecs, cents, eps=0.95,
                                       approx_centroid_rows=n_cents)
    from pyspark.sql import functions as _F
    agg = out.agg(_F.count("*").alias("n"), _F.sum("is_dup").alias("d")).collect()[0]
    t_sem = time.time() - t0
    print(f"semdedup (C={n_cents}, eps=0.95): {agg['n']} rows, "
          f"{agg['d']} pruned in {t_sem:.1f}s")

    spark.stop()


if __name__ == "__main__":
    main()
