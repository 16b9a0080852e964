"""Engine-level scale probe: the flagship READ path at 10x the bench corpus.

Generates a synthetic 600k-chunk corpus (64-dim), then measures the exact
code paths a production deployment serves:

1. full-scan ACL-filtered cosine top-20 (`plans.search.search`) — the
   sf0.1 flagship plan at 10x rows;
2. IVF index build (`MemoryEngine.build_search_index` with the auto
   centroid count clamped for probe wall-time);
3. ANN-served search (`engine.search(ann_nprobe=...)`) — wall time + the
   fraction of the corpus scanned + top-20 overlap vs the full scan.

Usage: python tools/engine_probe.py [n_rows] [dim]
Results recorded in PERF.md (round-6 engine probe section).
"""

from __future__ import annotations

import os
import shutil
import sys
import time

sys.path.insert(0, ".")

SCRATCH = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                       ".scratch")


def main():
    from pyspark.sql import functions as F

    from memory_opensource_spark.api import MemoryEngine
    from memory_opensource_spark.operators.predicate import AclContext
    from memory_opensource_spark.plans.search import search as search_plan
    from memory_opensource_spark.session import get_spark
    from memory_opensource_spark.sources import tables

    n = int(sys.argv[1]) if len(sys.argv) > 1 else 600_000
    dim = int(sys.argv[2]) if len(sys.argv) > 2 else 64
    spark = get_spark("engine-probe")
    os.makedirs(SCRATCH, exist_ok=True)
    emb_path = os.path.join(SCRATCH, f"probe_emb_{n}_{dim}.parquet")
    doc_path = os.path.join(SCRATCH, f"probe_doc_{n}.parquet")
    idx_path = os.path.join(SCRATCH, f"probe_ivf_{n}_{dim}")

    if not os.path.exists(emb_path):
        # clustered corpus (512 centers + noise): real embeddings are
        # clustered — uniform random vectors are near-equidistant in high dim
        # and would make any IVF recall number meaningless
        print(f"generating {n} x {dim} corpus ...")
        centers = spark.range(512).select(
            F.col("id").alias("cid"),
            F.array(*[F.rand(seed=1000 + i) for i in range(dim)]).alias("center"),
        )
        spark.range(n).select(
            F.col("id").alias("vec_id"),
            (F.col("id") % 512).alias("cid"),
            F.array(*[F.rand(seed=i) for i in range(dim)]).alias("noise"),
            (F.col("id") % 5).cast("string").alias("label"),
        ).join(F.broadcast(centers), "cid").select(
            "vec_id",
            F.zip_with("center", "noise",
                       lambda c, z: c + 0.15 * z).alias("embedding"),
            "label",
        ).write.mode("overwrite").parquet(emb_path)
        spark.range(n).select(
            F.col("id").alias("doc_id"),
            F.concat(F.lit("synthetic document body "),
                     F.col("id").cast("string")).alias("text"),
            F.element_at(F.array(F.lit("en"), F.lit("de"), F.lit("fr")),
                         (F.col("id") % 3 + 1).cast("int")).alias("lang"),
            F.element_at(F.array(F.lit("web"), F.lit("chat"), F.lit("doc")),
                         (F.col("id") % 3 + 1).cast("int")).alias("source"),
        ).write.mode("overwrite").parquet(doc_path)

    chunks = tables.build_chunks(spark.read.parquet(emb_path))
    memories = tables.build_memories(spark.read.parquet(doc_path))
    qvec = [float(x) for x in
            chunks.filter(F.col("chunk_id") == "m7_0").select("embedding").first()[0]]
    ctx = AclContext(user_id="u5", workspace_ids=["w1", "w3"], role_ids=["r2"],
                     organization_id="o1")

    # 1. full scan (warm once for read caches, then timed)
    full = search_plan(chunks, memories, qvec, ctx=ctx, top_k=20,
                       score_threshold=0.0)
    full_ids = [r.memory_id for r in full.select("memory_id").collect()]
    t0 = time.time()
    full_ids = [r.memory_id for r in
                search_plan(chunks, memories, qvec, ctx=ctx, top_k=20,
                            score_threshold=0.0).select("memory_id").collect()]
    t_full = time.time() - t0
    print(f"full-scan search: {t_full:.2f}s  (top-20 over {n} chunks)")

    # 2. IVF build through the engine (centroids clamped: the probe measures
    # serving shape, not k-means convergence wall-time)
    eng = MemoryEngine(spark, dim=dim)
    eng.chunks, eng.memories = chunks, memories
    n_cents = 512
    if os.path.exists(idx_path):
        shutil.rmtree(idx_path, ignore_errors=True)
        shutil.rmtree(idx_path + ".centroids", ignore_errors=True)
    t0 = time.time()
    eng.build_search_index(idx_path, n_centroids=n_cents)
    t_build = time.time() - t0
    print(f"IVF build: {t_build:.2f}s  ({n_cents} centroids)")

    # 3. ANN-served search through the SAME engine surface
    # engine.search() embeds the query text; serve the SAME qvec as the full
    # scan for parity, through the identical candidate + plan path
    nprobe = max(1, n_cents // 16)  # ~6% of buckets
    t0 = time.time()
    cand = eng._ann_candidates(qvec, nprobe)
    ann = search_plan(cand, memories, qvec, ctx=ctx, top_k=20,
                      score_threshold=0.0)
    ann_ids = [r.memory_id for r in ann.select("memory_id").collect()]
    t_ann = time.time() - t0
    scanned = eng._ann_candidates(qvec, nprobe).count()
    overlap = len(set(full_ids) & set(ann_ids)) / max(1, len(full_ids))
    print(f"ANN search: {t_ann:.2f}s  nprobe={nprobe}  "
          f"scanned {scanned}/{n} ({100.0 * scanned / n:.1f}%)  "
          f"top-20 overlap vs full scan: {overlap:.2f}")

    # 4. PQ/IVFADC build + serving through the SAME engine surface (r7: the
    # VERDICT gap — PQ was tooling-only).  Same coarse C as the IVF run; the
    # ADC scan reads m-byte codes instead of full vectors, so equal-recall
    # serving should cost less wall/bytes than IVF at the same nprobe.
    pq_path = os.path.join(SCRATCH, f"probe_pq_{n}_{dim}")
    for suffix in ["", ".rows", ".codebook", ".ivfcents"]:
        shutil.rmtree(pq_path + suffix, ignore_errors=True)
    t0 = time.time()
    eng.build_search_index(pq_path, n_centroids=n_cents, method="pq")
    t_pq_build = time.time() - t0
    print(f"PQ build: {t_pq_build:.2f}s  ({n_cents} coarse centroids, IVFADC)")

    t0 = time.time()
    pq_cand = eng._ann_candidates_pq(qvec, nprobe, 20, ctx=ctx)
    pq_ann = search_plan(pq_cand, memories, qvec, ctx=ctx, top_k=20,
                         score_threshold=0.0)
    pq_ids = [r.memory_id for r in pq_ann.select("memory_id").collect()]
    t_pq = time.time() - t0
    # steady-state serve (r8): the first query pays one-time costs the
    # engine now amortizes — bucket-dir listing into the cached relations,
    # Python ADC worker spin-up, broadcast build — so the SECOND query is
    # the serving number a deployment sees
    t0 = time.time()
    warm_cand = eng._ann_candidates_pq(qvec, nprobe, 20, ctx=ctx)
    warm = search_plan(warm_cand, memories, qvec, ctx=ctx, top_k=20,
                       score_threshold=0.0)
    warm_ids = [r.memory_id for r in warm.select("memory_id").collect()]
    t_pq_warm = time.time() - t0
    assert warm_ids == pq_ids
    from pyspark.sql import functions as FF
    from memory_opensource_spark.sources import pq_index as pqm
    cents = pqm.load_ivf_centroids(spark, pq_path)
    probe = __import__(
        "memory_opensource_spark.sources.ann_index", fromlist=["probe_buckets"]
    ).probe_buckets(qvec, cents, nprobe)
    codes_scanned = (spark.read.parquet(pq_path)
                     .filter(FF.col(pqm.BUCKET_COL).isin(probe)).count())
    pq_overlap = len(set(full_ids) & set(pq_ids)) / max(1, len(full_ids))
    m_bytes = eng._pq_books.shape[0]
    # denominator: the ACTUAL stored representation (array<double>, 8 B/dim)
    # — a float32 baseline would overstate the PQ fraction 2x
    bytes_frac = (codes_scanned * m_bytes) / (n * dim * 8)
    print(f"PQ search: {t_pq:.2f}s (first) / {t_pq_warm:.2f}s (steady)  "
          f"nprobe={nprobe}  ADC-scanned {codes_scanned}/{n} codes "
          f"(~{100.0 * bytes_frac:.1f}% of full-scan bytes)  "
          f"top-20 overlap vs full scan: {pq_overlap:.2f}")

    import json
    print(json.dumps({
        "n": n, "dim": dim, "t_full_scan_s": round(t_full, 2),
        "t_ivf_build_s": round(t_build, 2), "t_ann_s": round(t_ann, 2),
        "nprobe": nprobe, "scan_fraction": round(scanned / n, 4),
        "top20_overlap": round(overlap, 2),
        "t_pq_build_s": round(t_pq_build, 2), "t_pq_s": round(t_pq, 2),
        "t_pq_warm_s": round(t_pq_warm, 2),
        "pq_codes_scanned": codes_scanned,
        "pq_bytes_fraction": round(bytes_frac, 4),
        "pq_top20_overlap": round(pq_overlap, 2),
    }))


if __name__ == "__main__":
    main()
