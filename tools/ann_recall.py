"""Measure ANN recall@k vs exact search at a given scale factor.

Quantifies the accuracy/cost trade of the two approximate paths:
- IVF (coarse quantization + nprobe)  — recall rises with nprobe
- LSH (random projections)            — recall rises with hash tables

Usage: python tools/ann_recall.py [sf_dir] [k]
Prints one line per configuration: name, recall@k, candidate fraction scanned.
"""

from __future__ import annotations

import sys

sys.path.insert(0, ".")


def main():
    import numpy as np

    from memory_opensource_spark.session import get_spark
    from memory_opensource_spark.sources import tables

    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    k = int(sys.argv[2]) if len(sys.argv) > 2 else 10
    n_queries = 50

    spark = get_spark("ann-recall")
    spark.sparkContext.setLogLevel("ERROR")
    emb = tables.load(spark, sf_dir, "embeddings")
    rows = emb.collect()
    ids = np.array([r.vec_id for r in rows])
    mat = np.array([list(r.embedding) for r in rows], dtype="float64")
    mat /= np.linalg.norm(mat, axis=1, keepdims=True)

    rng = np.random.default_rng(42)
    q_idx = rng.choice(len(ids), size=n_queries, replace=False)

    # exact ground truth
    truth = {}
    for qi in q_idx:
        s = mat @ mat[qi]
        s[qi] = -np.inf
        truth[qi] = set(ids[np.argsort(-s)[:k]])

    # IVF: sampled (first-C) vs k-means centroids, assignment by max dot
    from memory_opensource_spark.sources.ann_index import train_centroids

    trained = {c: np.asarray(train_centroids(emb, c))
               for c in (32, 128, 256, 512, 1024)}
    for trainer, n_cents, nprobe, assign_k in [
        ("kmeans", 32, 4, 1),
        # the C scaling law at ~matched scan fraction (~12.5%)
        ("kmeans", 128, 16, 1), ("kmeans", 256, 32, 1),
        # round-6: keep scaling C — recall at fixed scan keeps rising
        ("kmeans", 512, 64, 1), ("kmeans", 512, 77, 1),
        ("kmeans", 1024, 100, 1), ("kmeans", 1024, 150, 1),
        # multi-assignment (spill) — replicated rows counted in scan
        ("kmeans", 256, 24, 2), ("kmeans", 1024, 75, 2),
    ]:
        cents = trained[n_cents] if trainer == "kmeans" else mat[:n_cents]
        sims_all = mat @ cents.T
        assign = np.argsort(-sims_all, axis=1)[:, :assign_k]  # (n, assign_k)
        hits, frac = 0, 0.0
        for qi in q_idx:
            order = np.argsort(-(cents @ mat[qi]))[:nprobe]
            in_probe = np.isin(assign, order)
            cand_mask = in_probe.any(axis=1)
            # scanned rows include replicas: a spill layout stores assign_k
            # copies, so cost = rows-in-probed-buckets, not distinct vectors
            frac += in_probe.sum() / len(mat)
            cand = np.where(cand_mask)[0]
            s = mat[cand] @ mat[qi]
            keep = cand[np.argsort(-s)]
            keep = [c for c in keep if c != qi][:k]
            hits += len(truth[qi] & set(ids[keep]))
        tag = f" assign={assign_k}" if assign_k > 1 else ""
        print(f"ivf[{trainer}] C={n_cents} nprobe={nprobe}{tag}: "
              f"recall@{k}={hits/(k*n_queries):.3f} scan_frac={frac/n_queries:.3f}")

    # LSH: random hyperplane signatures, candidates = same bucket in any table
    dim = mat.shape[1]
    for n_tables, n_bits in [(4, 8), (8, 8), (8, 6)]:
        planes = rng.normal(size=(n_tables, n_bits, dim))
        codes = np.stack([(mat @ planes[t].T > 0) @ (1 << np.arange(n_bits))
                          for t in range(n_tables)], axis=1)  # (n, tables)
        hits, frac = 0, 0.0
        for qi in q_idx:
            cand_mask = (codes == codes[qi]).any(axis=1)
            cand_mask[qi] = False
            frac += cand_mask.mean()
            cand = np.where(cand_mask)[0]
            if len(cand) == 0:
                continue
            s = mat[cand] @ mat[qi]
            keep = cand[np.argsort(-s)][:k]
            hits += len(truth[qi] & set(ids[keep]))
        print(f"lsh tables={n_tables} bits={n_bits}: recall@{k}={hits/(k*n_queries):.3f} "
              f"scan_frac={frac/n_queries:.3f}")

    # PQ + exact re-rank (sources/pq_index.py): ADC over m-byte codes covers
    # EVERY row, then the top-R candidates re-rank exactly.  Cost is bytes,
    # not rows: scan_bytes = m / (8 * dim)  [codes vs the ACTUAL stored
    # array<double> vectors — 8 B/dim; the round-6 PERF table used a float32
    # baseline, which overstated the fraction 2x]
    # + R/n full-fidelity rows for the re-rank.
    from memory_opensource_spark.sources.pq_index import (
        build_pq_index, train_pq_codebooks)

    n, dim = mat.shape
    for m, R in [(8, max(k, n // 100)), (16, max(k, n // 100)),
                 (16, max(k, n // 20)), (32, max(k, n // 100))]:
        books = np.asarray(train_pq_codebooks(emb, m=m))
        ds = dim // m
        codes = np.empty((n, m), dtype=np.uint8)
        for j in range(m):
            sub = mat[:, j * ds:(j + 1) * ds]
            d = ((sub * sub).sum(1)[:, None] - 2.0 * (sub @ books[j].T)
                 + (books[j] * books[j]).sum(1)[None, :])
            codes[:, j] = d.argmin(1)
        hits = 0
        for qi in q_idx:
            lut = np.stack([books[j] @ mat[qi, j * ds:(j + 1) * ds]
                            for j in range(m)])
            s = lut[np.arange(m), codes].sum(1)
            cand = np.argsort(-s)[:R]
            rr = cand[np.argsort(-(mat[cand] @ mat[qi]))]
            rr = [c for c in rr if c != qi][:k]
            hits += len(truth[qi] & set(ids[rr]))
        byte_frac = m / (8.0 * dim) + R / n
        print(f"pq m={m} rerank={R} ({R/n:.1%} rows): "
              f"recall@{k}={hits/(k*n_queries):.3f} "
              f"bytes_frac={byte_frac:.3f}")

    spark.stop()


if __name__ == "__main__":
    main()
