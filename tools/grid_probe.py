"""Scale probe for the grid similarity joins: 50k x 64 synthetic vectors,
grid_near_duplicates vs cosine_join_blas — same results, no driver collect.

Usage: python tools/grid_probe.py [n_rows] [dim] [threshold]
"""

from __future__ import annotations

import sys
import time

sys.path.insert(0, ".")


def main():
    import numpy as np

    from memory_opensource_spark.operators.similarity import (
        cosine_join_blas,
        grid_near_duplicates,
    )
    from memory_opensource_spark.session import get_spark

    n = int(sys.argv[1]) if len(sys.argv) > 1 else 50_000
    dim = int(sys.argv[2]) if len(sys.argv) > 2 else 64
    tau = float(sys.argv[3]) if len(sys.argv) > 3 else 0.62

    spark = get_spark("grid-probe")
    spark.sparkContext.setLogLevel("ERROR")
    rng = np.random.default_rng(11)
    mat = rng.normal(size=(n, dim))
    mat /= np.linalg.norm(mat, axis=1, keepdims=True)
    rows = [(i, [float(x) for x in mat[i]]) for i in range(n)]
    df = spark.createDataFrame(rows, "id bigint, embedding array<double>") \
              .repartition(32).cache()
    df.count()

    t0 = time.time()
    blas = cosine_join_blas(df, df, tau, left_id="id", right_id="id",
                            inclusive=False)
    n_blas = blas.filter("left_id < right_id").count()
    t_blas = time.time() - t0

    t0 = time.time()
    grid = grid_near_duplicates(df, tau, id_col="id", n_blocks=8,
                                inclusive=False)
    n_grid = grid.count()
    t_grid = time.time() - t0

    print(f"rows={n} dim={dim} tau={tau}")
    print(f"blas (broadcast-collect): {t_blas:.1f}s, {n_blas} pairs")
    print(f"grid (no collect):        {t_grid:.1f}s, {n_grid} pairs")
    assert n_blas == n_grid, "grid must be bit-identical to blas"
    spark.stop()


if __name__ == "__main__":
    main()
