"""Product-quantization (PQ) index: compressed full-coverage scan + exact re-rank.

The reference's quality bar is Qdrant HNSW at m=16/ef=128
(memory/memory_graph.py:1036-1057) — recall >= 0.9 at a small fraction of the
work of a full scan.  IVF alone cannot reach that bar on embedding
distributions without cluster structure (PERF.md's recall tables: coarse
bucket pruning caps out ~0.8 because the true neighbors of a boundary query
live in unprobed buckets).  PQ attacks the cost axis IVF can't: instead of
reading FEWER rows, it reads ALL rows in a representation ~16x SMALLER, so
no neighbor is ever lost to a bucketing decision.

Pipeline (FAISS ``IndexPQ`` + re-rank, re-expressed as Spark dataflow):

    books = train_pq_codebooks(vectors, m=16)     # driver numpy Lloyd's, KB-sized
    build_pq_index(vectors, path, books)          # encode via Arrow, 16 B/row codes
    hits = pq_query(spark, path, vectors, qvec, k=10, rerank=128)

- **Encode**: L2-normalize, split dim into ``m`` subspaces, each subvector ->
  nearest of 256 per-subspace centroids -> an ``m``-byte binary code.
  ``mapInPandas`` with the (m x 256 x dsub) codebook in the task closure —
  embarrassingly parallel, no shuffle.
- **ADC scan** (asymmetric distance computation): at query time build a
  (m x 256) lookup table of query-subvector . centroid dot products; a row's
  approximate cosine is ``sum_j lut[j, code[j]]`` — pure numpy gathers over
  the codes column, never touching the full vectors.  Each Arrow batch emits
  only its local top-``rerank`` rows, so the stage output is bounded.
- **Exact re-rank**: the global top-``rerank`` ADC candidates (a few hundred
  rows) broadcast-join back to the full-fidelity vectors; exact cosine top-k
  via the same :func:`~..operators.similarity.topk_search` the exact path
  uses.  The approximation can only affect WHICH candidates are re-ranked,
  never the scores the user sees.

Scale audit (100 TB): the codes table is bytes-per-row = m (16 B) vs 4*dim
(256 B float32) — a 100 TB vector corpus scans as ~6 TB of codes,
embarrassingly parallel, zero shuffle; the candidate fetch is a broadcast
semi-join on ids that prunes to the row groups holding ``rerank`` rows when
the vector table is laid out by id (writers.zorder_write).  Codebooks are KB
of metadata (like the IVF centroid sidecar), trained once on a bounded
sample.

IVFADC composition (the FAISS ``IndexIVFPQ`` layout): pass ``ivf_centroids``
to :func:`build_pq_index` and the codes persist PARTITIONED by their coarse
bucket; a query with ``nprobe`` set prunes the ADC scan itself to nprobe/C
of the (already ~16x smaller) files via ``PartitionFilters`` — both levers
of PERF.md's round-6 recall table at once.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators.similarity import ivf_assign_auto, topk_search

CODE_COL = "pq_code"
BUCKET_COL = "ivf_bucket"


def _codebook_path(index_path: str) -> str:
    return index_path.rstrip("/") + ".codebook"


def _ivf_cents_path(index_path: str) -> str:
    return index_path.rstrip("/") + ".ivfcents"


def _lloyds(X, k: int, seed: int, iters: int):
    """Seeded vectorized Lloyd's on a driver-side sample.  Deterministic:
    init = seeded row choice, empty clusters keep their previous centroid
    (no data-dependent re-seeding), fixed iteration count."""
    import numpy as np

    rng = np.random.default_rng(seed)
    k = min(k, len(X))
    C = X[rng.choice(len(X), size=k, replace=False)].copy()
    for _ in range(iters):
        # (n, k) squared distances via the expanded form — no n*k*d temp
        d = (X * X).sum(1)[:, None] - 2.0 * (X @ C.T) + (C * C).sum(1)[None, :]
        a = d.argmin(1)
        for j in range(k):
            m = a == j
            if m.any():
                C[j] = X[m].mean(0)
    return C


def train_pq_codebooks(df: DataFrame, m: int = 16, nbits: int = 8,
                       vec_col: str = "embedding", id_col: str = "vec_id",
                       seed: int = 42, sample_cap: int = 65536,
                       iters: int = 12):
    """Per-subspace k-means codebooks -> numpy array (m, 2**nbits, dim/m).

    Driver-side numpy over a DETERMINISTIC bounded sample (order by id,
    limit ``sample_cap`` — independent of partitioning), the same
    bounded-metadata shape as IVF centroid training: codebook quality
    saturates long before the corpus does, and the result is ~KBs.
    """
    import numpy as np

    if nbits > 8:
        raise ValueError("nbits > 8 needs multi-byte codes; only <=8 supported")
    k = 2 ** nbits
    rows = (df.select(F.col(id_col), F.col(vec_col))
              .orderBy(F.col(id_col)).limit(sample_cap).collect())
    X = np.asarray([list(r[1]) for r in rows], dtype=np.float64)
    X /= np.maximum(np.linalg.norm(X, axis=1, keepdims=True), 1e-12)
    dim = X.shape[1]
    if dim % m:
        raise ValueError(f"dim {dim} not divisible by m={m}")
    ds = dim // m
    return np.stack([
        _lloyds(X[:, j * ds:(j + 1) * ds], k, seed + j, iters)
        for j in range(m)
    ])


def build_pq_index(df: DataFrame, index_path: str, codebooks=None,
                   m: int = 16, nbits: int = 8,
                   vec_col: str = "embedding", id_col: str = "vec_id",
                   mode: str = "overwrite", ivf_centroids=None,
                   extra_cols: list[str] | None = None):
    """Encode every vector to an m-byte PQ code and persist ``(id, code)``.
    Codebooks are stored alongside (``<path>.codebook``) so query time needs
    no re-training.  Returns the codebooks.

    ``extra_cols`` pass through unencoded into the codes table (e.g. the
    engine's ``memory_id``, so serving can tombstone-filter the ADC scan
    itself — stale rows never burn re-rank slots).

    With ``ivf_centroids`` (IVFADC): each code row also carries its coarse
    bucket and the layout is PARTITIONED by it, so an ``nprobe`` query prunes
    the ADC scan to nprobe/C of the files (the FAISS IVFPQ shape).  The
    coarse centroids persist in ``<path>.ivfcents``."""
    import numpy as np

    books = (codebooks if codebooks is not None
             else train_pq_codebooks(df, m, nbits, vec_col, id_col))
    books = np.asarray(books, dtype=np.float64)
    m_, k, ds = books.shape
    bucketed = ivf_centroids is not None

    if mode != "overwrite":
        # The sidecars are written overwrite below; an append whose codebooks
        # differ from the stored ones would silently re-point every previously
        # appended code at the WRONG codebooks (ADC scores corrupt, no error).
        # Mirror append_to_index's contract: appends must decode against the
        # existing sidecar, so require bit-equal codebooks (and, for IVFADC,
        # bit-equal coarse centroids).
        spark_ = df.sparkSession
        try:
            stored = load_codebooks(spark_, index_path)
        except Exception as e:
            # ONLY a missing sidecar may skip the check (first append to a
            # fresh path).  Any other read failure must propagate: treating
            # a transient store error as "no sidecar" would bypass the guard
            # and overwrite the sidecar below — exactly the silent-corruption
            # mode this block exists to prevent.
            if isinstance(e, FileNotFoundError) or "PATH_NOT_FOUND" in str(e) \
                    or "Path does not exist" in str(e):
                stored = None
            else:
                raise
        if stored is not None and not np.array_equal(
                np.asarray(stored, dtype=np.float64), books):
            raise ValueError(
                f"build_pq_index(mode={mode!r}): codebooks differ from the "
                f"sidecar at {_codebook_path(index_path)}; pass the stored "
                "codebooks (load_codebooks) to append compatibly")
        if stored is not None and bucketed:
            stored_cents = load_ivf_centroids(spark_, index_path)
            if stored_cents is not None and not np.allclose(
                    np.asarray(stored_cents, dtype=np.float64),
                    np.asarray(ivf_centroids, dtype=np.float64)):
                raise ValueError(
                    f"build_pq_index(mode={mode!r}): ivf_centroids differ "
                    f"from {_ivf_cents_path(index_path)}; appended codes "
                    "would land in wrong buckets")

    def encode(batches):
        import pandas as pd

        for pdf in batches:
            Xm = np.asarray([np.asarray(v, dtype=np.float64)
                             for v in pdf[vec_col]])
            Xm /= np.maximum(np.linalg.norm(Xm, axis=1, keepdims=True), 1e-12)
            codes = np.empty((len(Xm), m_), dtype=np.uint8)
            for j in range(m_):
                sub = Xm[:, j * ds:(j + 1) * ds]
                d = ((sub * sub).sum(1)[:, None] - 2.0 * (sub @ books[j].T)
                     + (books[j] * books[j]).sum(1)[None, :])
                codes[:, j] = d.argmin(1)
            out = {id_col: pdf[id_col],
                   CODE_COL: [c.tobytes() for c in codes]}
            for c in passthru:
                out[c] = pdf[c]
            if bucketed:
                out[BUCKET_COL] = pdf[BUCKET_COL]
            yield pd.DataFrame(out)

    passthru = list(extra_cols or [])
    dtypes = dict(df.dtypes)
    schema = f"{id_col} {dtypes[id_col]}, {CODE_COL} binary"
    for c in passthru:
        schema += f", {c} {dtypes[c]}"
    src = df
    if bucketed:
        src = ivf_assign_auto(df, ivf_centroids, 1, vec_col,
                              bucket_col=BUCKET_COL)
        schema += f", {BUCKET_COL} int"
        out = src.select(id_col, vec_col, *passthru, BUCKET_COL).mapInPandas(
            encode, schema=schema)
        # one writer per bucket directory, not writers x buckets small files
        # (the same fix build_ivf_index carries)
        out.repartition(F.col(BUCKET_COL)).write.mode(mode) \
           .partitionBy(BUCKET_COL).parquet(index_path)
    else:
        out = src.select(id_col, vec_col, *passthru).mapInPandas(
            encode, schema=schema)
        out.write.mode(mode).parquet(index_path)

    spark = df.sparkSession
    side = spark.createDataFrame(
        [(j, c, [float(x) for x in books[j, c]])
         for j in range(m_) for c in range(k)],
        "sub int, code int, centroid array<double>",
    )
    side.coalesce(1).write.mode("overwrite").parquet(_codebook_path(index_path))
    if bucketed:
        cdf = spark.createDataFrame(
            [(i, [float(x) for x in c]) for i, c in enumerate(ivf_centroids)],
            "cid int, centroid array<double>",
        )
        cdf.coalesce(1).write.mode("overwrite").parquet(
            _ivf_cents_path(index_path))
    return books


def load_codebooks(spark: SparkSession, index_path: str):
    """Codebook sidecar -> (m, k, dsub) numpy array.  pyarrow fast path (a
    per-query Spark collect for KBs of metadata costs ~0.5 s of scheduler
    overhead), Spark fallback for filesystems pyarrow can't reach."""
    import numpy as np

    try:
        import pyarrow.parquet as pq

        t = pq.read_table(_codebook_path(index_path)).to_pydict()
        triples = sorted(zip(t["sub"], t["code"], t["centroid"]))
    except (ImportError, OSError, ValueError):
        rows = (spark.read.parquet(_codebook_path(index_path))
                .orderBy("sub", "code").collect())
        triples = [(r.sub, r.code, list(r.centroid)) for r in rows]
    m = triples[-1][0] + 1
    k = triples[-1][1] + 1
    ds = len(triples[0][2])
    books = np.empty((m, k, ds), dtype=np.float64)
    for j, c, cent in triples:
        books[j, c] = cent
    return books


def load_ivf_centroids(spark: SparkSession, index_path: str):
    """Coarse-centroid sidecar of an IVFADC layout -> list of vectors
    (None when the index was built flat)."""
    try:
        import pyarrow.parquet as pq

        t = pq.read_table(_ivf_cents_path(index_path)).to_pydict()
        order = sorted(range(len(t["cid"])), key=lambda i: t["cid"][i])
        return [[float(x) for x in t["centroid"][i]] for i in order]
    except (ImportError, ValueError):
        # Spark fallback must mirror the pyarrow branch's missing-sidecar ->
        # None mapping, or a flat index queried with nprobe surfaces an opaque
        # PATH_NOT_FOUND instead of pq_candidates' intended ValueError.
        try:
            rows = (spark.read.parquet(_ivf_cents_path(index_path))
                    .orderBy("cid").collect())
        except Exception as e:
            if "PATH_NOT_FOUND" in str(e) or "Path does not exist" in str(e):
                return None
            raise
        return [[float(x) for x in r.centroid] for r in rows]
    except OSError:
        return None


def pq_candidates(spark: SparkSession, index_path: str, query_vec: list[float],
                  rerank: int, codebooks=None,
                  id_col: str = "vec_id", nprobe: int | None = None,
                  codes_df: DataFrame | None = None,
                  ivf_centroids=None) -> DataFrame:
    """ADC scan over the codes table -> global top-``rerank`` candidate ids
    with approximate scores.  Per-batch top-r preselect keeps the Arrow
    stage's output bounded (the global top-r is a subset of the union of
    per-batch top-rs); the only exchange is the final ``rerank``-row
    TakeOrdered.

    ``nprobe`` on an IVFADC layout prunes the scan to the nprobe coarse
    buckets nearest the query BEFORE it starts (``PartitionFilters``, plan-
    asserted in tests/test_pq_index.py)."""
    import numpy as np

    books = (np.asarray(codebooks, dtype=np.float64) if codebooks is not None
             else load_codebooks(spark, index_path))
    m, k, ds = books.shape
    q = np.asarray(query_vec, dtype=np.float64)
    q = q / max(float(np.linalg.norm(q)), 1e-12)
    lut = np.stack([books[j] @ q[j * ds:(j + 1) * ds] for j in range(m)])
    r = int(rerank)

    def adc(batches):
        import pandas as pd

        for pdf in batches:
            if not len(pdf):
                continue
            codes = np.frombuffer(
                b"".join(pdf[CODE_COL]), dtype=np.uint8).reshape(len(pdf), m)
            s = lut[np.arange(m), codes].sum(1)
            # (score desc, id asc) so exact-tie cuts are layout-independent —
            # plain argsort would let partition/batch order pick which tied
            # row reaches re-rank (the id-asc determinism rule everywhere else)
            top = np.lexsort((pdf[id_col].to_numpy(), -s))[:r]
            yield pd.DataFrame({
                id_col: pdf[id_col].iloc[top].to_numpy(),
                "adc_score": s[top],
            })

    if codes_df is None:
        codes_df = spark.read.parquet(index_path)
    # else: caller pre-filtered the codes scan (e.g. the engine's broadcast
    # tombstone anti-join) — pruning composes below
    if nprobe is not None:
        from .ann_index import probe_buckets

        # the centroid sidecar is KBs — a serving engine passes its cached
        # copy (ivf_centroids=) so no per-query Spark read happens here
        cents = (ivf_centroids if ivf_centroids is not None
                 else load_ivf_centroids(spark, index_path))
        if cents is None:
            raise ValueError(
                f"{index_path}: nprobe set but no {_ivf_cents_path(index_path)} "
                "sidecar — build with ivf_centroids= for an IVFADC layout")
        probe = probe_buckets(list(q), cents, nprobe)
        codes_df = codes_df.filter(F.col(BUCKET_COL).isin(probe))
    codes_df = codes_df.select(id_col, CODE_COL)
    id_type = dict(codes_df.dtypes)[id_col]
    scored = codes_df.mapInPandas(
        adc, schema=f"{id_col} {id_type}, adc_score double")
    return (scored.orderBy(F.col("adc_score").desc(), F.col(id_col).asc())
            .limit(r))


def pq_query(spark: SparkSession, index_path: str, vectors: DataFrame,
             query_vec: list[float], k: int, rerank: int = 128,
             codebooks=None, id_col: str = "vec_id",
             vec_col: str = "embedding",
             score_threshold: float | None = None,
             nprobe: int | None = None) -> DataFrame:
    """PQ ANN top-k: ADC candidates -> broadcast-join to the full vectors ->
    EXACT cosine top-k.  Scores the caller sees are exact; the compression
    only bounds which ``rerank`` rows get exact treatment (recall measured in
    PERF.md — 1.0 at rerank=1% on the uniform-sphere fixture).  ``nprobe``
    additionally prunes the ADC scan on an IVFADC layout."""
    cand = pq_candidates(spark, index_path, query_vec, rerank, codebooks,
                         id_col, nprobe=nprobe)
    subset = vectors.join(F.broadcast(cand.select(id_col)), id_col)
    return topk_search(subset, query_vec, k, None, vec_col, id_col,
                       score_threshold=score_threshold)
