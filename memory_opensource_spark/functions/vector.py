"""Vector math as JVM-side Column expressions (no Python UDFs in the hot path).

The reference computes cosine similarity in numpy (memory/memory_graph.py:1626-1628,
memory/memory_item_relevance.py:29-34) and ships int8-quantized vectors
(services/memory_management.py:3957-4025).  Here every operation is a Catalyst
higher-order-function expression so it stays inside whole-stage codegen and
vectorizes on the JVM — ~10-100x faster than row-at-a-time Python and with zero
serialization cost, which is what matters at 100 TB.

All math is done in double precision (inputs are float32 arrays; cast first) so the
DuckDB oracle — which also computes in double — hash-matches.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

from ..semantics import INT8_SCALE


def to_double(vec: Column) -> Column:
    """Cast array<float> -> array<double> for stable cross-engine math."""
    return F.transform(vec, lambda x: x.cast("double"))


def dot(a: Column, b: Column) -> Column:
    """Dot product of two array<double> columns, fully JVM-side."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def norm(vec: Column) -> Column:
    return F.sqrt(F.aggregate(vec, F.lit(0.0), lambda acc, x: acc + x * x))


def cosine(a: Column, b: Column) -> Column:
    """cos(a,b) = dot/(|a||b|); mirrors memory/memory_graph.py:1626-1628.
    Zero vectors score 0.0 (ANSI mode would raise on the 0 denominator)."""
    denom = norm(a) * norm(b)
    return F.when(denom == 0.0, F.lit(0.0)).otherwise(dot(a, b) / denom)


def l2_normalize(vec: Column) -> Column:
    """Normalize so cosine becomes a plain dot product (the reference stores
    normalized embeddings: models/embedding_model.py:722-736).  A zero vector
    (empty content) stays zero instead of raising DIVIDE_BY_ZERO under ANSI
    mode — matching the driver-side twin (api.hash_embed_py)."""
    n = norm(vec)
    denom = F.when(n == 0.0, F.lit(1.0)).otherwise(n)
    return F.transform(vec, lambda x: x / denom)


def int8_scale(vec: Column) -> Column:
    """Per-vector quantization scale 127/max_abs (services/memory_management.py:
    3957-4025 uses dynamic per-vector scaling, not a fixed clip-to-[-1,1]).
    The reference substitutes 1e-8 ONLY for an exactly-zero max_abs
    (``max_abs or 1e-8``) — flooring tiny-but-nonzero magnitudes instead
    would quantize subnormal vectors to all-zeros where the reference
    saturates them to +-127, losing their direction (round-6 review pass)."""
    max_abs = F.array_max(F.transform(vec, lambda x: F.abs(x)))
    safe = F.when(max_abs == 0.0, F.lit(1e-8)).otherwise(max_abs)
    return F.lit(float(INT8_SCALE)) / safe


def quantize_int8(vec: Column, scale: Column | None = None) -> Column:
    """int8 quantization with per-vector max-abs scaling, clamped to [-128,127]
    (services/memory_management.py:3957-4025).  Pass ``scale`` to reuse a
    precomputed ``int8_scale`` column; store it alongside for dequantization."""
    s = int8_scale(vec) if scale is None else scale
    return F.transform(
        vec,
        lambda x: F.least(F.greatest(F.round(x * s), F.lit(-128.0)), F.lit(127.0)).cast("tinyint"),
    )


def dequantize_int8(vec: Column, scale: Column) -> Column:
    """Inverse of quantize_int8 given the stored per-vector scale."""
    return F.transform(vec, lambda x: x.cast("double") / scale)


def lit_vector(values: list[float]) -> Column:
    """A literal query vector as an array<double> column (broadcast to executors
    as a constant — no shuffle, no join needed for single-query search)."""
    return F.array(*[F.lit(float(v)) for v in values])
