"""Id algebra of the reference, as Column expressions.

- Chunk ids are ``"{memory_id}_{n}"``; base-id recovery strips the ``_N`` suffix
  (memory/memory_graph.py:6064-6066, :3256-3260).
- Vector point ids are deterministic UUIDs from the first 16 bytes of
  sha256(chunk_id) (memory/memory_graph.py:13744-13762).
"""

from __future__ import annotations

import hashlib
import uuid

from pyspark.sql import Column
from pyspark.sql import functions as F


def strip_chunk_suffix(col: Column) -> Column:
    """Remove a trailing ``_<digits>`` (memory/memory_graph.py:6064-6066)."""
    return F.regexp_replace(col, r"_[0-9]+$", "")


def base_id(col: Column) -> Column:
    """First ``_``-separated component (memory/memory_graph.py:3256-3260)."""
    return F.split(col, "_").getItem(0)


def chunk_id(memory_id: Column, chunk_index: Column) -> Column:
    """``"{memory_id}_{n}"`` (memory/memory_graph.py:2226-2249)."""
    return F.concat_ws("_", memory_id, chunk_index.cast("string"))


def point_id(chunk_id_col: Column) -> Column:
    """Deterministic UUID from the first 16 bytes of sha256(chunk_id)
    (memory/memory_graph.py:13744-13762).

    Pure Column expression: sha2 hex -> format as 8-4-4-4-12 UUID string.
    Identical to ``uuid.UUID(bytes=sha256(id).digest()[:16])`` since the hex
    digest's first 32 chars ARE the first 16 bytes.
    """
    h = F.sha2(chunk_id_col, 256)
    return F.concat_ws(
        "-",
        F.substring(h, 1, 8),
        F.substring(h, 9, 4),
        F.substring(h, 13, 4),
        F.substring(h, 17, 4),
        F.substring(h, 21, 12),
    )


def point_id_py(chunk_id_str: str) -> str:
    """Driver-side twin of :func:`point_id` for tests."""
    return str(uuid.UUID(bytes=hashlib.sha256(chunk_id_str.encode()).digest()[:16]))
