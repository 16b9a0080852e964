"""Multimodal columns (north-star op): image/audio/video as opaque binary columns
with typed metadata, processed via Arrow-batched mapInPandas.

The container has no image/audio codecs, so the decode step is STUBBED: a
deterministic fake decoder (seeded from the content hash) stands in behind the
same signature a real libjpeg/ffmpeg-backed decoder would have, and raises
NotImplementedError when `real=True` is requested.  Everything Spark-side —
schema, partition sizing, UDF signatures, batch shapes — is real and tested.

Design for 100 TB of media:
- binaryFile source with `spark.sql.files.maxPartitionBytes` tuned so one task
  holds a handful of blobs, not thousands (decode is CPU-bound, not IO-bound);
- metadata (width/height/duration/codec) lives in a sibling struct column so
  filters prune on parquet stats without touching bytes;
- features come back as fixed-width array<float> ready for the similarity ops.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    ArrayType,
    BinaryType,
    FloatType,
    IntegerType,
    StringType,
    StructField,
    StructType,
)

MEDIA_SCHEMA = StructType([
    StructField("media_id", StringType()),
    StructField("modality", StringType()),          # image | audio | video
    StructField("content", BinaryType()),            # opaque encoded bytes
    StructField("mime_type", StringType()),
    StructField("meta_width", IntegerType()),        # image/video
    StructField("meta_height", IntegerType()),
    StructField("meta_duration_ms", IntegerType()),  # audio/video
])

FEATURE_DIM = 16

DECODED_SCHEMA = StructType([
    StructField("media_id", StringType()),
    StructField("modality", StringType()),
    StructField("feature", ArrayType(FloatType())),   # pooled feature vector
    StructField("frame_index", IntegerType()),        # 0 for image/audio
])


def _fake_decode(content: bytes, modality: str, frame: int = 0) -> list[float]:
    """Deterministic stand-in for decode+feature-extract: FEATURE_DIM floats in
    [0,1) derived from sha256(content || ascii(frame)).  Replace with a real
    torchvision/librosa pipeline by swapping this function only.

    The frame suffix is ASCII decimal (not packed bytes) so the identical hash
    is expressible in the DuckDB oracle (``sha256(text || frame::VARCHAR)`` —
    its sha256 takes VARCHAR only); each b/256.0 is an exact binary fraction,
    so features — and the cosine scores built from them — are bit-identical
    across engines regardless of summation order."""
    h = hashlib.sha256(content + str(frame).encode("ascii")).digest()
    return [b / 256.0 for b in h[:FEATURE_DIM]]


def decode_features(media: DataFrame, frames_per_video: int = 4,
                    real: bool = False) -> DataFrame:
    """Decode/feature-extract every media row via mapInPandas.

    - image/audio -> one feature row (frame_index 0)
    - video       -> ``frames_per_video`` uniformly-sampled frame rows
    """
    if real:
        raise NotImplementedError(
            "real decoders (libjpeg/ffmpeg/librosa) are not installed in this "
            "container; the Spark plumbing below is production-shaped"
        )

    def compute(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for _, r in pdf.iterrows():
                content = bytes(r["content"]) if r["content"] is not None else b""
                n_frames = frames_per_video if r["modality"] == "video" else 1
                for f_idx in range(n_frames):
                    rows.append(
                        (r["media_id"], r["modality"],
                         _fake_decode(content, r["modality"], f_idx), f_idx)
                    )
            yield pd.DataFrame(rows, columns=["media_id", "modality", "feature", "frame_index"])

    return media.mapInPandas(compute, DECODED_SCHEMA)


def build_media_table(docs: DataFrame, id_col: str = "doc_id",
                      text_col: str = "text") -> DataFrame:
    """Derive a synthetic media table from documents (test fixture): bytes are
    the utf-8 text, modality round-robins image/audio/video, metadata derived
    arithmetically."""
    i = F.col(id_col)
    modality = F.element_at(
        F.array(F.lit("image"), F.lit("audio"), F.lit("video")), (i % 3 + 1).cast("int")
    )
    return docs.select(
        F.concat(F.lit("media"), i.cast("string")).alias("media_id"),
        modality.alias("modality"),
        F.encode(F.col(text_col), "utf-8").alias("content"),
        F.when(modality == "image", "image/jpeg")
        .when(modality == "audio", "audio/wav")
        .otherwise("video/mp4")
        .alias("mime_type"),
        F.when(modality != "audio", (i % 1920).cast("int")).alias("meta_width"),
        F.when(modality != "audio", (i % 1080).cast("int")).alias("meta_height"),
        F.when(modality != "image", (i * 100 % 60000).cast("int")).alias("meta_duration_ms"),
    )


def media_feature_search(media: DataFrame, query_feature: list[float], k: int,
                         modality: str | None = None) -> DataFrame:
    """Compose decode -> cosine top-k over features (the multimodal read path)."""
    from ..operators.similarity import topk_search

    feats = decode_features(media)
    if modality:
        feats = feats.filter(F.col("modality") == modality)
    feats = feats.withColumn(
        "feat_id", F.concat_ws("#", "media_id", F.col("frame_index").cast("string"))
    )
    return topk_search(feats, query_feature, k, vec_col="feature", id_col="feat_id",
                       score_threshold=None)
