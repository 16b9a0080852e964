"""Multimodal plumbing tests: schema, batch shapes, frame sampling, search."""

import pytest
from pyspark.sql import functions as F

from memory_opensource_spark.sources import multimodal, tables

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def media(spark):
    docs = tables.load(spark, SF, "documents").filter(F.col("doc_id") < 30)
    return multimodal.build_media_table(docs)


def test_media_table_schema(media):
    assert dict(media.dtypes)["content"] == "binary"
    mods = {r.modality for r in media.select("modality").distinct().collect()}
    assert mods == {"image", "audio", "video"}
    audio = media.filter(F.col("modality") == "audio").first()
    assert audio.meta_width is None and audio.meta_duration_ms is not None


def test_decode_shapes_and_determinism(media):
    feats = multimodal.decode_features(media, frames_per_video=4)
    rows = feats.collect()
    by_mod = {}
    for r in rows:
        by_mod.setdefault(r.modality, []).append(r)
        assert len(r.feature) == multimodal.FEATURE_DIM
        assert all(0.0 <= x < 1.0 for x in r.feature)
    # video rows explode to 4 frames; image/audio to 1
    vids = {}
    for r in by_mod["video"]:
        vids.setdefault(r.media_id, []).append(r.frame_index)
    assert all(sorted(v) == [0, 1, 2, 3] for v in vids.values())
    assert all(r.frame_index == 0 for r in by_mod["image"])
    # deterministic across runs
    again = {(r.media_id, r.frame_index): r.feature
             for r in multimodal.decode_features(media).collect()}
    for r in rows:
        assert again[(r.media_id, r.frame_index)] == r.feature


def test_real_decoder_is_explicitly_stubbed(media):
    with pytest.raises(NotImplementedError):
        multimodal.decode_features(media, real=True)


def test_media_feature_search(media, spark):
    one = multimodal.decode_features(media).filter(
        (F.col("media_id") == "media0") & (F.col("frame_index") == 0)
    ).first()
    out = multimodal.media_feature_search(media, [float(x) for x in one.feature], 3).collect()
    assert out[0].feat_id == "media0#0"  # self-match ranks first
    assert len(out) == 3
