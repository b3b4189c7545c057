"""Multimodal plumbing tests: deterministic KWM codec end-to-end."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from kowari_spark.operators.multimodal import (
    encode_kwm,
    frame_sample,
    media_features,
    media_meta,
    resize_media,
    synth_media,
)
from kowari_spark.operators import knn


@pytest.fixture(scope="module")
def media_df(spark):
    ids = spark.range(0, 40).select(F.col("id").alias("media_id"))
    return synth_media(ids, kind="video", width=16, height=12, n_frames=6).cache()


def test_encode_decode_roundtrip():
    blob = encode_kwm(0, 4, 3, 1, key=7)
    assert blob[:4] == b"KWM1"
    assert len(blob) == 11 + 4 * 3


def test_media_meta_native_header_parse(spark, media_df):
    meta = media_meta(media_df)
    rows = meta.collect()
    assert len(rows) == 40
    for r in rows:
        assert (r["kind"], r["width"], r["height"], r["n_frames"]) == ("video", 16, 12, 6)
        assert r["n_bytes"] == 11 + 16 * 12 * 6
    # header parse is native expressions — no Python stage on top of the
    # (cached) media source in the meta plan
    plan = meta._jdf.queryExecution().optimizedPlan().toString()
    assert "pythonUDF" not in plan and "MapInPandas" not in plan.split("InMemoryRelation")[0]


def test_media_features_deterministic_and_knn_ready(spark, media_df):
    feats = media_features(media_df).cache()
    rows = {r["media_id"]: r["features"] for r in feats.collect()}
    assert len(rows) == 40 and all(len(v) == 10 for v in rows.values())
    # deterministic: same pipeline twice -> identical vectors
    rows2 = {r["media_id"]: r["features"] for r in media_features(media_df).collect()}
    assert rows == rows2
    # features flow into the standard knn operator
    out = knn(
        feats.withColumnRenamed("features", "embedding"),
        rows[0], 5, metric="cosine", id_col="media_id", round_to=6,
    ).collect()
    assert out[0]["media_id"] == 0 and out[0]["score"] == pytest.approx(1.0)


def test_resize(spark, media_df):
    small = resize_media(media_df, out_w=8, out_h=6)
    meta = media_meta(small).first()
    assert (meta["width"], meta["height"], meta["n_frames"]) == (8, 6, 6)
    assert meta["n_bytes"] == 11 + 8 * 6 * 6
    # nearest-neighbor on the deterministic pattern: pixel (0,0,0) unchanged
    blob = bytes(small.filter(F.col("media_id") == 3).first()["media"])
    orig = encode_kwm(2, 16, 12, 6, key=3)
    assert blob[11] == orig[11]


def test_frame_sample(spark, media_df):
    sampled = frame_sample(media_df, every_k=2)
    meta = media_meta(sampled).first()
    assert meta["n_frames"] == 3  # frames 0,2,4 of 6
    assert meta["n_bytes"] == 11 + 16 * 12 * 3
    # frame 0 bytes preserved exactly
    got = bytes(sampled.filter(F.col("media_id") == 5).first()["media"])
    orig = encode_kwm(2, 16, 12, 6, key=5)
    assert got[11 : 11 + 16 * 12] == orig[11 : 11 + 16 * 12]


def test_ffmpeg_codec_stubbed(spark, media_df):
    with pytest.raises(Exception) as ei:
        media_features(media_df, codec="ffmpeg").collect()
    assert "NotImplementedError" in str(ei.value) or isinstance(
        ei.value, NotImplementedError
    )


def test_unknown_codec_raises_valueerror(spark, media_df):
    with pytest.raises(Exception) as ei:
        media_features(media_df, codec="bmp").collect()
    assert "unknown codec" in str(ei.value)


def test_arrow_batch_shape_respected(spark):
    """Batch shaping: maxRecordsPerBatch bounds decoder memory."""
    old = spark.conf.get("spark.sql.execution.arrow.maxRecordsPerBatch", "10000")
    spark.conf.set("spark.sql.execution.arrow.maxRecordsPerBatch", "7")
    try:
        ids = spark.range(0, 25).coalesce(1).select(F.col("id").alias("media_id"))
        media = synth_media(ids, width=4, height=4)
        assert media_features(media).count() == 25
    finally:
        spark.conf.set("spark.sql.execution.arrow.maxRecordsPerBatch", old)


def test_dhash_rejects_subgrid_frames():
    """A frame smaller than the dHash grid would block-mean over empty
    chunks (NaN -> silent all-zero fingerprint); it must raise."""
    import numpy as np
    import pytest

    from kowari_spark.operators.multimodal import _dhash_frame

    with pytest.raises(ValueError, match="dHash grid"):
        _dhash_frame(np.zeros((4, 16)), 8)
    with pytest.raises(ValueError, match="dHash grid"):
        _dhash_frame(np.zeros((16, 8)), 8)
    # boundary: exactly grid-sized frames are fine
    assert isinstance(_dhash_frame(np.zeros((8, 9)), 8), int)
