"""Real-image decode at the multimodal boundary: the pure-Python PNG
codec (byte-real files, every filter type) and the import-gated Pillow
path."""

import numpy as np
import pytest
from pyspark.sql import functions as F
from pyspark.sql.types import BinaryType, LongType, StructField, StructType

from kowari_spark.codecs import decode_png, encode_png
from kowari_spark.operators.multimodal import (
    media_features,
    media_meta,
    resize_media,
)

try:
    import PIL  # noqa: F401

    HAVE_PIL = True
except ImportError:
    HAVE_PIL = False


def _gradient(h, w):
    y = np.arange(h, dtype=np.int32)[:, None]
    x = np.arange(w, dtype=np.int32)[None, :]
    return ((y * 7 + x * 13) % 256).astype(np.uint8)


def test_png_gray_roundtrip_all_filters():
    px = _gradient(9, 13)
    for ftype in (0, 1, 2, 3, 4):
        blob = encode_png(px, filter_type=ftype)
        w, h, got = decode_png(blob)
        assert (w, h) == (13, 9)
        assert np.array_equal(got, px), f"filter {ftype} round-trip"


def test_png_rgb_and_rgba_luma():
    rgb = np.zeros((4, 5, 3), np.uint8)
    rgb[:, :, 0] = 200  # red plane
    rgb[:, :, 1] = 100
    rgb[:, :, 2] = 50
    w, h, got = decode_png(encode_png(rgb, filter_type=4))
    # BT.601 integer luma: (200*299 + 100*587 + 50*114) // 1000 = 124
    assert got.min() == got.max() == 124
    rgba = np.concatenate([rgb, np.full((4, 5, 1), 255, np.uint8)], axis=2)
    _, _, got4 = decode_png(encode_png(rgba))
    assert np.array_equal(got4, got)


def test_png_rejects_garbage():
    with pytest.raises(ValueError, match="signature"):
        decode_png(b"JPEG not really")


def _png_media_df(spark, n=6, h=12, w=16):
    """Real PNG blobs as a media DataFrame (binary column)."""
    rows = [
        (i, bytearray(encode_png(((_gradient(h, w).astype(np.int32) + i) % 256).astype(np.uint8))))
        for i in range(n)
    ]
    schema = StructType(
        [StructField("media_id", LongType()), StructField("media", BinaryType())]
    )
    return spark.createDataFrame(rows, schema)


def test_media_features_decodes_real_png(spark):
    df = _png_media_df(spark)
    feats = media_features(df, codec="png", n_bins=8).orderBy("media_id").collect()
    assert len(feats) == 6
    assert feats[0]["kind"] == "image"
    # features = 8 histogram bins + mean + std
    assert len(feats[0]["features"]) == 10
    # histogram sums to 1 over the real decoded pixels
    assert sum(feats[0]["features"][:8]) == pytest.approx(1.0, abs=1e-6)
    # decode is exact: mean of the known gradient pattern
    px = _gradient(12, 16)
    assert feats[0]["features"][8] == pytest.approx(px.mean() / 255.0, abs=1e-6)


def test_resize_real_png_reencodes_kwm(spark):
    """PNG in, KWM out: the resize stage decodes real PNGs and the
    header-only metadata op then reads the re-encoded result natively."""
    df = _png_media_df(spark)
    small = resize_media(df, out_w=8, out_h=6, codec="png")
    meta = media_meta(small).orderBy("media_id").first()
    assert (meta["kind"], meta["width"], meta["height"], meta["n_frames"]) == (
        "image", 8, 6, 1,
    )


@pytest.mark.skipif(not HAVE_PIL, reason="Pillow not installed in this env")
def test_media_features_via_pil(spark):
    """When Pillow is present the 'pil' codec decodes the same real PNG
    bytes to identical features as the built-in decoder."""
    df = _png_media_df(spark)
    a = media_features(df, codec="png").orderBy("media_id").collect()
    b = media_features(df, codec="pil").orderBy("media_id").collect()
    for ra, rb in zip(a, b):
        assert ra["features"] == pytest.approx(rb["features"], abs=1e-6)


def test_pil_absent_raises_not_implemented(spark):
    if HAVE_PIL:
        pytest.skip("Pillow installed; absence path not reachable")
    df = _png_media_df(spark, n=1)
    with pytest.raises(Exception) as ei:
        media_features(df, codec="pil").collect()
    assert "Pillow" in str(ei.value)
