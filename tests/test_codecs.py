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


# -- Y4M / MJPEG video codecs -------------------------------------------------

def _luma_frames(n=5, h=12, w=16):
    import numpy as np

    f = np.arange(n)[:, None, None]
    y = np.arange(h)[None, :, None]
    x = np.arange(w)[None, None, :]
    return ((f * 31 + y * 7 + x * 13) % 256).astype(np.uint8)


def test_y4m_roundtrip_c420_and_mono():
    import numpy as np

    from kowari_spark.codecs import decode_y4m, encode_y4m

    frames = _luma_frames()
    for cs in ("C420jpeg", "C444", "C422", "Cmono"):
        blob = encode_y4m(frames, colorspace=cs)
        w, h, got = decode_y4m(blob)
        assert (w, h) == (16, 12)
        assert np.array_equal(got, frames), cs


def test_y4m_header_defaults_and_errors():
    import numpy as np
    import pytest as _pytest

    from kowari_spark.codecs import decode_y4m, encode_y4m

    # spec default colorspace (no C token) is C420jpeg
    frames = _luma_frames(n=2)
    blob = encode_y4m(frames).replace(b" C420jpeg", b"", 1)
    w, h, got = decode_y4m(blob)
    assert np.array_equal(got, frames)
    with _pytest.raises(ValueError, match="bad magic"):
        decode_y4m(b"JUNK")
    with _pytest.raises(ValueError, match="truncated"):
        decode_y4m(encode_y4m(frames)[:-5])


def test_mjpeg_split_by_markers():
    from kowari_spark.codecs import split_mjpeg

    f1 = b"\xff\xd8" + b"\x01\x02\x03" + b"\xff\xd9"
    f2 = b"\xff\xd8" + b"\x04\x05" + b"\xff\xd9"
    assert split_mjpeg(f1 + f2) == [f1, f2]
    assert split_mjpeg(b"") == []
    import pytest as _pytest

    with _pytest.raises(ValueError, match="no EOI"):
        split_mjpeg(b"\xff\xd8\x00\x00")


def test_mjpeg_split_skips_eoi_inside_app_segments():
    """An FFD9 inside a length-delimited APPn payload (EXIF thumbnails
    embed a complete JPEG) must NOT terminate the frame — the splitter
    walks the segment structure instead of flat-scanning (ADVICE r5)."""
    from kowari_spark.codecs import split_mjpeg

    thumb = b"\xff\xd8\x01\x02\xff\xd9"  # a full tiny "JPEG" as payload
    app1 = b"\xff\xe1" + (len(thumb) + 2).to_bytes(2, "big") + thumb
    # minimal conformant-enough frame: SOI, APP1(with embedded EOI),
    # SOS with 2-byte header then entropy data with a stuffed FF00 and
    # an RST marker, then the real EOI
    sos = b"\xff\xda\x00\x02" + b"\x10\xff\x00\x20\xff\xd0\x30"
    f1 = b"\xff\xd8" + app1 + sos + b"\xff\xd9"
    f2 = b"\xff\xd8" + b"\x04\x05" + b"\xff\xd9"  # loose fragment after
    assert split_mjpeg(f1 + f2) == [f1, f2]


def test_frame_sample_on_y4m_video(spark):
    """The video frame-sample operator drives the REAL y4m decode path
    end-to-end: 2 videos of 6 luma frames -> every 3rd frame kept,
    output normalized to KWM framing."""
    import numpy as np

    from kowari_spark.codecs import encode_y4m
    from kowari_spark.operators.multimodal import _decode_blob, frame_sample

    vids = []
    for key in (0, 1):
        frames = (_luma_frames(n=6) + key).astype(np.uint8)
        vids.append((key, bytearray(encode_y4m(frames))))
    df = spark.createDataFrame(vids, "media_id long, media binary")
    out = {r["media_id"]: bytes(r["media"])
           for r in frame_sample(df, 3, codec="y4m").collect()}
    for key in (0, 1):
        kind, w, h, n, px = _decode_blob(out[key], "kwm")
        assert (kind, w, h, n) == ("video", 16, 12, 2)
        want = ((_luma_frames(n=6) + key).astype(np.uint8))[::3]
        assert np.array_equal(px, want)


def test_mjpeg_via_pil_or_gated(spark):
    """MJPEG end-to-end where Pillow exists; the NotImplementedError
    boundary where it doesn't (same gate the 'pil' image codec uses)."""
    import numpy as np
    import pytest as _pytest

    from kowari_spark.codecs import decode_mjpeg

    try:
        import io

        from PIL import Image
    except ImportError:
        with _pytest.raises(NotImplementedError, match="Pillow"):
            decode_mjpeg(b"\xff\xd8\x00\xff\xd9")
        return
    frames = _luma_frames(n=3)
    bufs = []
    for f in frames:
        b = io.BytesIO()
        Image.fromarray(f, mode="L").save(b, format="JPEG", quality=95)
        bufs.append(b.getvalue())
    w, h, got = decode_mjpeg(b"".join(bufs))
    assert (w, h) == (16, 12) and got.shape == (3, 12, 16)
    # lossy codec: luma within JPEG quantization error of the source
    assert np.abs(got.astype(int) - frames.astype(int)).mean() < 8


def test_y4m_rejects_odd_dims_for_subsampled_chroma():
    import numpy as np
    import pytest as _pytest

    from kowari_spark.codecs import encode_y4m

    odd = np.zeros((1, 11, 16), dtype=np.uint8)
    with _pytest.raises(ValueError, match="even dimensions"):
        encode_y4m(odd, colorspace="C420jpeg")
    # mono has no chroma planes: odd dims are legal
    assert encode_y4m(odd, colorspace="Cmono")


def test_mjpeg_split_survives_corrupt_segment_length():
    """A frame whose APPn length field is corrupt (claims more bytes
    than exist) must fall back to the flat EOI scan, not fail the whole
    stream — the segment walk only decides boundaries when the bytes
    actually parse as segments."""
    from kowari_spark.codecs import split_mjpeg

    # APP0 claiming 0xFFFF payload bytes in a 10-byte frame
    f_corrupt = b"\xff\xd8" + b"\xff\xe0\xff\xff" + b"\x01\x02" + b"\xff\xd9"
    f_next = b"\xff\xd8" + b"\x07\x08" + b"\xff\xd9"
    assert split_mjpeg(f_corrupt + f_next) == [f_corrupt, f_next]
