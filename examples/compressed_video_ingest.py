"""Compressed-container video ingest — the documented transcode recipe.

The engine's in-process decoders cover PNG / Pillow-readable images /
YUV4MPEG2 (.y4m) / MJPEG (SURVEY.md §7.1): compressed containers
(mp4/webm/mkv) are out of scope by design because their decoders need
native libraries the runtime does not ship. The supported recipe is a
ONE-LINE upstream transcode to an uncompressed interchange stream every
ffmpeg can emit:

    ffmpeg -i in.mp4 out.y4m          # video -> YUV4MPEG2
    ffmpeg -i in.mp4 -c:v mjpeg out.mjpeg   # alternative: MJPEG

and then this script's path: ingest the .y4m bytes as a binary column,
normalize to the engine's KWM framing ONCE at ingest (frame_sample with
codec="y4m" — decode happens inside mapInPandas, Arrow-batched,
per-partition), and run every downstream media operator (typed
metadata, feature extraction, resize) against the normalized column.

Run: python examples/compressed_video_ingest.py [dir-with-y4m-files]
     (default: tests/fixtures — two checked-in pre-transcoded clips)
"""

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from pyspark.sql import functions as F


def ingest_transcoded(spark, y4m_dir: str):
    """Load every .y4m in ``y4m_dir`` and return (normalized_media_df,
    meta_df, features_df). This is the recipe's Spark half — the ffmpeg
    half already ran wherever the compressed originals live."""
    from kowari_spark.operators.multimodal import (
        frame_sample,
        media_features,
        media_meta,
    )

    raw = (
        spark.read.format("binaryFile")
        .option("pathGlobFilter", "*.y4m")
        .load(y4m_dir)
        .select(
            F.crc32(F.col("path")).cast("long").alias("media_id"),
            F.col("path"),
            F.col("content").alias("media"),
        )
    )
    # normalize to KWM framing at ingest (every_k=1 keeps all frames);
    # downstream stages then read ONE format regardless of source codec
    normalized = frame_sample(raw, 1, codec="y4m")
    meta = media_meta(normalized)
    feats = media_features(normalized)
    return normalized, meta, feats


def main(y4m_dir: str | None = None) -> None:
    from kowari_spark import get_session

    spark = get_session(app="kowari_video_ingest")
    if y4m_dir is None:
        y4m_dir = str(Path(__file__).resolve().parent.parent / "tests" / "fixtures")

    # the gate a user hits FIRST with a compressed container: the error
    # carries the transcode instruction this script demonstrates
    from kowari_spark.operators.multimodal import _decode_blob

    try:
        _decode_blob(b"\x00\x00\x00\x18ftypmp42", "ffmpeg")
    except NotImplementedError as e:
        print(f"compressed container gate: {e}\n")

    _normalized, meta, feats = ingest_transcoded(spark, y4m_dir)
    print("typed metadata (from the 11-byte header, payload unread):")
    for r in meta.orderBy("media_id").collect():
        print(" ", r.asDict())
    print("feature vectors (histogram + mean/std, mapInPandas):")
    for r in feats.orderBy("media_id").collect():
        print(f"  media_id={r['media_id']} kind={r['kind']} "
              f"dim={len(r['features'])}")


if __name__ == "__main__":
    main(*sys.argv[1:])
