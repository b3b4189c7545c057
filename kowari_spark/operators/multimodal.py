"""Multimodal (image/audio/video) column plumbing.

Beyond-reference surface (task north star): large-scale training
pipelines carry media as opaque ``binary`` columns next to typed
metadata, and run decode / feature-extract / resize / frame-sample as
Arrow-batched Python stages. The Spark-side plumbing here — schema,
mapInPandas signatures, batch shaping, column pruning — is real and
tested, and so is image decode:

- ``codec="kwm"`` (default): a deterministic fake format (see below)
  that exercises every byte of the pipeline end-to-end and keeps the
  oracle contract reproducible;
- ``codec="png"``: REAL PNG decode with no external dependency
  (kowari_spark/codecs.py — stdlib zlib inflate + per-spec unfilter);
- ``codec="pil"``: any Pillow-supported format, gated behind an
  import-try (Pillow is public but not in every runtime; tests skip
  when absent);
- ``codec="y4m"``: REAL video decode, no dependency — YUV4MPEG2, the
  uncompressed interchange stream every ffmpeg can emit;
- ``codec="mjpeg"``: concatenated-JPEG video; dependency-free frame
  split + Pillow-gated per-frame decode;
- ``codec="ffmpeg"``: out of scope BY DESIGN — compressed containers
  are transcoded to y4m/mjpeg upstream (SURVEY.md §7 scope decision);
  the stub's message documents the boundary.

KWM fake format (so tests are byte-level real):
  magic ``KWM1`` | u8 kind (0=image,1=audio,2=video) | u16be width |
  u16be height | u16be n_frames | payload = frames*width*height bytes,
  pixel[f,y,x] = (f*31 + y*7 + x*13 + key) % 256.

Scale design:
- media bytes NEVER go through a shuffle in these operators: decode /
  features / resize are narrow mapInPandas stages — at 100 TB the only
  movement is the initial scan;
- ``spark.sql.execution.arrow.maxRecordsPerBatch`` (and
  maxBytesPerBatch on Spark 4) bound decoder memory per Arrow batch;
- metadata extraction reads the fixed-size header only — a projection of
  the first 11 bytes — so meta-only queries never materialize payloads;
- downstream, feature vectors feed the SAME knn/LSH/dedup operators as
  text embeddings (one engine, all modalities).
"""

from __future__ import annotations

import struct
from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    ArrayType,
    BinaryType,
    FloatType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

_MAGIC = b"KWM1"
_KINDS = {0: "image", 1: "audio", 2: "video"}
_HEADER = struct.Struct(">4sBHHH")  # magic, kind, width, height, n_frames

MEDIA_SCHEMA = StructType(
    [
        StructField("media_id", LongType()),
        StructField("media", BinaryType()),
    ]
)

MEDIA_META_SCHEMA = StructType(
    [
        StructField("media_id", LongType()),
        StructField("kind", StringType()),
        StructField("width", IntegerType()),
        StructField("height", IntegerType()),
        StructField("n_frames", IntegerType()),
        StructField("n_bytes", LongType()),
    ]
)


# -- synthesis (deterministic test media) ------------------------------------

def _pack_header(kind_code: int, width: int, height: int, n_frames: int) -> bytes:
    return _HEADER.pack(_MAGIC, kind_code, width, height, n_frames)


def _kind_code(kind: str) -> int:
    return {v: k for k, v in _KINDS.items()}[kind]


def encode_kwm(kind: int, width: int, height: int, n_frames: int, key: int) -> bytes:
    """One deterministic KWM blob."""
    header = _pack_header(kind, width, height, n_frames)
    f = np.arange(n_frames, dtype=np.int64)[:, None, None]
    y = np.arange(height, dtype=np.int64)[None, :, None]
    x = np.arange(width, dtype=np.int64)[None, None, :]
    pixels = ((f * 31 + y * 7 + x * 13 + key) % 256).astype(np.uint8)
    return header + pixels.tobytes()


def synth_media(
    df: DataFrame, id_col: str = "media_id", kind: str = "image",
    width: int = 16, height: int = 12, n_frames: int = 1,
) -> DataFrame:
    """Attach a deterministic KWM binary column keyed by ``id_col``
    (mapInPandas — generation happens executor-side, in parallel)."""
    kind_code = _kind_code(kind)
    out_schema = StructType(
        [StructField("media_id", LongType()), StructField("media", BinaryType())]
    )

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids = pdf[id_col].astype("int64")
            yield pd.DataFrame(
                {
                    "media_id": ids,
                    "media": [
                        encode_kwm(kind_code, width, height, n_frames, int(i))
                        for i in ids
                    ],
                }
            )

    return df.select(id_col).mapInPandas(gen, out_schema)


# -- decode boundary ---------------------------------------------------------

def _decode_blob(blob: bytes, codec: str) -> tuple[str, int, int, int, np.ndarray]:
    """(kind, width, height, n_frames, pixels[f,h,w]) for one blob.

    THE decode boundary — every schema and operator around it is
    codec-agnostic:

    - ``kwm``: the deterministic built-in test codec;
    - ``png``: real PNG files via the dependency-free decoder
      (kowari_spark.codecs.decode_png — stdlib zlib + numpy);
    - ``pil``: any Pillow-supported format (PNG/JPEG/WebP/...);
      import-gated, raises NotImplementedError with the install hint
      where Pillow is absent;
    - ``y4m``: REAL video decode with no external dependency — the
      YUV4MPEG2 uncompressed interchange stream every ffmpeg pipeline
      can emit (``ffmpeg -i in.mp4 out.y4m``); luma planes only, like
      the image paths (kowari_spark.codecs.decode_y4m);
    - ``mjpeg``: concatenated-JPEG video stream — the frame SPLIT is
      dependency-free marker scanning, per-frame entropy decode rides
      the import-gated Pillow adapter;
    - ``ffmpeg``: intentionally NOT implemented — compressed containers
      (mp4/webm/mkv) are transcoded to ``.y4m``/MJPEG upstream of the
      engine; that transcode is the documented system boundary rather
      than an in-engine binding.
    """
    if codec == "png":
        from kowari_spark.codecs import decode_png

        width, height, gray = decode_png(bytes(blob))
        return "image", width, height, 1, gray[None, :, :]
    if codec == "pil":
        from kowari_spark.codecs import decode_with_pil

        width, height, gray = decode_with_pil(bytes(blob))
        return "image", width, height, 1, gray[None, :, :]
    if codec == "y4m":
        from kowari_spark.codecs import decode_y4m

        width, height, frames = decode_y4m(bytes(blob))
        return "video", width, height, frames.shape[0], frames
    if codec == "mjpeg":
        from kowari_spark.codecs import decode_mjpeg

        width, height, frames = decode_mjpeg(bytes(blob))
        return "video", width, height, frames.shape[0], frames
    if codec == "ffmpeg":
        raise NotImplementedError(
            "codec 'ffmpeg' is out of scope by design: transcode "
            "compressed containers to YUV4MPEG2 ('y4m') or MJPEG "
            "('mjpeg') upstream (e.g. `ffmpeg -i in.mp4 out.y4m`) and "
            "feed those — both decode here with no external dependency "
            "(mjpeg entropy decode needs Pillow)"
        )
    if codec != "kwm":
        raise ValueError(
            f"unknown codec {codec!r} (kwm, png, pil, y4m, mjpeg, ffmpeg)"
        )
    magic, kind, width, height, n_frames = _HEADER.unpack_from(blob, 0)
    if magic != _MAGIC:
        raise ValueError("not a KWM blob")
    pixels = np.frombuffer(blob, dtype=np.uint8, offset=_HEADER.size).reshape(
        n_frames, height, width
    )
    return _KINDS[kind], width, height, n_frames, pixels


# -- operators ---------------------------------------------------------------

def media_meta(df: DataFrame, media_col: str = "media", id_col: str = "media_id") -> DataFrame:
    """Typed metadata from the fixed-size header (payload never parsed).

    Native column expressions over the binary prefix — codegen, no
    Python: meta-only queries at 100 TB read 11 bytes per record and
    prune the payload entirely at the Parquet scan when the layout
    splits header/payload columns.
    """
    b = F.col(media_col)

    def be_uint(pos: int, nbytes: int):
        # big-endian unsigned int at 1-indexed byte offset: slice the
        # binary, hex it, parse base-16 — all codegen'd builtins
        return F.conv(F.hex(F.substring(b, pos, nbytes)), 16, 10).cast("int")

    kind_code = be_uint(5, 1)
    kind = (
        F.when(kind_code == 0, "image")
        .when(kind_code == 1, "audio")
        .when(kind_code == 2, "video")
        .otherwise("unknown")
    )
    return df.select(
        F.col(id_col),
        kind.alias("kind"),
        be_uint(6, 2).alias("width"),
        be_uint(8, 2).alias("height"),
        be_uint(10, 2).alias("n_frames"),
        F.length(b).cast("long").alias("n_bytes"),
    )


_FEATURES_SCHEMA = StructType(
    [
        StructField("media_id", LongType()),
        StructField("kind", StringType()),
        StructField("features", ArrayType(FloatType(), containsNull=False)),
    ]
)


def media_features(
    df: DataFrame, media_col: str = "media", id_col: str = "media_id",
    codec: str = "kwm", n_bins: int = 8,
) -> DataFrame:
    """Decode + per-media feature vector (histogram of pixel values +
    mean/std), Arrow-batched. The output array<float> plugs straight
    into knn / LSH / dedup operators."""

    def extract(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, kinds, feats = [], [], []
            for mid, blob in zip(pdf[id_col], pdf[media_col]):
                kind, _w, _h, _n, px = _decode_blob(bytes(blob), codec)
                hist = np.histogram(px, bins=n_bins, range=(0, 256))[0]
                hist = hist / max(1, px.size)
                feats.append(
                    np.concatenate(
                        [hist, [px.mean() / 255.0, px.std() / 255.0]]
                    ).astype(np.float32)
                )
                ids.append(int(mid))
                kinds.append(kind)
            yield pd.DataFrame(
                {"media_id": ids, "kind": kinds, "features": [f.tolist() for f in feats]}
            )

    return df.select(id_col, media_col).mapInPandas(extract, _FEATURES_SCHEMA)


def resize_media(
    df: DataFrame, out_w: int, out_h: int,
    media_col: str = "media", id_col: str = "media_id", codec: str = "kwm",
) -> DataFrame:
    """Nearest-neighbor resize of every frame, re-encoded to KWM.

    Narrow mapInPandas: bytes in, bytes out, no shuffle."""

    def resize(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = []
            for blob in pdf[media_col]:
                kind, w, h, n, px = _decode_blob(bytes(blob), codec)
                ys = (np.arange(out_h) * h // out_h)
                xs = (np.arange(out_w) * w // out_w)
                small = px[:, ys][:, :, xs]
                header = _pack_header(_kind_code(kind), out_w, out_h, n)
                out.append(header + small.astype(np.uint8).tobytes())
            yield pd.DataFrame({"media_id": pdf[id_col].astype("int64"), "media": out})

    return df.select(id_col, media_col).mapInPandas(resize, MEDIA_SCHEMA)


def frame_sample(
    df: DataFrame, every_k: int,
    media_col: str = "media", id_col: str = "media_id", codec: str = "kwm",
) -> DataFrame:
    """Keep every k-th frame of video media (frame 0 always kept),
    re-encoded; images/audio pass through unchanged. Like
    ``resize_media``, output blobs are normalized to the engine's KWM
    framing regardless of input codec (decode once at ingest, every
    downstream stage reads one format)."""

    def sample(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = []
            for blob in pdf[media_col]:
                blob = bytes(blob)
                kind, w, h, n, px = _decode_blob(blob, codec)
                if kind != "video":
                    out.append(blob)
                    continue
                kept = px[::every_k]
                header = _pack_header(2, w, h, kept.shape[0])
                out.append(header + kept.tobytes())
            yield pd.DataFrame({"media_id": pdf[id_col].astype("int64"), "media": out})

    return df.select(id_col, media_col).mapInPandas(sample, MEDIA_SCHEMA)


# -- perceptual hashing / media near-dup ------------------------------------

def _dhash_frame(px: np.ndarray, hash_size: int) -> int:
    """dHash (difference hash) of one luma frame: block-mean the frame
    to a (hash_size x hash_size+1) grid, set bit (r, c) when
    grid[r, c] > grid[r, c+1]. Gradient signs survive brightness /
    contrast shifts and approximate rescaling (block boundaries shift
    slightly when hash_size+1 doesn't divide the width, so a resized
    copy lands a few bits away, not bit-identical — which is what the
    Hamming-ball join is for), the standard cheap near-dup fingerprint
    for images. Pure deterministic numpy; returns a signed 64-bit int
    (bit pattern wrapped) so the value lands in a Spark long.

    Frames smaller than the hash grid are rejected: np.array_split
    would emit empty chunks whose mean() is NaN, silently degrading the
    fingerprint to all-zero bits (every near-dup join would then match
    every sub-grid frame to every other)."""
    if px.shape[0] < hash_size or px.shape[1] < hash_size + 1:
        raise ValueError(
            f"frame {px.shape[0]}x{px.shape[1]} is smaller than the "
            f"dHash grid ({hash_size}x{hash_size + 1}); media_phash "
            f"needs frames at least hash_size tall and hash_size+1 wide"
        )
    rows = np.array_split(px.astype(np.float64), hash_size, axis=0)
    grid = np.stack(
        [
            np.array([c.mean() for c in np.array_split(r, hash_size + 1, axis=1)])
            for r in rows
        ]
    )
    bits = grid[:, :-1] > grid[:, 1:]
    v = 0
    for i, b in enumerate(bits.flatten()):
        if b:
            v |= 1 << i
    return int(np.uint64(v).astype(np.int64))


def media_phash(
    df: DataFrame, media_col: str = "media", id_col: str = "media_id",
    codec: str = "kwm", hash_size: int = 8, frame: int = 0,
) -> DataFrame:
    """Per-media perceptual fingerprint: (id_col, kind, phash) with
    ``phash`` the 64-bit dHash of frame ``frame`` (hash_size=8).
    Arrow-batched decode, no shuffle — one narrow pass. ``hash_size``
    is capped at 8: the fingerprint lives in one Spark long
    (hash_size² bits) so the Hamming join stays a native xor."""
    if hash_size * hash_size > 64:
        raise ValueError(
            f"hash_size={hash_size} needs {hash_size * hash_size} bits; "
            "the 64-bit long fingerprint caps hash_size at 8"
        )
    id_type = df.schema[id_col].dataType.simpleString()
    schema = f"{id_col} {id_type}, kind string, phash long"

    def extract(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            kinds, hashes = [], []
            for blob in pdf[media_col]:
                kind, _w, _h, n, px = _decode_blob(bytes(blob), codec)
                f = px[min(frame, n - 1)]
                kinds.append(kind)
                hashes.append(_dhash_frame(f, hash_size))
            yield pd.DataFrame(
                {id_col: pdf[id_col], "kind": kinds, "phash": hashes}
            )

    return df.select(id_col, media_col).mapInPandas(extract, schema)


def media_near_dups(
    df: DataFrame, media_col: str = "media", id_col: str = "media_id",
    codec: str = "kwm", hash_size: int = 8, max_hamming: int = 6,
    bands: int = 8, edges: str = "auto",
) -> DataFrame:
    """Visual near-duplicate pairs: (id_a, id_b, hamming) where the
    dHash Hamming distance is <= ``max_hamming``.

    Scale shape — banded LSH on the fingerprint, the same idea as the
    MinHash band join: the 64-bit hash splits into ``bands`` equal
    bands and candidate pairs form only inside a matching (band index,
    band value) bucket; by pigeonhole any pair within Hamming
    ``bands - 1`` differs in fewer bands than exist, so it MUST agree
    on at least one band — with the default bands=8 > max_hamming=6
    the candidate generation is exact (no missed pairs), never an
    all-pairs join. Verification is a native xor+bit_count filter.
    The fingerprint pass is lazily checkpointed so the self-join reads
    it once.

    ``edges="star"`` verifies only member↔bucket-min edges — O(B) rows
    per (band, val) bucket instead of the self-join's O(B²), the shape
    to feed ``media_dedup_keep``'s connected components on corpora with
    large duplicate families (a 100k-frame boilerplate family is ONE
    bucket). Every emitted edge still satisfies the exact Hamming
    bound, but a bucket whose min is beyond ``max_hamming`` of some
    members can split components verified all-pairs would join through
    intermediates (operators/dedup.py module docstring, VERDICT r7).
    ``"auto"`` (default) probes the bucket sizes and stays on "pairs"
    until one could go quadratic — pin "pairs" when the complete pair
    list is the contract."""
    from kowari_spark.operators.dedup import (
        _check_edges,
        bucket_star_edges,
        resolve_edges,
    )

    _check_edges(edges)
    if bands <= max_hamming:
        raise ValueError(
            f"bands={bands} must exceed max_hamming={max_hamming} for "
            "exact candidate generation (pigeonhole)"
        )
    nbits = hash_size * hash_size
    if nbits % bands:
        raise ValueError(f"{nbits} hash bits don't split into {bands} bands")
    w = nbits // bands
    mask = (1 << w) - 1

    ph = media_phash(df, media_col, id_col, codec, hash_size).localCheckpoint(
        eager=False
    )
    band_arr = F.array(
        *[
            F.shiftrightunsigned(F.col("phash"), i * w).bitwiseAND(F.lit(mask))
            for i in range(bands)
        ]
    )
    banded = ph.select(
        F.col(id_col), F.col("phash"), F.posexplode(band_arr).alias("band", "val")
    )
    edges = resolve_edges(edges, banded, ["band", "val"])
    if edges == "star":
        star = bucket_star_edges(
            banded, id_col, ["band", "val"], keep_cols=("phash",)
        )
        return (
            star.withColumn(
                "hamming",
                F.bit_count(F.col("phash_a").bitwiseXOR(F.col("phash_b"))),
            )
            .filter(F.col("hamming") <= max_hamming)
            .select("id_a", "id_b", "hamming")
        )
    a = banded.select(
        F.col(id_col).alias("id_a"), F.col("phash").alias("ph_a"), "band", "val"
    )
    b = banded.select(
        F.col(id_col).alias("id_b"), F.col("phash").alias("ph_b"), "band", "val"
    )
    return (
        a.join(b, ["band", "val"])
        .filter(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b", "ph_a", "ph_b")
        .distinct()
        .withColumn(
            "hamming", F.bit_count(F.col("ph_a").bitwiseXOR(F.col("ph_b")))
        )
        .filter(F.col("hamming") <= max_hamming)
        .select("id_a", "id_b", "hamming")
    )


def media_dedup_keep(
    df: DataFrame, media_col: str = "media", id_col: str = "media_id",
    codec: str = "kwm", hash_size: int = 8, max_hamming: int = 6,
    bands: int = 8, max_iter: int = 20, edges: str = "auto",
) -> DataFrame:
    """End-to-end visual dedup keep-list — the media counterpart of the
    document pipeline's ``doc_dedup_keep`` shape: dHash fingerprints →
    banded-Hamming near-dup pairs (:func:`media_near_dups`, exact by
    pigeonhole when ``bands > max_hamming``) → connected components
    (operators/dedup.dedup_clusters — near-dup isn't transitive, dedup
    treats it so) → min-id representative per component.

    Returns one row per input media: (id_col, rep_id, is_kept) — the
    ``semantic_dedup`` output convention. Media in no near-dup pair are
    their own representative and survive.

    Scale shape: everything after the Arrow-batched decode is the
    banded join + the adaptive CC of the document path — no all-pairs
    comparison, no new shuffle shapes."""
    from kowari_spark.operators.dedup import dedup_clusters

    pairs = media_near_dups(
        df, media_col, id_col, codec, hash_size, max_hamming, bands,
        edges=edges,
    )
    clusters = dedup_clusters(pairs, max_iter=max_iter).withColumnRenamed(
        "id", id_col
    )
    rep = F.coalesce(F.col("cluster_id"), F.col(id_col))
    return (
        df.select(id_col)
        .join(clusters, id_col, "left")
        .select(
            id_col,
            rep.alias("rep_id"),
            (rep == F.col(id_col)).alias("is_kept"),
        )
    )
