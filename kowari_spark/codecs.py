"""Real image codecs for the multimodal decode boundary.

Two codecs plug into ``operators.multimodal._decode_blob``:

- ``png``: a built-in pure-Python PNG decoder (stdlib ``zlib`` +
  numpy unfiltering) — no external library, so REAL image decode is
  exercised in any environment. Supports the common non-interlaced
  8-bit forms: grayscale (color type 0), RGB (2), gray+alpha (4),
  RGBA (6). Multi-channel images reduce to luma (ITU-R BT.601 integer
  weights) because the media pipeline's frame model is single-channel
  ``pixels[f, h, w]``.
- ``pil``: a thin Pillow adapter (any format Pillow can open —
  PNG/JPEG/WebP/...), gated behind an import-try since Pillow does not
  ship in every environment; when absent the decode boundary raises
  NotImplementedError with the install hint. Tests for this path are
  skipif-gated on the import.

``encode_png`` exists so tests can synthesize byte-real PNG files
(including rows using each of the five filter types, which genuinely
exercises the unfilter logic) without any external tool.
"""

from __future__ import annotations

import struct
import zlib

import numpy as np

_PNG_SIG = b"\x89PNG\r\n\x1a\n"
# channels per color type (8-bit, non-interlaced support matrix)
_CHANNELS = {0: 1, 2: 3, 4: 2, 6: 4}


def _chunks(blob: bytes):
    pos = len(_PNG_SIG)
    while pos + 8 <= len(blob):
        (length,) = struct.unpack_from(">I", blob, pos)
        ctype = blob[pos + 4 : pos + 8]
        data = blob[pos + 8 : pos + 8 + length]
        yield ctype, data
        pos += 12 + length  # len + type + data + crc
        if ctype == b"IEND":
            return


def _unfilter(raw: np.ndarray, height: int, stride: int, bpp: int) -> np.ndarray:
    """Undo PNG per-row filtering (spec §9): rows arrive as
    ``filter_type | filtered bytes``; reconstruct in scanline order.
    Up/None rows vectorize; Sub/Average/Paeth need the left neighbor so
    they scan pixels left-to-right (numpy int16 per row — rows are
    short relative to Arrow batch sizes, and the hot production path is
    the ``pil`` codec; this one is the dependency-free correctness
    path)."""
    rows = raw.reshape(height, stride + 1)
    out = np.zeros((height, stride), dtype=np.uint8)
    for y in range(height):
        ftype = int(rows[y, 0])
        cur = rows[y, 1:].astype(np.int16)
        prev = out[y - 1].astype(np.int16) if y else np.zeros(stride, np.int16)
        if ftype == 0:  # None
            rec = cur
        elif ftype == 2:  # Up
            rec = (cur + prev) & 0xFF
        else:
            rec = np.zeros(stride, np.int16)
            for i in range(stride):
                a = rec[i - bpp] if i >= bpp else 0  # left
                b = prev[i]  # up
                c = prev[i - bpp] if i >= bpp else 0  # up-left
                if ftype == 1:  # Sub
                    pred = a
                elif ftype == 3:  # Average
                    pred = (int(a) + int(b)) // 2
                elif ftype == 4:  # Paeth
                    p = int(a) + int(b) - int(c)
                    pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
                    pred = a if pa <= pb and pa <= pc else (b if pb <= pc else c)
                else:
                    raise ValueError(f"bad PNG filter type {ftype} on row {y}")
                rec[i] = (int(cur[i]) + int(pred)) & 0xFF
        out[y] = rec.astype(np.uint8)
    return out


def decode_png(blob: bytes) -> tuple[int, int, np.ndarray]:
    """Parse one PNG file -> (width, height, pixels[h, w] uint8 luma).

    8-bit depth, non-interlaced, color types 0/2/4/6; IDAT chunks are
    concatenated then zlib-inflated per the spec."""
    if blob[: len(_PNG_SIG)] != _PNG_SIG:
        raise ValueError("not a PNG file (bad signature)")
    width = height = None
    color_type = bit_depth = interlace = None
    idat = []
    for ctype, data in _chunks(blob):
        if ctype == b"IHDR":
            width, height, bit_depth, color_type, _comp, _filt, interlace = (
                struct.unpack(">IIBBBBB", data)
            )
        elif ctype == b"IDAT":
            idat.append(data)
    if width is None or not idat:
        raise ValueError("PNG missing IHDR or IDAT")
    if bit_depth != 8:
        raise ValueError(f"unsupported PNG bit depth {bit_depth} (only 8)")
    if interlace:
        raise ValueError("interlaced PNG not supported")
    if color_type not in _CHANNELS:
        raise ValueError(f"unsupported PNG color type {color_type}")
    ch = _CHANNELS[color_type]
    raw = np.frombuffer(zlib.decompress(b"".join(idat)), dtype=np.uint8)
    stride = width * ch
    if raw.size != height * (stride + 1):
        raise ValueError("PNG pixel data size mismatch")
    px = _unfilter(raw, height, stride, bpp=ch).reshape(height, width, ch)
    if ch == 1:
        gray = px[:, :, 0]
    elif ch == 2:  # gray + alpha
        gray = px[:, :, 0]
    else:  # RGB(A) -> BT.601 integer luma
        r, g, b = px[:, :, 0].astype(np.int32), px[:, :, 1].astype(np.int32), px[
            :, :, 2
        ].astype(np.int32)
        gray = ((r * 299 + g * 587 + b * 114) // 1000).astype(np.uint8)
    return width, height, gray


def _filter_row(
    ftype: int, cur: np.ndarray, prev: np.ndarray, bpp: int
) -> np.ndarray:
    """Forward-apply one PNG filter (encoder side; exact inverse of
    ``_unfilter`` so tests can cover every filter type)."""
    cur = cur.astype(np.int16)
    prev = prev.astype(np.int16)
    n = cur.size
    out = np.zeros(n, np.int16)
    for i in range(n):
        a = int(cur[i - bpp]) if i >= bpp else 0
        b = int(prev[i])
        c = int(prev[i - bpp]) if i >= bpp else 0
        if ftype == 0:
            pred = 0
        elif ftype == 1:
            pred = a
        elif ftype == 2:
            pred = b
        elif ftype == 3:
            pred = (a + b) // 2
        elif ftype == 4:
            p = a + b - c
            pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
            pred = a if pa <= pb and pa <= pc else (b if pb <= pc else c)
        else:
            raise ValueError(f"bad filter type {ftype}")
        out[i] = (int(cur[i]) - pred) & 0xFF
    return out.astype(np.uint8)


def encode_png(
    pixels: np.ndarray, filter_type: int | None = None
) -> bytes:
    """Write a real PNG: grayscale ``[h, w]`` or color ``[h, w, 3|4]``
    uint8, 8-bit, non-interlaced. ``filter_type`` forces one filter on
    every row (None -> 0); used by tests to exercise each unfilter
    branch with byte-real files any PNG reader can open."""
    px = np.asarray(pixels, dtype=np.uint8)
    if px.ndim == 2:
        px = px[:, :, None]
    h, w, ch = px.shape
    color_type = {1: 0, 3: 2, 4: 6}[ch]
    ft = 0 if filter_type is None else int(filter_type)
    stride = w * ch
    flat = px.reshape(h, stride)
    zeros = np.zeros(stride, np.uint8)
    lines = []
    for y in range(h):
        prev = flat[y - 1] if y else zeros
        lines.append(bytes([ft]) + _filter_row(ft, flat[y], prev, ch).tobytes())
    ihdr = struct.pack(">IIBBBBB", w, h, 8, color_type, 0, 0, 0)

    def chunk(ctype: bytes, data: bytes) -> bytes:
        crc = zlib.crc32(ctype + data) & 0xFFFFFFFF
        return struct.pack(">I", len(data)) + ctype + data + struct.pack(">I", crc)

    return (
        _PNG_SIG
        + chunk(b"IHDR", ihdr)
        + chunk(b"IDAT", zlib.compress(b"".join(lines)))
        + chunk(b"IEND", b"")
    )


def decode_with_pil(blob: bytes) -> tuple[int, int, np.ndarray]:
    """(width, height, luma[h, w]) via Pillow — any format it opens.

    Import-gated: Pillow is a public library but absent from some
    runtimes; the caller surfaces the NotImplementedError as the
    documented decode-boundary behavior."""
    try:
        import io

        from PIL import Image
    except ImportError as e:  # pragma: no cover - env without Pillow
        raise NotImplementedError(
            "codec 'pil' requires Pillow (pip install Pillow); in this "
            "environment use the built-in 'png' or 'kwm' codecs"
        ) from e
    img = Image.open(io.BytesIO(blob)).convert("L")
    arr = np.asarray(img, dtype=np.uint8)
    return img.width, img.height, arr
