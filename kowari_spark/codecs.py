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


# -- Y4M (YUV4MPEG2) — public uncompressed video container -------------------
#
# The video analog of the dependency-free PNG path: YUV4MPEG2 is the
# standard interchange format every ffmpeg/mjpegtools pipeline can emit
# (`ffmpeg -i in.mp4 out.y4m`), and it is trivially parseable — an ASCII
# stream header, then "FRAME\n"-delimited raw planar YUV. Decoding it
# here keeps the video decode boundary REAL without shipping ffmpeg:
# compressed containers are transcoded to .y4m upstream (the documented
# boundary), and the engine's frame operators run on the result.

_Y4M_MAGIC = b"YUV4MPEG2 "


def _y4m_plane_sizes(cs: str, w: int, h: int) -> list[tuple[int, int]]:
    """(plane_w, plane_h) per plane for the colorspaces we accept."""
    if cs.startswith("C420"):  # C420, C420jpeg, C420mpeg2, C420paldv
        if w % 2 or h % 2:
            raise ValueError(f"{cs} requires even dimensions, got {w}x{h}")
        return [(w, h), (w // 2, h // 2), (w // 2, h // 2)]
    if cs == "C422":
        if w % 2:
            raise ValueError(f"C422 requires even width, got {w}")
        return [(w, h), (w // 2, h), (w // 2, h)]
    if cs == "C444":
        return [(w, h), (w, h), (w, h)]
    if cs == "Cmono":
        return [(w, h)]
    raise ValueError(f"unsupported Y4M colorspace {cs!r}")


def decode_y4m(blob: bytes) -> tuple[int, int, np.ndarray]:
    """(width, height, luma[n_frames, h, w]) from a YUV4MPEG2 stream.

    Parses the stream header (W/H mandatory, C colorspace optional —
    spec default C420jpeg), then every FRAME section; chroma planes are
    skipped (the engine's media operators are luma-based, like the
    PNG/PIL image path)."""
    if not blob.startswith(_Y4M_MAGIC):
        raise ValueError("not a YUV4MPEG2 stream (bad magic)")
    nl = blob.index(b"\n")
    params = blob[len(_Y4M_MAGIC):nl].decode("ascii").split()
    w = h = None
    cs = "C420jpeg"
    for p in params:
        if p.startswith("W"):
            w = int(p[1:])
        elif p.startswith("H"):
            h = int(p[1:])
        elif p.startswith("C"):
            cs = p
    if not w or not h:
        raise ValueError("Y4M header missing W/H")
    planes = _y4m_plane_sizes(cs, w, h)
    frame_bytes = sum(pw * ph for pw, ph in planes)
    frames = []
    pos = nl + 1
    while pos < len(blob):
        if blob[pos : pos + 5] != b"FRAME":
            raise ValueError(f"expected FRAME marker at offset {pos}")
        fnl = blob.index(b"\n", pos)
        body = blob[fnl + 1 : fnl + 1 + frame_bytes]
        if len(body) < frame_bytes:
            raise ValueError(f"truncated frame at offset {pos}")
        frames.append(
            np.frombuffer(body, dtype=np.uint8, count=w * h).reshape(h, w)
        )
        pos = fnl + 1 + frame_bytes
    return w, h, np.stack(frames) if frames else np.empty((0, h, w), np.uint8)


def encode_y4m(
    frames: np.ndarray, colorspace: str = "C420jpeg", fps: str = "25:1"
) -> bytes:
    """YUV4MPEG2 stream from luma frames [n, h, w] (chroma planes are
    written neutral 128). The test-fixture writer for the decoder above,
    and a legitimate exporter toward any ffmpeg consumer."""
    n, h, w = frames.shape
    planes = _y4m_plane_sizes(colorspace, w, h)
    head = f"YUV4MPEG2 W{w} H{h} F{fps} Ip A1:1 {colorspace}\n".encode()
    out = [head]
    for f in range(n):
        out.append(b"FRAME\n")
        out.append(frames[f].astype(np.uint8).tobytes())
        for pw, ph in planes[1:]:
            out.append(b"\x80" * (pw * ph))
    return b"".join(out)


# -- MJPEG — concatenated-JPEG stream ----------------------------------------

_JPEG_STANDALONE = frozenset([0x01, *range(0xD0, 0xD8)])  # TEM, RSTn


def _jpeg_frame_end(blob: bytes, soi: int) -> int:
    """Index just past the EOI of the JPEG starting at ``soi``, found by
    walking the SEGMENT structure: length-prefixed markers (APPn, COM,
    DQT, SOF, ...) are skipped whole — an FFD9 byte pair inside an APPn
    payload (e.g. the full thumbnail JPEG EXIF embeds in APP1) is
    payload, not this frame's EOI (ADVICE r5). Inside entropy-coded
    data (after SOS) only FF00 stuffing and RSTn can follow FF, so
    scanning for the next real marker there is sound per the spec.

    Returns -1 when the bytes after SOI don't parse as JPEG segments —
    the caller falls back to a flat EOI scan for that frame (loose
    concatenations of non-conformant fragments keep splitting the old
    way)."""
    n = len(blob)
    pos = soi + 2
    while pos < n:
        if blob[pos] != 0xFF:
            return -1  # not segment-conformant
        while pos < n and blob[pos] == 0xFF:  # optional fill bytes
            pos += 1
        if pos >= n:
            break
        marker = blob[pos]
        pos += 1
        if marker == 0xD9:  # EOI
            return pos
        if marker == 0xD8 or marker in _JPEG_STANDALONE:
            continue  # no payload
        if marker == 0x00:
            return -1  # stuffing outside entropy data: not conformant
        if pos + 2 > n:
            return -1  # truncated length field -> let the flat scan try
        seg_len = int.from_bytes(blob[pos : pos + 2], "big")
        if seg_len < 2 or pos + seg_len > n:
            # nonsense / overrunning length (corrupt segment): fall back
            # rather than declaring the whole frame EOI-less — a valid
            # FFD9 may still exist past the corruption
            return -1
        pos += seg_len
        if marker == 0xDA:  # SOS: entropy-coded data until a real marker
            while pos < n:
                ff = blob.find(b"\xff", pos)
                if ff < 0 or ff + 1 >= n:
                    pos = n
                    break
                nxt = blob[ff + 1]
                if nxt == 0x00 or 0xD0 <= nxt <= 0xD7:
                    pos = ff + 2  # stuffed byte / restart marker
                    continue
                pos = ff  # next segment-level marker
                break
    # ran out of bytes with no EOI: defer to the caller's flat scan
    # (which raises the no-EOI error if there is truly none)
    return -1


def split_mjpeg(blob: bytes) -> list[bytes]:
    """Split a raw MJPEG stream into its JPEG frames. Frame boundaries
    come from a JPEG SEGMENT walk (``_jpeg_frame_end``), so an FFD9
    inside a length-delimited APPn/COM payload — EXIF thumbnails embed
    a complete JPEG — does not truncate the frame; fragments that don't
    parse as segments fall back to the flat SOI..EOI scan. Frame
    PAYLOAD decode then goes through the Pillow adapter (JPEG entropy
    decode is exactly the boundary the import-gate exists for)."""
    frames = []
    pos = 0
    while True:
        soi = blob.find(b"\xff\xd8", pos)
        if soi < 0:
            break
        end = _jpeg_frame_end(blob, soi)
        if end < 0:  # non-conformant fragment: flat scan
            eoi = blob.find(b"\xff\xd9", soi + 2)
            if eoi < 0:
                raise ValueError(f"JPEG frame at offset {soi} has no EOI marker")
            end = eoi + 2
        frames.append(blob[soi:end])
        pos = end
    return frames


def decode_mjpeg(blob: bytes) -> tuple[int, int, np.ndarray]:
    """(width, height, luma[n, h, w]) from an MJPEG stream: marker split
    (dependency-free) + per-frame Pillow decode (import-gated)."""
    parts = split_mjpeg(blob)
    if not parts:
        raise ValueError("no JPEG frames found in MJPEG stream")
    lumas = []
    w = h = None
    for p in parts:
        fw, fh, arr = decode_with_pil(p)
        if w is None:
            w, h = fw, fh
        elif (fw, fh) != (w, h):
            raise ValueError("MJPEG frames disagree on dimensions")
        lumas.append(arr)
    return w, h, np.stack(lumas)
