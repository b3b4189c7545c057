"""`.kwi` binary-format compatibility shim (S10-S12).

The engine's storage is Parquet (SURVEY.md §1.4 decision — columnar
supersedes the reference's custom format); this module exists so data
written by the reference can be MIGRATED in. Two reference framings:

**LocalStorage** (primary migration target — what ``save``/``load``
vector files contain, local_storage.rs:75-78 header, :126-164 records):

    header  : KWI\\0 | u32le version | u64le count | u32le reserved  (20 B)
    record  : u32le id_len | 36-byte NUL-padded id | u32le data_len |
              bincode(Array1<f32>) = u64le n + n * f32le |
              u32le metadata_len | metadata JSON bytes

Records start at offset 20. The reference's own reader seeks to 16
(local_storage.rs:221,256 — the SURVEY.md §1.5 misalignment bug) and so
misparses the files its writer produces; this reader parses the layout
the writer actually emits, which is what a migrating user's files hold.

**BinaryIndex** (binary_index.rs:48-59 header, :103-146 records): 28-byte
header ``magic | u32 version | u32 dimension | u64 count | u64 reserved``
followed by appended records ``bincode(Array1<f32>) | u32 meta_len |
meta``. The format self-clobbers: ``add_vector`` calls ``update_header``
on EVERY add (binary_index.rs:142-143), and ``update_header`` writes the
live count at offset 16 (not the header's count field at 12 — a
reference seek bug, binary_index.rs:222-224) and then the whole
index-entry table at offset 32 (binary_index.rs:227-234), directly over
the bytes of the first appended record(s). In a genuine reference file
the index-entry table — 32-byte rows of ``uuid(16) | u64le record
offset | u32le dimension | u32le metadata_size`` — is therefore the
authoritative (and only intact) id/offset structure. ``decode_kwi_index``
is a SALVAGE reader that parses that table to recover the real vector
ids and offsets, then extracts each record's f32 payload and JSON
metadata; records whose bytes fall inside the table's clobber range are
unrecoverable and are skipped (reported via ``strict=True``).

Scale path: files land via Spark's ``binaryFile`` source (one row per
file, bytes in memory — .kwi files are single-node artifacts by origin,
so per-file decode parallelism is the right grain) and are decoded in an
Arrow-batched ``mapInPandas`` stage straight into the canonical vector
schema.
"""

from __future__ import annotations

import struct
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession

from kowari_spark.schema import VECTOR_SCHEMA

_MAGIC = b"KWI\x00"
_VERSION = 1
_HEADER_LEN = 20  # magic(4) + version(4) + count(8) + reserved(4)
_INDEX_HEADER_LEN = 28  # magic(4) + version(4) + dim(4) + count(8) + reserved(8)


def encode_kwi(records: list[tuple[str, list[float], str | None]]) -> bytes:
    """Serialize (id, embedding, metadata_json) records to LocalStorage
    .kwi bytes (byte-identical to the reference writer's output)."""
    out = [_MAGIC, struct.pack("<I", _VERSION), struct.pack("<Q", len(records)),
           struct.pack("<I", 0)]
    for rid, vec, meta in records:
        id_raw = rid.encode()[:36]
        # u32 id_len is the STRING length; the field itself is a fixed
        # 36-byte NUL-padded block (local_storage.rs:128-135)
        id_block = id_raw + b"\x00" * (36 - len(id_raw))
        data = struct.pack("<Q", len(vec)) + struct.pack(f"<{len(vec)}f", *vec)
        meta_bytes = (meta or "").encode()
        out.append(struct.pack("<I", len(id_raw)))
        out.append(id_block)
        out.append(struct.pack("<I", len(data)))
        out.append(data)
        out.append(struct.pack("<I", len(meta_bytes)))
        out.append(meta_bytes)
    return b"".join(out)


def decode_kwi(blob: bytes) -> list[tuple[str, list[float], str | None]]:
    """Parse one LocalStorage .kwi file into (id, embedding,
    metadata_json) records. Records start at offset 20 — the header the
    writer emits, not the 16 bytes its own buggy reader skips."""
    if blob[:4] != _MAGIC:
        raise ValueError("not a KWI file (bad magic)")
    (count,) = struct.unpack_from("<Q", blob, 8)
    pos = _HEADER_LEN
    records = []
    for _ in range(count):
        (id_len,) = struct.unpack_from("<I", blob, pos); pos += 4
        rid = blob[pos : pos + min(id_len, 36)].decode().rstrip("\x00").strip()
        pos += 36  # fixed-width NUL-padded id block
        (data_len,) = struct.unpack_from("<I", blob, pos); pos += 4
        (n,) = struct.unpack_from("<Q", blob, pos)
        vec = list(struct.unpack_from(f"<{n}f", blob, pos + 8))
        pos += data_len
        (meta_len,) = struct.unpack_from("<I", blob, pos); pos += 4
        meta = blob[pos : pos + meta_len].decode() if meta_len else None
        pos += meta_len
        records.append((rid, vec, meta))
    return records


def encode_kwi_index(
    records: list[tuple[str, list[float], str | None]],
) -> bytes:
    """Byte-faithful simulation of the reference BinaryIndex writer,
    for fixtures and export: replays create_new_index
    (binary_index.rs:48-59) then, per vector, the add_vector append +
    update_header rewrite (binary_index.rs:103-146, 222-237) — including
    the self-clobbering: every add seeks to 16 to write the live count
    and to 32 to write the full index-entry table, overwriting the first
    record's bytes exactly as the reference does. ``records`` ids must be
    UUID strings (the on-disk id is a 16-byte uuid)."""
    import uuid as _uuid

    dim = len(records[0][1]) if records else 0
    # create_new_index: magic | version | dim | count=0 (offset 12) | reserved
    buf = bytearray(
        _MAGIC
        + struct.pack("<I", _VERSION)
        + struct.pack("<I", dim)
        + struct.pack("<Q", 0)
        + struct.pack("<Q", 0)
    )

    def write_at(pos: int, data: bytes) -> None:
        end = pos + len(data)
        if end > len(buf):
            buf.extend(b"\x00" * (end - len(buf)))
        buf[pos:end] = data

    entries: list[tuple[bytes, int, int, int]] = []
    for rid, vec, meta in records:
        offset = len(buf)  # seek(End) then stream_position
        data = struct.pack("<Q", len(vec)) + struct.pack(f"<{len(vec)}f", *vec)
        meta_bytes = (meta or "").encode()
        buf.extend(data)
        buf.extend(struct.pack("<I", len(meta_bytes)))
        buf.extend(meta_bytes)
        entries.append((_uuid.UUID(rid).bytes, offset, len(vec), len(meta_bytes)))
        # update_header: count at offset 16, entry table at offset 32
        write_at(16, struct.pack("<Q", len(entries)))
        table = b"".join(
            u + struct.pack("<QII", off, d, m) for u, off, d, m in entries
        )
        write_at(32, table)
    return bytes(buf)


def decode_kwi_index(
    blob: bytes, strict: bool = False
) -> list[tuple[str, list[float], str | None]]:
    """Salvage reader for genuine reference BinaryIndex .kwi files.

    Parses the index-entry table at offset 32 — the structure
    ``update_header`` rewrites on every add (binary_index.rs:222-237):
    ``count`` from offset 16 (where update_header actually writes it;
    the header's count field at 12 is only ever written as 0 at create
    time), then ``count`` 32-byte rows of ``uuid(16) | u64le offset |
    u32le dim | u32le meta_size``. Each entry's record payload is
    ``bincode(Array1<f32>)`` — a u64le length prefix the offset points
    at, so the f32s start at ``offset + 8`` — followed by ``u32le
    meta_len | metadata JSON``. Entries whose record bytes overlap the
    entry-table region ``[32, 32 + 32*count)`` were physically
    overwritten by the reference's own header rewrites and are
    unrecoverable: skipped by default, raised with ``strict=True``.
    Output is in append (offset) order with real uuid-string ids."""
    import uuid as _uuid

    if blob[:4] != _MAGIC:
        raise ValueError("not a KWI file (bad magic)")
    (count,) = struct.unpack_from("<Q", blob, 16)
    if count == 0:
        # create_new_index writes a 28-byte header-only file
        # (binary_index.rs:48-60); there is no entry table to bound
        return []
    table_end = 32 + 32 * count
    if table_end > len(blob):
        raise ValueError(
            f"entry table ({count} entries) exceeds file size {len(blob)}"
        )
    salvaged: list[tuple[int, str, list[float], str | None]] = []
    for i in range(count):
        base = 32 + 32 * i
        rid = str(_uuid.UUID(bytes=blob[base : base + 16]))
        offset, rdim, meta_size = struct.unpack_from("<QII", blob, base + 16)
        rec_end = offset + 8 + 4 * rdim + 4 + meta_size
        if offset < table_end:
            # record bytes were clobbered by a later update_header rewrite
            if strict:
                raise ValueError(
                    f"record {rid} at offset {offset} overlaps the entry "
                    f"table [32, {table_end}): clobbered by the reference's "
                    "own header rewrites, unrecoverable"
                )
            continue
        if rec_end > len(blob):
            raise ValueError(f"truncated record {rid} at offset {offset}")
        (n,) = struct.unpack_from("<Q", blob, offset)
        if n != rdim:
            raise ValueError(
                f"record {rid}: bincode length {n} != entry dimension {rdim}"
            )
        vec = list(struct.unpack_from(f"<{rdim}f", blob, offset + 8))
        (meta_len,) = struct.unpack_from("<I", blob, offset + 8 + 4 * rdim)
        mstart = offset + 8 + 4 * rdim + 4
        meta = blob[mstart : mstart + meta_len].decode() if meta_len else None
        salvaged.append((offset, rid, vec, meta))
    salvaged.sort()
    return [(rid, vec, meta) for _, rid, vec, meta in salvaged]


def write_kwi(df: DataFrame, path: str) -> None:
    """Compat writer: serialize a vector DataFrame to ONE .kwi file.

    .kwi is a single-file single-node format by origin; this exists for
    round-trip tests and for exporting small collections back to the
    reference. toLocalIterator streams partitions without materializing
    the whole table driver-side."""
    records = [
        (r["id"], [float(x) for x in r["embedding"]], r["metadata"])
        for r in df.select("id", "embedding", "metadata").toLocalIterator()
    ]
    with open(path, "wb") as f:
        f.write(encode_kwi(records))


def read_kwi(spark: SparkSession, path: str, framing: str = "local") -> DataFrame:
    """Migration reader: .kwi file(s) -> canonical vector DataFrame.

    ``path`` may be a glob; each file decodes independently in an
    Arrow-batched python stage (per-file parallelism). ``framing`` is
    ``"local"`` (LocalStorage vector files) or ``"index"`` (BinaryIndex
    salvage — see decode_kwi_index)."""
    decoder = {"local": decode_kwi, "index": decode_kwi_index}[framing]
    files = spark.read.format("binaryFile").load(path).select("content")

    def parse(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, vecs, metas = [], [], []
            for blob in pdf["content"]:
                for rid, vec, meta in decoder(bytes(blob)):
                    ids.append(rid)
                    vecs.append(vec)
                    metas.append(meta)
            yield pd.DataFrame({"id": ids, "embedding": vecs, "metadata": metas})

    return files.mapInPandas(parse, VECTOR_SCHEMA)
