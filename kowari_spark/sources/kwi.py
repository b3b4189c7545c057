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
meta``. Vector ids are kept only in the process's in-memory map and are
never written on the append path (binary_index.rs:103-146 — add_vector
persists no id; update_header runs only on delete and then clobbers
record bytes at offset 32). Files are therefore id-less on disk;
``decode_kwi_index`` is a SALVAGE reader — sequential record scan with
synthesized row-ordinal ids — for the append-only happy path.

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


def decode_kwi_index(blob: bytes) -> list[tuple[str, list[float], str | None]]:
    """Salvage reader for BinaryIndex .kwi files (append-only happy
    path): sequential scan of ``bincode(f32 array) | u32 meta_len | meta``
    records after the 28-byte header. Ids were never persisted by the
    reference (binary_index.rs:103-146), so they are synthesized as row
    ordinals ``row-N``. Files that went through delete_vector are
    unrecoverable (update_header overwrites record bytes at offset 32)."""
    if blob[:4] != _MAGIC:
        raise ValueError("not a KWI file (bad magic)")
    pos = _INDEX_HEADER_LEN
    records = []
    i = 0
    while pos + 8 <= len(blob):
        (n,) = struct.unpack_from("<Q", blob, pos)
        if pos + 8 + 4 * n + 4 > len(blob):
            raise ValueError(f"truncated BinaryIndex record at offset {pos}")
        vec = list(struct.unpack_from(f"<{n}f", blob, pos + 8))
        pos += 8 + 4 * n
        (meta_len,) = struct.unpack_from("<I", blob, pos); pos += 4
        meta = blob[pos : pos + meta_len].decode() if meta_len else None
        pos += meta_len
        records.append((f"row-{i}", vec, meta))
        i += 1
    return records


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
