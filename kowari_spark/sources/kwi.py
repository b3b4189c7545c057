"""`.kwi` binary-format compatibility shim (S10-S12).

The engine's storage is Parquet (SURVEY.md §1.4 decision — columnar
supersedes the reference's custom format); this module exists so data
written by the reference can be MIGRATED in. Record framing follows the
reference's LocalStorage variant as documented in SURVEY.md §1.4
(local_storage.rs:126-164): per record

    u32le id_len | 36-byte space-padded id | u32le data_len |
    bincode(Array1<f32>) = u64le n + n * f32le | u32le metadata_len |
    metadata JSON bytes

with a 24-byte header ``KWI\\0 | u32le version | u64le count | u64le
reserved``. The reference's header-seek misalignment (writers emit 24
bytes, readers skip 16 — SURVEY.md §1.5) is NOT reproduced: this reader
parses the header it declares. Deletion-by-rewrite, offset tables and
two-tier reads are irrelevant here — migration reads everything once.

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


def encode_kwi(records: list[tuple[str, list[float], str | None]]) -> bytes:
    """Serialize (id, embedding, metadata_json) records to .kwi bytes."""
    out = [_MAGIC, struct.pack("<I", _VERSION), struct.pack("<Q", len(records)),
           struct.pack("<Q", 0)]
    for rid, vec, meta in records:
        id_bytes = rid.ljust(36)[:36].encode()
        data = struct.pack("<Q", len(vec)) + struct.pack(f"<{len(vec)}f", *vec)
        meta_bytes = (meta or "").encode()
        out.append(struct.pack("<I", len(id_bytes)))
        out.append(id_bytes)
        out.append(struct.pack("<I", len(data)))
        out.append(data)
        out.append(struct.pack("<I", len(meta_bytes)))
        out.append(meta_bytes)
    return b"".join(out)


def decode_kwi(blob: bytes) -> list[tuple[str, list[float], str | None]]:
    """Parse one .kwi file into (id, embedding, metadata_json) records."""
    if blob[:4] != _MAGIC:
        raise ValueError("not a KWI file (bad magic)")
    (count,) = struct.unpack_from("<Q", blob, 8)
    pos = 24
    records = []
    for _ in range(count):
        (id_len,) = struct.unpack_from("<I", blob, pos); pos += 4
        rid = blob[pos : pos + id_len].decode().strip(); pos += id_len
        (data_len,) = struct.unpack_from("<I", blob, pos); pos += 4
        (n,) = struct.unpack_from("<Q", blob, pos)
        vec = list(struct.unpack_from(f"<{n}f", blob, pos + 8))
        pos += data_len
        (meta_len,) = struct.unpack_from("<I", blob, pos); pos += 4
        meta = blob[pos : pos + meta_len].decode() if meta_len else None
        pos += meta_len
        records.append((rid, vec, meta))
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


def read_kwi(spark: SparkSession, path: str) -> DataFrame:
    """Migration reader: .kwi file(s) -> canonical vector DataFrame.

    ``path`` may be a glob; each file decodes independently in an
    Arrow-batched python stage (per-file parallelism)."""
    files = spark.read.format("binaryFile").load(path).select("content")

    def parse(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, vecs, metas = [], [], []
            for blob in pdf["content"]:
                for rid, vec, meta in decode_kwi(bytes(blob)):
                    ids.append(rid)
                    vecs.append(vec)
                    metas.append(meta)
            yield pd.DataFrame({"id": ids, "embedding": vecs, "metadata": metas})

    return files.mapInPandas(parse, VECTOR_SCHEMA)
