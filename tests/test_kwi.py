"""`.kwi` compat shim tests: byte-level round-trip + migration path."""

import json

import pytest
from pyspark.sql import functions as F

from kowari_spark.sources.kwi import decode_kwi, encode_kwi, read_kwi, write_kwi
from kowari_spark.catalog import CollectionManager


def test_bytes_roundtrip():
    recs = [
        ("a" * 36, [1.0, 2.5, -3.0], json.dumps({"k": 1, "nested": {"x": [1, 2]}})),
        ("b" * 36, [0.0, 0.0, 0.0], None),
        ("short-id", [9.0, 8.0, 7.0], json.dumps({"t": "q"})),
    ]
    blob = encode_kwi(recs)
    assert blob[:4] == b"KWI\x00"
    got = decode_kwi(blob)
    assert [g[0] for g in got] == ["a" * 36, "b" * 36, "short-id"]
    assert got[0][1] == [1.0, 2.5, -3.0]
    assert json.loads(got[0][2])["nested"]["x"] == [1, 2]
    assert got[1][2] is None


def test_spark_roundtrip_and_migration(spark, embeddings, tmp_path):
    vecs = embeddings.limit(50).select(
        F.col("vec_id").cast("string").alias("id"),
        "embedding",
        F.to_json(F.struct("label")).alias("metadata"),
    )
    kwi_path = str(tmp_path / "export.kwi")
    write_kwi(vecs, kwi_path)

    back = read_kwi(spark, kwi_path)
    assert back.count() == 50
    orig = {r["id"]: r for r in vecs.collect()}
    for r in back.collect():
        o = orig[r["id"]]
        assert [round(float(x), 5) for x in r["embedding"]] == [
            round(float(x), 5) for x in o["embedding"]
        ]
        assert json.loads(r["metadata"]) == json.loads(o["metadata"])

    # migrate into a managed collection through the validated path
    mgr = CollectionManager(spark, str(tmp_path / "wh"))
    coll = mgr.create_collection("migrated", dimension=64, mode="strict")
    coll.add_df(back)
    assert coll.count() == 50


def test_read_multiple_files(spark, tmp_path):
    for i in range(3):
        blob = encode_kwi([(f"id-{i}", [float(i)] * 4, None)])
        (tmp_path / f"part{i}.kwi").write_bytes(blob)
    df = read_kwi(spark, str(tmp_path / "*.kwi"))
    assert sorted(r["id"] for r in df.collect()) == ["id-0", "id-1", "id-2"]


def test_bad_magic_raises():
    with pytest.raises(ValueError, match="bad magic"):
        decode_kwi(b"NOPE" + b"\x00" * 40)


def _reference_localstorage_bytes():
    """Hand-build a file with the reference writer's EXACT byte layout
    (local_storage.rs:75-78 header, :126-164 records), independently of
    encode_kwi, so the decoder is pinned to the genuine on-disk format:
    20-byte header (u32 reserved), u32 id_len = string length, 36-byte
    NUL-padded id block, bincode f32 array, u32 meta_len."""
    import struct

    uid = "123e4567-e89b-12d3-a456-426614174000"  # 36 chars, like Uuid
    vec = [1.5, -2.0, 0.25]
    meta = b'{"k":1}'
    out = b"KWI\x00" + struct.pack("<I", 1)          # magic + version
    out += struct.pack("<Q", 2)                       # count
    out += struct.pack("<I", 0)                       # u32 reserved -> 20 B
    for rid, m in ((uid, meta), ("short", b"")):
        id_raw = rid.encode()
        out += struct.pack("<I", len(id_raw))         # id_len = STRING len
        out += id_raw + b"\x00" * (36 - len(id_raw))  # fixed 36-B NUL pad
        data = struct.pack("<Q", len(vec)) + struct.pack(f"<{len(vec)}f", *vec)
        out += struct.pack("<I", len(data)) + data
        out += struct.pack("<I", len(m)) + m
    return out, uid, vec


def test_reference_layout_fixture_decodes():
    blob, uid, vec = _reference_localstorage_bytes()
    got = decode_kwi(blob)
    assert [g[0] for g in got] == [uid, "short"]
    assert got[0][1] == pytest.approx(vec)
    assert got[0][2] == '{"k":1}'
    assert got[1][2] is None


def test_encoder_matches_reference_layout():
    """encode_kwi must emit the same bytes the reference writer would:
    records start at offset 20, id block NUL-padded."""
    blob, uid, vec = _reference_localstorage_bytes()
    ours = encode_kwi([(uid, vec, '{"k":1}'), ("short", vec, None)])
    assert ours == blob


def test_binary_index_salvage(spark, tmp_path):
    """BinaryIndex framing, faithfully-clobbered fixture: the encoder
    replays the reference's add_vector + update_header sequence
    (binary_index.rs:103-146, 222-237), so the entry table at offset 32
    physically overwrites the first record's bytes. The salvage reader
    must recover the later records with their REAL uuids and skip the
    clobbered one."""
    import uuid

    from kowari_spark.sources.kwi import decode_kwi_index, encode_kwi_index

    ids = [str(uuid.UUID(int=i + 1)) for i in range(3)]
    # dim 32: records (~140 B) outrun the 32 B/entry table, so only the
    # first record is clobbered — the reference's typical corruption shape
    vecs = [[i + j * 0.25 for j in range(32)] for i in range(3)]
    metas = ['{"a":2}', None, '{"b":"x"}']
    blob = encode_kwi_index(list(zip(ids, vecs, metas)))

    # header truths the reference writer leaves behind: count=0 at the
    # header field (offset 12, never rewritten), live count at offset 16
    import struct

    assert struct.unpack_from("<Q", blob, 12)[0] & 0xFFFFFFFF == 0
    assert struct.unpack_from("<Q", blob, 16)[0] == 3

    got = decode_kwi_index(blob)
    # record 0 (offset 28) overlaps the 3-entry table [32, 128): clobbered
    assert [g[0] for g in got] == ids[1:]
    assert got[0][1] == pytest.approx(vecs[1])
    assert got[0][2] is None
    assert got[1][1] == pytest.approx(vecs[2])
    assert got[1][2] == '{"b":"x"}'

    with pytest.raises(ValueError, match="unrecoverable"):
        decode_kwi_index(blob, strict=True)

    p = tmp_path / "idx.kwi"
    p.write_bytes(blob)
    df = read_kwi(spark, str(p), framing="index")
    assert sorted(r["id"] for r in df.collect()) == sorted(ids[1:])


def test_binary_index_salvage_shuffled_table_order(tmp_path):
    """The reference's entry table is HashMap-ordered (arbitrary); the
    salvage reader must not depend on table order — output is offset
    (append) order regardless."""
    import struct
    import uuid

    from kowari_spark.sources.kwi import decode_kwi_index, encode_kwi_index

    ids = [str(uuid.UUID(int=i + 10)) for i in range(4)]
    vecs = [[float(i) + j * 0.5 for j in range(32)] for i in range(4)]
    blob = bytearray(encode_kwi_index([(r, v, None) for r, v in zip(ids, vecs)]))
    # swap two entry rows in place to simulate a different HashMap order
    r1, r2 = blob[32 + 32 : 32 + 64], blob[32 + 64 : 32 + 96]
    blob[32 + 32 : 32 + 64], blob[32 + 64 : 32 + 96] = r2, r1
    got = decode_kwi_index(bytes(blob))
    # entry 0 clobbered (4-entry table ends at 160 > offset 28); rest in
    # append order by offset, ids preserved
    assert [g[0] for g in got] == ids[1:]
    assert got[0][1] == pytest.approx(vecs[1])


def test_decode_empty_header_only_index():
    """create_new_index writes a 28-byte header-only file
    (binary_index.rs:48-60): count 0, no entry table. A valid empty
    index decodes to [] instead of tripping the table-bounds check."""
    import struct

    from kowari_spark.sources.kwi import decode_kwi_index

    blob = b"KWI\x00" + struct.pack("<IIQ", 1, 64, 0) + struct.pack("<Q", 0)
    assert len(blob) == 28
    assert decode_kwi_index(blob) == []
    assert decode_kwi_index(blob, strict=True) == []
