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
