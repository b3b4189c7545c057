"""Merge-on-read deletes for the collection store (round 15 — VERDICT
r14 #1): ``delete``/``delete_df`` default to committing an O(batch)
tombstone id-set file instead of rewriting the table; ``df()``
subtracts tombstones via the size-probed anti-join with seq ordering
(re-adds and upsert replacements outrank older tombstones);
``optimize()`` physically applies; ``vacuum`` tracks tombstone files.
The eager rewrite survives as the opt-in ``strategy="eager"`` and the
two strategies are parity-tested against each other."""

import json
import os

import pytest

from kowari_spark.catalog import CollectionManager
from kowari_spark.errors import MissingIdError
from kowari_spark.schema import vector_df, vector_row


@pytest.fixture()
def mgr(spark, tmp_path):
    return CollectionManager(spark, str(tmp_path / "warehouse"))


def _fill(spark, c, n=10, dim=4, prefix="v"):
    c.add_df(vector_df(spark, [
        vector_row([float(i)] + [0.0] * (dim - 1), {"i": i}, f"{prefix}{i}")
        for i in range(n)
    ]))


def _seg_dirs(c):
    data = os.path.join(c.path, "data")
    return sorted(d for d in os.listdir(data) if d.startswith("seg-"))


def _del_dirs(c):
    data = os.path.join(c.path, "data")
    return sorted(d for d in os.listdir(data) if d.startswith("del-"))


def test_tombstone_delete_writes_no_data_segment(mgr, spark):
    """The O(batch)-bytes contract: a tombstone delete_df of K ids
    leaves every data segment untouched (same seg-* dirs, same
    manifest segment names) and adds exactly one small del-* id-set
    file."""
    c = mgr.create_collection("mor", 4)
    _fill(spark, c, 20)
    segs_before = _seg_dirs(c)
    _, names_before = c.log.snapshot()

    ids = spark.createDataFrame([(f"v{i}",) for i in (2, 4, 6)], "id string")
    assert c.delete_df(ids) == 3

    assert _seg_dirs(c) == segs_before  # no data rewritten
    assert len(_del_dirs(c)) == 1
    v, names_after = c.log.snapshot()
    assert names_after == names_before  # manifest carries same segments
    _, _, tombs = c.log.snapshot_full()
    assert len(tombs) == 1 and tombs[0]["rows"] == 3
    assert tombs[0]["seq"] == v
    # the view subtracts
    assert c.count() == 17
    assert c.get("v2") is None and c.get("v3") is not None


def test_tombstone_vs_eager_parity(mgr, spark):
    """Same deletes via both strategies -> identical visible rows."""
    a = mgr.create_collection("par_a", 4)
    b = mgr.create_collection("par_b", 4)
    _fill(spark, a, 15)
    _fill(spark, b, 15)
    ids = spark.createDataFrame(
        [(f"v{i}",) for i in (0, 7, 14)], "id string"
    )
    assert a.delete_df(ids, strategy="tombstone") == 3
    assert b.delete_df(ids, strategy="eager") == 3
    rows_a = sorted(
        (r["id"], tuple(r["embedding"])) for r in a.df().collect()
    )
    rows_b = sorted(
        (r["id"], tuple(r["embedding"])) for r in b.df().collect()
    )
    assert rows_a == rows_b and len(rows_a) == 12
    # single-id delete parity too
    a.delete("v3")
    b.delete("v3", strategy="eager")
    assert sorted(r["id"] for r in a.df().collect()) == sorted(
        r["id"] for r in b.df().collect()
    )


def test_readd_after_tombstone_delete_survives(mgr, spark):
    """Seq ordering: a tombstone kills only rows OLDER than itself, so
    an id deleted and later re-added is visible with its new value."""
    c = mgr.create_collection("readd", 2)
    c.add([1.0, 0.0], id="a")
    c.delete("a")
    assert c.get("a") is None
    c.add([0.0, 9.0], id="a")  # strict re-add: id is free again
    row = c.get("a")
    assert row is not None and row["embedding"] == pytest.approx([0.0, 9.0])
    # and the tombstone still hides the ORIGINAL row at latest
    assert c.count() == 1


def test_upsert_is_merge_on_read(mgr, spark):
    """Upsert commits (tombstone of incoming ids + new segment) in ONE
    version — no table rewrite: prior segment dirs and manifest names
    survive verbatim, and replaced ids read back the new values."""
    c = mgr.create_collection("ups", 2, mode="upsert")
    _fill(spark, c, 8, dim=2)
    segs_before = _seg_dirs(c)
    _, names_before = c.log.snapshot()

    batch = vector_df(spark, [
        vector_row([9.0, 9.0], {"new": True}, "v3"),
        vector_row([8.0, 8.0], {"new": True}, "v99"),
    ])
    c.add_df(batch)
    # old segments untouched, one new segment, one tombstone file
    # (set inclusion, not prefix: segment uuids sort arbitrarily)
    assert set(segs_before) <= set(_seg_dirs(c))
    assert len(_seg_dirs(c)) == len(segs_before) + 1
    assert len(_del_dirs(c)) == 1
    v, names_after = c.log.snapshot()
    assert set(names_before) <= set(names_after)
    assert c.count() == 9
    assert c.get("v3")["embedding"] == pytest.approx([9.0, 9.0])
    assert json.loads(c.get("v3")["metadata"])["new"] is True
    # chained upserts keep resolving to the newest value
    c.add_df(vector_df(spark, [vector_row([7.0, 7.0], None, "v3")]))
    assert c.get("v3")["embedding"] == pytest.approx([7.0, 7.0])
    assert c.count() == 9


def test_optimize_applies_tombstones(mgr, spark):
    """optimize() is the physical APPLY: the new manifest holds one
    segment and no tombstones, and the visible rows are unchanged."""
    c = mgr.create_collection("opt", 4)
    _fill(spark, c, 12)
    c.delete_df(
        spark.createDataFrame([(f"v{i}",) for i in (1, 2)], "id string")
    )
    before = sorted(r["id"] for r in c.df().collect())
    c.optimize()
    _, segs, tombs = c.log.snapshot_full()
    assert len(segs) == 1 and tombs == []
    assert sorted(r["id"] for r in c.df().collect()) == before


def test_time_travel_across_tombstone_versions(mgr, spark):
    c = mgr.create_collection("tt", 2)
    c.add([1.0, 0.0], id="a")
    c.add([0.0, 1.0], id="b")
    v_pre = c.log.latest_version()
    c.delete("b")
    assert sorted(r["id"] for r in c.df().collect()) == ["a"]
    assert sorted(r["id"] for r in c.df(version=v_pre).collect()) == [
        "a", "b",
    ]
    ops = [v["op"] for v in c.versions()]
    assert ops[-1] == "delete"


def test_vacuum_tracks_tombstone_files(mgr, spark):
    """vacuum keeps tombstone files referenced by retained versions;
    after optimize (apply) + vacuum they are physically removed."""
    c = mgr.create_collection("vac", 4)
    _fill(spark, c, 6)
    c.delete_df(spark.createDataFrame([("v0",)], "id string"))
    assert len(_del_dirs(c)) == 1
    c.vacuum(keep_last=1)
    # latest version still references the tombstone -> kept, view intact
    assert len(_del_dirs(c)) == 1
    assert c.count() == 5
    c.optimize()
    c.vacuum(keep_last=1)
    assert _del_dirs(c) == []
    assert len(_seg_dirs(c)) == 1
    assert c.count() == 5


def test_delete_df_txn_idempotent_with_tombstones(mgr, spark):
    c = mgr.create_collection("txn", 4)
    _fill(spark, c, 5)
    ids = spark.createDataFrame([("v1",)], "id string")
    assert c.delete_df(ids, txn_id="t1") == 1
    nv = len(c.versions())
    assert c.delete_df(ids, txn_id="t1") == 0
    assert len(c.versions()) == nv
    assert len(_del_dirs(c)) == 1


def test_legacy_manifest_still_reads_and_deletes(mgr, spark):
    """A pre-round-15 manifest (segments as plain name strings, no
    tombstones key) opens fine, and a tombstone delete on top of it
    works: legacy segments normalize to the manifest's own version, so
    any NEW tombstone (strictly later seq) applies to them."""
    c = mgr.create_collection("legacy", 2)
    c.add([1.0, 0.0], id="a")
    c.add([0.0, 1.0], id="b")
    # rewrite the latest manifest into the legacy shape (through the
    # Hadoop-FS layer — a plain open() would orphan the .crc sidecar)
    from kowari_spark import fsutil

    v = c.log.latest_version()
    mpath = c.log._manifest_path(v)
    m = json.loads(fsutil.read_bytes(spark, mpath))
    m["segments"] = [e["name"] for e in m["segments"]]
    m.pop("tombstones", None)
    fsutil.write_bytes(spark, mpath, json.dumps(m).encode())

    c2 = mgr.get_collection("legacy")
    assert sorted(r["id"] for r in c2.df().collect()) == ["a", "b"]
    c2.delete("a")
    assert sorted(r["id"] for r in c2.df().collect()) == ["b"]


def test_strict_delete_df_missing_removes_nothing(mgr, spark):
    c = mgr.create_collection("strictmor", 4)
    _fill(spark, c, 4)
    bad = spark.createDataFrame([("v1",), ("ghost",)], "id string")
    with pytest.raises(MissingIdError, match="ghost"):
        c.delete_df(bad)
    assert c.count() == 4 and _del_dirs(c) == []


def test_search_over_tombstoned_view(mgr, spark):
    """The serving surface reads the MOR view: a deleted vector never
    surfaces from search even before optimize()."""
    c = mgr.create_collection("srch", 2)
    c.add([1.0, 0.0], id="hit")
    c.add([0.99, 0.01], id="near")
    c.add([0.0, 1.0], id="far")
    c.delete("near")
    got = [r["id"] for r in c.search([1.0, 0.0], k=3).collect()]
    assert got == ["hit", "far"]


def test_s3_log_warns_once(spark, monkeypatch):
    """Constructing a TransactionLog on an s3 scheme surfaces the
    documented concurrent-writer caveat as a RuntimeWarning (once per
    warehouse per process) instead of letting it be tripped silently."""
    import warnings

    import kowari_spark.catalog as cat
    from kowari_spark import fsutil

    monkeypatch.setattr(fsutil, "mkdirs", lambda spark, path: None)
    monkeypatch.setattr(cat, "_S3_WARNED", set())
    with pytest.warns(RuntimeWarning, match="copy\\+delete"):
        cat.TransactionLog(spark, "s3a://bucket/wh/coll")
    with warnings.catch_warnings():
        warnings.simplefilter("error")
        cat.TransactionLog(spark, "s3a://bucket/wh/coll")  # no re-warn
    # local paths never warn
    with warnings.catch_warnings():
        warnings.simplefilter("error")
        cat.TransactionLog(spark, "/tmp/notwarned_wh")


def test_restore_rolls_back_metadata_only(mgr, spark):
    """Collection.restore(v): the Delta RESTORE verb — re-publish an
    old version's segment+tombstone entries as a new commit. No data
    moves; deletes made after v are undone; restore-of-restore works;
    intermediate history stays readable."""
    c = mgr.create_collection("rst", 2)
    c.add([1.0, 0.0], id="a")
    c.add([0.0, 1.0], id="b")
    v_full = c.log.latest_version()
    c.delete("a")
    assert sorted(r["id"] for r in c.df().collect()) == ["b"]
    segs_before = _seg_dirs(c)

    c.restore(v_full)
    assert sorted(r["id"] for r in c.df().collect()) == ["a", "b"]
    assert _seg_dirs(c) == segs_before  # metadata-only
    assert [v["op"] for v in c.versions()][-1] == "restore"
    # the deleted state is still retrievable between the two
    v_del = v_full + 1
    assert sorted(r["id"] for r in c.df(version=v_del).collect()) == ["b"]
    # restore of the deleted state (restore-of-history incl. tombstones)
    c.restore(v_del)
    assert sorted(r["id"] for r in c.df().collect()) == ["b"]
