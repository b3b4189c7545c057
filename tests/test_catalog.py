"""Catalog / collection lifecycle tests.

Mirrors the reference suites (SURVEY.md §5.1):
- CRUD + error paths (tests/integration_tests.rs:101-138)
- dimension validation (vector_db/tests/sqlite_binary_tests.rs:234-254)
- persistence across manager instances (:256-288)
- nested metadata fidelity (vector_db/tests/local_storage_tests.rs:118-151)
- create/list/delete collections (sqlite_binary_tests.rs:170-187)
"""

import json

import pytest

from kowari_spark.catalog import CollectionManager
from kowari_spark.errors import (
    CollectionNotFoundError,
    DimensionMismatchError,
    DuplicateIdError,
    MissingIdError,
)
from kowari_spark.schema import vector_df, vector_row
from kowari_spark.sources import append_vectors, load_vectors, save_vectors


@pytest.fixture()
def mgr(spark, tmp_path):
    return CollectionManager(spark, str(tmp_path / "warehouse"))


def test_create_list_delete(mgr):
    mgr.create_collection("a", 4)
    mgr.create_collection("b", 8)
    assert mgr.list_collections() == ["a", "b"]
    mgr.delete_collection("a")
    assert mgr.list_collections() == ["b"]
    with pytest.raises(CollectionNotFoundError):
        mgr.get_collection("a")
    with pytest.raises(ValueError):
        mgr.create_collection("b", 8)


def test_add_get_count_delete(mgr):
    c = mgr.create_collection("vecs", 3)
    vid = c.add([1.0, 2.0, 3.0], {"label": "x"})
    assert c.count() == 1
    row = c.get(vid)
    assert row["embedding"] == pytest.approx([1.0, 2.0, 3.0])
    assert json.loads(row["metadata"])["label"] == "x"
    c.delete(vid)
    assert c.count() == 0
    assert c.get(vid) is None


def test_near_dups_uses_collection_dimension(mgr):
    """Collection.near_dups plumbs its known dimension into the LSH
    near-dup pipeline — the duplicate pair is found and no dimension
    inference is needed (the dim= path is job-count-tested in
    test_text_dedup)."""
    c = mgr.create_collection("dupes", 4)
    c.add([1.0, 0.0, 0.0, 0.0], id="a")
    c.add([1.0, 0.001, 0.0, 0.0], id="b")
    c.add([0.0, 0.0, 1.0, 0.0], id="far")
    pairs = c.near_dups(threshold=0.99, round_to=6).collect()
    assert [(r["id_a"], r["id_b"]) for r in pairs] == [("a", "b")]


def test_strict_duplicate_and_missing(mgr):
    c = mgr.create_collection("strictc", 3)
    c.add([1.0, 0.0, 0.0], id="v1")
    with pytest.raises(DuplicateIdError):
        c.add([0.0, 1.0, 0.0], id="v1")
    with pytest.raises(MissingIdError):
        c.delete("nope")
    assert c.count() == 1


def test_upsert_mode(mgr, spark):
    c = mgr.create_collection("ups", 3, mode="upsert")
    c.add([1.0, 0.0, 0.0], {"v": 1}, id="v1")
    c.add([0.0, 1.0, 0.0], {"v": 2}, id="v1")  # silently replaces
    assert c.count() == 1
    assert c.get("v1")["embedding"] == pytest.approx([0.0, 1.0, 0.0])
    c.delete("missing")  # ignored in upsert mode
    assert c.count() == 1


def test_dimension_validation(mgr):
    c = mgr.create_collection("dim64", 64)
    with pytest.raises(DimensionMismatchError):
        c.add([1.0, 2.0, 3.0])
    assert c.count() == 0


def test_persistence_across_instances(mgr, spark):
    c = mgr.create_collection("persist", 3)
    meta = {
        "user": {"id": 12345, "preferences": {"theme": "dark"}},
        "tags": ["test", "vector"],
    }
    c.add([0.1, 0.2, 0.3], meta, id="v1")
    # reopen through a fresh manager rooted at the same warehouse
    mgr2 = CollectionManager(spark, mgr.base_path)
    c2 = mgr2.get_collection("persist")
    assert c2.dimension == 3
    row = c2.get("v1")
    got = json.loads(row["metadata"])
    assert got["user"]["preferences"]["theme"] == "dark"
    assert got["tags"] == ["test", "vector"]
    assert c2.info()["vector_count"] == 1


def test_clear_and_optimize(mgr):
    c = mgr.create_collection("clr", 2)
    for i in range(5):
        c.add([float(i), 0.0], id=f"v{i}")
    c.optimize(target_partitions=1)
    assert c.count() == 5
    c.clear()
    assert c.count() == 0


def test_json_roundtrip(spark, tmp_path):
    rows = [
        vector_row([1.0, 2.0], {"a": 1}, id="x"),
        vector_row([3.0, 4.0], None, id="y"),
    ]
    df = vector_df(spark, rows)
    path = str(tmp_path / "snap.json")
    save_vectors(df, path)
    back = load_vectors(spark, path)
    got = {r["id"]: r for r in back.collect()}
    assert got["x"]["embedding"] == pytest.approx([1.0, 2.0])
    assert got["y"]["metadata"] is None
    append_vectors(vector_df(spark, [vector_row([5.0, 6.0], id="z")]), path)
    assert load_vectors(spark, path).count() == 3


def test_collection_search_api(spark, embeddings, tmp_path):
    from pyspark.sql import functions as F
    from kowari_spark.catalog import CollectionManager

    mgr = CollectionManager(spark, str(tmp_path / "wh"))
    coll = mgr.create_collection("searchable", dimension=64, mode="upsert")
    coll.add_df(
        embeddings.limit(60).select(
            F.col("vec_id").cast("string").alias("id"),
            "embedding",
            F.to_json(F.struct("label")).alias("metadata"),
        )
    )
    q = [float(x) for x in coll.get("5")["embedding"]]
    scored = coll.search_with_scores(q, 3, round_to=6).collect()
    assert scored[0]["id"] == "5" and scored[0]["score"] == 1.0
    assert set(scored[0].asDict()) == {"id", "embedding", "metadata", "score"}
    plain = coll.search(q, 3).collect()
    assert [r["id"] for r in plain][0] == "5"
    assert "score" not in plain[0].asDict()


# -- versioned storage (TransactionLog) -------------------------------------

def _mk(mgr_factory, spark, tmp_path, name, mode="upsert"):
    from kowari_spark.catalog import CollectionManager

    mgr = CollectionManager(spark, str(tmp_path / "wh"))
    return mgr, mgr.create_collection(name, dimension=2, mode=mode)


def test_versions_and_time_travel(spark, tmp_path):
    from kowari_spark.catalog import CollectionManager

    mgr = CollectionManager(spark, str(tmp_path / "wh"))
    c = mgr.create_collection("tt", dimension=2, mode="upsert")
    c.add([1.0, 0.0], id="a")
    c.add([0.0, 1.0], id="b")
    c.delete("a")
    ops = [v["op"] for v in c.versions()]
    assert ops == ["append", "upsert", "delete"]
    # latest sees the delete; version 2 still has both rows
    assert sorted(r["id"] for r in c.df().collect()) == ["b"]
    assert sorted(r["id"] for r in c.df(version=2).collect()) == ["a", "b"]


def test_snapshot_isolation_under_concurrent_commit(spark, tmp_path):
    from kowari_spark.catalog import CollectionManager

    mgr = CollectionManager(spark, str(tmp_path / "wh"))
    c = mgr.create_collection("iso", dimension=2, mode="upsert")
    c.add([1.0, 0.0], id="a")
    snap = c.df()  # resolves the manifest NOW
    c.delete("a")  # new version
    # the pinned snapshot still reads the immutable old segment
    assert [r["id"] for r in snap.collect()] == ["a"]
    assert c.df().count() == 0


def test_commit_conflict_on_rewrite(spark, tmp_path):
    import pytest
    from kowari_spark.catalog import CollectionManager
    from kowari_spark.errors import CommitConflictError

    mgr = CollectionManager(spark, str(tmp_path / "wh"))
    c = mgr.create_collection("cc", dimension=2, mode="upsert")
    c.add([1.0, 0.0], id="a")
    version, segments = c.log.snapshot()
    # another writer steals the next version slot
    c.log.commit(version, segments, "optimize")
    with pytest.raises(CommitConflictError):
        c._commit_rewrite(c.df(version), "delete", base_version=version)


def test_strict_append_retries_past_conflict(spark, tmp_path):
    """A strict append that loses the version race must re-validate and
    retry, not fail: simulate by pre-committing a competing version."""
    from kowari_spark.catalog import CollectionManager, TransactionLog

    mgr = CollectionManager(spark, str(tmp_path / "wh"))
    c = mgr.create_collection("ra", dimension=2, mode="strict")
    c.add([1.0, 0.0], id="a")
    orig_commit = TransactionLog.commit
    stolen = {"done": False}

    def racing_commit(self, base_version, segments, op, txn=None,
                      tombstones=None):
        if not stolen["done"] and op == "append" and base_version >= 1:
            stolen["done"] = True
            # competitor publishes its own (unrelated) version first
            orig_commit(self, base_version, segments[:-1], "steal")
        return orig_commit(self, base_version, segments, op, txn=txn,
                           tombstones=tombstones)

    TransactionLog.commit = racing_commit
    try:
        c.add([0.0, 1.0], id="b")
    finally:
        TransactionLog.commit = orig_commit
    assert sorted(r["id"] for r in c.df().collect()) == ["a", "b"]


def test_vacuum_drops_old_segments_keeps_latest(spark, tmp_path):
    import os
    from kowari_spark.catalog import CollectionManager

    mgr = CollectionManager(spark, str(tmp_path / "wh"))
    c = mgr.create_collection("vac", dimension=2, mode="upsert")
    c.add([1.0, 0.0], id="a")
    c.add([0.0, 1.0], id="b")
    c.optimize(target_partitions=1)
    data = os.path.join(c.path, "data")
    # segments AND tombstone id-set files are vacuum-managed (round 15)
    before = {d for d in os.listdir(data)
              if d.startswith(("seg-", "del-"))}
    removed = c.vacuum(keep_last=1)
    after = {d for d in os.listdir(data)
             if d.startswith(("seg-", "del-"))}
    assert removed == len(before) - len(after) and len(after) == 1
    assert sorted(r["id"] for r in c.df().collect()) == ["a", "b"]
    assert [v["op"] for v in c.versions()] == ["optimize"]


def test_legacy_layout_migrates_in_place(spark, tmp_path):
    """A pre-versioning collection (loose part files under data/) must
    open as version 1 with identical contents."""
    import json as _json
    import os
    import time as _time
    from kowari_spark.catalog import Collection
    from kowari_spark.schema import VECTOR_SCHEMA, vector_row

    path = str(tmp_path / "wh" / "legacy")
    os.makedirs(path)
    now = int(_time.time())
    meta = {"name": "legacy", "dimension": 2, "mode": "upsert",
            "created_at": now, "updated_at": now}
    with open(os.path.join(path, "_meta.json"), "w") as f:
        _json.dump(meta, f)
    spark.createDataFrame(
        [vector_row([1.0, 0.0], None, "a")], VECTOR_SCHEMA
    ).write.parquet(os.path.join(path, "data"))

    c = Collection(spark, path, meta)
    assert [r["id"] for r in c.df().collect()] == ["a"]
    assert [v["op"] for v in c.versions()] == ["migrate"]
    c.add([0.0, 1.0], id="b")
    assert sorted(r["id"] for r in c.df().collect()) == ["a", "b"]


def test_txn_id_makes_append_idempotent(spark, tmp_path):
    """A replayed micro-batch (same txn token) must commit exactly once,
    in both strict and upsert modes."""
    from kowari_spark.catalog import CollectionManager
    from kowari_spark.schema import VECTOR_SCHEMA, vector_row

    mgr = CollectionManager(spark, str(tmp_path / "wh"))
    for mode in ("strict", "upsert"):
        c = mgr.create_collection(f"txn_{mode}", dimension=2, mode=mode)
        batch = spark.createDataFrame(
            [vector_row([1.0, 0.0], None, "a"), vector_row([0.0, 1.0], None, "b")],
            VECTOR_SCHEMA,
        )
        c.add_df(batch, txn_id="ckpt:0")
        c.add_df(batch, txn_id="ckpt:0")  # replay -> no-op (even strict!)
        assert c.count() == 2, mode
        assert len([v for v in c.versions() if v.get("txn") == "ckpt:0"]) == 1
        # a NEW batch id still commits
        batch2 = spark.createDataFrame(
            [vector_row([0.5, 0.5], None, "c")], VECTOR_SCHEMA
        )
        c.add_df(batch2, txn_id="ckpt:1")
        assert c.count() == 3, mode


def test_collection_semantic_dedup(mgr):
    """Collection.semantic_dedup: clustered near-identical vectors
    collapse to the lexicographic-min representative."""
    from kowari_spark.operators.ivf import IVF

    c = mgr.create_collection("semdup", 4)
    c.add([1.0, 0.0, 0.0, 0.0], id="a")
    c.add([1.0, 0.001, 0.0, 0.0], id="b")
    c.add([0.0, 0.0, 1.0, 0.0], id="far")
    out = {
        r["id"]: r
        for r in c.semantic_dedup(
            threshold=0.99, ivf=IVF(n_lists=2, round_centroids=6)
        ).collect()
    }
    assert out["a"]["is_kept"] and out["b"]["rep_id"] == "a"
    assert not out["b"]["is_kept"] and out["far"]["is_kept"]


def test_collection_signature_layout_crawl_loop(mgr, spark):
    """Collection.signature_layout wires the facade to the catalog:
    build-or-open under the collection dir, probe/filter a new batch,
    append alongside add_df; mismatched params refuse on reopen."""
    from kowari_spark.schema import vector_df

    c = mgr.create_collection("crawl", 4)
    c.add([1.0, 0.0, 0.0, 0.0], id="a")
    c.add([0.0, 0.0, 1.0, 0.0], id="far")

    lay = c.signature_layout()
    assert lay.kind == "embedding" and lay.meta["id_col"] == "id"
    batch = vector_df(
        spark,
        [("dup_a", [1.0, 0.001, 0.0, 0.0], None),
         ("new_1", [0.0, 1.0, 0.0, 0.0], None)],
    )
    dups = lay.dedup_against(batch, threshold=0.99, round_to=6).collect()
    assert {(r["new_id"], r["hist_id"]) for r in dups} == {("dup_a", "a")}
    fresh = lay.filter_new(batch, threshold=0.99)
    assert {r["id"] for r in fresh.collect()} == {"new_1"}
    # the five-line crawl loop: keep fresh rows, grow both relations
    c.add_df(fresh)
    lay.append(fresh)
    assert c.count() == 3
    again = lay.dedup_against(batch, threshold=0.99, round_to=6)
    assert {(r["new_id"], r["hist_id"]) for r in again.collect()} == {
        ("dup_a", "a"), ("new_1", "new_1"),
    }
    # a second open reuses the stored layout; changed params refuse
    assert c.signature_layout().kind == "embedding"
    with pytest.raises(ValueError, match="probe wrong buckets"):
        c.signature_layout(num_planes=4)
    # rebuild under new params replaces the layout
    assert c.signature_layout(num_planes=4, rebuild=True).meta[
        "num_planes"
    ] == 4


def test_collection_dsir_layout_fit_score_append_unlearn(mgr, spark):
    """Collection.dsir_layout wires the DSIR facade to the catalog
    (VERDICT r12 #6): fit over metadata text vs a target corpus, score
    and top a crawl batch through the handle, roll the batch in
    (append), exactly unlearn it (remove) — scores return bit-identical
    to the pre-append model. Reopen validates the sidecar; first build
    requires target and a non-empty collection."""
    c = mgr.create_collection("dsir", 4)
    texts = {
        "a1": "lazy dog sleeps here", "a2": "lazy dog sleeps again",
        "a3": "dog sleeps lazy here", "b1": "entirely different words",
    }
    for i, vid in enumerate(sorted(texts)):
        c.add([1.0, float(i), 0.0, 0.0], {"text": texts[vid]}, id=vid)

    target = spark.createDataFrame(
        [("quick brown fox runs",), ("brown fox quick again",)],
        "text string",
    )
    lay = c.dsir_layout(target=target, buckets=256)
    assert lay.meta["text_col"] == "text"
    assert lay.meta["buckets"] == 256

    # doc 1 carries target-only tokens (rare in raw, common in target:
    # high importance ratio); doc 2 carries raw-common tokens (low)
    batch = spark.createDataFrame(
        [(1, "quick brown fox story"), (2, "lazy dog sleeps here")],
        "doc_id long, text string",
    )
    before = sorted(map(tuple, lay.score(batch).collect()))
    assert len(before) == 2
    # the target-like doc outranks the raw-like one; top(1) picks it
    w = {r["doc_id"]: r["dsir_logw"] for r in lay.score(batch).collect()}
    assert w[1] > w[2]
    assert [r["doc_id"] for r in lay.top(batch, 1).collect()] == [1]

    # append then exact unlearn: the model returns bit-identical
    lay.append(batch)
    after_append = sorted(map(tuple, lay.score(batch).collect()))
    assert after_append != before  # the roll really changed the model
    lay.remove(batch)
    assert sorted(map(tuple, lay.score(batch).collect())) == before

    # reopen: same params reuse the stored fit (target ignored);
    # diverged params refuse via the sidecar
    assert c.dsir_layout(buckets=256).meta["buckets"] == 256
    with pytest.raises(ValueError, match="diverged featurization"):
        c.dsir_layout(buckets=512)
    # rebuild needs target again
    with pytest.raises(ValueError, match="needs target"):
        c.dsir_layout(buckets=256, rebuild=True)
    # target missing the text column refuses
    with pytest.raises(ValueError, match="text.*column"):
        c.dsir_layout(
            target=target.withColumnRenamed("text", "body"),
            buckets=256, rebuild=True,
        )

    # empty collection refuses the first fit
    c2 = mgr.create_collection("dsir_empty", 4)
    with pytest.raises(ValueError, match="no records"):
        c2.dsir_layout(target=target)


def test_collection_bm25_layout_lifecycle(mgr, spark):
    """Collection.bm25_layout wires keyword serving to the catalog
    (round 13, the signature_layout/dsir_layout precedent): build over
    metadata text, search/search_batch through the handle, append a
    crawl batch, tombstone-delete + apply — scores track a from-scratch
    view of the surviving corpus throughout. Reopen validates the
    sidecar; empty collections refuse."""
    from kowari_spark.operators.search import bm25_search

    c = mgr.create_collection("kw", 4)
    texts = {
        "a1": "vector hash join batch", "a2": "vector hash probe",
        "a3": "lazy dog sleeps here", "b1": "entirely different words",
        "b2": "hash join again",
    }
    for i, vid in enumerate(sorted(texts)):
        c.add([1.0, float(i), 0.0, 0.0], {"text": texts[vid]}, id=vid)
    c.add([0.0, 1.0, 0.0, 0.0], None, id="nometa")  # NULL metadata

    lay = c.bm25_layout()
    assert lay.meta["text_col"] == "text" and lay.meta["id_col"] == "id"
    st = lay.stats()
    assert st["n_docs"] == 6  # nometa indexes as '' but counts

    # handle search == scan-path bm25 over the same projected corpus
    corpus = spark.createDataFrame(
        [(k, v) for k, v in texts.items()] + [("nometa", "")],
        "id string, text string",
    )
    q = "hash join"
    want = [tuple(r) for r in bm25_search(corpus, q, id_col="id").collect()]
    assert [tuple(r) for r in lay.search(q).collect()] == want
    got_b = lay.search_batch({"q1": q, "q2": "vector"}).collect()
    assert {r["query_id"] for r in got_b} == {"q1", "q2"}

    # crawl append then tombstone delete + apply: scores track a
    # from-scratch view of the survivors at every step
    extra = spark.createDataFrame(
        [("c1", "hash join everywhere")], "id string, text string"
    )
    lay.append(extra)
    assert lay.stats()["n_docs"] == 7
    lay.delete(extra)  # id-only frame -> postings-derived dl
    assert lay.stats()["n_docs"] == 6
    assert [tuple(r) for r in lay.search(q).collect()] == want
    assert lay.apply_deletes() is True
    assert [tuple(r) for r in lay.search(q).collect()] == want

    # reopen: stored geometry accepted under 'auto'; mismatches refuse
    assert c.bm25_layout().meta["buckets"] == lay.meta["buckets"]
    with pytest.raises(ValueError, match="diverged tokenization"):
        c.bm25_layout(key="body")
    with pytest.raises(ValueError, match="buckets="):
        c.bm25_layout(buckets=lay.meta["buckets"] + 1)

    c2 = mgr.create_collection("kw_empty", 4)
    with pytest.raises(ValueError, match="no records"):
        c2.bm25_layout()

    # hybrid serving from the collection's two stored layouts: equal
    # to hand-composing hybrid_search_indexed over the same paths
    import os as _os

    from kowari_spark.operators.search import hybrid_search_indexed

    qvec = [1.0, 0.0, 0.0, 0.0]
    got = [tuple(r) for r in c.hybrid_search(q, qvec, k=3).collect()]
    want_h = [tuple(r) for r in hybrid_search_indexed(
        spark,
        _os.path.join(c.path, "indexes", "bm25"),
        _os.path.join(c.path, "indexes", "lsh"),
        q, qvec, k=3,
    ).collect()]
    assert got == want_h and len(got) > 0
    assert {r[0] for r in got} <= set(texts) | {"nometa"}


def test_collection_curation_surface(mgr, spark):
    """The r11 corpus-curation ops wired onto the Collection (VERDICT
    r11 missing #5): semantic_decontaminate over stored vectors,
    cluster_cap topic balancing, source_cap / surprisal_buckets over
    metadata JSON fields."""
    import json as _json

    c = mgr.create_collection("cur", 4)
    texts = {
        "a1": "the quick brown fox", "a2": "the quick brown fox jumps",
        "a3": "lazy dog sleeps here", "a4": "quick brown dog",
        "b1": "entirely different words", "b2": "other tokens again",
    }
    vecs = {
        "a1": [1.0, 0.0, 0.0, 0.0], "a2": [1.0, 0.1, 0.0, 0.0],
        "a3": [0.9, 0.2, 0.0, 0.0], "a4": [1.0, 0.05, 0.0, 0.0],
        "b1": [0.0, 0.0, 1.0, 0.0], "b2": [0.0, 0.0, 1.0, 0.1],
    }
    for vid in sorted(texts):
        c.add(
            vecs[vid],
            {"source": vid[0], "text": texts[vid], "lang": "en"},
            id=vid,
        )
    c.add([0.0, 1.0, 0.0, 0.0], None, id="nometa")  # NULL metadata

    # semantic_decontaminate: eval vector == a1's direction -> the
    # aligned family flags, the orthogonal one doesn't
    ev = spark.createDataFrame(
        [([1.0, 0.0, 0.0, 0.0],)], "embedding array<double>"
    )
    rows = {r["id"]: r["is_contaminated"]
            for r in c.semantic_decontaminate(ev, 0.95).collect()}
    assert rows["a1"] and rows["a4"]
    assert not rows["b1"] and not rows["b2"] and not rows["nometa"]

    # cluster_cap: 2 cells, cap 2 -> each cell keeps <= 2, most-central
    out = c.cluster_cap(2, n_lists=2).collect()
    per = {}
    for r in out:
        per.setdefault(r["list_id"], set()).add(r["id"])
    assert all(len(v) <= 2 for v in per.values())
    assert {"list_id", "dist"} <= set(out[0].asDict())

    # source_cap on the metadata JSON "source" key: a has 4 records,
    # cap 2 keeps the id-ascending first two; NULL metadata is its own
    # group (same semantics as the library op)
    kept = sorted(r["id"] for r in c.source_cap(2, "source").collect())
    assert kept == ["a1", "a2", "b1", "b2", "nometa"]
    assert "metadata" in c.source_cap(2, "source").columns

    # surprisal_buckets reads text from metadata; the no-text record
    # has no bucket row; every named bucket non-empty on 6 docs
    sb = c.surprisal_buckets("text").collect()
    assert {r["id"] for r in sb} == set(texts)
    assert {r["bucket"] for r in sb} == {"head", "middle", "tail"}
    # stratified: one stratum (lang=en) still buckets everything
    sb2 = c.surprisal_buckets("text", strata_key="lang").collect()
    assert {r["id"] for r in sb2} == set(texts)
    assert {r["stratum"] for r in sb2} == {"en"}


def test_catalog_on_hadoop_fs_uri(spark, tmp_path):
    """Round 14 (VERDICT r13 missing #3): the catalog — manager,
    transaction log, collection CRUD, vacuum, layout facades' exists
    checks — runs entirely through fsutil's Hadoop FileSystem layer,
    so a scheme-qualified warehouse URI works end-to-end. `file://`
    is the URI scheme local boxes have; the same code path serves
    hdfs:// and abfs:// (s3a:// single-writer; concurrent-writer
    caveat documented on TransactionLog). Every os.path/open/shutil
    call in the old catalog would crash on this path."""
    from pyspark.sql import functions as F

    base = f"file://{tmp_path}/wh_uri"
    mgr = CollectionManager(spark, base)
    c = mgr.create_collection("uri_coll", dimension=4)
    with pytest.raises(ValueError, match="already exists"):
        mgr.create_collection("uri_coll", dimension=4)
    assert mgr.list_collections() == ["uri_coll"]

    c.add_df(vector_df(spark, [
        vector_row([1.0, 0.0, 0.0, 0.0], {"k": 1}, "a"),
        vector_row([0.0, 1.0, 0.0, 0.0], {"k": 2}, "b"),
    ]))
    assert c.count() == 2
    assert c.get("a")["id"] == "a"
    with pytest.raises(DuplicateIdError):
        c.add_df(vector_df(spark, [vector_row([9.0] * 4, None, "a")]))

    c.delete("b")
    assert c.count() == 1
    # versioned manifests live under the URI; time travel still works
    assert [v["op"] for v in c.versions()] == ["append", "delete"]
    assert c.df(version=1).count() == 2

    # reopen via a FRESH manager instance (cross-instance read of the
    # URI-resident _meta.json + manifests)
    again = CollectionManager(spark, base).get_collection("uri_coll")
    assert again.dimension == 4 and again.count() == 1

    # vacuum physically deletes through the Hadoop FS. The delete was
    # a merge-on-read tombstone (round 15): the latest version still
    # references the original segment AND the id-set file, so nothing
    # is removable until optimize() physically applies
    assert again.vacuum(keep_last=1) == 0
    assert again.count() == 1
    with pytest.raises(FileNotFoundError):
        again.df(version=1).count()
    again.optimize()
    # now the pre-apply segment and the tombstone file both retire
    assert again.vacuum(keep_last=1) == 2
    assert again.count() == 1

    mgr.delete_collection("uri_coll")
    with pytest.raises(CollectionNotFoundError):
        mgr.get_collection("uri_coll")


def test_collection_signature_layout_multi_table_geometry(mgr, spark):
    """Round 14 (VERDICT r13 missing #2): the Collection serving
    surface accepts any probing family. Built as MultiSignLSH (the
    OR-construction recall config), (1) a bare reopen follows the
    stored geometry instead of refusing, (2) hybrid_search serves
    THROUGH the multi-table layout and equals hand-composed
    hybrid_search_indexed over the same paths, (3) a mismatched
    explicit geometry refuses, (4) a wrong-dim index refuses."""
    import json as _json

    from kowari_spark.operators.lsh import MultiSignLSH, SignLSH
    from kowari_spark.operators.search import hybrid_search_indexed
    from kowari_spark.schema import vector_df, vector_row

    dim = 8
    c = mgr.create_collection("multigeo", dim)
    rows = []
    for i in range(40):
        v = [0.0] * dim
        v[i % dim] = 1.0
        v[(i + 1) % dim] = 0.3 + (i % 5) * 0.1
        rows.append(vector_row(
            v, {"text": f"document {i} spark vector engine term{i % 7}"},
            f"d{i}",
        ))
    c.add_df(vector_df(spark, rows))

    ms = MultiSignLSH(dim=dim, num_planes=4, num_tables=3, seed=11)
    lay = c.signature_layout(index=ms)
    assert lay.kind == "embedding"
    assert lay.meta["family"] == "multisign"
    assert lay.meta["num_tables"] == 3

    # bare reopen follows the stored multi-table config
    again = c.signature_layout()
    assert again.meta["family"] == "multisign"

    # facade probe works over the stored OR-construction
    probe = vector_df(
        spark, [vector_row([1.0, 0.3, 0.0, 0.0, 0.0, 0.0, 0.0, 0.0],
                           None, "q0")]
    )
    hits = lay.dedup_against(probe, threshold=0.9, round_to=6).collect()
    assert any(r["hist_id"] == "d0" for r in hits)

    # hybrid served from the collection == hand-composed over paths
    qvec = [1.0, 0.3, 0.0, 0.0, 0.0, 0.0, 0.0, 0.0]
    got = [tuple(r) for r in
           c.hybrid_search("spark term0", qvec, k=5).collect()]
    bm = c.bm25_layout()
    want = [tuple(r) for r in hybrid_search_indexed(
        spark, bm.path, lay.path, "spark term0", qvec, k=5,
    ).collect()]
    assert got == want and got

    # explicit mismatched geometry refuses with the rebuild hint
    with pytest.raises(ValueError, match="probe wrong buckets"):
        c.signature_layout(index=SignLSH(dim=dim, num_planes=4, seed=11))
    with pytest.raises(ValueError, match="probe wrong buckets"):
        c.signature_layout(
            index=MultiSignLSH(dim=dim, num_planes=4, num_tables=2,
                               seed=11))
    # both-args misuse and wrong-dim index refuse
    with pytest.raises(ValueError, match="not both"):
        c.signature_layout(num_planes=4, index=ms)
    from kowari_spark.errors import DimensionMismatchError
    with pytest.raises(DimensionMismatchError):
        c.signature_layout(index=MultiSignLSH(
            dim=dim * 2, num_planes=4, num_tables=3, seed=11))


def test_collection_hybrid_batch_and_cp_geometry(mgr, spark):
    """Round 14 additions to the serving surface: (1)
    Collection.hybrid_search_batch == per-query hybrid_search over the
    same stored layouts (the module parity contract, through the
    facade); (2) CrossPolytopeLSH is accepted as the stored geometry
    (the third probing family) and bare reopen follows it."""
    from kowari_spark.operators.cplsh import CrossPolytopeLSH
    from kowari_spark.schema import vector_df, vector_row

    dim = 8
    c = mgr.create_collection("hybatch", dim)
    rows = []
    for i in range(30):
        v = [0.0] * dim
        v[i % dim] = 1.0
        v[(i + 2) % dim] = 0.4
        rows.append(vector_row(
            v, {"text": f"doc {i} spark hybrid serving term{i % 5}"},
            f"d{i}",
        ))
    c.add_df(vector_df(spark, rows))

    cp = CrossPolytopeLSH(dim=dim, num_tables=3, seed=5)
    lay = c.signature_layout(index=cp)
    assert lay.kind == "embedding"
    assert c.signature_layout().meta["num_tables"] == 3  # bare reopen

    q1 = [1.0, 0.0, 0.4, 0.0, 0.0, 0.0, 0.0, 0.0]
    q2 = [0.0, 1.0, 0.0, 0.4, 0.0, 0.0, 0.0, 0.0]
    qtexts = {0: "spark term0", 1: "hybrid term1"}
    qvecs = spark.createDataFrame(
        [(0, q1), (1, q2)], "query_id long, embedding array<double>"
    )
    batch = c.hybrid_search_batch(qtexts, qvecs, k=4).collect()
    for qid, qtext, qvec in ((0, "spark term0", q1), (1, "hybrid term1", q2)):
        single = [tuple(r) for r in c.hybrid_search(qtext, qvec, k=4).collect()]
        got = [tuple(r)[1:] for r in batch if r["query_id"] == qid]
        assert got == single, qid


def test_collection_delete_df_batch(mgr, spark):
    """Collection.delete_df (round 14): N ids -> ONE rewrite + ONE
    version (vs N versions via per-id delete); strict raises on any
    absent id and removes NOTHING (batch-atomic); upsert ignores
    absences; txn_id makes a replay a no-op; empty-match returns 0."""
    from kowari_spark.schema import vector_df, vector_row

    c = mgr.create_collection("batchdel", 4)
    c.add_df(vector_df(spark, [
        vector_row([float(i), 0.0, 0.0, 0.0], None, f"v{i}") for i in range(10)
    ]))
    v0 = len(c.versions())

    ids = spark.createDataFrame([(f"v{i}",) for i in (1, 3, 5)], "id string")
    assert c.delete_df(ids, txn_id="batch-1") == 3
    assert c.count() == 7
    assert len(c.versions()) == v0 + 1  # ONE version for the batch
    assert c.get("v1") is None and c.get("v2") is not None
    # replay: token makes it a no-op (no version burned)
    assert c.delete_df(ids, txn_id="batch-1") == 0
    assert len(c.versions()) == v0 + 1

    # strict: any absent id -> raises, nothing removed
    bad = spark.createDataFrame([("v2",), ("nope",)], "id string")
    with pytest.raises(MissingIdError, match="nope"):
        c.delete_df(bad)
    assert c.count() == 7
    # upsert mode: absences ignored, present ids removed
    assert c.delete_df(bad, mode="upsert") == 1
    assert c.count() == 6 and c.get("v2") is None
    # nothing matched -> 0, no version
    nv = len(c.versions())
    assert c.delete_df(
        spark.createDataFrame([("ghost",)], "id string"), mode="upsert"
    ) == 0
    assert len(c.versions()) == nv


def test_collection_temperature_sample(mgr, spark):
    """Collection.temperature_sample rebalances by a metadata field:
    alpha=0 exact levels every group to the smallest's count; alpha=1
    keeps everything; survivors carry the collection's own columns."""
    from kowari_spark.schema import vector_df, vector_row

    c = mgr.create_collection("tempsamp", 4)
    rows = [vector_row([float(i), 0.0, 0.0, 0.0],
                       {"lang": "en" if i < 40 else "de"}, f"v{i}")
            for i in range(50)]
    c.add_df(vector_df(spark, rows))
    assert c.temperature_sample(1.0).count() == 50
    lev = c.temperature_sample(0.0, mode="exact")
    assert lev.count() == 20 and set(lev.columns) == {
        "id", "embedding", "metadata"}


def test_signature_layout_default_and_bare_rebuild_geometry(mgr, spark):
    """Round 15: (1) a FIRST bare signature_layout() builds the
    measured-good serving default — MultiSignLSH(4 planes, 12 tables)
    — not the low-recall single-table config (VERDICT r14 #3);
    (2) rebuild=True with NO geometry args rebuilds UNDER THE STORED
    geometry instead of silently downgrading to the default
    (ADVICE r14)."""
    from kowari_spark.operators.lsh import SignLSH
    from kowari_spark.schema import vector_df, vector_row

    c = mgr.create_collection("defgeo", 4)
    c.add_df(vector_df(spark, [
        vector_row([float(i % 3), 1.0, 0.0, 0.0], None, f"v{i}")
        for i in range(12)
    ]))
    lay = c.signature_layout()
    assert lay.meta["family"] == "multisign"
    assert lay.meta["num_planes"] == 4 and lay.meta["num_tables"] == 12

    # a tuned explicit geometry, then a BARE rebuild: geometry sticks
    c.signature_layout(index=SignLSH(dim=4, num_planes=6, seed=7),
                       rebuild=True)
    relay = c.signature_layout(rebuild=True)
    assert relay.meta["family"] == "sign"
    assert relay.meta["num_planes"] == 6 and relay.meta["seed"] == 7


def test_collection_bm25_layout_sharded(mgr, spark):
    """Round 15: Collection.bm25_layout(shards=N) lays the postings
    down sharded; the returned facade serves it transparently and
    scores match the single-layout build over the same collection;
    reopening ignores shards (stored geometry wins); rebuild
    transitions single <-> sharded cleanly."""
    from kowari_spark.schema import vector_df, vector_row

    c = mgr.create_collection("bmsh", 4)
    rows = [
        vector_row(
            [float(i % 5), 1.0, 0.0, 0.0],
            {"text": f"spark vector engine doc {i} term{i % 7}"},
            f"d{i}",
        )
        for i in range(30)
    ]
    c.add_df(vector_df(spark, rows))

    single = c.bm25_layout()
    want = [tuple(r) for r in single.search("spark term0", k=5).collect()]
    assert not single.meta.get("sharded")

    sharded = c.bm25_layout(shards=3, rebuild=True)
    assert sharded.meta.get("sharded") and sharded.meta["shards"] == 3
    got = [tuple(r) for r in sharded.search("spark term0", k=5).collect()]
    assert got == want and got

    # reopen without shards: the stored sharded geometry wins
    again = c.bm25_layout()
    assert again.meta.get("sharded")
    # facade growth verb works on the collection surface
    assert again.reshard() == 6
    assert [tuple(r) for r in again.search("spark term0", k=5).collect()] \
        == want
    # rebuild back to a single layout
    back = c.bm25_layout(rebuild=True)
    assert not back.meta.get("sharded")
    assert [tuple(r) for r in back.search("spark term0", k=5).collect()] \
        == want
