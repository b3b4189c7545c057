"""Persisted text-dedup signature layouts (operators/dedup_index.py):
build / load provenance, batch-vs-incremental identity, the keep
filter, append, and the streaming sink."""

import pytest
from pyspark.sql import functions as F

from kowari_spark.operators.dedup import minhash_band_pairs, minhash_bands
from kowari_spark.operators.dedup_index import (
    append_minhash_layout,
    build_minhash_layout,
    dedup_against,
    filter_new_against,
    load_minhash_layout,
)


@pytest.fixture(scope="module")
def docs(spark, sf_dir):
    return spark.read.parquet(f"{sf_dir}/documents.parquet").cache()


@pytest.fixture(scope="module")
def halves(docs):
    hist = docs.filter(F.col("doc_id") % 2 == 0).cache()
    new = docs.filter(F.col("doc_id") % 2 == 1).cache()
    return hist, new


def _cross_pairs(hist, new, pairs_df):
    """Batch-mode ground truth: minhash_band_pairs over hist ∪ new,
    restricted to one-hist-one-new pairs, normalized to (new, hist)."""
    hist_ids = {r["doc_id"] for r in hist.select("doc_id").collect()}
    out = set()
    for r in pairs_df.collect():
        a, b = r["id_a"], r["id_b"]
        if (a in hist_ids) != (b in hist_ids):
            out.add((b, a) if a in hist_ids else (a, b))
    return out


def test_incremental_matches_batch_join(spark, halves, tmp_path):
    """dedup_against(mode="pairs") over the stored layout == the
    cross-half slice of the full batch band join — fingerprinting
    history ONCE loses nothing (the md5 determinism argument)."""
    hist, new = halves
    path = str(tmp_path / "sig")
    build_minhash_layout(hist, path)

    inc = {
        (r["new_id"], r["hist_id"])
        for r in dedup_against(spark, path, new, mode="pairs").collect()
    }
    full = minhash_band_pairs(hist.unionByName(new), edges="pairs")
    assert inc == _cross_pairs(hist, new, full)

    # reps mode: same matched new ids, one representative per bucket
    reps = dedup_against(spark, path, new, mode="reps")
    assert {r["new_id"] for r in reps.collect()} == {a for a, _ in inc}
    hist_ids = {r["doc_id"] for r in hist.select("doc_id").collect()}
    assert {r["hist_id"] for r in reps.collect()} <= hist_ids

    with pytest.raises(ValueError, match="mode must be"):
        dedup_against(spark, path, new, mode="all")


def test_filter_new_against_keep_semantics(spark, halves, tmp_path):
    """filter_new_against drops exactly the colliding new docs and the
    shuffle fallback (broadcast_keys_max=0) changes nothing."""
    hist, new = halves
    path = str(tmp_path / "sig")
    build_minhash_layout(hist, path)
    matched = {
        r["new_id"] for r in dedup_against(spark, path, new).collect()
    }
    kept = filter_new_against(spark, path, new)
    kept_ids = {r["doc_id"] for r in kept.select("doc_id").collect()}
    new_ids = {r["doc_id"] for r in new.select("doc_id").collect()}
    assert kept_ids == new_ids - matched
    assert kept.columns == new.columns
    shuffled = filter_new_against(
        spark, path, new, broadcast_keys_max=0
    )
    assert {r["doc_id"] for r in shuffled.select("doc_id").collect()} == kept_ids


def test_layout_provenance_and_params(spark, halves, tmp_path):
    """Sidecar round-trip: load refuses missing/foreign versions; the
    probe fingerprints the batch under the LAYOUT's params even when
    they differ from the library defaults."""
    import json

    from kowari_spark.fsutil import read_bytes, write_bytes

    hist, new = halves
    path = str(tmp_path / "sig_params")
    build_minhash_layout(hist, path, num_hashes=32, bands=8, seed=7)
    bands_df, meta = load_minhash_layout(spark, path)
    assert (meta["num_hashes"], meta["bands"], meta["seed"]) == (32, 8, 7)
    # stored rows == a fresh fingerprint pass under the same params
    expect = minhash_bands(hist, num_hashes=32, bands=8, seed=7)
    assert sorted(map(tuple, bands_df.select(*expect.columns).collect())) \
        == sorted(map(tuple, expect.collect()))
    # the probe must join under (32, 8, seed=7), not the defaults:
    # candidates computed incrementally == batch join at those params
    inc = {
        (r["new_id"], r["hist_id"])
        for r in dedup_against(spark, path, new, mode="pairs").collect()
    }
    full = minhash_band_pairs(
        hist.unionByName(new), num_hashes=32, bands=8, seed=7,
        edges="pairs",
    )
    assert inc == _cross_pairs(hist, new, full)

    with pytest.raises(ValueError, match="not a minhash signature"):
        load_minhash_layout(spark, str(tmp_path / "nope"))
    mp = f"{path}/_minhash_meta.json"
    meta["version"] = "minhash-bands-v0"
    write_bytes(spark, mp, json.dumps(meta).encode())
    with pytest.raises(ValueError, match="minhash-bands-v0"):
        load_minhash_layout(spark, path)
    assert read_bytes(spark, mp)  # still present after refusals


def test_append_extends_history(spark, halves, tmp_path):
    """After append_minhash_layout(batch), a later batch dedups against
    history ∪ batch — the stored relation equals a fresh build over the
    union (partitioned-append identity)."""
    hist, new = halves
    batch1 = new.filter(F.col("doc_id") % 4 == 1).cache()
    batch2 = new.filter(F.col("doc_id") % 4 == 3).cache()
    path = str(tmp_path / "sig_grow")
    build_minhash_layout(hist, path)
    append_minhash_layout(spark, path, batch1)

    grown, _ = load_minhash_layout(spark, path)
    rebuilt_path = str(tmp_path / "sig_rebuilt")
    build_minhash_layout(hist.unionByName(batch1), rebuilt_path)
    rebuilt, _ = load_minhash_layout(spark, rebuilt_path)
    cols = ["doc_id", "band", "band_key"]
    assert sorted(map(tuple, grown.select(*cols).collect())) == sorted(
        map(tuple, rebuilt.select(*cols).collect())
    )
    # batch2 now sees batch1 as history
    inc = dedup_against(spark, path, batch2, mode="pairs")
    b1_ids = {r["doc_id"] for r in batch1.select("doc_id").collect()}
    direct = dedup_against(spark, rebuilt_path, batch2, mode="pairs")
    assert sorted(map(tuple, inc.collect())) == sorted(
        map(tuple, direct.collect())
    )
    del b1_ids


def test_streaming_sink_matches_batch_append(spark, halves, tmp_path):
    """stream_into_minhash_layout: draining a document stream leaves the
    exact band rows a batch build over history ∪ stream would hold; a
    second drain of the same checkpoint is a no-op (markers)."""
    from kowari_spark.streaming.ingest import stream_into_minhash_layout

    hist, new = halves
    path = str(tmp_path / "sig_stream")
    build_minhash_layout(hist, path)
    src = str(tmp_path / "src")
    new.select("doc_id", "text").repartition(3).write.parquet(src)

    def drain(ck):
        q = stream_into_minhash_layout(
            spark.readStream.schema(
                new.select("doc_id", "text").schema
            ).parquet(src),
            path, ck,
        )
        q.awaitTermination(120)

    drain(str(tmp_path / "ck1"))
    grown, _ = load_minhash_layout(spark, path)
    rebuilt_path = str(tmp_path / "sig_all")
    build_minhash_layout(hist.unionByName(new), rebuilt_path)
    rebuilt, _ = load_minhash_layout(spark, rebuilt_path)
    cols = ["doc_id", "band", "band_key"]
    assert sorted(map(tuple, grown.select(*cols).collect())) == sorted(
        map(tuple, rebuilt.select(*cols).collect())
    )
    n = grown.count()
    drain(str(tmp_path / "ck1"))  # replay: markers + offsets gate it
    assert load_minhash_layout(spark, path)[0].count() == n


def test_simhash_incremental_verified_matches_batch(spark, halves, tmp_path):
    """The simhash layout's probe is VERIFIED from stored state alone:
    (new, hist, hamming) pairs == the cross-half slice of the batch
    simhash_near_pairs join at the same bound."""
    from kowari_spark.operators.dedup import simhash_near_pairs
    from kowari_spark.operators.dedup_index import (
        build_simhash_layout,
        simhash_dedup_against,
        simhash_filter_new_against,
    )

    hist, new = halves
    path = str(tmp_path / "shsig")
    build_simhash_layout(hist, path)
    inc = {
        (r["new_id"], r["hist_id"], r["hamming"])
        for r in simhash_dedup_against(
            spark, path, new, max_hamming=6, mode="pairs"
        ).collect()
    }
    hist_ids = {r["doc_id"] for r in hist.select("doc_id").collect()}
    full = simhash_near_pairs(
        hist.unionByName(new), max_hamming=6, edges="pairs"
    )
    expect = set()
    for r in full.collect():
        a, b, hm = r["id_a"], r["id_b"], r["hamming"]
        if (a in hist_ids) != (b in hist_ids):
            expect.add((b, a, hm) if a in hist_ids else (a, b, hm))
    assert inc == expect

    # reps (the default): every emitted edge is a true verified pair
    # (⊆ pairs), each hist_id is its block's min — the verified-star
    # bound VERDICT r9 asked for
    reps = {
        (r["new_id"], r["hist_id"], r["hamming"])
        for r in simhash_dedup_against(
            spark, path, new, max_hamming=6
        ).collect()
    }
    assert reps <= inc
    with pytest.raises(ValueError, match="mode must be"):
        simhash_dedup_against(spark, path, new, mode="all")

    # the keep filter rides reps — matched set comes from the reps probe
    kept = simhash_filter_new_against(spark, path, new, max_hamming=6)
    matched = {a for a, _, _ in reps}
    new_ids = {r["doc_id"] for r in new.select("doc_id").collect()}
    assert {r["doc_id"] for r in kept.select("doc_id").collect()} \
        == new_ids - matched


def test_simhash_reps_bounds_hot_block(spark, halves, tmp_path):
    """The r9 scale-killer shape: a boilerplate family of F history
    docs shares ONE block (identical text ⇒ identical fingerprint).
    The pairs probe emits F verified rows for one matching batch doc
    (linear in history); reps emits exactly ONE (the block-min), and
    the keep filter still drops the batch copy because the family min
    IS a family member (hamming 0)."""
    from kowari_spark.operators.dedup_index import (
        build_simhash_layout,
        simhash_dedup_against,
        simhash_filter_new_against,
    )

    fam_text = (
        "planted boilerplate family document sharing one long run "
        "of identical tokens across every member of the family"
    )
    fam_n = 50
    hist, new = halves
    fam = spark.range(fam_n).select(
        (F.col("id") + 10_000_000).alias("doc_id"),
        F.lit(fam_text).alias("text"),
    )
    path = str(tmp_path / "hotsig")
    build_simhash_layout(
        hist.select("doc_id", "text").unionByName(fam), path
    )
    batch = spark.createDataFrame(
        [(99_000_000, fam_text)], "doc_id long, text string"
    )
    pairs = simhash_dedup_against(
        spark, path, batch, max_hamming=3, mode="pairs"
    ).collect()
    assert len(pairs) == fam_n and all(r["hamming"] == 0 for r in pairs)
    reps = simhash_dedup_against(
        spark, path, batch, max_hamming=3
    ).collect()
    assert len(reps) == 1
    assert reps[0]["hist_id"] == 10_000_000 and reps[0]["hamming"] == 0
    kept = simhash_filter_new_against(spark, path, batch, max_hamming=3)
    assert kept.count() == 0


def test_simhash_layout_provenance_and_append(spark, halves, tmp_path):
    from kowari_spark.operators.dedup_index import (
        append_simhash_layout,
        build_simhash_layout,
        load_simhash_layout,
    )

    hist, new = halves
    path = str(tmp_path / "shsig2")
    build_simhash_layout(hist, path, bits=32, block_bits=8)
    _, meta = load_simhash_layout(spark, path)
    assert (meta["bits"], meta["block_bits"]) == (32, 8)
    append_simhash_layout(spark, path, new)
    grown, _ = load_simhash_layout(spark, path)
    rebuilt = str(tmp_path / "shsig3")
    build_simhash_layout(hist.unionByName(new), rebuilt)
    rb, _ = load_simhash_layout(spark, rebuilt)
    cols = ["doc_id", "simhash", "block"]
    assert sorted(map(tuple, grown.select(*cols).collect())) == sorted(
        map(tuple, rb.select(*cols).collect())
    )
    with pytest.raises(ValueError, match="not a simhash layout"):
        load_simhash_layout(spark, str(tmp_path / "missing"))


def test_probe_plan_gates(spark, halves, tmp_path):
    """Scale-shape plan gates: the minhash probe semi-joins history via
    BROADCAST (history never shuffles for candidate pruning); the
    simhash probe's history scan is STATICALLY partition-pruned to the
    batch's blocks (literal IN over the bounded block space)."""
    import re

    from kowari_spark.operators.dedup_index import (
        build_simhash_layout,
        dedup_against,
        simhash_dedup_against,
    )

    hist, new = halves
    mh_path = str(tmp_path / "pg_mh")
    build_minhash_layout(hist, mh_path)
    plan = (
        dedup_against(spark, mh_path, new, mode="reps")
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "BroadcastHashJoin" in plan and "LeftSemi" in plan

    sh_path = str(tmp_path / "pg_sh")
    build_simhash_layout(hist, sh_path)
    plan2 = (
        simhash_dedup_against(spark, sh_path, new, max_hamming=6)
        ._jdf.queryExecution().executedPlan().toString()
    )
    # the history scan's PartitionFilters must carry the block IN list
    # (not just isnotnull) — that is the static pruning the layout's
    # partitionBy(block) exists for
    pf = re.findall(r"PartitionFilters: \[[^\]]*\]", plan2)
    assert any(
        ("block" in f) and (" IN " in f or "INSET" in f.upper())
        for f in pf
    ), pf


def test_signature_verified_dedup_against(spark, halves, tmp_path):
    """verify_threshold: est_jaccard = (matching minhash positions)/
    num_hashes computed from STORED state matches a direct signature
    comparison; only pairs at/above threshold survive; sig-less layouts
    refuse verification."""
    from kowari_spark.operators.dedup import minhash_signatures
    from kowari_spark.operators.dedup_index import (
        build_minhash_layout,
        dedup_against,
    )

    hist, new = halves
    path = str(tmp_path / "vsig")
    build_minhash_layout(hist, path)  # store_sigs defaults True

    got = {
        (r["new_id"], r["hist_id"]): r["est_jaccard"]
        for r in dedup_against(
            spark, path, new, mode="pairs", verify_threshold=0.0
        ).collect()
    }
    assert got, "fixture produced no candidate pairs"
    # direct agreement from fresh signatures over the union
    sigs = {
        r["doc_id"]: [r[f"m{i}"] for i in range(16)]
        for r in minhash_signatures(hist.unionByName(new)).collect()
    }
    for (a, b), est in got.items():
        agree = sum(x == y for x, y in zip(sigs[a], sigs[b]))
        assert est == round(agree / 16.0, 6) + 0.0, (a, b)
    # thresholding prunes: strictly fewer rows at a bound above the min
    lo = min(got.values())
    if lo < 1.0:
        t = lo + 1e-6
        kept = dedup_against(
            spark, path, new, mode="pairs", verify_threshold=t
        ).count()
        assert kept < len(got)
    # reps mode verifies the bucket-min representative
    reps = dedup_against(
        spark, path, new, mode="reps", verify_threshold=0.0
    )
    assert "est_jaccard" in reps.columns and reps.count() > 0

    skinny = str(tmp_path / "vsig_skinny")
    build_minhash_layout(hist, skinny, store_sigs=False)
    with pytest.raises(ValueError, match="store_sigs"):
        dedup_against(spark, skinny, new, verify_threshold=0.5)
    # unverified probe over the skinny layout unchanged
    assert dedup_against(spark, skinny, new, mode="pairs").count() == len(got)


def test_winnow_incremental_matches_batch(spark, halves, tmp_path):
    """winnow_dedup_against(mode="pairs") == the cross-half slice of
    batch winnow_pairs at the same (k, window, min_shared) — shared
    counts included (verified-by-construction from stored state)."""
    from kowari_spark.operators.dedup import winnow_pairs
    from kowari_spark.operators.dedup_index import (
        build_winnow_layout,
        winnow_dedup_against,
        winnow_filter_new_against,
    )

    hist, new = halves
    path = str(tmp_path / "wsig")
    build_winnow_layout(hist, path, k=4, window=4)
    inc = {
        (r["new_id"], r["hist_id"], r["shared"])
        for r in winnow_dedup_against(
            spark, path, new, min_shared=2, mode="pairs"
        ).collect()
    }
    hist_ids = {r["doc_id"] for r in hist.select("doc_id").collect()}
    full = winnow_pairs(
        hist.unionByName(new), k=4, window=4, min_shared=2, edges="pairs"
    )
    expect = set()
    for r in full.collect():
        a, b, sh = r["id_a"], r["id_b"], r["shared"]
        if (a in hist_ids) != (b in hist_ids):
            expect.add((b, a, sh) if a in hist_ids else (a, b, sh))
    assert inc == expect

    # reps mode: member↔per-fp-min lower-bound semantics — every match
    # is a subset of some pairs match's shared count
    reps = winnow_dedup_against(spark, path, new, min_shared=1, mode="reps")
    pair_lookup = {}
    for a, b, sh in {
        (r["new_id"], r["hist_id"], r["shared"])
        for r in winnow_dedup_against(
            spark, path, new, min_shared=1, mode="pairs"
        ).collect()
    }:
        pair_lookup[(a, b)] = sh
    for r in reps.collect():
        key = (r["new_id"], r["hist_id"])
        assert key in pair_lookup and r["shared"] <= pair_lookup[key]

    kept = winnow_filter_new_against(spark, path, new, min_shared=2)
    matched = {
        r["new_id"]
        for r in winnow_dedup_against(
            spark, path, new, min_shared=2, mode="reps"
        ).collect()
    }
    new_ids = {r["doc_id"] for r in new.select("doc_id").collect()}
    assert {r["doc_id"] for r in kept.select("doc_id").collect()} \
        == new_ids - matched


def test_winnow_layout_provenance_and_append(spark, halves, tmp_path):
    from kowari_spark.operators.dedup_index import (
        append_winnow_layout,
        build_winnow_layout,
        load_winnow_layout,
    )

    hist, new = halves
    path = str(tmp_path / "wsig2")
    build_winnow_layout(hist, path, k=5, window=3)
    _, meta = load_winnow_layout(spark, path)
    assert (meta["k"], meta["window"]) == (5, 3)
    append_winnow_layout(spark, path, new)
    grown, _ = load_winnow_layout(spark, path)
    rebuilt = str(tmp_path / "wsig3")
    build_winnow_layout(hist.unionByName(new), rebuilt, k=5, window=3)
    rb, _ = load_winnow_layout(spark, rebuilt)
    cols = ["doc_id", "fp", "fpb"]
    assert sorted(map(tuple, grown.select(*cols).collect())) == sorted(
        map(tuple, rb.select(*cols).collect())
    )
    with pytest.raises(ValueError, match="not a winnow layout"):
        load_winnow_layout(spark, str(tmp_path / "missing"))


def test_embedding_near_dups_against_stored_layout(spark, embeddings, tmp_path):
    """Incremental vector near-dup against a stored SignLSH layout:
    pairs mode == the cross-half co-bucket slice of the batch LSH
    near-dup join (cosine verified from STORED vectors); the history
    scan is partition-pruned to the batch's buckets (plan gate)."""
    import re

    from kowari_spark.operators.dedup import embedding_near_dups_lsh
    from kowari_spark.operators.dedup_index import (
        embedding_filter_new_against,
        embedding_near_dups_against,
    )
    from kowari_spark.operators.lsh import SignLSH

    base = embeddings.select(
        F.col("vec_id").alias("id"), "embedding"
    ).limit(300).cache()
    hist = base.filter(F.col("id") % 2 == 0).cache()
    new = base.filter(F.col("id") % 2 == 1).cache()
    lsh = SignLSH(dim=64, num_planes=4, seed=7)
    path = str(tmp_path / "lsh_hist")
    lsh.build(hist, path)

    inc = {
        (r["new_id"], r["hist_id"], r["cos"])
        for r in embedding_near_dups_against(
            spark, lsh, path, new, threshold=0.3, round_to=6,
            mode="pairs",
        ).collect()
    }
    # batch ground truth: single-table sign LSH over the union at the
    # SAME planes, cross-half slice
    full = embedding_near_dups_lsh(
        base, threshold=0.3, num_planes=4, num_tables=1, seed=7,
        round_to=6, dim=64, edges="pairs",
    )
    hist_ids = {r["id"] for r in hist.select("id").collect()}
    expect = set()
    for r in full.collect():
        a, b, c = r["id_a"], r["id_b"], r["cos"]
        if (a in hist_ids) != (b in hist_ids):
            expect.add((b, a, c) if a in hist_ids else (a, b, c))
    assert inc == expect
    assert inc, "fixture produced no verified matches"

    # plan gate: bucket IN list reaches PartitionFilters
    plan = (
        embedding_near_dups_against(
            spark, lsh, path, new, threshold=0.3, mode="pairs"
        )._jdf.queryExecution().executedPlan().toString()
    )
    pf = re.findall(r"PartitionFilters: \[[^\]]*\]", plan)
    assert any(
        "bucket" in f and (" IN " in f or "INSET" in f.upper()) for f in pf
    ), pf

    # reps-mode keep filter: matched ids are a subset of pairs-mode's
    kept = embedding_filter_new_against(
        spark, lsh, path, new, threshold=0.3, round_to=6
    )
    kept_ids = {r["id"] for r in kept.select("id").collect()}
    pairs_matched = {a for a, _, _ in inc}
    new_ids = {r["id"] for r in new.select("id").collect()}
    assert new_ids - pairs_matched <= kept_ids  # reps matches ⊆ pairs matches
    assert kept_ids <= new_ids

    with pytest.raises(TypeError, match="SignLSH"):
        embedding_near_dups_against(spark, object(), path, new, 0.3)


def test_embedding_against_multitable_layout(spark, embeddings, tmp_path):
    """The MultiSignLSH (OR-construction) layout probes identically:
    pairs == the cross-half slice of the multi-table batch join, and
    the per-table IN predicate reaches PartitionFilters."""
    import re

    from kowari_spark.operators.dedup import embedding_near_dups_lsh
    from kowari_spark.operators.dedup_index import embedding_near_dups_against
    from kowari_spark.operators.lsh import MultiSignLSH

    base = embeddings.select(
        F.col("vec_id").alias("id"), "embedding"
    ).limit(300).cache()
    hist = base.filter(F.col("id") % 2 == 0).cache()
    new = base.filter(F.col("id") % 2 == 1).cache()
    ml = MultiSignLSH(dim=64, num_planes=4, num_tables=3, seed=7)
    path = str(tmp_path / "mlsh_hist")
    ml.build(hist, path)

    res = embedding_near_dups_against(
        spark, ml, path, new, threshold=0.3, round_to=6, mode="pairs"
    )
    inc = {(r["new_id"], r["hist_id"], r["cos"]) for r in res.collect()}
    full = embedding_near_dups_lsh(
        base, threshold=0.3, num_planes=4, num_tables=3, seed=7,
        round_to=6, dim=64, edges="pairs",
    )
    hist_ids = {r["id"] for r in hist.select("id").collect()}
    expect = set()
    for r in full.collect():
        a, b, c = r["id_a"], r["id_b"], r["cos"]
        if (a in hist_ids) != (b in hist_ids):
            expect.add((b, a, c) if a in hist_ids else (a, b, c))
    assert inc == expect and inc

    plan = res._jdf.queryExecution().executedPlan().toString()
    pf = re.findall(r"PartitionFilters: \[[^\]]*\]", plan)
    assert any(
        "__tbl" in f and (" IN " in f or "INSET" in f.upper()) for f in pf
    ), pf


def test_compact_minhash_layout_bounds_files(spark, halves, tmp_path):
    """Streamed micro-batch appends leave one small file per band per
    batch; compact_bucketed_layout(partition_col="band") bounds them
    with NO data change — the maintenance claim in the module header,
    exercised."""
    from kowari_spark.fsutil import count_data_files, list_dirs
    from kowari_spark.operators.dedup_index import load_minhash_layout
    from kowari_spark.streaming.ingest import compact_bucketed_layout

    hist, new = halves
    path = str(tmp_path / "sig_compact")
    build_minhash_layout(hist, path)
    # several small appends -> file buildup per band dir
    for i in range(1, 5):
        append_minhash_layout(
            spark, path, new.filter(F.col("doc_id") % 8 == i)
        )
    bands_dirs = [d for d in list_dirs(spark, path) if d.startswith("band=")]
    assert any(count_data_files(spark, f"{path}/{d}") > 2 for d in bands_dirs)
    before, _ = load_minhash_layout(spark, path)
    rows_before = sorted(
        map(tuple, before.select("doc_id", "band", "band_key").collect())
    )
    rewritten = compact_bucketed_layout(
        spark, path, partition_col="band", max_files=2, target_files=1
    )
    assert rewritten
    assert all(
        count_data_files(spark, f"{path}/{d}") <= 2 for d in bands_dirs
    )
    after, meta = load_minhash_layout(spark, path)  # sidecar survived
    assert meta["version"]
    assert sorted(
        map(tuple, after.select("doc_id", "band", "band_key").collect())
    ) == rows_before


def test_simhash_and_winnow_streaming_sinks(spark, halves, tmp_path):
    """The simhash/winnow layout sinks mirror the minhash one: drained
    streams leave exactly the rows a batch rebuild over the union would
    hold, and re-draining is a no-op."""
    from kowari_spark.operators.dedup_index import (
        build_simhash_layout,
        build_winnow_layout,
        load_simhash_layout,
        load_winnow_layout,
    )
    from kowari_spark.streaming.ingest import (
        stream_into_simhash_layout,
        stream_into_winnow_layout,
    )

    hist, new = halves
    src = str(tmp_path / "src")
    new.select("doc_id", "text").repartition(2).write.parquet(src)
    schema = new.select("doc_id", "text").schema

    for name, build, load, sink, cols in (
        ("sh", build_simhash_layout, load_simhash_layout,
         stream_into_simhash_layout, ["doc_id", "simhash", "block"]),
        ("wn", build_winnow_layout, load_winnow_layout,
         stream_into_winnow_layout, ["doc_id", "fp", "fpb"]),
    ):
        path = str(tmp_path / f"{name}_stream")
        build(hist, path)
        q = sink(
            spark.readStream.schema(schema).parquet(src),
            path, str(tmp_path / f"ck_{name}"),
        )
        q.awaitTermination(120)
        grown, _ = load(spark, path)
        rebuilt = str(tmp_path / f"{name}_all")
        build(hist.unionByName(new), rebuilt)
        rb, _ = load(spark, rebuilt)
        assert sorted(map(tuple, grown.select(*cols).collect())) == sorted(
            map(tuple, rb.select(*cols).collect())
        ), name
        n = grown.count()
        q = sink(
            spark.readStream.schema(schema).parquet(src),
            path, str(tmp_path / f"ck_{name}"),
        )
        q.awaitTermination(120)
        assert load(spark, path)[0].count() == n, name


def test_embedding_against_cplsh_layout(spark, embeddings, tmp_path):
    """CrossPolytopeLSH layouts (same (__tbl, bucket) shape) probe
    through the same code path, with CP's own sidecar validation."""
    from kowari_spark.operators.cplsh import CrossPolytopeLSH
    from kowari_spark.operators.dedup_index import embedding_near_dups_against
    from kowari_spark.functions.vector import cosine_similarity

    base = embeddings.select(
        F.col("vec_id").alias("id"), "embedding"
    ).limit(200).cache()
    hist = base.filter(F.col("id") % 2 == 0).cache()
    new = base.filter(F.col("id") % 2 == 1).cache()
    cp = CrossPolytopeLSH(dim=64, num_tables=8, seed=100)
    path = str(tmp_path / "cp_hist")
    cp.build(hist, path)
    res = embedding_near_dups_against(
        spark, cp, path, new, threshold=0.3, round_to=6, mode="pairs"
    )
    got = {(r["new_id"], r["hist_id"]): r["cos"] for r in res.collect()}
    assert got, "fixture produced no verified matches"
    # every emitted pair passes the exact cosine bound (true values)
    exact = (
        new.withColumnRenamed("id", "new_id")
        .withColumnRenamed("embedding", "va")
        .crossJoin(hist.withColumnRenamed("id", "hist_id")
                   .withColumnRenamed("embedding", "vb"))
        .select("new_id", "hist_id",
                (F.round(cosine_similarity("va", "vb"), 6)
                 + F.lit(0.0)).alias("cos"))
        .filter(F.col("cos") >= 0.3)
    )
    e = {(r["new_id"], r["hist_id"]): r["cos"] for r in exact.collect()}
    assert set(got) <= set(e)
    for k, v in got.items():
        assert v == e[k]


# -- media layout (the fourth signature family) --------------------------


@pytest.fixture(scope="module")
def media_halves(spark):
    """History: 40 distinct synthetic images. Batch: exact copies of
    the first 20 under shifted ids plus 10 genuinely new images."""
    from kowari_spark.operators.multimodal import synth_media

    def mk(lo, hi):
        ids = spark.createDataFrame(
            [(i,) for i in range(lo, hi)], "media_id long"
        )
        return synth_media(ids, kind="image", width=32, height=24)

    hist = mk(0, 40).cache()
    # same content as 0..19 under shifted ids, plus 10 genuinely new
    # images: the synthetic KWM pixel pattern repeats mod 256
    # (multimodal.encode_kwm), so "new" keys must NOT be congruent to
    # any history key mod 256 — 1100..1109 ≡ 76..85, and their dHashes
    # sit >= 18 Hamming bits from every history image (checked), so
    # the no-match/keep path is genuinely exercised
    copies = hist.filter(F.col("media_id") < 20).withColumn(
        "media_id", F.col("media_id") + 1000
    )
    fresh = mk(1100, 1110)
    return hist, copies.unionByName(fresh).cache()


def test_media_incremental_matches_batch(spark, media_halves, tmp_path):
    """media_dedup_against(mode="pairs") over the stored layout == the
    cross-half slice of batch media_near_dups at the same bound —
    history media never re-decoded; reps edges are verified (⊆ pairs)
    and the keep filter drops exactly the reps-matched batch rows."""
    from kowari_spark.operators.dedup_index import (
        build_media_layout,
        media_dedup_against,
        media_filter_new_against,
    )
    from kowari_spark.operators.multimodal import media_near_dups

    hist, new = media_halves
    path = str(tmp_path / "media_sig")
    build_media_layout(hist, path)

    inc = {
        (r["new_id"], r["hist_id"], r["hamming"])
        for r in media_dedup_against(
            spark, path, new, max_hamming=6, mode="pairs"
        ).collect()
    }
    hist_ids = {r["media_id"] for r in hist.select("media_id").collect()}
    full = media_near_dups(
        hist.unionByName(new), max_hamming=6, edges="pairs"
    )
    expect = set()
    for r in full.collect():
        a, b, hm = r["id_a"], r["id_b"], r["hamming"]
        if (a in hist_ids) != (b in hist_ids):
            expect.add((b, a, hm) if a in hist_ids else (a, b, hm))
    assert inc == expect
    # every exact copy surfaces at hamming 0
    assert {(i + 1000, i, 0) for i in range(20)} <= inc

    reps = {
        (r["new_id"], r["hist_id"], r["hamming"])
        for r in media_dedup_against(
            spark, path, new, max_hamming=6
        ).collect()
    }
    assert reps <= inc
    with pytest.raises(ValueError, match="mode must be"):
        media_dedup_against(spark, path, new, mode="all")

    kept = media_filter_new_against(spark, path, new, max_hamming=6)
    matched = {a for a, _, _ in reps}
    new_ids = {r["media_id"] for r in new.select("media_id").collect()}
    kept_ids = {r["media_id"] for r in kept.select("media_id").collect()}
    assert kept_ids == new_ids - matched
    # the 20 exact copies are all dropped AND the 10 genuinely new
    # images (>= 18 Hamming bits from all history) all survive — the
    # keep path is exercised, not vacuously empty
    assert not ({i + 1000 for i in range(20)} & kept_ids)
    assert {i for i in range(1100, 1110)} <= kept_ids


def test_media_layout_provenance_append_and_plan(
    spark, media_halves, tmp_path
):
    """Sidecar round-trip + pigeonhole guard + append==rebuild + the
    static-pruning plan gate (PartitionFilters IN over bv)."""
    import json
    import re

    from kowari_spark.fsutil import write_bytes
    from kowari_spark.operators.dedup_index import (
        append_media_layout,
        build_media_layout,
        load_media_layout,
        media_dedup_against,
    )

    hist, new = media_halves
    path = str(tmp_path / "media_sig2")
    build_media_layout(hist, path, bands=8, hash_size=8)
    banded, meta = load_media_layout(spark, path)
    assert (meta["bands"], meta["hash_size"]) == (8, 8)
    assert set(banded.columns) == {"media_id", "phash", "bv"}
    # 8 banded rows per media, bv packs (band, value) into [0, 2048)
    assert banded.count() == 40 * 8
    mn, mx = banded.agg(F.min("bv"), F.max("bv")).first()
    assert 0 <= mn and mx < 8 * 256

    # pigeonhole guard: probing past the layout's band budget refuses
    with pytest.raises(ValueError, match="pigeonhole"):
        media_dedup_against(spark, path, new, max_hamming=8)
    with pytest.raises(ValueError, match="don't split"):
        build_media_layout(hist, str(tmp_path / "bad"), bands=7)
    with pytest.raises(ValueError, match="not a media layout"):
        load_media_layout(spark, str(tmp_path / "missing"))
    meta2 = dict(meta, version="media-dhash-v0")
    wrong = str(tmp_path / "media_wrong")
    build_media_layout(hist, wrong)
    write_bytes(spark, f"{wrong}/_media_meta.json",
                json.dumps(meta2).encode())
    with pytest.raises(ValueError, match="rebuild the layout"):
        load_media_layout(spark, wrong)

    # append under stored params == rebuild over the union
    append_media_layout(spark, path, new)
    grown, _ = load_media_layout(spark, path)
    rebuilt = str(tmp_path / "media_all")
    build_media_layout(hist.unionByName(new), rebuilt)
    rb, _ = load_media_layout(spark, rebuilt)
    cols = ["media_id", "phash", "bv"]
    assert sorted(map(tuple, grown.select(*cols).collect())) == sorted(
        map(tuple, rb.select(*cols).collect())
    )

    # plan gate: the history scan is STATICALLY partition-pruned to the
    # batch's buckets (literal IN in PartitionFilters, not just a
    # runtime filter)
    plan = (
        media_dedup_against(spark, rebuilt, new, max_hamming=6)
        ._jdf.queryExecution().executedPlan().toString()
    )
    pf = re.findall(r"PartitionFilters: \[[^\]]*\]", plan)
    assert any(
        ("bv" in f) and (" IN " in f or "INSET" in f.upper())
        for f in pf
    ), pf


def test_media_streaming_sink(spark, media_halves, tmp_path):
    """stream_into_media_layout: the drained stream leaves exactly the
    rows a batch rebuild over the union would hold; re-drain no-op."""
    from kowari_spark.operators.dedup_index import (
        build_media_layout,
        load_media_layout,
    )
    from kowari_spark.streaming.ingest import stream_into_media_layout

    hist, new = media_halves
    src = str(tmp_path / "media_src")
    new.repartition(2).write.parquet(src)
    schema = new.schema
    path = str(tmp_path / "media_stream")
    build_media_layout(hist, path)
    q = stream_into_media_layout(
        spark.readStream.schema(schema).parquet(src),
        path, str(tmp_path / "ck_media"),
    )
    q.awaitTermination(120)
    grown, _ = load_media_layout(spark, path)
    rebuilt = str(tmp_path / "media_stream_all")
    build_media_layout(hist.unionByName(new), rebuilt)
    rb, _ = load_media_layout(spark, rebuilt)
    cols = ["media_id", "phash", "bv"]
    assert sorted(map(tuple, grown.select(*cols).collect())) == sorted(
        map(tuple, rb.select(*cols).collect())
    )
    n = grown.count()
    q = stream_into_media_layout(
        spark.readStream.schema(schema).parquet(src),
        path, str(tmp_path / "ck_media"),
    )
    q.awaitTermination(120)
    assert load_media_layout(spark, path)[0].count() == n


def test_signature_layout_facade(spark, halves, media_halves, tmp_path):
    """SignatureLayout.open dispatches on the sidecar and its verbs
    delegate to the family functions (identical outputs)."""
    from kowari_spark.operators.dedup_index import (
        SignatureLayout,
        build_media_layout,
        build_minhash_layout,
        build_simhash_layout,
        build_winnow_layout,
        dedup_against,
        filter_new_against,
        simhash_dedup_against,
    )

    hist, new = halves
    mhist, mnew = media_halves
    paths = {}
    for kind, build, hdf in (
        ("minhash", build_minhash_layout, hist),
        ("simhash", build_simhash_layout, hist),
        ("winnow", build_winnow_layout, hist),
        ("media", build_media_layout, mhist),
    ):
        p = str(tmp_path / f"fac_{kind}")
        build(hdf, p)
        paths[kind] = p
        assert SignatureLayout.open(spark, p).kind == kind

    lay = SignatureLayout.open(spark, paths["minhash"])
    assert lay.meta["num_hashes"] == 16
    got = sorted(map(tuple, lay.dedup_against(new, mode="pairs").collect()))
    want = sorted(map(tuple,
                      dedup_against(spark, paths["minhash"], new,
                                    mode="pairs").collect()))
    assert got == want
    assert lay.filter_new(new).count() == \
        filter_new_against(spark, paths["minhash"], new).count()

    sh = SignatureLayout.open(spark, paths["simhash"])
    assert sorted(map(tuple, sh.dedup_against(new, max_hamming=6)
                      .collect())) == \
        sorted(map(tuple, simhash_dedup_against(
            spark, paths["simhash"], new, max_hamming=6).collect()))
    # append through the facade == family append (row counts grow alike)
    before = spark.read.parquet(paths["winnow"]).count()
    wn = SignatureLayout.open(spark, paths["winnow"])
    wn.append(new)
    assert spark.read.parquet(paths["winnow"]).count() > before

    with pytest.raises(ValueError, match="no signature-layout sidecar"):
        SignatureLayout.open(spark, str(tmp_path / "fac_nothing"))
    with pytest.raises(ValueError, match="unknown signature-layout"):
        SignatureLayout(spark, paths["minhash"], "bogus")
    with pytest.raises(ValueError, match="no LSH params sidecar"):
        SignatureLayout(spark, paths["minhash"], "embedding")


def test_signature_layout_facade_stream(spark, halves, tmp_path):
    """stream_into through the facade drives the family sink (drained
    rows == batch append; idempotent re-drain)."""
    from kowari_spark.operators.dedup_index import (
        SignatureLayout,
        build_minhash_layout,
        load_minhash_layout,
    )

    hist, new = halves
    path = str(tmp_path / "fac_stream")
    build_minhash_layout(hist, path)
    src = str(tmp_path / "fac_src")
    new.select("doc_id", "text").repartition(2).write.parquet(src)
    schema = new.select("doc_id", "text").schema
    lay = SignatureLayout.open(spark, path)
    q = lay.stream_into(
        spark.readStream.schema(schema).parquet(src),
        str(tmp_path / "fac_ck"),
    )
    q.awaitTermination(120)
    grown, _ = load_minhash_layout(spark, path)
    rebuilt = str(tmp_path / "fac_all")
    build_minhash_layout(hist.unionByName(new), rebuilt)
    rb, _ = load_minhash_layout(spark, rebuilt)
    cols = ["doc_id", "band", "band_key"]
    assert sorted(map(tuple, grown.select(*cols).collect())) == sorted(
        map(tuple, rb.select(*cols).collect())
    )


def test_lsh_layout_params_sidecar(spark, embeddings, tmp_path):
    """SignLSH/MultiSignLSH builds write a _lsh_meta.json params
    sidecar; load refuses a param-mismatched reader; open_lsh_layout
    reconstructs the exact instance (lsh=None probe == instance
    probe); CP-LSH layouts open too."""
    from kowari_spark.operators.cplsh import CrossPolytopeLSH
    from kowari_spark.operators.dedup_index import (
        embedding_near_dups_against,
        open_lsh_layout,
    )
    from kowari_spark.operators.lsh import MultiSignLSH, SignLSH

    base = embeddings.select(
        F.col("vec_id").alias("id"), "embedding"
    ).limit(300).cache()
    hist = base.filter(F.col("id") % 2 == 0).cache()
    new = base.filter(F.col("id") % 2 == 1).cache()
    path = str(tmp_path / "lsh_side")
    SignLSH(dim=64, num_planes=4, seed=7).build(hist, path)

    # a differently-seeded/planed reader is refused, not silently wrong
    for bad in (
        SignLSH(dim=64, num_planes=4, seed=8),
        SignLSH(dim=64, num_planes=6, seed=7),
    ):
        with pytest.raises(ValueError, match="hashes with"):
            bad.load(spark, path)
        with pytest.raises(ValueError, match="hashes with"):
            embedding_near_dups_against(
                spark, bad, path, new, 0.3, id_col="id"
            )

    # sidecar reconstruction: a param-free probe == the instance probe
    inst, meta = open_lsh_layout(spark, path)
    assert (meta["family"], meta["vec_col"], meta["id_col"]) == \
        ("sign", "embedding", "id")
    assert (inst.num_planes, inst.seed) == (4, 7)
    with_inst = sorted(map(tuple, embedding_near_dups_against(
        spark, SignLSH(dim=64, num_planes=4, seed=7), path, new, 0.3,
        id_col="id", round_to=6, mode="pairs",
    ).collect()))
    with_none = sorted(map(tuple, embedding_near_dups_against(
        spark, None, path, new, 0.3, id_col="id", round_to=6,
        mode="pairs",
    ).collect()))
    assert with_inst == with_none and with_inst

    # multisign + cplsh sidecars reconstruct their families
    mpath = str(tmp_path / "mlsh_side")
    MultiSignLSH(dim=64, num_planes=4, num_tables=3, seed=7).build(
        hist, mpath
    )
    minst, mmeta = open_lsh_layout(spark, mpath)
    assert isinstance(minst, MultiSignLSH) and minst.num_tables == 3
    assert mmeta["family"] == "multisign"
    with pytest.raises(ValueError, match="hashes with"):
        MultiSignLSH(dim=64, num_planes=4, num_tables=3, seed=9).load(
            spark, mpath
        )
    cpath = str(tmp_path / "cp_side")
    CrossPolytopeLSH(dim=64, num_tables=2, seed=5).build(hist, cpath)
    cinst, cmeta = open_lsh_layout(spark, cpath)
    assert isinstance(cinst, CrossPolytopeLSH) and cinst.num_tables == 2
    assert cmeta["family"] == "crosspolytope"

    with pytest.raises(ValueError, match="no LSH params sidecar"):
        open_lsh_layout(spark, str(tmp_path / "lsh_nothing"))


def test_facade_dispatches_embedding_family(spark, embeddings, tmp_path):
    """SignatureLayout.open dispatches LSH layouts as the fifth family:
    dedup_against == embedding_near_dups_against, filter_new keeps
    non-matching rows, append extends probe-visible history, and the
    streaming sink refuses a mismatched instance up front."""
    from kowari_spark.operators.dedup_index import (
        SignatureLayout,
        embedding_near_dups_against,
    )
    from kowari_spark.operators.lsh import SignLSH
    from kowari_spark.streaming.ingest import stream_into_lsh_layout

    base = embeddings.select(
        F.col("vec_id").alias("id"), "embedding"
    ).limit(300).cache()
    hist = base.filter(F.col("id") % 4 == 0).cache()
    grow = base.filter(F.col("id") % 4 == 2).cache()
    new = base.filter(F.col("id") % 2 == 1).cache()
    lsh = SignLSH(dim=64, num_planes=4, seed=7)
    path = str(tmp_path / "fac_emb")
    lsh.build(hist, path)

    lay = SignatureLayout.open(spark, path)
    assert lay.kind == "embedding" and lay.meta["family"] == "sign"
    got = sorted(map(tuple, lay.dedup_against(
        new, threshold=0.3, round_to=6, mode="pairs"
    ).collect()))
    want = sorted(map(tuple, embedding_near_dups_against(
        spark, lsh, path, new, 0.3, id_col="id", round_to=6,
        mode="pairs",
    ).collect()))
    assert got == want and got
    with pytest.raises(ValueError, match="threshold"):
        lay.dedup_against(new)

    kept = lay.filter_new(new, threshold=0.3)
    matched = {a for a, _, _ in got}
    kept_ids = {r["id"] for r in kept.select("id").collect()}
    new_ids = {r["id"] for r in new.select("id").collect()}
    assert new_ids - matched <= kept_ids <= new_ids

    # append under STORED params: appended rows join probe history
    lay.append(grow)
    after = sorted(map(tuple, lay.dedup_against(
        new, threshold=0.3, round_to=6, mode="pairs"
    ).collect()))
    rebuilt = str(tmp_path / "fac_emb_all")
    lsh.build(hist.unionByName(grow), rebuilt)
    want_after = sorted(map(tuple, embedding_near_dups_against(
        spark, lsh, rebuilt, new, 0.3, id_col="id", round_to=6,
        mode="pairs",
    ).collect()))
    assert after == want_after and len(after) >= len(got)

    # the streaming sink refuses a mismatched stream BEFORE any append
    src = str(tmp_path / "fac_emb_src")
    new.write.parquet(src)
    stream = spark.readStream.schema(new.schema).parquet(src)
    with pytest.raises(ValueError, match="hashes with"):
        stream_into_lsh_layout(
            stream, SignLSH(dim=64, num_planes=4, seed=99), path,
            str(tmp_path / "fac_emb_ck"),
        )


def test_facade_file_stats_and_compact(spark, halves, tmp_path):
    """file_stats (one FS listing, no job) reports the small-file
    health appends degrade, and compact() bounds it with NO data
    change — the maintenance loop the r11 measurements motivate."""
    from kowari_spark.operators.dedup_index import (
        SignatureLayout,
        build_minhash_layout,
    )
    from kowari_spark.operators.lsh import MultiSignLSH

    hist, new = halves
    path = str(tmp_path / "maint_mh")
    build_minhash_layout(hist, path)
    lay = SignatureLayout.open(spark, path)
    assert lay.partition_col() == "band"
    for i in range(1, 5):
        lay.append(new.filter(F.col("doc_id") % 8 == i))
    st = lay.file_stats(max_files=1)
    assert st["kind"] == "minhash" and st["n_partitions"] > 0
    assert st["max_files_per_partition"] > 1 and st["partitions_over"]

    before = sorted(map(tuple, lay.dedup_against(
        new.filter(F.col("doc_id") % 8 == 7), mode="pairs").collect()))
    rewritten = lay.compact(max_files=1)
    assert rewritten  # something was actually over the bound
    st2 = lay.file_stats(max_files=1)
    assert st2["max_files_per_partition"] <= 1
    assert st2["n_files"] < st["n_files"]
    after = sorted(map(tuple, lay.dedup_against(
        new.filter(F.col("doc_id") % 8 == 7), mode="pairs").collect()))
    assert after == before  # compaction changed no data

    # embedding: sign layouts compact on "bucket"; multi-table refuse
    from kowari_spark.operators.lsh import SignLSH

    epath = str(tmp_path / "maint_emb")
    SignLSH(dim=4, num_planes=2, seed=1).build(
        spark.createDataFrame(
            [(1, [1.0, 0.0, 0.0, 0.0])], "id long, embedding array<double>"
        ), epath, id_col="id",
    )
    elay = SignatureLayout.open(spark, epath)
    assert elay.partition_col() == "bucket"
    assert elay.file_stats()["partition_col"] == "bucket"
    mpath = str(tmp_path / "maint_memb")
    MultiSignLSH(dim=4, num_planes=2, num_tables=2, seed=1).build(
        spark.createDataFrame(
            [(1, [1.0, 0.0, 0.0, 0.0])], "id long, embedding array<double>"
        ), mpath, id_col="id",
    )
    with pytest.raises(ValueError, match="single-table"):
        SignatureLayout.open(spark, mpath).partition_col()


def test_signature_layout_delete(spark, halves, tmp_path):
    """delete(ids) drops the docs' stored signatures: pruned rewrite,
    they stop matching probes, survivors' probe results are unchanged,
    and the sidecar survives (the layout re-opens)."""
    from kowari_spark.operators.dedup_index import SignatureLayout
    from kowari_spark.operators.dedup_index import build_minhash_layout

    hist, new = halves
    path = str(tmp_path / "del_mh")
    build_minhash_layout(hist, path)
    lay = SignatureLayout.open(spark, path)

    before = lay.dedup_against(new, mode="pairs").collect()
    assert before
    doomed = sorted({r["hist_id"] for r in before})[: max(1, len(before) // 4)]
    ids = spark.createDataFrame([(i,) for i in doomed], "doc_id long")
    parts = lay.delete(ids, mode="rewrite")
    assert parts  # something was rewritten
    stored = {r["doc_id"] for r in
              spark.read.parquet(path).select("doc_id").collect()}
    assert not stored & set(doomed)

    after = lay.dedup_against(new, mode="pairs").collect()
    gone = set(doomed)
    assert not {r["hist_id"] for r in after} & gone
    # survivors: exactly the before-pairs not touching a doomed id
    keep = {(r["new_id"], r["hist_id"]) for r in before
            if r["hist_id"] not in gone}
    assert {(r["new_id"], r["hist_id"]) for r in after} == keep

    # sidecar intact: a fresh open still dispatches and probes
    again = SignatureLayout.open(spark, path)
    assert again.kind == "minhash" and again.meta == lay.meta
    # deleting nothing is a no-op
    assert lay.delete(
        spark.createDataFrame([(-(10**9),)], "doc_id long"),
        mode="rewrite") == []


def test_signature_layout_tombstone_delete(spark, halves, tmp_path):
    """mode='tombstone' (VERDICT r11 missing #3): O(|ids|) delete for
    the every-id-in-every-partition families — probes stop matching
    IMMEDIATELY (facade verbs AND the public load_*_layout consumers),
    bit-identical to the rewrite delete, while physical rows survive
    until apply_deletes()/compact() rewrites once and clears the log."""
    from kowari_spark.operators.dedup_index import (
        SignatureLayout,
        build_minhash_layout,
        dedup_against,
    )

    hist, new = halves
    path = str(tmp_path / "tomb_mh")
    twin = str(tmp_path / "tomb_mh_twin")
    build_minhash_layout(hist, path)
    build_minhash_layout(hist, twin)
    lay = SignatureLayout.open(spark, path)
    ref = SignatureLayout.open(spark, twin)

    def pairs(fn):
        return sorted(
            (r["new_id"], r["hist_id"])
            for r in fn(new, mode="pairs").collect()
        )

    before = lay.dedup_against(new, mode="pairs").collect()
    assert before
    doomed = sorted({r["hist_id"] for r in before})[
        : max(1, len(before) // 4)
    ]
    ids = spark.createDataFrame([(i,) for i in doomed], "doc_id long")
    assert lay.delete(ids, mode="tombstone") == []  # nothing rewritten
    raw = {r["doc_id"] for r in
           spark.read.parquet(path).select("doc_id").collect()}
    assert raw & set(doomed)  # physical rows still present
    assert lay.file_stats()["has_pending_tombstones"]

    # the pending log subtracts via a BROADCAST anti-join — history is
    # never shuffled for tombstone filtering (plan gate)
    plan = (
        lay._hist()._jdf.queryExecution().executedPlan().toString()
    )
    assert "BroadcastHashJoin" in plan and "LeftAnti" in plan, plan

    # probe results identical to the physically-rewritten twin —
    # through the facade AND the public loader path
    ref.delete(ids, mode="rewrite")
    want = pairs(ref.dedup_against)
    assert pairs(lay.dedup_against) == want
    assert pairs(
        lambda df, **kw: dedup_against(spark, path, df, **kw)
    ) == want
    # duplicate tombstones are benign (log read distinct)
    lay.delete(ids, mode="tombstone")
    assert pairs(lay.dedup_against) == want

    # apply: one pruned rewrite, log cleared, rows physically gone,
    # probe unchanged; a second apply is a clean no-op
    assert lay.apply_deletes()
    assert not lay.file_stats()["has_pending_tombstones"]
    raw2 = {r["doc_id"] for r in
            spark.read.parquet(path).select("doc_id").collect()}
    assert not raw2 & set(doomed)
    assert pairs(lay.dedup_against) == want
    assert lay.apply_deletes() == []

    # compact() folds pending deletes into the maintenance window
    more = sorted({r["hist_id"] for r in lay.dedup_against(
        new, mode="pairs").collect()})[:1]
    lay.delete(
        spark.createDataFrame([(i,) for i in more], "doc_id long"),
        mode="tombstone",
    )
    lay.compact(max_files=0)  # force every partition through
    assert not lay.file_stats()["has_pending_tombstones"]
    assert not {r["doc_id"] for r in
                spark.read.parquet(path).select("doc_id").collect()
                } & set(more)

    # tombstoning every still-visible id refuses like the rewrite mode
    left = sorted({r["doc_id"] for r in
                   spark.read.parquet(path).select("doc_id").collect()})
    with pytest.raises(ValueError, match="every stored signature"):
        lay.delete(
            spark.createDataFrame([(i,) for i in left], "doc_id long"),
            mode="tombstone",
        )
    with pytest.raises(ValueError, match="'rewrite' or 'tombstone'"):
        lay.delete(ids, mode="soft")


def test_tombstone_mode_refused_for_embedding(spark, embeddings, tmp_path):
    from kowari_spark.operators.dedup_index import SignatureLayout
    from kowari_spark.operators.lsh import SignLSH

    base = embeddings.select(
        F.col("vec_id").alias("id"), "embedding"
    ).limit(100)
    path = str(tmp_path / "tomb_emb")
    SignLSH(dim=64, num_planes=4, seed=7).build(base, path)
    lay = SignatureLayout.open(spark, path)
    with pytest.raises(ValueError, match="rewrite' only"):
        lay.delete(
            spark.createDataFrame([(0,)], "id long"), mode="tombstone"
        )


def test_signature_layout_delete_embedding(spark, embeddings, tmp_path):
    """The embedding family's delete prunes on (bucket) for sign
    layouts and (__tbl, bucket) for multi-table layouts — deleted
    vectors stop surfacing from probes in both."""
    from kowari_spark.operators.dedup_index import SignatureLayout
    from kowari_spark.operators.lsh import MultiSignLSH, SignLSH

    base = embeddings.select(
        F.col("vec_id").alias("id"), "embedding"
    ).limit(200).cache()
    hist = base.filter(F.col("id") % 2 == 0).cache()
    new = base.filter(F.col("id") % 2 == 1).cache()

    for name, inst in (
        ("sign", SignLSH(dim=64, num_planes=4, seed=7)),
        ("multi", MultiSignLSH(dim=64, num_planes=4, num_tables=3, seed=7)),
    ):
        path = str(tmp_path / f"del_emb_{name}")
        inst.build(hist, path)
        lay = SignatureLayout.open(spark, path)
        before = lay.dedup_against(
            new, threshold=0.3, round_to=6, mode="pairs").collect()
        assert before, name
        doomed = sorted({r["hist_id"] for r in before})[:2]
        lay.delete(spark.createDataFrame([(i,) for i in doomed], "id long"))
        stored = {r["id"] for r in
                  spark.read.parquet(path).select("id").collect()}
        assert not stored & set(doomed), name
        after = lay.dedup_against(
            new, threshold=0.3, round_to=6, mode="pairs").collect()
        assert not {r["hist_id"] for r in after} & set(doomed), name
        keep = {(r["new_id"], r["hist_id"]) for r in before
                if r["hist_id"] not in set(doomed)}
        assert {(r["new_id"], r["hist_id"]) for r in after} == keep, name


def test_signature_layout_delete_all_families(spark, halves, media_halves,
                                              tmp_path):
    """Every family's _del_pcols path runs: delete shrinks stored ids,
    the layout re-opens (sidecar intact), and a delete of EVERY stored
    row refuses instead of leaving an unreadable directory."""
    from kowari_spark.operators.dedup_index import (
        SignatureLayout,
        build_media_layout,
        build_simhash_layout,
        build_winnow_layout,
    )

    hist, _ = halves
    mhist, _ = media_halves
    for kind, build, hdf, idc in (
        ("simhash", build_simhash_layout, hist, "doc_id"),
        ("winnow", build_winnow_layout, hist, "doc_id"),
        ("media", build_media_layout, mhist, "media_id"),
    ):
        p = str(tmp_path / f"delall_{kind}")
        build(hdf, p)
        lay = SignatureLayout.open(spark, p)
        stored = sorted({r[idc] for r in
                         spark.read.parquet(p).select(idc).collect()})
        doomed = stored[: max(1, len(stored) // 5)]
        parts = lay.delete(
            spark.createDataFrame([(i,) for i in doomed], f"{idc} long"),
            mode="rewrite")
        assert parts, kind
        left = {r[idc] for r in
                spark.read.parquet(p).select(idc).collect()}
        assert left == set(stored) - set(doomed), kind
        again = SignatureLayout.open(spark, p)
        assert again.kind == kind and again.meta == lay.meta

        # delete-all refuses BEFORE touching the layout
        with pytest.raises(ValueError, match="every stored signature"):
            lay.delete(spark.createDataFrame(
                [(i,) for i in stored], f"{idc} long"))
        assert {r[idc] for r in
                spark.read.parquet(p).select(idc).collect()} == left, kind


def test_tombstone_log_normalizes_id_dtype(spark, halves, tmp_path):
    """Successive tombstone deletes with different (castable) caller id
    dtypes must not leave a mixed-schema parquet log — ids are cast to
    the LAYOUT's stored dtype on write, so probes and apply keep
    working."""
    from kowari_spark.operators.dedup_index import (
        SignatureLayout,
        build_minhash_layout,
    )

    hist, new = halves
    path = str(tmp_path / "tomb_dtype")
    build_minhash_layout(hist, path)
    lay = SignatureLayout.open(spark, path)
    stored = sorted({r["doc_id"] for r in
                     spark.read.parquet(path).select("doc_id").collect()})
    lay.delete(
        spark.createDataFrame([(int(stored[0]),)], "doc_id int"),
        mode="tombstone",
    )
    lay.delete(
        spark.createDataFrame([(int(stored[1]),)], "doc_id long"),
        mode="tombstone",
    )
    gone = {stored[0], stored[1]}
    after = {r["hist_id"] for r in
             lay.dedup_against(new, mode="pairs").collect()}
    assert not after & gone
    assert lay.apply_deletes()
    left = {r["doc_id"] for r in
            spark.read.parquet(path).select("doc_id").collect()}
    assert not left & gone


def test_tombstone_delete_all_hist_families(spark, halves, media_halves,
                                            tmp_path):
    """The tombstone path is loader-level, so simhash / winnow / media
    inherit it: tombstoned ids vanish from probes immediately (equal to
    the rewrite-twin's results), apply_deletes makes it physical and
    clears the log."""
    from kowari_spark.operators.dedup_index import (
        SignatureLayout,
        build_media_layout,
        build_simhash_layout,
        build_winnow_layout,
    )

    hist, new = halves
    mhist, mnew = media_halves
    for kind, build, hdf, ndf, idc, kw in (
        ("simhash", build_simhash_layout, hist, new, "doc_id", {}),
        ("winnow", build_winnow_layout, hist, new, "doc_id", {}),
        ("media", build_media_layout, mhist, mnew, "media_id", {}),
    ):
        p = str(tmp_path / f"tomb_{kind}")
        tw = str(tmp_path / f"tomb_{kind}_twin")
        build(hdf, p)
        build(hdf, tw)
        lay = SignatureLayout.open(spark, p)
        ref = SignatureLayout.open(spark, tw)
        before = lay.dedup_against(ndf, mode="pairs", **kw).collect()
        assert before, kind
        doomed = sorted({r["hist_id"] for r in before})[:3]
        ids = spark.createDataFrame([(i,) for i in doomed], f"{idc} long")
        assert lay.delete(ids, mode="tombstone") == [], kind
        ref.delete(ids, mode="rewrite")

        def pairs(layout):
            return sorted(
                (r["new_id"], r["hist_id"])
                for r in layout.dedup_against(
                    ndf, mode="pairs", **kw).collect()
            )

        want = pairs(ref)
        assert pairs(lay) == want, kind
        lay.apply_deletes()
        assert not lay.file_stats()["has_pending_tombstones"], kind
        assert pairs(lay) == want, kind
        stored = {r[idc] for r in
                  spark.read.parquet(p).select(idc).collect()}
        assert not stored & set(doomed), kind


def test_facade_compact_multi_table_layouts(spark, embeddings, tmp_path):
    """compact()/file_stats() cover the (__tbl, bucket) two-level
    embedding layouts (round 13): their streaming/batch appends
    accumulate small files per LEAF dir exactly like the single-level
    families, so the generalized compactor rewrites oversized leaves
    with NO data change — for MultiSignLSH and CrossPolytopeLSH both.
    partition_col() keeps its single-column contract (raises);
    partition_cols() is the every-family surface."""
    import pytest as _pt

    from kowari_spark.operators.cplsh import CrossPolytopeLSH
    from kowari_spark.operators.dedup_index import SignatureLayout
    from kowari_spark.operators.lsh import MultiSignLSH

    base = embeddings.select(
        F.col("vec_id").alias("id"), "embedding"
    ).limit(240).cache()
    hist = base.filter(F.col("id") % 2 == 0)
    probe_q = base.filter(F.col("id") % 2 == 1).limit(8)

    insts = {
        "mlsh": MultiSignLSH(dim=64, num_planes=2, num_tables=2, seed=5),
        "cp": CrossPolytopeLSH(dim=64, num_tables=2, seed=5),
    }
    for tag, inst in insts.items():
        path = str(tmp_path / f"compact_{tag}")
        inst.build(hist, path, vec_col="embedding", id_col="id")
        lay = SignatureLayout.open(spark, path)
        assert lay.partition_cols() == ("__tbl", "bucket")
        with _pt.raises(ValueError, match="single-table"):
            lay.partition_col()
        for i in range(1, 4):
            lay.append(base.filter(F.col("id") % 8 == i))
        st = lay.file_stats(max_files=1)
        assert st["partition_col"] == ["__tbl", "bucket"]
        assert st["max_files_per_partition"] > 1 and st["partitions_over"]
        assert all("/" in d for d in st["partitions_over"])  # leaf names

        before = sorted(map(tuple, inst.query_batch(
            inst.load(spark, path),
            probe_q.select(F.col("id").alias("query_id"), "embedding"),
            k=5, id_col="id",
        ).collect()))
        rewritten = lay.compact(max_files=1)
        assert rewritten and all("/" in d for d in rewritten)
        st2 = lay.file_stats(max_files=1)
        assert st2["max_files_per_partition"] <= 1
        assert st2["n_files"] < st["n_files"]
        after = sorted(map(tuple, inst.query_batch(
            inst.load(spark, path),
            probe_q.select(F.col("id").alias("query_id"), "embedding"),
            k=5, id_col="id",
        ).collect()))
        assert after == before  # compaction changed no data


def test_facade_delete_default_is_tombstone(spark, halves, embeddings, tmp_path):
    """Round-14 unification (VERDICT r13 ask #7): the facade default
    for `SignatureLayout.delete` matches `Bm25Layout.delete` —
    tombstone for the every-id-in-every-partition signature families
    (nothing rewritten now, log pending), resolving to the cheap
    bucket-pruned rewrite for embedding layouts (which refuse
    tombstones). Module-level delete_from_layout keeps its historical
    eager-rewrite contract."""
    from kowari_spark.operators.dedup_index import (
        SignatureLayout,
        build_minhash_layout,
    )
    from kowari_spark.operators.lsh import SignLSH

    hist, _ = halves
    path = str(tmp_path / "dflt_mh")
    build_minhash_layout(hist, path)
    lay = SignatureLayout.open(spark, path)
    stored = sorted({r["doc_id"] for r in
                     spark.read.parquet(path).select("doc_id").collect()})
    ids = spark.createDataFrame([(stored[0],)], "doc_id long")
    assert lay.delete(ids) == []  # default = tombstone: no rewrite
    assert lay.file_stats()["has_pending_tombstones"]
    # physical row still present until apply
    raw = {r["doc_id"] for r in
           spark.read.parquet(path).select("doc_id").collect()}
    assert stored[0] in raw

    base = embeddings.select(
        F.col("vec_id").alias("id"), "embedding"
    ).limit(120)
    epath = str(tmp_path / "dflt_emb")
    SignLSH(dim=64, num_planes=4, seed=7).build(base, epath)
    elay = SignatureLayout.open(spark, epath)
    eids = spark.createDataFrame([(0,)], "id long")
    assert elay.delete(eids)  # default resolves to rewrite: parts back
    left = {r["id"] for r in
            spark.read.parquet(epath).select("id").collect()}
    assert 0 not in left
