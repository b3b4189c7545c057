"""Perceptual-hash media near-dup (operators/multimodal.py)."""

import pytest
from pyspark.sql import functions as F

from kowari_spark.operators.multimodal import (
    media_near_dups,
    media_phash,
    resize_media,
    synth_media,
)


@pytest.fixture(scope="module")
def dup_media(spark):
    """ids 0..9 distinct content; ids 100..109 duplicate it (same KWM key)."""
    a = synth_media(
        spark.createDataFrame([(i,) for i in range(10)], "media_id long"),
        kind="image", width=32, height=24,
    )
    b = a.withColumn("media_id", F.col("media_id") + 100)
    return a.unionByName(b)


def test_phash_deterministic_and_distinct(dup_media):
    ph = {r["media_id"]: r["phash"] for r in media_phash(dup_media).collect()}
    # identical content -> identical hash
    for i in range(10):
        assert ph[i] == ph[i + 100]
    # different synthetic frames -> not all hashes equal
    assert len({ph[i] for i in range(10)}) > 1


def test_phash_robust_under_nn_upscale(dup_media):
    """A 2x nearest-neighbor upscale shifts dHash block boundaries
    slightly (hash_size+1 = 9 doesn't divide the width), so the
    fingerprint moves a FEW bits, not far — the resized copy stays
    inside the near-dup Hamming ball while distinct images average
    ~32 bits apart."""
    orig = {r["media_id"]: r["phash"] for r in media_phash(dup_media).collect()}
    up = resize_media(dup_media, out_w=64, out_h=48)
    scaled = {r["media_id"]: r["phash"] for r in media_phash(up).collect()}

    def ham(a, b):
        return bin((a ^ b) & ((1 << 64) - 1)).count("1")

    for k in orig:
        assert ham(orig[k], scaled[k]) <= 6


def test_near_dups_finds_exact_copies_only(dup_media):
    pairs = media_near_dups(dup_media, max_hamming=0).collect()
    got = {(r["id_a"], r["id_b"]) for r in pairs}
    # every copy pairs with its original at hamming 0...
    assert {(i, i + 100) for i in range(10)} <= got
    # ...and every surviving pair IS hamming 0
    assert all(r["hamming"] == 0 for r in pairs)


def test_band_join_is_exact_within_hamming_budget(spark, dup_media):
    """Brute-force verification: banded candidates + filter == exact
    all-pairs hamming filter (pigeonhole guarantee bands > max_hamming)."""
    ph = media_phash(dup_media).collect()
    import itertools

    def ham(a, b):
        return bin((a ^ b) & ((1 << 64) - 1)).count("1")

    exact = {
        tuple(sorted((x["media_id"], y["media_id"]))): ham(x["phash"], y["phash"])
        for x, y in itertools.combinations(ph, 2)
        if ham(x["phash"], y["phash"]) <= 6
    }
    got = {
        (r["id_a"], r["id_b"]): r["hamming"]
        for r in media_near_dups(dup_media, max_hamming=6).collect()
    }
    assert got == exact


def test_bad_band_config_rejected(dup_media):
    with pytest.raises(ValueError):
        media_near_dups(dup_media, max_hamming=8, bands=8)
    with pytest.raises(ValueError):
        media_near_dups(dup_media, bands=7)


def test_phash_honors_custom_and_string_id_col(spark):
    base = spark.createDataFrame([(i,) for i in range(4)], "media_id long")
    media = synth_media(base, kind="image", width=16, height=12)
    renamed = media.withColumn("img_id", F.concat(F.lit("m"), F.col("media_id"))).drop("media_id")
    ph = media_phash(renamed, id_col="img_id").collect()
    assert {r["img_id"] for r in ph} == {"m0", "m1", "m2", "m3"}
    pairs = media_near_dups(
        renamed.unionByName(
            renamed.withColumn("img_id", F.concat(F.col("img_id"), F.lit("x")))
        ),
        id_col="img_id", max_hamming=0,
    ).collect()
    got = {(r["id_a"], r["id_b"]) for r in pairs}
    assert {(f"m{i}", f"m{i}x") for i in range(4)} <= got


def test_phash_rejects_oversized_hash(dup_media):
    with pytest.raises(ValueError):
        media_phash(dup_media, hash_size=16)


def test_media_dedup_keep_matches_union_find(spark, dup_media):
    """media_dedup_keep == union-find over the brute-force pair set:
    one row per input, rep = min reachable id, is_kept iff own rep."""
    from kowari_spark.operators.multimodal import media_dedup_keep

    out = {r["media_id"]: (r["rep_id"], r["is_kept"])
           for r in media_dedup_keep(dup_media, max_hamming=1).collect()}
    ph = {r["media_id"]: r["phash"] for r in media_phash(dup_media).collect()}
    ids = sorted(ph)
    assert sorted(out) == ids  # one row per input
    parent = {i: i for i in ids}

    def find(i):
        while parent[i] != i:
            parent[i] = parent[parent[i]]
            i = parent[i]
        return i

    for a in ids:
        for b in ids:
            if a < b and bin((ph[a] ^ ph[b]) & (2**64 - 1)).count("1") <= 1:
                ra, rb = find(a), find(b)
                if ra != rb:
                    parent[max(ra, rb)] = min(ra, rb)
    for i in ids:
        rep = find(i)
        assert out[i] == (rep, rep == i), i
    # the fixture's exact copies are clustered -> some losers exist
    assert any(not kept for _, kept in out.values())


def test_media_star_edges_same_components(spark, dup_media):
    """media star edges give identical media_dedup_keep output as
    all-pairs (CC needs connectivity), every star edge satisfies the
    Hamming bound, and the star set is a subset of the verified
    all-pairs set."""
    from kowari_spark.operators.multimodal import media_dedup_keep

    allp = {(r["id_a"], r["id_b"]): r["hamming"]
            for r in media_near_dups(dup_media).collect()}
    star = media_near_dups(dup_media, edges="star").collect()
    assert len(star) > 0
    for r in star:
        assert r["hamming"] <= 6
        assert allp[(r["id_a"], r["id_b"])] == r["hamming"]

    keep_p = {tuple(r) for r in media_dedup_keep(dup_media).collect()}
    keep_s = {tuple(r)
              for r in media_dedup_keep(dup_media, edges="star").collect()}
    assert keep_p == keep_s
