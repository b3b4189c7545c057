"""Skew helpers: salted results must equal the unsalted plans exactly."""

import pytest
from pyspark.sql import functions as F

from kowari_spark.operators.skew import salted_aggregate, salted_join


@pytest.fixture(scope="module")
def skewed(spark):
    # one hot key (90%), many cold keys
    hot = spark.range(0, 9000).select(
        F.lit("hot").alias("k"), (F.col("id") % 100).cast("double").alias("v")
    )
    cold = spark.range(0, 1000).select(
        F.concat(F.lit("c"), (F.col("id") % 50).cast("string")).alias("k"),
        F.col("id").cast("double").alias("v"),
    )
    return hot.unionByName(cold).cache()


def test_salted_aggregate_matches_plain(skewed):
    got = salted_aggregate(
        skewed,
        ["k"],
        {
            "n": (F.count("*"), F.sum("n")),
            "total": (F.sum("v"), F.sum("total")),
            "mx": (F.max("v"), F.max("mx")),
        },
        salt_from=["v"],
        n_salts=8,
    )
    want = skewed.groupBy("k").agg(
        F.count("*").alias("n"), F.sum("v").alias("total"), F.max("v").alias("mx")
    )
    g = {r["k"]: (r["n"], round(r["total"], 6), r["mx"]) for r in got.collect()}
    w = {r["k"]: (r["n"], round(r["total"], 6), r["mx"]) for r in want.collect()}
    assert g == w


def test_salted_aggregate_spreads_hot_key(skewed):
    # stage 1 must produce multiple partials for the hot key
    stage1 = (
        skewed.withColumn("__salt", F.pmod(F.hash("v"), F.lit(8)))
        .groupBy("k", "__salt")
        .count()
    )
    hot_parts = stage1.filter(F.col("k") == "hot").count()
    assert hot_parts == 8


@pytest.mark.parametrize("how", ["inner", "left"])
def test_salted_join_matches_plain(spark, skewed, how):
    dim = spark.createDataFrame(
        [("hot", "HOT"), ("c1", "C1"), ("c7", "C7"), ("absent", "A")],
        "k string, label string",
    )
    got = salted_join(skewed, dim, ["k"], n_salts=8, how=how)
    want = skewed.join(dim, ["k"], how)
    assert got.count() == want.count()
    g = got.groupBy("k", "label").count().collect()
    w = want.groupBy("k", "label").count().collect()
    assert sorted(map(tuple, g)) == sorted(map(tuple, w))


def test_grouped_standardize_matches_native_window(spark, skewed):
    from pyspark.sql.window import Window
    from kowari_spark.operators.grouped import grouped_standardize

    got = grouped_standardize(skewed, ["k"], "v")
    w = Window.partitionBy("k")
    want = skewed.withColumn(
        "zscore",
        F.when(F.stddev_pop("v").over(w) == 0, F.lit(0.0)).otherwise(
            (F.col("v") - F.avg("v").over(w)) / F.stddev_pop("v").over(w)
        ),
    )
    g = sorted((r["k"], r["v"], round(r["zscore"], 9)) for r in got.collect())
    e = sorted((r["k"], r["v"], round(r["zscore"], 9)) for r in want.collect())
    assert g == e


def test_kmv_distinct_exact_below_k_and_close_above(spark):
    from kowari_spark.operators.sketch import kmv_distinct

    # group 'small': 30 distinct (< k=64 -> exact); 'big': 5000 distinct
    small = spark.range(30).select(F.lit("small").alias("g"), F.col("id").alias("v"))
    big = spark.range(5000).select(F.lit("big").alias("g"), (F.col("id") + 1000).alias("v"))
    dup = small.unionByName(small)  # duplicates must not inflate the count
    df = dup.unionByName(big)
    got = {r["g"]: r["distinct_est"] for r in
           kmv_distinct(df, ["g"], "v", k=64).collect()}
    assert got["small"] == 30.0
    assert abs(got["big"] - 5000) / 5000 < 0.30  # ~1/sqrt(64) error bound
    # determinism: same data -> same estimate, bit-for-bit
    again = {r["g"]: r["distinct_est"] for r in
             kmv_distinct(df, ["g"], "v", k=64).collect()}
    assert got == again


def test_salted_join_rejects_outer_modes(spark, skewed):
    dim = spark.createDataFrame([("hot", "HOT")], "k string, label string")
    for how in ("right", "full", "full_outer", "right_outer"):
        with pytest.raises(ValueError, match="big-side-driven"):
            salted_join(skewed, dim, ["k"], n_salts=8, how=how)


def test_hll_distinct_register_math_and_determinism(spark):
    """Pins hll_distinct (operators/sketch.py): small groups land in the
    linear-counting branch and must reproduce the driver-computed
    m*ln(m/V) literal exactly; large groups use the raw HLL estimator
    within the ~1.04/sqrt(m) error band; duplicates never inflate; the
    estimate is bit-deterministic run-to-run (portable md5 hash, no RNG)."""
    import math

    from kowari_spark.operators.sketch import hll_distinct

    p, m = 6, 64
    small = spark.range(12).select(F.lit("small").alias("g"), F.col("id").alias("v"))
    big = spark.range(5000).select(F.lit("big").alias("g"), (F.col("id") + 10_000).alias("v"))
    df = small.unionByName(small).unionByName(big)  # dup the small group
    got = {r["g"]: r["distinct_est"] for r in
           hll_distinct(df, ["g"], "v", p=p).collect()}
    # 'small' has 12 distinct values -> at most 12 registers hit -> V >= 52
    # empty registers -> e_raw is tiny -> linear-counting branch. The
    # estimate must be EXACTLY the in-plan round(m*ln(m/V), 9) value
    # for some empty-register count V (round 15: the rounded-ln form
    # replaced the driver literal map so p can reach 12-14).
    lits = {round(m * math.log(m / v), 9) for v in range(1, m + 1)}
    assert got["small"] in lits
    assert abs(got["small"] - 12) <= 2  # m*ln(m/V) is near-exact down here
    assert abs(got["big"] - 5000) / 5000 < 3 * 1.04 / math.sqrt(m)
    again = {r["g"]: r["distinct_est"] for r in
             hll_distinct(df, ["g"], "v", p=p).collect()}
    assert got == again  # bit-for-bit


def test_hll_distinct_state_is_constant_and_p_validated(spark):
    """The register relation carries at most m = 2^p rows per group no
    matter the input size (the property that makes HLL the scale choice
    over KMV), and p outside [4, 14] is refused (the cap moved from 8
    to 14 in round 15 — in-plan linear counting freed it)."""
    import pytest as _pytest

    from kowari_spark.operators.sketch import hll_distinct

    df = spark.range(20_000).select(
        F.lit("g").alias("g"), F.col("id").alias("v")
    )
    for p in (4, 8, 12):
        m = 1 << p
        out = hll_distinct(df, ["g"], "v", p=p).collect()
        assert len(out) == 1
        assert abs(out[0]["distinct_est"] - 20_000) / 20_000 < 3 * 1.04 / (m ** 0.5)
    for bad in (3, 15):
        with _pytest.raises(ValueError, match=r"p must be in \[4, 14\]"):
            hll_distinct(df, ["g"], "v", p=bad)


def test_hll_layout_build_append_estimate_parity(spark, tmp_path):
    """Stored HLL sketch layout (round 14): build(a) + append(b) ==
    build(a ∪ b) bit-for-bit (register relation AND estimates);
    estimates from the store == one-shot hll_distinct over the union;
    a REPLAYED append is a no-op by max-merge algebra (not markers);
    deletes don't exist (sketches aren't subtractable) and param
    mismatches refuse via the sidecar."""
    from kowari_spark.operators.sketch import (
        append_hll_layout,
        build_hll_layout,
        hll_distinct,
        hll_layout_estimate,
    )

    base = spark.range(8000).select(
        (F.col("id") % 3).cast("string").alias("g"),
        (F.col("id") % 2500).alias("v"),
    )
    a = base.filter(F.col("id") % 5 != 0)
    b = base.filter(F.col("id") % 5 == 0)
    path = str(tmp_path / "hll_lay")
    build_hll_layout(a, path, ["g"], "v", p=6)
    append_hll_layout(spark, path, b)

    def regs(p):
        return sorted(map(tuple, spark.read.parquet(p).collect()))

    union_path = str(tmp_path / "hll_union")
    build_hll_layout(base, union_path, ["g"], "v", p=6)
    assert regs(path) == regs(union_path)

    got = {r["g"]: r["distinct_est"]
           for r in hll_layout_estimate(spark, path).collect()}
    want = {r["g"]: r["distinct_est"]
            for r in hll_distinct(base, ["g"], "v", p=6).collect()}
    assert got == want

    append_hll_layout(spark, path, b)  # replay: bit-identical state
    assert regs(path) == regs(union_path)

    # sidecar refusals: not-a-layout and version drift
    import json

    from kowari_spark import fsutil
    from kowari_spark.operators.sketch import _HLL_META_NAME
    import pytest as _pytest

    with _pytest.raises(ValueError, match="not an HLL sketch layout"):
        hll_layout_estimate(spark, str(tmp_path / "nope"))
    meta = json.loads(fsutil.read_bytes(spark, f"{path}/{_HLL_META_NAME}"))
    meta["version"] = "hll-registers-v0"
    fsutil.write_bytes(
        spark, f"{path}/{_HLL_META_NAME}", json.dumps(meta).encode()
    )
    with _pytest.raises(ValueError, match="rebuild"):
        hll_layout_estimate(spark, path)


def test_hll_layout_append_swap_crash_recovery(spark, tmp_path):
    """A crash between the append's two renames leaves no ``path`` —
    the next touch finishes the swap (sidecar-complete tmp promoted;
    otherwise the backup restores) and estimates are the merged ones."""
    from kowari_spark import fsutil
    from kowari_spark.operators.sketch import (
        _HLL_META_NAME,
        append_hll_layout,
        build_hll_layout,
        hll_distinct,
        hll_layout_estimate,
    )

    base = spark.range(2000).select(
        F.lit("g").alias("g"), (F.col("id") % 900).alias("v")
    )
    a = base.filter(F.col("id") % 2 == 0)
    b = base.filter(F.col("id") % 2 == 1)
    path = str(tmp_path / "hll_crash")
    build_hll_layout(a, path, ["g"], "v", p=5)
    append_hll_layout(spark, path, b)
    # simulate the between-renames crash state: merged tmp complete,
    # original moved to bak, path missing
    fsutil.rename(spark, path, f"{path}.__sk_tmp")
    fsutil.write_bytes(spark, f"{path}.__sk_bak/stale", b"x")
    got = {r["g"]: r["distinct_est"]
           for r in hll_layout_estimate(spark, path).collect()}
    want = {r["g"]: r["distinct_est"]
            for r in hll_distinct(base, ["g"], "v", p=5).collect()}
    assert got == want
    assert not fsutil.exists(spark, f"{path}.__sk_tmp")
    assert not fsutil.exists(spark, f"{path}.__sk_bak")


def test_kmv_layout_build_append_estimate_parity(spark, tmp_path):
    """Stored KMV minima layout (round 14, the HLL layout's twin):
    build(a) + append(b) == build(a ∪ b) bit-for-bit; estimates from
    the store == one-shot kmv_distinct over the union (EXACT below k);
    replayed appends are no-ops by keep-k-smallest algebra; param
    drift refuses via the sidecar."""
    from kowari_spark.operators.sketch import (
        append_kmv_layout,
        build_kmv_layout,
        kmv_distinct,
        kmv_layout_estimate,
    )

    small = spark.range(30).select(
        F.lit("small").alias("g"), F.col("id").alias("v"))
    big = spark.range(5000).select(
        F.lit("big").alias("g"), (F.col("id") + 1000).alias("v"))
    base = small.unionByName(big)
    a = base.filter(F.col("v") % 2 == 0)
    b = base.filter(F.col("v") % 2 == 1)
    path = str(tmp_path / "kmv_lay")
    build_kmv_layout(a, path, ["g"], "v", k=64)
    append_kmv_layout(spark, path, b)

    def minima(p):
        return sorted(map(tuple, spark.read.parquet(p).collect()))

    union_path = str(tmp_path / "kmv_union")
    build_kmv_layout(base, union_path, ["g"], "v", k=64)
    assert minima(path) == minima(union_path)

    got = {r["g"]: r["distinct_est"]
           for r in kmv_layout_estimate(spark, path).collect()}
    want = {r["g"]: r["distinct_est"]
            for r in kmv_distinct(base, ["g"], "v", k=64).collect()}
    assert got == want and got["small"] == 30.0  # exact below k

    append_kmv_layout(spark, path, b)  # replay: bit-identical
    assert minima(path) == minima(union_path)

    import pytest as _pytest

    with _pytest.raises(ValueError, match="not a KMV sketch layout"):
        kmv_layout_estimate(spark, str(tmp_path / "nope"))
