"""Deterministic sampling / splits (operators/sampling.py)."""

from pyspark.sql import functions as F

from kowari_spark.operators.sampling import (
    deterministic_sample,
    hash_uniform,
    train_val_test,
)


def test_sample_is_stable_and_near_fraction(spark):
    df = spark.range(10_000).select(F.col("id").alias("doc_id"))
    a = deterministic_sample(df, 0.2, seed=3)
    b = deterministic_sample(df.repartition(7), 0.2, seed=3)
    ids_a = sorted(r["doc_id"] for r in a.collect())
    ids_b = sorted(r["doc_id"] for r in b.collect())
    assert ids_a == ids_b  # partitioning-independent
    assert 0.17 <= len(ids_a) / 10_000 <= 0.23
    # different seed -> different (mostly disjoint-ish) sample
    c = {r["doc_id"] for r in deterministic_sample(df, 0.2, seed=4).collect()}
    assert set(ids_a) != c


def test_splits_partition_rows_exhaustively(spark):
    df = spark.range(5_000).select(F.col("id").alias("doc_id"))
    s = train_val_test(df, seed=1)
    counts = {r["split"]: r["n"] for r in
              s.groupBy("split").agg(F.count("*").alias("n")).collect()}
    assert set(counts) == {"train", "val", "test"}
    assert sum(counts.values()) == 5_000
    assert 0.75 <= counts["train"] / 5_000 <= 0.85
    # assignment is per-id stable: re-running over a subset agrees
    sub = train_val_test(df.filter(F.col("doc_id") < 100), seed=1)
    full = {r["doc_id"]: r["split"] for r in s.filter(F.col("doc_id") < 100).collect()}
    for r in sub.collect():
        assert full[r["doc_id"]] == r["split"]


def test_hash_uniform_range(spark):
    df = spark.range(1_000).select(hash_uniform(F.col("id"), 9).alias("u"))
    mm = df.agg(F.min("u"), F.max("u"), F.avg("u")).first()
    assert 0.0 <= mm[0] and mm[1] < 1.0
    assert 0.4 <= mm[2] <= 0.6


def test_stratified_sample_per_group_rates(spark):
    from kowari_spark.operators.sampling import stratified_sample

    df = spark.range(6_000).select(
        F.col("id").alias("doc_id"),
        F.when(F.col("id") % 3 == 0, "en")
        .when(F.col("id") % 3 == 1, "de")
        .otherwise("fr")
        .alias("lang"),
    )
    out = stratified_sample(df, "lang", {"en": 0.5, "de": 0.1}, seed=5)
    rates = {r["lang"]: r["n"] / 2_000 for r in
             out.groupBy("lang").agg(F.count("*").alias("n")).collect()}
    assert 0.44 <= rates["en"] <= 0.56
    assert 0.05 <= rates["de"] <= 0.15
    assert "fr" not in rates  # default fraction 0
    # deterministic across partitionings
    a = sorted(r["doc_id"] for r in out.collect())
    b = sorted(r["doc_id"] for r in
               stratified_sample(df.repartition(5), "lang", {"en": 0.5, "de": 0.1}, seed=5).collect())
    assert a == b
