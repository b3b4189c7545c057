"""Exact grouped quantiles (operators/stats.py)."""

import pytest
from pyspark.sql import functions as F

from kowari_spark.operators.stats import exact_quantiles


def test_exact_quantiles_known_values(spark):
    rows = [("a", float(v)) for v in range(1, 101)] + [("b", 7.0), ("b", 9.0), ("b", 11.0)]
    df = spark.createDataFrame(rows, "k string, v double")
    got = {r["k"]: r for r in exact_quantiles(df, ["k"], "v").collect()}
    # group a: n=100 -> ranks 50, 95, 99
    assert got["a"]["n"] == 100
    assert got["a"]["p50"] == 50.0 and got["a"]["p95"] == 95.0 and got["a"]["p99"] == 99.0
    # group b: n=3 -> ceil(1.5)=2, ceil(2.85)=3, ceil(2.97)=3
    assert got["b"]["n"] == 3
    assert got["b"]["p50"] == 9.0 and got["b"]["p95"] == 11.0 and got["b"]["p99"] == 11.0


def test_exact_quantiles_ties_and_single_row(spark):
    df = spark.createDataFrame(
        [("t", 5.0), ("t", 5.0), ("t", 5.0), ("s", 42.0)], "k string, v double"
    )
    got = {r["k"]: r for r in exact_quantiles(df, ["k"], "v", (0.5,)).collect()}
    assert got["t"]["p50"] == 5.0
    assert got["s"]["n"] == 1 and got["s"]["p50"] == 42.0
