"""As-of join: semantics vs hand-built expectations + pandas merge_asof."""

import pandas as pd
import pytest
from pyspark.sql import functions as F

from kowari_spark.operators.asof import asof_join


def test_basic_backward_asof(spark):
    left = spark.createDataFrame(
        [(1, 10, "l1"), (1, 20, "l2"), (1, 5, "l0"), (2, 10, "m1")],
        "k long, t long, name string",
    )
    right = spark.createDataFrame(
        [(1, 8, 100.0), (1, 15, 200.0), (2, 10, 300.0), (3, 1, 999.0)],
        "k long, t long, price double",
    )
    out = asof_join(left, right, "t", ["k"])
    got = {r["name"]: r["price_asof"] for r in out.collect()}
    assert got == {
        "l0": None,     # nothing at or before t=5
        "l1": 100.0,    # t=8 is the latest <= 10
        "l2": 200.0,    # t=15 latest <= 20
        "m1": 300.0,    # equal time matches (<= semantics)
    }


def test_matches_pandas_merge_asof(spark, sf_dir):
    # Load via the same dtype-branching loader the entry point uses
    # (events.parquet may store ts as int64-nanos or native timestamp[us]),
    # then normalize to long microseconds for the pandas comparison.
    from __spark_entry__ import _events

    ev = _events(spark, sf_dir).withColumn(
        "ts", F.unix_micros(F.col("ts"))
    )
    left = ev.filter(F.col("event_type") == "purchase").select(
        "event_id", "user_id", "ts", "value"
    )
    right = (
        ev.filter(F.col("event_type") == "click")
        .groupBy("user_id", "ts")
        .agg(F.max("value").alias("click_value"))
    )
    got = asof_join(left, right, "ts", ["user_id"]).toPandas()

    lp = left.toPandas().sort_values("ts")
    rp = right.toPandas().sort_values("ts")
    want = pd.merge_asof(
        lp, rp, on="ts", by="user_id", direction="backward"
    )
    g = got.sort_values("event_id")[["event_id", "click_value_asof"]].reset_index(drop=True)
    w = want.sort_values("event_id")[["event_id", "click_value"]].reset_index(drop=True)
    assert len(g) == len(w)
    for a, b in zip(g["click_value_asof"], w["click_value"]):
        assert (pd.isna(a) and pd.isna(b)) or a == b


def test_equal_time_right_rows_deterministic(spark):
    """Right rows sharing (key, time): the greatest tiebreak tuple wins,
    independent of input/physical order."""
    left = spark.createDataFrame([(1, 10, "l")], "k long, t long, name string")
    dup = [(1, 10, 100.0), (1, 10, 300.0), (1, 10, 200.0)]
    for perm in (dup, dup[::-1], [dup[1], dup[0], dup[2]]):
        right = spark.createDataFrame(perm, "k long, t long, price double").repartition(3)
        out = asof_join(left, right, "t", ["k"])
        assert out.collect()[0]["price_asof"] == 300.0


def test_explicit_tiebreak_column(spark):
    left = spark.createDataFrame([(1, 10, "l")], "k long, t long, name string")
    right = spark.createDataFrame(
        [(1, 10, 5, 100.0), (1, 10, 9, 50.0)], "k long, t long, rid long, price double"
    )
    out = asof_join(left, right, "t", ["k"], value_cols=["price"], tiebreak=["rid"])
    # rid=9 is the greatest tiebreak, so its price wins even though smaller
    assert out.collect()[0]["price_asof"] == 50.0
