"""Property-based checks (SURVEY.md §5.2 item 7 — absent in the
reference, declared as our addition): metric laws verified on
hypothesis-generated vectors through the REAL Spark expressions.

One Spark job per property: hypothesis builds a batch of vector triples,
the property is asserted row-wise over the whole batch.
"""

import math

import pytest
from hypothesis import given, settings, strategies as st
from pyspark.sql import functions as F

from kowari_spark.functions.vector import (
    cosine_similarity,
    euclidean_distance,
    magnitude,
    manhattan_distance,
    normalize,
)

DIM = 6
finite = st.floats(
    min_value=-1e3, max_value=1e3, allow_nan=False, allow_infinity=False, width=32
)
vec = st.lists(finite, min_size=DIM, max_size=DIM)
triples = st.lists(st.tuples(vec, vec, vec), min_size=1, max_size=8)


def _df(spark, batch):
    return spark.createDataFrame(
        [(list(a), list(b), list(c)) for a, b, c in batch],
        f"a array<double>, b array<double>, c array<double>",
    )


@settings(max_examples=5, deadline=None)
@given(batch=triples)
def test_cosine_symmetry_and_bounds(spark, batch):
    rows = _df(spark, batch).select(
        cosine_similarity("a", "b").alias("ab"),
        cosine_similarity("b", "a").alias("ba"),
    ).collect()
    for r in rows:
        assert r["ab"] == pytest.approx(r["ba"], abs=1e-9)
        assert -1.0 - 1e-9 <= r["ab"] <= 1.0 + 1e-9


@settings(max_examples=5, deadline=None)
@given(batch=triples, scale=st.floats(min_value=1e-3, max_value=1e3))
def test_cosine_scale_invariance(spark, batch, scale):
    df = _df(spark, batch).withColumn(
        "sa", F.transform("a", lambda x: x * F.lit(float(scale)))
    )
    rows = df.select(
        cosine_similarity("a", "b").alias("ab"),
        cosine_similarity("sa", "b").alias("sab"),
        magnitude("a").alias("ma"),
    ).collect()
    for r in rows:
        if r["ma"] > 1e-6:  # scaling a zero vector stays zero -> both 0.0
            assert r["sab"] == pytest.approx(r["ab"], abs=1e-6)


@settings(max_examples=5, deadline=None)
@given(batch=triples)
def test_euclidean_triangle_inequality(spark, batch):
    rows = _df(spark, batch).select(
        euclidean_distance("a", "b").alias("ab"),
        euclidean_distance("a", "c").alias("ac"),
        euclidean_distance("c", "b").alias("cb"),
    ).collect()
    for r in rows:
        assert r["ab"] <= r["ac"] + r["cb"] + 1e-6


@settings(max_examples=5, deadline=None)
@given(batch=triples)
def test_manhattan_symmetry_and_dominates_euclidean(spark, batch):
    rows = _df(spark, batch).select(
        manhattan_distance("a", "b").alias("m_ab"),
        manhattan_distance("b", "a").alias("m_ba"),
        euclidean_distance("a", "b").alias("e_ab"),
    ).collect()
    for r in rows:
        assert r["m_ab"] == pytest.approx(r["m_ba"], abs=1e-9)
        assert r["m_ab"] >= r["e_ab"] - 1e-6  # L1 >= L2 always


@settings(max_examples=5, deadline=None)
@given(batch=triples)
def test_normalize_is_unit_or_zero(spark, batch):
    rows = _df(spark, batch).select(
        magnitude("a").alias("m"),
        magnitude(normalize("a")).alias("nm"),
    ).collect()
    for r in rows:
        if r["m"] == 0.0:
            assert r["nm"] == 0.0
        else:
            assert r["nm"] == pytest.approx(1.0, abs=1e-9)
