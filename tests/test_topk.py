"""Exact top-k search tests.

Mirrors the reference invariants: self-query returns self at rank 1 with
cosine score 1.0 (tests/integration_tests.rs:34-40), scores monotone
non-increasing (:70-72), metadata preserved through search (:183-215);
plus heap-vs-window strategy equivalence (engine-specific).
"""

import pytest
from pyspark.sql import functions as F

from kowari_spark.operators import knn, knn_batch, resolve
from kowari_spark.schema import vector_df, vector_row


@pytest.fixture(scope="module")
def small(spark):
    rows = [
        vector_row([1.0, 0.0, 0.0], {"label": "e1"}, id="e1"),
        vector_row([0.0, 1.0, 0.0], {"label": "e2"}, id="e2"),
        vector_row([0.0, 0.0, 1.0], {"label": "e3"}, id="e3"),
        vector_row([0.9, 0.1, 0.0], {"label": "near-e1"}, id="n1"),
    ]
    return vector_df(spark, rows).cache()


def test_self_query_rank1(small):
    res = knn(small, [1.0, 0.0, 0.0], 3).collect()
    assert res[0]["id"] == "e1"
    assert res[0]["score"] == pytest.approx(1.0)
    scores = [r["score"] for r in res]
    assert scores == sorted(scores, reverse=True)


def test_cosine_ordering(small):
    res = knn(small, [1.0, 0.0, 0.0], 4).collect()
    assert [r["id"] for r in res][:2] == ["e1", "n1"]


def test_euclidean_metric(small):
    res = knn(small, [0.0, 1.0, 0.0], 1, metric="euclidean").collect()
    assert res[0]["id"] == "e2"
    assert res[0]["score"] == pytest.approx(0.0)


def test_resolve_preserves_metadata(small):
    res = resolve(knn(small, [1.0, 0.0, 0.0], 2), small)
    rows = {r["id"]: r for r in res.collect()}
    assert '"label":"e1"' in rows["e1"]["metadata"].replace(" ", "")


def test_resolve_silent_drop(small, spark):
    """Ids missing from storage are silently dropped (query.rs:18-24)."""
    base = small.filter(F.col("id") != "e1")
    res = resolve(knn(small, [1.0, 0.0, 0.0], 2), base)
    assert [r["id"] for r in res.collect()] == ["n1"]


@pytest.mark.parametrize("metric", ["cosine", "euclidean", "manhattan", "dot"])
def test_batch_heap_equals_window(spark, embeddings, metric):
    base = embeddings.withColumnRenamed("vec_id", "id")
    queries = base.select(F.col("id").alias("query_id"), "embedding").limit(7)
    a = knn_batch(base, queries, 5, metric=metric, round_to=6, strategy="heap")
    b = knn_batch(base, queries, 5, metric=metric, round_to=6, strategy="window")
    rows_a = sorted(map(tuple, a.select("query_id", "id", "score", "rank").collect()))
    rows_b = sorted(map(tuple, b.select("query_id", "id", "score", "rank").collect()))
    assert rows_a == rows_b
    assert len(rows_a) == 7 * 5


def test_batch_self_query(spark, embeddings):
    base = embeddings.withColumnRenamed("vec_id", "id")
    queries = base.select(F.col("id").alias("query_id"), "embedding").limit(5)
    res = knn_batch(base, queries, 1, round_to=6).collect()
    for r in res:
        assert r["query_id"] == r["id"]
        assert r["score"] == pytest.approx(1.0, abs=1e-5)


def test_knn_two_stage_matches_exact(spark, embeddings):
    from pyspark.sql import functions as F
    from kowari_spark.operators import knn
    from kowari_spark.operators.topk import knn_two_stage

    base = embeddings.limit(300)
    q = [float(x) for x in base.filter(F.col("vec_id") == 3).first()["embedding"]]
    exact = [(r["vec_id"], r["score"]) for r in
             knn(base, q, 5, id_col="vec_id", round_to=6).collect()]
    # with a generous candidate pool the two-stage result is exact
    two = [(r["vec_id"], r["score"]) for r in
           knn_two_stage(base, q, 5, candidates=100, id_col="vec_id", round_to=6).collect()]
    assert two == exact
    # even the default narrow pool must keep the self-hit at rank 1
    narrow = knn_two_stage(base, q, 5, id_col="vec_id", round_to=6).collect()
    assert narrow[0]["vec_id"] == 3 and narrow[0]["score"] == 1.0
