"""HNSW tests: self-query rank-1 (tests/integration_tests.rs:247-273)
and recall@10 vs brute force — the acceptance metric the reference
defines but never asserts (src/utils.rs:64-79; SURVEY.md §5.2.6)."""

import pytest
from pyspark.sql import functions as F

from kowari_spark.operators.eval import mean_metric, recall_at_k
from kowari_spark.operators.hnsw import HNSW, assign_levels
from kowari_spark.operators.topk import knn_batch


@pytest.fixture(scope="module")
def base(spark, embeddings):
    return embeddings.withColumnRenamed("vec_id", "id").limit(200).cache()


@pytest.fixture(scope="module")
def index(base):
    hnsw = HNSW(m=8, ef=32, seed=42)
    edges = hnsw.build(base).cache()
    edges.count()
    return hnsw, edges


def test_levels_deterministic_and_geometric(base, spark):
    a = assign_levels(base, seed=42).select("id", "node_level")
    b = assign_levels(base, seed=42).select("id", "node_level")
    assert a.exceptAll(b).isEmpty()
    counts = {r["node_level"]: r["count"] for r in a.groupBy("node_level").count().collect()}
    # roughly half the nodes at level 0
    assert counts.get(0, 0) > 0.3 * sum(counts.values())


def test_edges_degree_bounded(index):
    _, edges = index
    worst = (
        edges.groupBy("src", "level").count().agg(F.max("count")).first()[0]
    )
    assert worst <= 8  # M


def test_self_query_rank1(base, index):
    hnsw, edges = index
    queries = base.select(F.col("id").alias("query_id"), "embedding").limit(10)
    res = hnsw.query_batch(base, edges, queries, 1, round_to=6).collect()
    for r in res:
        assert r["query_id"] == r["id"]
        assert r["score"] == pytest.approx(1.0, abs=1e-5)


def test_recall_vs_bruteforce(base, index):
    hnsw, edges = index
    queries = base.select(F.col("id").alias("query_id"), "embedding").limit(15)
    approx = hnsw.query_batch(base, edges, queries, 10, round_to=6)
    exact = knn_batch(base, queries, 10, round_to=6)
    m = mean_metric(recall_at_k(exact, approx, 10), "recall")
    assert m >= 0.9, f"hnsw recall@10 too low: {m}"


def test_build_plan_no_python_no_collect(base):
    """The round-1 build collected every layer to the driver (via
    knn_batch's query broadcast). The distributed build must be pure
    JVM: no Python eval nodes, no driver-side collect of the layer —
    candidates come from the LSH self-join, pruning from a window."""
    hnsw = HNSW(m=8, ef=32, seed=42)
    plan = hnsw.candidate_graph(base)._jdf.queryExecution().executedPlan().toString()
    for forbidden in ("MapInPandas", "BatchEvalPython", "ArrowEvalPython", "PythonUDF"):
        assert forbidden not in plan, f"{forbidden} in build plan"
    assert "Window" in plan
    # candidate generation is the bucketed self-join, not a cross join
    assert "CartesianProduct" not in plan and "BroadcastNestedLoopJoin" not in plan


def test_no_zero_degree_nodes(base, index):
    _, edges = index
    lvl0 = edges.filter(F.col("level") == 0)
    out_missing = base.select(F.col("id").alias("src")).join(
        lvl0.select("src").distinct(), "src", "left_anti"
    )
    assert out_missing.isEmpty()
