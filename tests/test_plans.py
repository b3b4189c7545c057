"""Physical-plan shape assertions — the 100 TB checklist, executable.

Each test pins a plan property that matters at scale: predicate pushdown
reaching the Parquet scan, column pruning, broadcast joins for small
dims, TakeOrderedAndProject for single-query top-k (distributed heap,
not a global sort), and partition pruning on index layouts.
"""

import pytest
from pyspark.sql import functions as F

from kowari_spark.operators import knn
from kowari_spark.operators.topk import knn_batch


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


@pytest.fixture(autouse=True)
def _uncached(spark):
    """Plan assertions inspect the Parquet scan; a cached table from an
    earlier test would swap it for InMemoryTableScan."""
    spark.catalog.clearCache()
    yield


def test_filter_pushdown_reaches_scan(spark, sf_dir):
    df = (
        spark.read.parquet(f"{sf_dir}/embeddings.parquet")
        .filter(F.col("label") == 3)
        .select("vec_id")
    )
    plan = _plan(df)
    assert "PushedFilters: [IsNotNull(label), EqualTo(label,3)]" in plan


def test_column_pruning_reaches_scan(spark, sf_dir):
    df = spark.read.parquet(f"{sf_dir}/lineitem.parquet").select(
        "l_orderkey", "l_quantity"
    )
    plan = _plan(df)
    # ReadSchema must carry ONLY the projected columns
    assert "ReadSchema: struct<l_orderkey:bigint,l_quantity:double>" in plan


def test_single_knn_plans_as_take_ordered(spark, sf_dir):
    base = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    q = [0.1] * 64
    plan = _plan(knn(base, q, 10, id_col="vec_id"))
    assert "TakeOrderedAndProject" in plan  # heap + merge, no global sort


def test_dim_joins_broadcast(spark, sf_dir):
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    orders = spark.read.parquet(f"{sf_dir}/orders.parquet")
    nation = spark.read.parquet(f"{sf_dir}/nation.parquet")
    cust = spark.read.parquet(f"{sf_dir}/customer.parquet")
    j = (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(cust), orders.o_custkey == cust.c_custkey)
        .join(F.broadcast(nation), cust.c_nationkey == nation.n_nationkey)
        .groupBy("n_name")
        .agg(F.count("*").alias("n"))
    )
    plan = _plan(j)
    assert plan.count("BroadcastHashJoin") >= 2
    # the big fact-fact join must NOT broadcast lineitem
    assert "SortMergeJoin" in plan or "ShuffledHashJoin" in plan or plan.count("BroadcastHashJoin") >= 3


def test_partial_aggregation_before_shuffle(spark, sf_dir):
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    agg = li.groupBy("l_returnflag").agg(F.sum("l_quantity").alias("s"))
    plan = _plan(agg)
    # partial_sum before the exchange = map-side combine
    assert "partial_sum" in plan


def test_knn_batch_heap_shuffles_only_candidates(spark, sf_dir):
    base = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    queries = base.filter(F.col("vec_id") < 4).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    out = knn_batch(base, queries, 5, id_col="vec_id")
    plan = _plan(out)
    assert "MapInPandas" in plan and "Window" in plan
    # base vectors feed the python heap stage DIRECTLY from the scan —
    # the only shuffle in the plan is the tiny candidate set keyed by
    # query_id for the final window
    below_python = plan.split("MapInPandas", 1)[1].split("Scan parquet")[0]
    assert "Exchange" not in below_python


def test_lsh_layout_partition_prunes(spark, sf_dir, tmp_path):
    from kowari_spark.operators.lsh import SignLSH

    base = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    lsh = SignLSH(dim=64, num_planes=4, seed=42)
    path = str(tmp_path / "lsh")
    lsh.build(base, path)
    stored = lsh.load(spark, path)
    probe = stored.filter(F.col("bucket") == 5)
    plan = _plan(probe)
    assert "PartitionFilters: [isnotnull(bucket" in plan


def test_events_agg_prunes_unused_columns(spark, sf_dir):
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    agg = ev.groupBy("event_type").agg(F.count("*").alias("n"))
    plan = _plan(agg)
    assert "ReadSchema: struct<event_type:string>" in plan


def test_ivf_batch_probe_prunes_built_layout(spark, sf_dir, tmp_path):
    """The batch probe must reach the built layout with a literal
    list_id IN (...) partition filter (static pruning ahead of the
    broadcast join), so only n_probe/n_lists of the files are read."""
    from kowari_spark.operators.ivf import IVF

    base = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    ivf = IVF(n_lists=8, n_probe=2, max_iter=2, seed=42).fit(base, id_col="vec_id")
    path = str(tmp_path / "ivf_plan")
    ivf.build(base, path)
    stored = ivf.load(spark, path)
    queries = base.filter(F.col("vec_id") < 2).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    out = ivf.query_batch(stored, queries, 5, id_col="vec_id", round_to=6)
    plan = _plan(out)
    assert "PartitionFilters" in plan and "list_id" in plan
    assert "CartesianProduct" not in plan and "BroadcastNestedLoopJoin" not in plan


def test_hnsw_query_no_python_eval(spark, sf_dir):
    """The whole beam search — descent, expansion, scoring, ranking —
    must stay JVM-side (joins + windows + native score expressions)."""
    from kowari_spark.operators.hnsw import HNSW

    base = spark.read.parquet(f"{sf_dir}/embeddings.parquet").filter(
        F.col("vec_id") < 100
    )
    h = HNSW(m=4, ef=8, seed=42, max_level=2)
    edges = h.build(base, id_col="vec_id")
    queries = base.filter(F.col("vec_id") < 2).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    out = h.query_batch(base, edges, queries, 3, id_col="vec_id", round_to=6)
    plan = _plan(out)
    for forbidden in ("MapInPandas", "BatchEvalPython", "ArrowEvalPython", "PythonUDF"):
        assert forbidden not in plan, forbidden


def test_star_edges_plan_partial_min_no_cartesian(spark, sf_dir):
    """The star candidate generator's bucket-min must partially
    aggregate map-side (the shuffle carries one row per bucket per map
    partition, not one per member), the join-back must be an equi-join
    on the bucket key (AQE skew-splittable — the whole point), and no
    cartesian product may appear anywhere."""
    from kowari_spark.operators.dedup import minhash_band_pairs

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    star = minhash_band_pairs(docs, edges="star")
    plan = _plan(star)
    assert "partial_min" in plan
    assert "CartesianProduct" not in plan and "BroadcastNestedLoop" not in plan
    # the join-back keys on the bucket columns
    assert "band" in plan and "band_key" in plan
