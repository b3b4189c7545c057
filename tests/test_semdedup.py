"""SemDeDup semantic dedup (operators/dedup.semantic_dedup)."""

import pytest
from pyspark.sql import functions as F

from kowari_spark.operators.dedup import semantic_dedup
from kowari_spark.operators.ivf import IVF


@pytest.fixture(scope="module")
def clustered(spark):
    # two tight direction-clusters plus one loner
    rows = [
        (0, [1.0, 0.0, 0.0]),
        (1, [0.999, 0.01, 0.0]),
        (2, [0.998, 0.02, 0.0]),
        (10, [0.0, 1.0, 0.0]),
        (11, [0.0, 0.999, 0.01]),
        (20, [0.0, 0.0, 1.0]),
    ]
    return spark.createDataFrame(rows, "vec_id long, embedding array<double>")


def test_clusters_keep_min_id_representative(clustered):
    out = {
        r["vec_id"]: r
        for r in semantic_dedup(
            clustered, threshold=0.99, n_lists=2, ivf=IVF(n_lists=2, round_centroids=6)
        ).collect()
    }
    assert len(out) == 6
    # 0,1,2 collapse to rep 0; 10,11 to rep 10; 20 survives alone
    assert out[0]["rep_id"] == 0 and out[0]["is_kept"]
    assert out[1]["rep_id"] == 0 and not out[1]["is_kept"]
    assert out[2]["rep_id"] == 0 and not out[2]["is_kept"]
    assert out[10]["rep_id"] == 10 and out[10]["is_kept"]
    assert out[11]["rep_id"] == 10 and not out[11]["is_kept"]
    assert out[20]["rep_id"] == 20 and out[20]["is_kept"]


def test_kept_set_equals_distinct_reps(clustered):
    out = semantic_dedup(
        clustered, threshold=0.99, ivf=IVF(n_lists=2, round_centroids=6)
    )
    kept = sorted(r["vec_id"] for r in out.filter("is_kept").collect())
    reps = sorted(r["rep_id"] for r in out.select("rep_id").distinct().collect())
    assert kept == reps


def test_preassigned_layout_skips_quantizer(clustered):
    """A df that already carries list_id (a loaded IVF layout) is used
    as-is — no ivf needed, no fit jobs."""
    pre = clustered.withColumn(
        "list_id", (F.col("vec_id") >= 10).cast("int")
    )
    out = {
        r["vec_id"]: r["rep_id"]
        for r in semantic_dedup(pre, threshold=0.99).collect()
    }
    assert out[1] == 0 and out[11] == 10 and out[20] == 20


def test_pair_join_is_cluster_local(clustered):
    pre = clustered.withColumn("list_id", (F.col("vec_id") >= 10).cast("int"))
    plan = (
        semantic_dedup(pre, threshold=0.99)
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "CartesianProduct" not in plan


def test_cross_cell_near_dups_not_connected(spark):
    """Near-identical vectors split across cells are NOT paired — the
    documented approximation of cluster-local comparison."""
    rows = [(0, [1.0, 0.0]), (1, [0.999, 0.001])]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    pre = df.withColumn("list_id", F.col("vec_id").cast("int"))
    out = {r["vec_id"]: r for r in semantic_dedup(pre, threshold=0.9).collect()}
    assert out[0]["is_kept"] and out[1]["is_kept"]


def test_gemm_scorer_parity_with_expr(spark, sf_dir):
    """The GEMM cell scorer must reproduce the expression engine's
    output bit-for-bit on the real embeddings table (margin-select +
    exact sequential rescore)."""
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    ivf = IVF(n_lists=8, max_iter=2, seed=42, round_centroids=6)
    ivf.fit(emb, id_col="vec_id")
    kw = dict(threshold=0.3, id_col="vec_id", ivf=ivf)
    a = semantic_dedup(emb, scorer="expr", **kw).toPandas().sort_values("vec_id")
    b = semantic_dedup(emb, scorer="gemm", **kw).toPandas().sort_values("vec_id")
    assert a.values.tolist() == b.values.tolist()


def test_gemm_scorer_zero_norm_guard(spark):
    rows = [
        (0, [0.0, 0.0]), (1, [0.0, 0.0]),  # zero vectors: cos defined 0.0
        (2, [1.0, 0.0]), (3, [1.0, 0.0]),
    ]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    pre = df.withColumn("list_id", F.lit(0))
    out = {r["vec_id"]: r for r in semantic_dedup(pre, 0.9, scorer="gemm").collect()}
    # zero-norm pairs score 0.0 (never dup); identical unit vectors pair up
    assert out[0]["is_kept"] and out[1]["is_kept"]
    assert out[2]["is_kept"] and out[3]["rep_id"] == 2


def test_bad_scorer_rejected(clustered):
    with pytest.raises(ValueError):
        semantic_dedup(clustered, 0.5, ivf=IVF(n_lists=2), scorer="nope")


def test_auto_n_lists_flows_through(spark, embeddings):
    """semantic_dedup(n_lists='auto') rides IVF's sqrt-n sizing: same
    output as passing the resolved value explicitly."""
    import math

    from kowari_spark.operators.dedup import semantic_dedup

    base = embeddings.limit(144).cache()
    n = base.count()
    want = max(1, int(round(math.sqrt(n))))
    a = semantic_dedup(base, threshold=0.3, n_lists="auto")
    b = semantic_dedup(base, threshold=0.3, n_lists=want)
    assert sorted(map(tuple, a.collect())) == sorted(map(tuple, b.collect()))


def test_star_edges_expr_gemm_parity(spark, sf_dir):
    """Verified-star cell scoring: expr and GEMM engines agree
    bit-for-bit (one GEMV + the same exact sequential rescore)."""
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    ivf = IVF(n_lists=8, max_iter=2, seed=42, round_centroids=6)
    ivf.fit(emb, id_col="vec_id")
    kw = dict(threshold=0.3, id_col="vec_id", ivf=ivf, edges="star")
    a = semantic_dedup(emb, scorer="expr", **kw).toPandas().sort_values("vec_id")
    b = semantic_dedup(emb, scorer="gemm", **kw).toPandas().sort_values("vec_id")
    assert a.values.tolist() == b.values.tolist()


def test_auto_edges_small_cells_match_pairs(clustered):
    """edges="auto" on task-sized cells == the exact all-pairs mode."""
    kw = dict(threshold=0.99, ivf=IVF(n_lists=2, round_centroids=6))
    auto = semantic_dedup(clustered, **kw).toPandas().sort_values("vec_id")
    kw = dict(threshold=0.99, ivf=IVF(n_lists=2, round_centroids=6))
    pinned = semantic_dedup(
        clustered, edges="pairs", **kw
    ).toPandas().sort_values("vec_id")
    assert auto.values.tolist() == pinned.values.tolist()


def test_hot_cell_star_bounds_dense_cluster(spark):
    """The hot-cell regime (VERDICT r8 missing #2): a planted dense
    cell of near-identical vectors. max_cell below the family size
    flips auto to star; the family still collapses to ONE survivor
    (near-identical members are all within threshold of the min, so
    the verified-star component equals the all-pairs component)."""
    n = 400
    fam = spark.range(n).select(
        F.col("id").alias("vec_id"),
        F.array(
            (F.lit(1.0) + F.col("id").cast("double") / 1.0e7),
            F.lit(0.0),
        ).alias("embedding"),
    )
    loner = spark.createDataFrame(
        [(10_000, [0.0, 1.0])], "vec_id long, embedding array<double>"
    )
    pre = fam.unionByName(loner).withColumn(
        "list_id", (F.col("vec_id") >= 10_000).cast("int")
    )
    out = semantic_dedup(
        pre, threshold=0.999, scorer="gemm", max_cell=100
    )
    kept = sorted(r["vec_id"] for r in out.filter("is_kept").collect())
    assert kept == [0, 10_000]
    assert out.count() == n + 1
    # same corpus through the expr engine, star pinned: identical keep set
    out2 = semantic_dedup(pre, threshold=0.999, scorer="expr", edges="star")
    assert sorted(r["vec_id"] for r in out2.filter("is_kept").collect()) \
        == [0, 10_000]
