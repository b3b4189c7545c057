"""IVF index tests: deterministic fit, layout, probe recall vs exact."""

import pytest
from pyspark.sql import functions as F

from kowari_spark.operators.ivf import IVF
from kowari_spark.operators.topk import knn_batch
from kowari_spark.operators.eval import mean_metric, recall_at_k


@pytest.fixture(scope="module")
def base(embeddings):
    return embeddings.cache()


def test_fit_deterministic(base):
    a = IVF(n_lists=8, max_iter=3, seed=1).fit(base, id_col="vec_id")
    b = IVF(n_lists=8, max_iter=3, seed=1).fit(base, id_col="vec_id")
    assert (a.centroids == b.centroids).all()
    c = IVF(n_lists=8, max_iter=3, seed=2).fit(base, id_col="vec_id")
    assert (a.centroids != c.centroids).any()


def test_assignment_covers_all_rows(base):
    ivf = IVF(n_lists=8, max_iter=3).fit(base, id_col="vec_id")
    lists = ivf.with_lists(base)
    assert lists.count() == base.count()
    ids = [r["list_id"] for r in lists.select("list_id").distinct().collect()]
    assert all(0 <= i < 8 for i in ids)
    # no cell should hold everything (the quantizer actually splits)
    biggest = lists.groupBy("list_id").count().agg(F.max("count")).first()[0]
    assert biggest < base.count()


def test_build_layout_partition_pruned(base, tmp_path, spark):
    ivf = IVF(n_lists=8, n_probe=2, max_iter=3).fit(base, id_col="vec_id")
    path = str(tmp_path / "ivf")
    ivf.build(base, path)
    stored = ivf.load(spark, path)
    assert stored.count() == base.count()
    probe = stored.filter(F.col("list_id") == 3)
    plan = probe._jdf.queryExecution().executedPlan().toString()
    # partition filter must prune at the scan, not filter post-read
    assert "PartitionFilters: [isnotnull(list_id" in plan


def test_query_self_hit_and_recall(base, spark):
    ivf = IVF(n_lists=8, n_probe=3, max_iter=3).fit(base, id_col="vec_id")
    lists = ivf.with_lists(base).cache()
    q = [float(x) for x in base.filter(F.col("vec_id") == 0).first()["embedding"]]
    top = ivf.query(lists, q, 5, id_col="vec_id", round_to=6).collect()
    assert top[0]["vec_id"] == 0 and top[0]["score"] == pytest.approx(1.0)

    queries = base.filter(F.col("vec_id") < 16).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    exact = knn_batch(base, queries, 10, id_col="vec_id", round_to=6)
    approx = ivf.query_batch(lists, queries, 10, id_col="vec_id", round_to=6)
    rec = mean_metric(recall_at_k(exact, approx, 10, id_col="vec_id"), "recall")
    # 3/8 of the space probed; near neighbors concentrate in the query's
    # cells, so recall must be well above the 3/8 random-baseline
    assert rec >= 0.55


def test_batch_single_agreement(base):
    ivf = IVF(n_lists=8, n_probe=2, max_iter=3).fit(base, id_col="vec_id")
    lists = ivf.with_lists(base).cache()
    q = [float(x) for x in base.filter(F.col("vec_id") == 7).first()["embedding"]]
    single = [(r["vec_id"], r["score"]) for r in
              ivf.query(lists, q, 5, id_col="vec_id", round_to=6).collect()]
    queries = base.filter(F.col("vec_id") == 7).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    batch = [(r["vec_id"], r["score"]) for r in
             ivf.query_batch(lists, queries, 5, id_col="vec_id", round_to=6)
             .orderBy("rank").collect()]
    assert single == batch


def test_build_saves_and_load_restores_quantizer(base, tmp_path, spark):
    ivf = IVF(n_lists=8, n_probe=2, max_iter=2, seed=3,
              round_centroids=6).fit(base, id_col="vec_id")
    path = str(tmp_path / "ivf_meta")
    ivf.build(base, path)
    fresh = IVF()
    stored = fresh.load(spark, path)
    assert fresh.n_lists == 8 and fresh.n_probe == 2 and fresh.round_centroids == 6
    assert (fresh.centroids == ivf.centroids).all()
    # probe-ready straight from disk, no refit
    q = [float(x) for x in base.first()["embedding"]]
    top = fresh.query(stored, q, 3, id_col="vec_id", round_to=6).collect()
    assert len(top) == 3


def test_sampled_seeding_matches_distributed_when_sample_covers(base):
    """seed_sample >= n must reproduce the distributed farthest-first
    traversal bit-for-bit — the parity claim of the driver-side loop
    (same sequential fold, same max-mind/lowest-id tie-break)."""
    full = IVF(n_lists=8, max_iter=2, seed=1, seed_sample=None).fit(
        base, id_col="vec_id"
    )
    sampled = IVF(n_lists=8, max_iter=2, seed=1, seed_sample=10_000).fit(
        base, id_col="vec_id"
    )
    assert (full.centroids == sampled.centroids).all()


def test_default_seeding_is_sampled_one_collect(base, spark):
    """The DEFAULT constructor takes the one-collect sampled seeding
    path ("auto" = 64*n_lists): a user calling IVF(n_lists=k) must not
    get k-1 sequential full-table argmax scans (VERDICT r5). Pinned by
    a job-count bound: the whole fit runs far fewer jobs than the
    exact traversal's n_lists-1 seeding scans alone."""
    ivf = IVF(n_lists=8, max_iter=2, seed=1)
    assert ivf.seed_sample == "auto"
    sc = spark.sparkContext
    group = "ivf-default-seeding-probe"
    sc.setJobGroup(group, "count fit jobs", interruptOnCancel=False)
    try:
        ivf.fit(base, id_col="vec_id")
    finally:
        sc.setJobGroup(None, None)
    jobs = sc.statusTracker().getJobIdsForGroup(group)
    # sampled path: 1 seeding collect + max_iter Lloyd collects (limit
    # collects may split into incremental jobs) — the exact path would
    # add n_lists-1 = 7 more full-scan seeding jobs on top, so the
    # bound below separates the two paths with room to spare
    assert len(jobs) < ivf.n_lists - 1, jobs
    # and "auto" is bit-identical to the explicit 64*n_lists sample
    explicit = IVF(n_lists=8, max_iter=2, seed=1, seed_sample=64 * 8).fit(
        base, id_col="vec_id"
    )
    assert (ivf.centroids == explicit.centroids).all()


def test_sampled_seeding_small_sample_still_quantizes(base):
    ivf = IVF(n_lists=8, n_probe=3, max_iter=2, seed=1, seed_sample=64).fit(
        base, id_col="vec_id"
    )
    lists = ivf.with_lists(base)
    assert lists.count() == base.count()
    biggest = lists.groupBy("list_id").count().agg(F.max("count")).first()[0]
    assert biggest < base.count()
    import pytest as _pytest

    with _pytest.raises(ValueError, match="seed_sample"):
        IVF(n_lists=8, seed_sample=4).fit(base, id_col="vec_id")


def test_seed_sample_string_typos_rejected_at_construction():
    with pytest.raises(ValueError, match="auto"):
        IVF(seed_sample="AUTO")
    with pytest.raises(ValueError, match="auto"):
        IVF(seed_sample="Auto")
    assert IVF(seed_sample="auto").seed_sample == "auto"
