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


def test_with_lists_arrow_parity_and_auto_dispatch(spark, embeddings):
    """The arrow cell assignment (shared quantizer argmin encoder, m=1)
    is bit-identical to the expression engine — real table plus
    handcrafted degraded rows (null/short/overlong vectors assign null
    list_id in BOTH engines; NaN resolves identically)."""
    base = embeddings.select(F.col("vec_id").alias("id"), "embedding").limit(300)
    ivf = IVF(n_lists=8, n_probe=2, max_iter=2, seed=42,
              round_centroids=6).fit(base, id_col="id")
    a = sorted((r["id"], r["list_id"]) for r in
               ivf.with_lists(base, engine="expr").select("id", "list_id").collect())
    b = sorted((r["id"], r["list_id"]) for r in
               ivf.with_lists(base, engine="arrow").select("id", "list_id").collect())
    assert a == b

    dim = 64
    degraded = spark.createDataFrame(
        [
            (0, None),
            (1, [1.0] * (dim - 3)),            # short
            (2, [0.5] * (dim + 5)),            # overlong
            (3, [float("nan")] + [0.0] * (dim - 1)),
            (4, [0.25] * dim),                  # clean control
        ],
        "id long, embedding array<double>",
    )
    da = sorted((r["id"], r["list_id"]) for r in
                ivf.with_lists(degraded, engine="expr").select("id", "list_id").collect())
    db = sorted((r["id"], r["list_id"]) for r in
                ivf.with_lists(degraded, engine="arrow").select("id", "list_id").collect())
    assert da == db
    got = dict(da)
    assert got[0] is None and got[1] is None and got[2] is None
    assert got[3] is not None and got[4] is not None

    # auto: arrow at/above threshold, expr below
    big = spark.range(1200).select(
        F.col("id"),
        F.array(*[((F.col("id") * (i + 3)) % 17).cast("double")
                  for i in range(dim)]).alias("embedding"),
    )
    plan_big = ivf.with_lists(big)._jdf.queryExecution().executedPlan().toString()
    assert "MapInPandas" in plan_big
    plan_small = ivf.with_lists(base)._jdf.queryExecution().executedPlan().toString()
    assert "MapInPandas" not in plan_small


def test_fit_engines_agree_and_auto_fit_uses_arrow(spark):
    """Fitting with assign_engine='expr' and 'arrow' produces IDENTICAL
    centroids (the Lloyd assignment is the only engine-dependent step,
    and it is bit-identical); the default 'auto' on a big frame runs
    the arrow Lloyd passes without any extra count scan."""
    import numpy as np

    big = spark.range(1500).select(
        F.col("id"),
        F.array(*[((F.col("id") * (i + 3)) % 29).cast("double")
                  for i in range(16)]).alias("embedding"),
    ).cache()
    a = IVF(n_lists=8, n_probe=2, max_iter=3, seed=42, round_centroids=6,
            assign_engine="expr").fit(big, id_col="id")
    b = IVF(n_lists=8, n_probe=2, max_iter=3, seed=42, round_centroids=6,
            assign_engine="arrow").fit(big, id_col="id")
    # auto sizing: a FULL seed sample (1024 rows for n_lists=16 on a
    # 1500-row frame) is only a lower bound on n, so fit records
    # _seen_rows=None and sizes the engine with the bounded
    # limit-count probe on the persisted projection — which resolves
    # to arrow here (1500 >= threshold). A PARTIAL sample is the exact
    # n and skips the probe.
    c = IVF(n_lists=16, n_probe=2, max_iter=3, seed=42, round_centroids=6).fit(
        big, id_col="id"
    )
    d = IVF(n_lists=16, n_probe=2, max_iter=3, seed=42, round_centroids=6,
            assign_engine="expr").fit(big, id_col="id")
    assert np.array_equal(a.centroids, b.centroids)
    assert np.array_equal(c.centroids, d.centroids)
    assert c.assign_engine == "auto" and c._seen_rows is None
    # partial sample: sample (512) > n (300) -> exact count recorded
    e = IVF(n_lists=8, n_probe=2, max_iter=1, seed=42, round_centroids=6)
    e.fit(big.limit(300), id_col="id")
    assert e._seen_rows == 300


def test_gonzalez_vectorized_matches_scalar():
    """The vectorized maxmin traversal (dimension-ordered accumulation)
    is byte-for-byte the scalar loop — the SQL fit replays depend on
    it."""
    import random

    from kowari_spark.operators.quantizer import (
        _gonzalez_scalar,
        gonzalez_maxmin,
    )

    rnd = random.Random(7)
    pts = [(i, [rnd.uniform(-1, 1) for _ in range(24)]) for i in range(300)]
    rnd.shuffle(pts)
    assert gonzalez_maxmin(pts, 16) == _gonzalez_scalar(pts, 16)
    # exact-duplicate points force ties -> lowest id must win in both
    dup = pts + [(10_000 + i, v) for i, (_, v) in enumerate(pts[:40])]
    assert gonzalez_maxmin(dup, 12) == _gonzalez_scalar(dup, 12)
    # ragged inputs fall back to the scalar loop
    ragged = [(0, [1.0, 2.0]), (1, [3.0]), (2, [0.5, 0.25])]
    assert gonzalez_maxmin(ragged, 2) == _gonzalez_scalar(ragged, 2)


def test_fit_ignores_degraded_rows(spark):
    """Null / short / overlong vectors assign a null list_id by design
    and carry no fittable signal — fit must produce the SAME centroids
    as fitting the clean subset alone. Previously a null list_id
    reaching the driver accumulation hit numpy's None-is-np.newaxis
    semantics: new_c[None] = vec/cnt[None] silently broadcast over the
    ENTIRE centroid matrix (ADVICE r7)."""
    import numpy as np

    clean = [(i, [float((i * 7 + j * 3) % 13) for j in range(8)])
             for i in range(40)]
    degraded = [(100, None), (101, [1.0, 2.0, 3.0]), (102, [0.0] * 9)]
    full = spark.createDataFrame(
        clean + degraded, "id long, embedding array<double>"
    )
    sub = spark.createDataFrame(clean, "id long, embedding array<double>")
    a = IVF(n_lists=4, max_iter=2, seed=42).fit(full, id_col="id")
    b = IVF(n_lists=4, max_iter=2, seed=42).fit(sub, id_col="id")
    assert np.array_equal(a.centroids, b.centroids)
    # and with decimal-grid rounding the degraded path must not crash
    # (the broadcast bug surfaced there as an opaque TypeError)
    c = IVF(n_lists=4, max_iter=2, seed=42, round_centroids=6).fit(
        full, id_col="id"
    )
    d = IVF(n_lists=4, max_iter=2, seed=42, round_centroids=6).fit(
        sub, id_col="id"
    )
    assert np.array_equal(c.centroids, d.centroids)


def test_gonzalez_nan_fails_intelligibly():
    """A NaN-poisoned seed sample has no meaningful maxmin answer —
    the traversal must raise a clear error naming the poisoned ids,
    not the vectorized path's former opaque 'min() arg is an empty
    sequence' (ADVICE r7)."""
    import pytest as _pytest

    from kowari_spark.operators.quantizer import gonzalez_maxmin

    pts = [(i, [float(i), 0.0]) for i in range(10)]
    pts[3] = (3, [float("nan"), 0.0])
    with _pytest.raises(ValueError, match="NaN in seed sample.*3"):
        gonzalez_maxmin(pts, 3)


def test_auto_sizing_resolves_sqrt_n(base, spark):
    """n_lists='auto' -> round(sqrt(n)) via the persist-warming count
    (the PQ.fit pattern); n_probe='auto' -> n_lists // 16 floored at 1.
    The resolved fit is bit-identical to an explicit fit with the same
    numbers (auto-sizing changes no arithmetic)."""
    import math

    import numpy as np

    n = base.count()
    auto = IVF(n_lists="auto", n_probe="auto", max_iter=2, seed=42).fit(
        base, id_col="vec_id"
    )
    want_lists = max(1, min(n, int(round(math.sqrt(n)))))
    assert auto.n_lists == want_lists
    assert auto.n_probe == max(1, want_lists // 16)
    explicit = IVF(n_lists=want_lists, n_probe=auto.n_probe, max_iter=2,
                   seed=42).fit(base, id_col="vec_id")
    assert np.array_equal(auto.centroids, explicit.centroids)
    with pytest.raises(ValueError, match="n_lists"):
        IVF(n_lists="mystery")
    with pytest.raises(ValueError, match="n_probe"):
        IVF(n_probe="mystery")


def test_auto_sizing_rederived_per_fit(spark, embeddings):
    """Refitting one IVF(n_lists='auto') instance on a different-size
    corpus re-derives sqrt(n) from THAT corpus instead of silently
    reusing the first fit's resolution (ADVICE r9)."""
    from kowari_spark.operators.ivf import IVF

    vecs = embeddings.select(F.col("vec_id").alias("id"), "embedding")
    ivf = IVF(n_lists="auto", n_probe="auto", max_iter=1, seed=42)
    ivf.fit(vecs.limit(100), id_col="id")
    assert ivf.n_lists == 10  # round(sqrt(100))
    first_probe = ivf.n_probe
    ivf.fit(vecs.limit(400), id_col="id")
    assert ivf.n_lists == 20  # re-derived, not the stale 10
    assert ivf.n_probe == max(1, 20 // 16)
    assert first_probe == 1
    # explicit ints stay untouched across fits
    ivf2 = IVF(n_lists=4, n_probe=2, max_iter=1, seed=42)
    ivf2.fit(vecs.limit(100), id_col="id")
    ivf2.fit(vecs.limit(400), id_col="id")
    assert (ivf2.n_lists, ivf2.n_probe) == (4, 2)
