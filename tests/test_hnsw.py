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
    knn_batch's query broadcast). scorer="expr" must be pure JVM: no
    Python eval nodes, no driver-side collect of the layer —
    candidates come from the LSH self-join, pruning from a window."""
    hnsw = HNSW(m=8, ef=32, seed=42, scorer="expr")
    plan = hnsw.candidate_graph(base)._jdf.queryExecution().executedPlan().toString()
    for forbidden in ("MapInPandas", "BatchEvalPython", "ArrowEvalPython",
                      "PythonUDF", "FlatMapGroupsInPandas"):
        assert forbidden not in plan, f"{forbidden} in build plan"
    assert "Window" in plan
    # candidate generation is the bucketed self-join, not a cross join
    assert "CartesianProduct" not in plan and "BroadcastNestedLoopJoin" not in plan


def test_gemm_scorer_plan_and_agreement(base):
    """The GEMM bucket scorer ("auto" picks it at >= AUTO_GEMM_MIN_ROWS;
    forced here since the fixture is tiny): the plan is the grouped-map
    GEMM — still no cartesian product, no driver collect — and the
    resulting edges agree with the pure-expression scorer except
    possibly at exact score ties (ulp-level BLAS vs fold differences).
    On this data the graphs must be near-identical."""
    gemm = HNSW(m=8, ef=32, seed=42, scorer="gemm")
    expr = HNSW(m=8, ef=32, seed=42, scorer="expr")
    plan = gemm.candidate_graph(base)._jdf.queryExecution().executedPlan().toString()
    assert "FlatMapGroupsInPandas" in plan
    assert "CartesianProduct" not in plan and "BroadcastNestedLoopJoin" not in plan

    eg = set(map(tuple, gemm.candidate_graph(base).collect()))
    ee = set(map(tuple, expr.candidate_graph(base).collect()))
    # tie flips only: symmetric difference is a tiny fraction
    assert len(eg ^ ee) <= max(4, len(ee) // 100), (
        f"gemm vs expr edge sets diverge: {len(eg ^ ee)} of {len(ee)}"
    )
    # determinism of the gemm path
    eg2 = set(map(tuple, gemm.candidate_graph(base).collect()))
    assert eg == eg2


def test_no_zero_degree_nodes(base, index):
    _, edges = index
    lvl0 = edges.filter(F.col("level") == 0)
    out_missing = base.select(F.col("id").alias("src")).join(
        lvl0.select("src").distinct(), "src", "left_anti"
    )
    assert out_missing.isEmpty()


def test_entry_point_has_out_edges_on_shared_levels(base, spark):
    """Round-4 ADVICE low (c): the connectivity patch used to exempt
    the entry point, so it could sit edgeless on levels it shares with
    other nodes. Invariant: on every level with >= 2 members, EVERY
    member — entry point included — has out-degree >= 1. num_planes=8
    (256 buckets over 200 vectors) forces many singleton buckets, the
    regime that starves the LSH candidate pass."""
    hnsw = HNSW(m=4, ef=16, seed=42, num_planes=8, num_tables=2,
                refine_rounds=0)
    edges = hnsw.build(base).cache()
    leveled = assign_levels(base.select("id", "embedding"), "id", 42, 16)
    members = leveled.select(
        "id", F.explode(F.sequence(F.lit(0), F.col("node_level"))).alias("level")
    )
    sizes = members.groupBy("level").count()
    shared = sizes.filter(F.col("count") >= 2).select("level")
    need = members.join(shared, "level").select(
        "level", F.col("id").alias("src")
    )
    missing = need.join(edges.select("level", "src").distinct(),
                        ["level", "src"], "left_anti")
    rows = missing.collect()
    assert rows == [], f"nodes without out-edges on shared levels: {rows}"


def test_flat_graph_entry_guard_warns_and_caps(spark, embeddings):
    """Round-4 ADVICE low (b): max_level=0 makes every node level 0;
    the exact entry layer must not silently cross-join the whole table
    with every query — it warns and caps to entry_budget."""
    import warnings

    base = embeddings.withColumnRenamed("vec_id", "id").limit(150).cache()
    hnsw = HNSW(m=4, ef=16, seed=42, max_level=0, num_planes=3,
                num_tables=4, refine_rounds=1)
    edges = hnsw.build(base).cache()
    queries = base.filter(F.col("id") < 3).select(
        F.col("id").alias("query_id"), "embedding"
    )
    with warnings.catch_warnings(record=True) as caught:
        warnings.simplefilter("always")
        out = hnsw.query_batch(base, edges, queries, 5, id_col="id",
                               entry_budget=32)
        rows = out.collect()
    assert any("flat graph" in str(w.message) for w in caught)
    counts = {}
    for r in rows:
        counts[r["query_id"]] = counts.get(r["query_id"], 0) + 1
    assert all(v == 5 for v in counts.values()) and len(counts) == 3


def test_query_batch_auto_split_matches_unsplit(base, index):
    """A batch above max_batch splits into sub-batches probing the same
    graph — output identical to the unsplit path (the enforced form of
    the broadcast operating bound, VERDICT r5)."""
    hnsw, edges = index
    queries = base.select(F.col("id").alias("query_id"), "embedding").limit(10)
    unsplit = hnsw.query_batch(
        base, edges, queries, 5, round_to=6, max_batch=None
    )
    split = hnsw.query_batch(
        base, edges, queries, 5, round_to=6, max_batch=3
    )
    assert sorted(map(tuple, unsplit.collect())) == sorted(
        map(tuple, split.collect())
    )


def test_contract_forwards_metric_to_graph_navigation(spark):
    """AnnIndex.search(metric=...) must navigate the HNSW graph with
    that metric, not the cosine default (ADVICE r5): on mixed-norm
    vectors the euclidean top-1 via the contract equals the exact
    euclidean top-1."""
    import numpy as np
    from kowari_spark.operators.ann import HNSWIndex

    rng = np.random.RandomState(5)
    # mixed norms: cosine and euclidean rankings disagree strongly
    rows = [
        (i, (rng.normal(size=8) * rng.uniform(0.1, 20.0)).tolist())
        for i in range(120)
    ]
    df = spark.createDataFrame(rows, "id int, embedding array<double>").cache()
    queries = df.filter(F.col("id") < 6).select(
        F.col("id").alias("query_id"), "embedding"
    )
    hnsw = HNSW(m=8, ef=64, seed=42)
    edges = hnsw.build(df, metric="euclidean").cache()
    strategy = HNSWIndex(hnsw)
    got = strategy.search(
        df, queries, 3, metric="euclidean", built=edges, round_to=6
    )
    direct = hnsw.query_batch(
        df, edges, queries, 3, metric="euclidean", round_to=6
    )
    assert sorted(map(tuple, got.collect())) == sorted(
        map(tuple, direct.collect())
    )
    # sanity: euclidean scores are negative distances (a cosine-scored
    # walk would return values in [-1, 1] with near-1 self-hits), and
    # most self-hits are found (approximate navigation, not exhaustive)
    rows = got.collect()
    assert all(r["score"] <= 0.0 for r in rows)
    top1 = {r["query_id"]: r["id"] for r in rows if r["rank"] == 1}
    assert sum(1 for q, i in top1.items() if q == i) >= 4
    # without built=, search() must BUILD the graph under the search
    # metric too — identical output to the explicit euclidean build
    auto = strategy.search(df, queries, 3, metric="euclidean", round_to=6)
    assert sorted(map(tuple, auto.collect())) == sorted(map(tuple, rows))


def test_gemm_scorer_rejects_unknown_metric():
    """An explicit scorer="gemm" with a custom registered metric must
    error, not silently score with the wrong geometry."""
    h = HNSW(scorer="gemm")
    with pytest.raises(ValueError, match="gemm"):
        h._resolve_scorer("my_custom_metric")
    # auto degrades to the expression path instead
    assert HNSW(scorer="auto")._resolve_scorer("my_custom_metric") == "expr"


def test_build_dim_param_skips_inference_job(spark, base):
    """candidate_graph(dim=) makes plan construction job-free for an
    explicit scorer (the first() dim inference costs one Spark job per
    build — ADVICE r5, same pattern as the dedup joins), with an edge
    set identical to the inferred-dim build."""
    hnsw = HNSW(m=4, ef=16, seed=42, scorer="expr")
    sc = spark.sparkContext
    group = "hnsw-dim-probe"
    sc.setJobGroup(group, "plan-time job probe", interruptOnCancel=False)
    try:
        withdim = hnsw.candidate_graph(base, dim=64)
    finally:
        sc.setJobGroup(None, None)
    assert sc.statusTracker().getJobIdsForGroup(group) == []
    inferred = hnsw.candidate_graph(base)
    assert sorted(map(tuple, withdim.collect())) == sorted(
        map(tuple, inferred.collect())
    )


def test_gemm_refine_build_matches_expr_build(base):
    """The GEMM refine (group-local scoring of the two-hop candidates,
    _refine_topm_gemm) must reproduce the expression path's NN-descent:
    identical candidate set (edges ∪ two-hop via a shared neighbor, plus
    the 1-hop edges scored separately), so full builds agree except at
    ulp-level score ties (BLAS vs fold summation)."""
    gemm = HNSW(m=8, ef=32, seed=42, scorer="gemm", refine_rounds=2)
    expr = HNSW(m=8, ef=32, seed=42, scorer="expr", refine_rounds=2)
    eg = set(map(tuple, gemm.build(base).collect()))
    ee = set(map(tuple, expr.build(base).collect()))
    assert len(eg ^ ee) <= max(4, len(ee) // 100), (
        f"gemm vs expr refined builds diverge: {len(eg ^ ee)} of {len(ee)}"
    )
    # determinism of the gemm refine
    eg2 = set(map(tuple, gemm.build(base).collect()))
    assert eg == eg2


# -- incremental maintenance (round-8 ask #6) --------------------------------

def test_insert_recall_matches_rebuild(spark, embeddings):
    """Online insert at a 50% inserted fraction: recall@10 over the
    incrementally-grown graph stays within 0.1 of a full rebuild's
    (recall-equivalence acceptance, not graph isomorphism), and every
    inserted node is findable as its own top-1."""
    full = embeddings.withColumnRenamed("vec_id", "id").limit(200).cache()
    old = full.filter(F.col("id") % 2 == 0).cache()
    new = full.filter(F.col("id") % 2 == 1).cache()
    h = HNSW(m=8, ef=32, seed=42)
    base2, edges2 = h.insert(old, h.build(old), new)
    edges2 = edges2.cache()

    queries = full.select(F.col("id").alias("query_id"), "embedding").limit(15)
    exact = knn_batch(full, queries, 10, round_to=6)
    grown = hnsw_recall = mean_metric(recall_at_k(
        exact, h.query_batch(base2, edges2, queries, 10, round_to=6), 10
    ), "recall")
    rebuilt = mean_metric(recall_at_k(
        exact, h.query_batch(full, h.build(full), queries, 10, round_to=6),
        10
    ), "recall")
    assert grown >= rebuilt - 0.1, (grown, rebuilt)

    # inserted nodes are immediately findable (reachable via the
    # reverse edges the insert added)
    newq = new.select(F.col("id").alias("query_id"), "embedding").limit(8)
    for r in h.query_batch(base2, edges2, newq, 1, round_to=6).collect():
        assert r["query_id"] == r["id"]


def test_insert_edges_shape_and_levels(spark, embeddings):
    """The delta is bidirectional, respects the M bound per (new node,
    level), and only links levels both endpoints occupy (the same
    deterministic level draw the batch build uses)."""
    full = embeddings.withColumnRenamed("vec_id", "id").limit(120).cache()
    old = full.filter(F.col("id") < 100)
    new = full.filter(F.col("id") >= 100)
    h = HNSW(m=4, ef=16, seed=42)
    delta = h.insert_edges(old, h.build(old), new).cache()
    assert delta.count() > 0
    # bidirectional: every fwd edge has its reverse
    fwd = delta.filter(F.col("src") >= 100)
    rev = delta.filter(F.col("dst") >= 100)
    a = {(r["level"], r["src"], r["dst"]) for r in fwd.collect()}
    b = {(r["level"], r["dst"], r["src"]) for r in rev.collect()}
    assert a == b
    # M bound per (new node, level)
    worst = fwd.groupBy("src", "level").count().agg(F.max("count")).first()[0]
    assert worst <= 4
    # level constraint: an edge at level l needs BOTH endpoints there
    lv = {r["id"]: r["node_level"]
          for r in assign_levels(full, seed=42).collect()}
    for lvl, s, d in a:
        assert lv[s] >= lvl and lv[d] >= lvl


def test_layout_roundtrip_and_sidecar(spark, embeddings, tmp_path):
    """build_layout/load_layout: a FRESH instance restores params from
    the sidecar and probes identically; bare dirs are refused."""
    full = embeddings.withColumnRenamed("vec_id", "id").limit(150).cache()
    path = str(tmp_path / "hnsw_layout")
    h = HNSW(m=8, ef=32, seed=42)
    h.build_layout(full, path)

    fresh = HNSW(m=1, ef=1, seed=0)
    base, edges, meta = fresh.load_layout(spark, path)
    assert (fresh.m, fresh.ef, fresh.seed) == (8, 32, 42)
    assert meta["metric"] == "cosine"
    q = full.select(F.col("id").alias("query_id"), "embedding").limit(5)
    a = sorted(map(tuple, fresh.query_batch(base, edges, q, 5,
                                            round_to=6).collect()))
    b = sorted(map(tuple, h.query_batch(
        full, h.build(full), q, 5, round_to=6).collect()))
    assert a == b

    bare = str(tmp_path / "bare")
    full.limit(3).write.parquet(f"{bare}/edges")
    with pytest.raises(ValueError, match="sidecar"):
        HNSW().load_layout(spark, bare)


def test_insert_id_collision_yields_no_self_edges(spark, embeddings):
    """A batch reusing existing ids retrieves itself from the frozen
    graph — the insert must not emit degenerate self-edges."""
    full = embeddings.withColumnRenamed("vec_id", "id").limit(100).cache()
    h = HNSW(m=4, ef=16, seed=42)
    delta = h.insert_edges(full, h.build(full), full.limit(5))
    assert delta.filter(F.col("src") == F.col("dst")).count() == 0


def _qb_rows(df):
    return sorted(
        (r["query_id"], r["id"], r["score"], r["rank"]) for r in df.collect()
    )


def test_query_batch_driver_beam_parity(base, index, monkeypatch):
    """The bounded driver-side beam is a transport change, not an
    algorithm change: row-for-row, score-for-score (exact float
    equality) identical to the distributed search for every numpy
    metric. Guards the round-16 beam routing (VERDICT r15 ask #4)."""
    hnsw, edges = index
    queries = base.select(F.col("id").alias("query_id"), "embedding").limit(12)
    for metric in ("cosine", "dot", "euclidean", "manhattan"):
        assert hnsw._try_driver_beam(
            base, edges, queries, 7, metric, "id", "embedding",
            "query_id", "embedding", 4, 6, 2048, 8192,
        ) is not None, f"beam unexpectedly declined metric={metric}"
        got_beam = _qb_rows(
            hnsw.query_batch(base, edges, queries, 7, metric=metric,
                             round_to=6)
        )
        monkeypatch.setenv("KOWARI_HNSW_BEAM_NODES", "0")
        got_dist = _qb_rows(
            hnsw.query_batch(base, edges, queries, 7, metric=metric,
                             round_to=6)
        )
        monkeypatch.delenv("KOWARI_HNSW_BEAM_NODES")
        assert got_beam == got_dist, f"beam/distributed diverged: {metric}"


def test_query_batch_driver_beam_parity_flat_graph(spark, embeddings,
                                                   monkeypatch):
    """Flat graph (l_cut==0, n > entry_budget): the beam's md5-ordered
    entry sample must pick the exact same entry rows as the distributed
    sample (same salt string, same hex ordering)."""
    import warnings

    base = embeddings.withColumnRenamed("vec_id", "id").limit(150).cache()
    hnsw = HNSW(m=4, ef=16, seed=42, max_level=0, num_planes=3,
                num_tables=4, refine_rounds=1)
    edges = hnsw.build(base).cache()
    queries = base.filter(F.col("id") < 3).select(
        F.col("id").alias("query_id"), "embedding"
    )
    with warnings.catch_warnings(record=True) as caught:
        warnings.simplefilter("always")
        got_beam = _qb_rows(
            hnsw.query_batch(base, edges, queries, 5, round_to=6,
                             entry_budget=32)
        )
    assert any("flat graph" in str(w.message) for w in caught)
    monkeypatch.setenv("KOWARI_HNSW_BEAM_NODES", "0")
    got_dist = _qb_rows(
        hnsw.query_batch(base, edges, queries, 5, round_to=6,
                         entry_budget=32)
    )
    assert got_beam == got_dist


def test_query_batch_driver_beam_declines_unrounded_and_custom(base, index):
    """No round_to, or a custom metric, must fall through to the
    distributed plan (ULP parity is only provable under rounding)."""
    hnsw, edges = index
    queries = base.select(F.col("id").alias("query_id"), "embedding").limit(3)
    assert hnsw._try_driver_beam(
        base, edges, queries, 5, "cosine", "id", "embedding",
        "query_id", "embedding", 4, None, 2048, 8192,
    ) is None
    assert hnsw._try_driver_beam(
        base, edges, queries, 5, "my_custom", "id", "embedding",
        "query_id", "embedding", 4, 6, 2048, 8192,
    ) is None


def test_query_batch_driver_beam_bounded_jobs(spark, base, index):
    """The beam's whole probe is a handful of bounded collects — the
    job-floor cost the distributed plan pays (~25-30 AQE
    materialization jobs) must be gone."""
    hnsw, edges = index
    queries = base.select(F.col("id").alias("query_id"), "embedding").limit(4)
    sc = spark.sparkContext
    group = "hnsw-beam-jobs"
    sc.setJobGroup(group, "beam job probe", interruptOnCancel=False)
    try:
        out = hnsw.query_batch(base, edges, queries, 5, round_to=6)
        rows = out.collect()
    finally:
        sc.setJobGroup(None, None)
    assert len(rows) == 4 * 5
    jobs = sc.statusTracker().getJobIdsForGroup(group)
    assert len(jobs) <= 8, f"beam probe ran {len(jobs)} jobs"
