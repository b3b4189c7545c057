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


def test_bucket_sql_parity_with_column_builder(base, lsh):
    """The SQL-string bucket builder (one F.expr parse — the
    construction-cost fix) must be VALUE-identical to the legacy
    per-plane Column builder on every row, for both the single-table
    bucket and the multi-table array (a Column input takes the legacy
    path, a string input the SQL path — same rows, exact equality)."""
    from kowari_spark.operators.lsh import MultiSignLSH

    fast = [r["b"] for r in base.select(lsh.bucket_expr("embedding").alias("b")).collect()]
    legacy = [
        r["b"] for r in base.select(lsh.bucket_expr(F.col("embedding")).alias("b")).collect()
    ]
    assert fast == legacy
    ml = MultiSignLSH(dim=lsh.dim, num_planes=4, num_tables=5, seed=7)
    fast_m = [r["b"] for r in base.select(ml.buckets_expr("embedding").alias("b")).collect()]
    legacy_m = [
        r["b"] for r in base.select(ml.buckets_expr(F.col("embedding")).alias("b")).collect()
    ]
    assert fast_m == legacy_m


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


def test_multiprobe_probe_sequence(base, lsh):
    """probes=1 is exactly the base bucket; probes>1 prepends it and adds
    distinct single/multi-bit perturbations of the low-margin planes."""
    row = base.first()
    probe_df = base.limit(3).select(
        "id", lsh.probe_buckets_expr("embedding", 8).alias("probes"),
        lsh.bucket_expr("embedding").alias("bucket"),
    )
    for r in probe_df.collect():
        assert r["probes"][0] == r["bucket"]  # cost-0 subset first
        assert len(r["probes"]) == 8
        assert len(set(r["probes"])) == 8  # distinct buckets


def test_multiprobe_sequence_prefix_property(base, lsh):
    """The probe sequence is deterministic and monotone: probing more
    buckets extends the same cost-ordered sequence (so the candidate
    pool only grows), and every probe differs from the base bucket only
    on low-margin planes. (End recall is NOT monotone in probes by
    design: widening the pool past k candidates disables the reference's
    brute-force fallback, which is the point of probing.)"""
    rows = base.limit(5).select(
        lsh.probe_buckets_expr("embedding", 4).alias("p4"),
        lsh.probe_buckets_expr("embedding", 16).alias("p16"),
    ).collect()
    for r in rows:
        assert list(r["p16"][:4]) == list(r["p4"])


def test_probe_buckets_driver_matches_expr(base, lsh):
    """probe_buckets_of (numpy, drives the single-query static prune)
    must produce the same ordered probe sequence as the native
    probe_buckets_expr used by the batch path."""
    rows = base.limit(10).select(
        "embedding", lsh.probe_buckets_expr("embedding", 8).alias("p")
    ).collect()
    for r in rows:
        assert lsh.probe_buckets_of(r["embedding"], 8) == list(r["p"])
        assert lsh.probe_buckets_of(r["embedding"], 1) == [lsh.bucket_of(r["embedding"])]


def test_single_query_probe_prunes_built_layout(tmp_path, base, lsh, spark):
    """On a built layout the single-query candidate scan must carry the
    literal bucket IN (...) as a partition filter (static pruning) —
    and multiprobe results must match the batch path's."""
    path = str(tmp_path / "lsh_probe")
    lsh.build(base, path)
    loaded = lsh.load(spark, path)
    q = base.first()["embedding"]
    buckets = lsh.probe_buckets_of(q, 4)
    cand = loaded.filter(F.col("bucket").isin(buckets))
    plan = cand._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters" in plan and "bucket" in plan

    single = [(r["id"], r["score"]) for r in
              lsh.query(loaded, q, 5, round_to=6, probes=4).collect()]
    queries = base.limit(1).select(F.col("id").alias("query_id"), "embedding")
    batch = [(r["id"], r["score"]) for r in
             lsh.query_batch(loaded, queries, 5, round_to=6, probes=4)
             .orderBy("rank").collect()]
    assert single == batch


def test_multitable_recall_beats_single_table(spark, base):
    from kowari_spark.operators.lsh import MultiSignLSH

    queries = base.select(F.col("id").alias("query_id"), "embedding").limit(8)
    exact = knn_batch(base, queries, 10, round_to=6)
    single = SignLSH(dim=64, num_planes=4, seed=42)
    mt = MultiSignLSH(dim=64, num_planes=4, num_tables=8, seed=42)
    r1 = mean_metric(recall_at_k(exact, single.query_batch(base, queries, 10, round_to=6), 10), "recall")
    rT = mean_metric(recall_at_k(exact, mt.query_batch(base, queries, 10, round_to=6), 10), "recall")
    assert rT >= r1
    # every query fully served
    counts = mt.query_batch(base, queries, 10, round_to=6).groupBy("query_id").count()
    assert [c["count"] for c in counts.select("count").distinct().collect()] == [10]


def test_multitable_built_layout_roundtrip(tmp_path, base, spark):
    from kowari_spark.operators.lsh import MultiSignLSH

    mt = MultiSignLSH(dim=64, num_planes=4, num_tables=4, seed=7)
    path = str(tmp_path / "mt_lsh")
    mt.build(base, path)
    loaded = mt.load(spark, path)
    queries = base.select(F.col("id").alias("query_id"), "embedding").limit(4)
    from_layout = mt.query_batch(loaded, queries, 5, round_to=6)
    from_df = mt.query_batch(base, queries, 5, round_to=6)
    a = sorted(map(tuple, from_layout.select("query_id", "id", "rank").collect()))
    b = sorted(map(tuple, from_df.select("query_id", "id", "rank").collect()))
    assert a == b


def test_multitable_gemm_hasher_parity_and_results(base):
    """The GEMM hasher (one float64 numpy GEMM per Arrow batch) must
    assign every vector to the same (table, bucket) cells as the native
    expression fold — sign bits only diverge when |v·p| sits inside the
    two summation orders' ulp gap, which real data never does — and the
    full query_batch must return identical rows under either hasher."""
    from kowari_spark.operators.lsh import MultiSignLSH

    expr = MultiSignLSH(dim=64, num_planes=6, num_tables=4, seed=42)
    gemm = MultiSignLSH(dim=64, num_planes=6, num_tables=4, seed=42,
                        hasher="gemm")
    a = sorted(map(tuple, expr.with_buckets(base)
                 .select("id", "__tbl", "bucket").collect()))
    b = sorted(map(tuple, gemm.with_buckets(base)
                 .select("id", "__tbl", "bucket").collect()))
    assert a == b
    queries = base.select(F.col("id").alias("query_id"), "embedding").limit(6)
    ra = sorted(map(tuple, expr.query_batch(base, queries, 5, round_to=6).collect()))
    rb = sorted(map(tuple, gemm.query_batch(base, queries, 5, round_to=6).collect()))
    assert ra == rb


def test_multitable_hasher_validation():
    from kowari_spark.operators.lsh import MultiSignLSH

    with pytest.raises(ValueError, match="hasher"):
        MultiSignLSH(dim=8, hasher="blas")


def test_build_refuses_empty_input(tmp_path, base, spark):
    """A build over an empty frame must refuse BEFORE writing anything:
    a params sidecar over a data-less dir would be accepted by
    open_lsh_layout/SignatureLayout.open and crash the first probe on
    parquet schema inference (ADVICE r11)."""
    from kowari_spark.fsutil import exists
    from kowari_spark.operators.lsh import MultiSignLSH

    empty = base.filter(F.lit(False))
    for idx, name in [
        (SignLSH(dim=64, num_planes=4, seed=1), "sig"),
        (MultiSignLSH(dim=64, num_planes=4, num_tables=2, seed=1), "multi"),
    ]:
        path = str(tmp_path / f"empty_{name}")
        with pytest.raises(ValueError, match="empty DataFrame"):
            idx.build(empty, path)
        assert not exists(spark, f"{path}/_lsh_meta.json")


def test_multi_table_batch_probe_statically_prunes(spark, embeddings, tmp_path):
    """MultiSignLSH.query_batch against a BUILT layout compiles the
    query batch's probed (table, bucket) pairs into a literal
    predicate: the candidate scan's PartitionFilters carry bucket
    values (static pruning — Spark's dynamic pruning emits a
    __tbl-only filter here, which prunes nothing), and the re-score
    reads vectors only from probed partitions (no table-0 join on the
    happy path)."""
    import re

    from kowari_spark.operators.lsh import MultiSignLSH

    base = embeddings.select("vec_id", "embedding").limit(400)
    mlsh = MultiSignLSH(dim=64, num_planes=4, num_tables=2, seed=7)
    path = str(tmp_path / "mlsh_prune")
    mlsh.build(base, path, vec_col="embedding", id_col="vec_id")
    queries = base.filter(F.col("vec_id") < 2).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    out = mlsh.query_batch(
        mlsh.load(spark, path), queries, 5,
        id_col="vec_id", query_vec_col="embedding", round_to=6,
    )
    plan = out._jdf.queryExecution().executedPlan().toString()
    pf = re.findall(r"PartitionFilters: \[[^\]]*\]", plan)
    assert any(
        "bucket" in f and (" IN " in f or "INSET" in f.upper())
        for f in pf
    ), pf
    # results identical to probing the raw (unpartitioned) relation,
    # where the probe computes buckets on the fly instead of pruning
    want = sorted(map(tuple, mlsh.query_batch(
        base, queries, 5, id_col="vec_id", query_vec_col="embedding",
        round_to=6,
    ).collect()))
    assert sorted(map(tuple, out.collect())) == want
