"""PQ index tests: deterministic fit, encode, compressed layout, ADC
probe parity, exact-rerank contract, plan shapes, DuckDB fit replay."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from kowari_spark.operators.pq import PQ
from kowari_spark.operators.topk import knn


@pytest.fixture(scope="module")
def base(embeddings):
    return embeddings.cache()


@pytest.fixture(scope="module")
def fitted(base):
    return PQ(m=4, k_sub=8, max_iter=2, seed=42).fit(
        base, id_col="vec_id", dim=64
    )


def test_fit_deterministic_and_seed_sensitive(base):
    a = PQ(m=4, k_sub=8, max_iter=2, seed=1).fit(base, id_col="vec_id", dim=64)
    b = PQ(m=4, k_sub=8, max_iter=2, seed=1).fit(base, id_col="vec_id", dim=64)
    assert np.array_equal(a.codebooks, b.codebooks)
    c = PQ(m=4, k_sub=8, max_iter=2, seed=2).fit(base, id_col="vec_id", dim=64)
    assert (a.codebooks != c.codebooks).any()


def test_constructor_validation(base):
    with pytest.raises(ValueError, match="seed_sample"):
        PQ(seed_sample="atuo")
    with pytest.raises(ValueError, match="divisible"):
        PQ(m=5).fit(base, id_col="vec_id", dim=64)


def test_codes_shape_and_range(base, fitted):
    coded = fitted.with_codes(base)
    rows = coded.select("codes").collect()
    assert len(rows) == base.count()
    for r in rows:
        assert len(r["codes"]) == 4
        assert all(0 <= c < 8 for c in r["codes"])
    # the quantizer actually splits each subspace: no code owns everything
    use = (
        coded.select(F.posexplode("codes").alias("sub", "code"))
        .groupBy("sub", "code").count()
        .agg(F.max("count")).first()[0]
    )
    assert use < base.count()


def test_encode_matches_numpy_argmin(base, fitted):
    """The native argmin expression picks the same code numpy does
    (distinct distances — ties are separately pinned by determinism)."""
    rows = base.limit(20).collect()
    got = {
        r["vec_id"]: list(r["codes"])
        for r in fitted.with_codes(base).filter(F.col("vec_id") < 20)
        .select("vec_id", "codes").collect()
    }
    for r in rows:
        v = np.asarray([float(x) for x in r["embedding"]])
        for j in range(4):
            sub = v[j * 16:(j + 1) * 16]
            d = ((fitted.codebooks[j] - sub) ** 2).sum(axis=1)
            assert got[r["vec_id"]][j] == int(np.argmin(d))


def test_build_layout_is_codes_only_and_load_restores(base, fitted, tmp_path, spark):
    path = str(tmp_path / "pq")
    fitted.build(base, path, id_col="vec_id")
    fresh = PQ()
    codes = fresh.load(spark, path)
    # the layout carries ONLY (id, codes) — never the raw vectors
    assert sorted(codes.columns) == ["codes", "vec_id"]
    assert codes.count() == base.count()
    assert fresh.dim == 64 and fresh.m == 4 and fresh.k_sub == 8
    assert np.array_equal(fresh.codebooks, fitted.codebooks)


def test_load_rejects_mismatched_algo_version(base, fitted, tmp_path, spark):
    import json

    from kowari_spark.fsutil import read_bytes, write_bytes

    path = str(tmp_path / "pq_v")
    fitted.build(base, path, id_col="vec_id")
    meta = json.loads(read_bytes(spark, f"{path}/_pq_meta.json").decode())
    meta["version"] = "pq-other-v9"
    # rewrite through the Hadoop FS API (a plain open() would leave the
    # local FS .crc sidecar stale)
    write_bytes(spark, f"{path}/_pq_meta.json", json.dumps(meta).encode())
    with pytest.raises(ValueError, match="rebuild the layout"):
        PQ().load(spark, path)


def test_adc_matches_reconstructed_distance(base, fitted):
    """ADC distance == squared L2 to the RECONSTRUCTED vector (the PQ
    identity: subspaces are disjoint, so the distance decomposes into
    the per-subspace table entries)."""
    codes = fitted.with_codes(base).select("vec_id", "codes")
    q = [float(x) for x in base.filter(F.col("vec_id") == 7).first()["embedding"]]
    got = {
        r["vec_id"]: r["distance"]
        for r in fitted.query(codes, q, 50, id_col="vec_id").collect()
    }
    code_map = {r["vec_id"]: list(r["codes"]) for r in codes.collect()}
    qv = np.asarray(q)
    for vid, dist in got.items():
        recon = np.concatenate(
            [fitted.codebooks[j][code_map[vid][j]] for j in range(4)]
        )
        assert dist == pytest.approx(float(((qv - recon) ** 2).sum()), abs=1e-9)


def test_batch_matches_single(base, fitted):
    codes = fitted.with_codes(base).select("vec_id", "codes").cache()
    queries = base.filter(F.col("vec_id") < 4).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    batch = fitted.query_batch(codes, queries, 10, id_col="vec_id", round_to=6)
    for r in queries.collect():
        single = [
            (x["vec_id"], x["distance"])
            for x in fitted.query(
                codes, list(r["embedding"]), 10, id_col="vec_id", round_to=6
            ).collect()
        ]
        got = [
            (x["vec_id"], x["distance"])
            for x in batch.filter(F.col("query_id") == r["query_id"])
            .orderBy("rank").collect()
        ]
        assert got == single
    codes.unpersist()


def test_probe_plan_never_reads_vectors(base, fitted, tmp_path, spark):
    """The ADC probe's scan reads the codes layout only — ReadSchema
    must not contain the embedding column, and the single-query top-k
    is a TakeOrderedAndProject (no global sort)."""
    path = str(tmp_path / "pq_plan")
    fitted.build(base, path, id_col="vec_id")
    codes = fitted.load(spark, path)
    q = [float(x) for x in base.first()["embedding"]]
    plan = fitted.query(codes, q, 10, id_col="vec_id")._jdf.queryExecution(
    ).executedPlan().toString()
    assert "embedding" not in plan
    assert "TakeOrderedAndProject" in plan


def test_batch_probe_partial_topk_below_shuffle(base, fitted):
    """The batch probe's per-query top-k must push a PARTIAL
    WindowGroupLimit below the query_id exchange: each map task emits
    only k rows per query, so the shuffle carries k*Q rows — not the
    whole scored relation — regardless of corpus size."""
    codes = fitted.with_codes(base).select("vec_id", "codes")
    queries = base.filter(F.col("vec_id") < 4).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    plan = fitted.query_batch(codes, queries, 10, id_col="vec_id")._jdf\
        .queryExecution().executedPlan().toString()
    partial = plan.find("row_number(), 10, Partial")
    exchange = plan.find("Exchange hashpartitioning(query_id")
    assert partial != -1 and exchange != -1
    # the plan prints top-down: the partial limit sits BELOW the exchange
    assert partial > exchange


def test_rerank_index_exact_topk(base, fitted):
    """PQIndex with a shortlist covering the whole table == exact knn:
    pins that candidates -> shared exact re-score composes correctly."""
    from kowari_spark.operators.ann import PQIndex

    idx = PQIndex(fitted, rerank=50)  # 50*10 = 500 >= n: full shortlist
    queries = base.filter(F.col("vec_id") < 2).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    got = idx.search(
        base, queries, 10, metric="euclidean", id_col="vec_id", round_to=6
    )
    for r in queries.collect():
        exact = [
            x["vec_id"]
            for x in knn(base, list(r["embedding"]), 10, metric="euclidean",
                         id_col="vec_id", round_to=6).collect()
        ]
        mine = [
            x["vec_id"]
            for x in got.filter(F.col("query_id") == r["query_id"])
            .orderBy("rank").collect()
        ]
        assert mine == exact


def test_fit_replay_in_duckdb(base):
    """Re-derive one subspace's Gonzalez seeding driver-side from a
    DuckDB md5-ordered sample and check the fitted codebook's seeds-
    round-0 behavior: the final codebooks must be reproducible from the
    documented arithmetic (full contract parity is the pq_knn oracle
    row; this pins the seeding order convention against DuckDB's md5)."""
    import duckdb

    pdf = base.select("vec_id", "embedding").toPandas()
    con = duckdb.connect()
    con.register("emb", pdf)
    ordered = con.execute(
        "SELECT vec_id FROM emb ORDER BY md5(CAST(vec_id AS VARCHAR) || '#42') LIMIT 512"
    ).df()["vec_id"].tolist()
    rows = {r["vec_id"]: [float(x) for x in r["embedding"]]
            for r in base.collect()}
    pts = [(i, rows[i][0:16]) for i in ordered]
    pq = PQ(m=4, k_sub=8, max_iter=0, seed=42)
    pq.dim = 64
    seeds = pq._gonzalez(pts)
    fitted0 = PQ(m=4, k_sub=8, max_iter=0, seed=42).fit(
        base, id_col="vec_id", dim=64
    )
    assert np.array_equal(np.asarray(seeds), fitted0.codebooks[0])


def test_arrow_encoder_parity_on_real_table(base, fitted):
    """engine='arrow' must produce byte-identical codes to the
    expression engine on the real embeddings table — the contract that
    lets the scale path share the SQL oracle."""
    expr = {
        r["vec_id"]: list(r["codes"])
        for r in fitted.with_codes(base).select("vec_id", "codes").collect()
    }
    arrow = {
        r["vec_id"]: list(r["codes"])
        for r in fitted.with_codes(base, engine="arrow")
        .select("vec_id", "codes").collect()
    }
    assert arrow == expr


def test_arrow_encoder_tie_breaks_lowest_code(spark):
    """A vector exactly equidistant from two centroids must take the
    LOWER code in both engines (array_position(array_min) finds the
    first match; np.argmin returns the first occurrence)."""
    pq = PQ(m=1, k_sub=2, max_iter=0)
    pq.dim = 2
    pq.codebooks = np.array([[[0.0, 0.0], [2.0, 0.0]]])
    df = spark.createDataFrame(
        [(0, [1.0, 0.0])], "vec_id long, embedding array<double>"
    )
    for eng in ("expr", "arrow"):
        assert list(pq.with_codes(df, engine=eng).first()["codes"]) == [0]


def test_arrow_encoder_is_shuffle_free(base, fitted):
    plan = fitted.with_codes(base, engine="arrow")._jdf.queryExecution(
    ).executedPlan().toString()
    assert "Exchange" not in plan


def test_fit_codebooks_agree_across_encoders(base):
    a = PQ(m=4, k_sub=8, max_iter=2, seed=42).fit(base, id_col="vec_id", dim=64)
    b = PQ(m=4, k_sub=8, max_iter=2, seed=42, encoder="arrow").fit(
        base, id_col="vec_id", dim=64
    )
    assert np.array_equal(a.codebooks, b.codebooks)


def test_encoder_typo_rejected():
    with pytest.raises(ValueError, match="encoder"):
        PQ(encoder="gemm")


def test_arrow_encoder_degraded_rows_match_expr(spark):
    """Null / short / NaN embeddings must take the SAME codes through
    both engines: null vector -> all-null codes, a short vector encodes
    only the subspaces its length fully covers (the expression engine's
    zip_with null-padding semantics), and a NaN-poisoned subspace
    resolves to code 0 in both (all distances NaN -> first index)."""
    pq = PQ(m=2, k_sub=2, max_iter=0)
    pq.dim = 4
    pq.codebooks = np.array(
        [[[0.0, 0.0], [1.0, 1.0]], [[0.0, 0.0], [1.0, 1.0]]]
    )
    df = spark.createDataFrame(
        [
            (0, [0.1, 0.1, 0.9, 0.9]),
            (1, None),
            (2, [0.1, 0.1]),
            (3, [0.1, 0.1, 0.9]),
            (4, [float("nan"), 0.1, 0.9, 0.9]),
            (5, [0.9, 0.9, 0.1, 0.1, 7.0]),  # overlong: extra ignored
        ],
        "vec_id long, embedding array<double>",
    )
    expr = {
        r["vec_id"]: list(r["codes"])
        for r in pq.with_codes(df, engine="expr").collect()
    }
    arrow = {
        r["vec_id"]: list(r["codes"])
        for r in pq.with_codes(df, engine="arrow").collect()
    }
    assert arrow == expr
    assert expr[1] == [None, None]
    assert expr[2] == [0, None]
    assert expr[3] == [0, None]
    assert expr[4][0] == 0  # NaN subspace -> first code in BOTH engines
    assert expr[5] == [1, 0]


def test_layout_sidecar_records_encoder_provenance(base, tmp_path, spark):
    pq = PQ(m=4, k_sub=8, max_iter=1, seed=42, encoder="arrow",
            seed_sample=512).fit(base, id_col="vec_id", dim=64)
    path = str(tmp_path / "pq_prov")
    pq.build(base, path, id_col="vec_id")
    fresh = PQ()
    fresh.load(spark, path)
    assert fresh.encoder == "arrow"
    assert fresh.seed_sample == 512


def test_fit_ignores_degraded_rows(spark):
    """Null / short vectors can't be encoded (null codes by design) —
    fit must skip them instead of crashing the Lloyd reduce, and the
    result equals fitting on the clean subset alone."""
    import numpy as np

    clean = [(i, [float((i * 7 + j * 3) % 13) for j in range(8)])
             for i in range(40)]
    degraded = [(100, None), (101, [1.0, 2.0, 3.0])]
    full = spark.createDataFrame(
        clean + degraded, "id long, embedding array<double>"
    )
    sub = spark.createDataFrame(clean, "id long, embedding array<double>")
    a = PQ(m=2, k_sub=4, max_iter=2, seed=42).fit(full, id_col="id", dim=8)
    b = PQ(m=2, k_sub=4, max_iter=2, seed=42).fit(sub, id_col="id", dim=8)
    assert np.array_equal(a.codebooks, b.codebooks)


def test_load_refuses_bare_parquet(spark, tmp_path):
    """A parquet dir without the _pq_meta.json sidecar is a provenance
    failure (codes are unusable without their exact codebooks), not a
    loadable layout."""
    path = str(tmp_path / "bare_pq")
    spark.range(3).write.parquet(path)
    with pytest.raises(ValueError, match="sidecar"):
        PQ().load(spark, path)
