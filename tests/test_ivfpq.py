"""IVF×PQ composed index (operators/ivfpq.py): cell pruning over
compressed codes — parity with flat PQ on the probed cells, layout
partition pruning, sidecar provenance, AnnIndex contract integration."""

import os

import pytest
from pyspark.sql import functions as F

from kowari_spark.operators.ivf import IVF
from kowari_spark.operators.ivfpq import IVFPQ
from kowari_spark.operators.pq import PQ


@pytest.fixture(scope="module")
def base(embeddings):
    return embeddings.select(
        F.col("vec_id").alias("id"), "embedding"
    ).cache()


@pytest.fixture(scope="module")
def fitted(base):
    comp = IVFPQ(
        IVF(n_lists=8, n_probe=2, max_iter=2, seed=42, round_centroids=6),
        PQ(m=4, k_sub=8, max_iter=2, seed=42, round_centroids=6),
    )
    return comp.fit(base, id_col="id", dim=64)


@pytest.fixture(scope="module")
def queries(base):
    return base.filter(F.col("id") < 3).select(
        F.col("id").alias("query_id"), "embedding"
    ).cache()


def test_pruned_adc_matches_flat_pq_on_probed_cells(fitted, base, queries):
    """The composed probe is DEFINED as flat-PQ ADC restricted to the
    query's probed cells — distances must be bit-identical to
    PQ.query_batch over the manually-pruned rows."""
    coded = fitted.with_cells_codes(base).select("id", "list_id", "codes").cache()
    comp = fitted.query_batch(coded, queries, 5, id_col="id", round_to=6)
    got = {
        (r["query_id"], r["id"]): (r["distance"], r["rank"])
        for r in comp.collect()
    }
    qrows = queries.collect()
    for qr in qrows:
        probes = fitted.ivf._probes_of(qr["embedding"])
        pruned = coded.filter(F.col("list_id").isin(probes)).select("id", "codes")
        flat = fitted.pq.query_batch(
            pruned,
            queries.filter(F.col("query_id") == qr["query_id"]),
            5, id_col="id", round_to=6,
        )
        for r in flat.collect():
            assert got[(r["query_id"], r["id"])] == (r["distance"], r["rank"])


def test_build_load_roundtrip_partitioned(fitted, base, spark, tmp_path):
    """build() writes partitionBy(list_id) + sidecar; a FRESH unfitted
    instance load()s to probe-ready state and probes identically; the
    probe plan partition-prunes the layout."""
    path = str(tmp_path / "ivfpq_layout")
    fitted.build(base, path, id_col="id")
    assert any(d.startswith("list_id=") for d in os.listdir(path))

    fresh = IVFPQ(IVF(), PQ())
    coded = fresh.load(spark, path)
    assert fresh.ivf.centroids is not None and fresh.pq.codebooks is not None

    q = base.filter(F.col("id") < 3).select(
        F.col("id").alias("query_id"), "embedding"
    )
    a = sorted(map(tuple, fresh.query_batch(coded, q, 5, id_col="id",
                                            round_to=6).collect()))
    b = sorted(map(tuple, fitted.query_batch(
        fitted.with_cells_codes(base).select("id", "list_id", "codes"),
        q, 5, id_col="id", round_to=6,
    ).collect()))
    assert a == b

    plan = fresh.query_batch(coded, q, 5, id_col="id")._jdf.queryExecution(
    ).executedPlan().toString()
    assert "PartitionFilters: [" in plan and "list_id" in plan


def test_load_refuses_bare_parquet(fitted, base, spark, tmp_path):
    path = str(tmp_path / "bare")
    base.limit(5).write.parquet(path)
    with pytest.raises(ValueError, match="sidecar"):
        IVFPQ(IVF(), PQ()).load(spark, path)


def test_build_requires_fit(base, tmp_path):
    with pytest.raises(ValueError, match="fit"):
        IVFPQ(IVF(), PQ()).build(base, str(tmp_path / "x"), id_col="id")


def test_probe_plan_stays_jvm_side(fitted, base, queries):
    """The ADC probe is pure expressions over the pruned scan: no
    Python stage, no cartesian product — the per-query restriction is
    the broadcast (query, cell) join."""
    coded = fitted.with_cells_codes(base, "embedding").select(
        "id", "list_id", "codes"
    )
    plan = fitted.query_batch(coded, queries, 5, id_col="id")._jdf\
        .queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
    assert "BroadcastHashJoin" in plan


def test_load_refuses_component_version_mismatch(fitted, base, spark,
                                                 tmp_path):
    """The sidecar carries the ivf.py/pq.py _ALGO_VERSION strings and
    load() verifies them — a future quantizer version bump refuses
    stale composed layouts instead of silently probing them (ADVICE
    r7: previously only the composed 'ivfpq-v1' string was checked)."""
    import json

    from kowari_spark.fsutil import read_bytes, write_bytes
    from kowari_spark.operators.ivfpq import _META_NAME

    path = str(tmp_path / "stale")
    fitted.build(base, path, id_col="id")
    meta = json.loads(read_bytes(spark, f"{path}/{_META_NAME}").decode())
    assert meta["ivf_version"] == "ivf-maxmin-v1"
    assert meta["pq_version"] == "pq-maxmin-v1"
    meta["pq_version"] = "pq-maxmin-v0"
    write_bytes(spark, f"{path}/{_META_NAME}", json.dumps(meta).encode())
    with pytest.raises(ValueError, match="component.*version"):
        IVFPQ(IVF(), PQ()).load(spark, path)


def test_full_probe_equals_flat_pq_rerank(fitted, base, queries):
    """Probing ALL cells (n_probe = n_lists) must reproduce flat-PQ
    results EXACTLY through the shared index contract — same codes,
    same ADC arithmetic, same rerank; any divergence means the pruned
    ADC drifted from flat ADC (the round-8 convergence pin)."""
    from kowari_spark.operators.ann import IVFPQIndex, PQIndex

    old_probe = fitted.ivf.n_probe
    try:
        fitted.ivf.n_probe = fitted.ivf.n_lists
        a = IVFPQIndex(fitted, rerank=4).search(
            base, queries, 5, metric="cosine", id_col="id", round_to=6
        )
        b = PQIndex(fitted.pq, rerank=4).search(
            base, queries, 5, metric="cosine", id_col="id", round_to=6
        )
        assert sorted(map(tuple, a.collect())) == sorted(
            map(tuple, b.collect())
        )
    finally:
        fitted.ivf.n_probe = old_probe
