"""Unified ANN index-strategy contract (operators/ann.py): all five
strategies drive through the same build_df -> candidates -> shared
search path — the Spark shape of the reference's Index trait
(src/index.rs:8-12) — and Collection.search(index=...) dispatches."""

import pytest
from pyspark.sql import functions as F

from kowari_spark.operators.ann import (
    CrossPolytopeIndex,
    HNSWIndex,
    IVFIndex,
    PQIndex,
    SignLSHIndex,
)
from kowari_spark.operators.cplsh import CrossPolytopeLSH
from kowari_spark.operators.eval import mean_metric, recall_at_k
from kowari_spark.operators.hnsw import HNSW
from kowari_spark.operators.ivf import IVF
from kowari_spark.operators.lsh import SignLSH
from kowari_spark.operators.pq import PQ
from kowari_spark.operators.topk import knn_batch


@pytest.fixture(scope="module")
def base(embeddings):
    return (
        embeddings.select(
            F.col("vec_id").alias("id"), "embedding"
        ).limit(300).cache()
    )


@pytest.fixture(scope="module")
def queries(base):
    return base.filter(F.col("id") < 4).select(
        F.col("id").alias("query_id"), "embedding"
    ).cache()


def _strategies():
    return [
        SignLSHIndex(SignLSH(dim=64, num_planes=2, seed=42), probes=2),
        CrossPolytopeIndex(
            CrossPolytopeLSH(dim=64, num_tables=16, seed=100), probes=2
        ),
        IVFIndex(IVF(n_lists=8, n_probe=3, max_iter=2, seed=42)),
        HNSWIndex(HNSW(m=8, ef=32, seed=42)),
        PQIndex(PQ(m=8, k_sub=16, max_iter=2, seed=42), rerank=8),
    ]


@pytest.mark.parametrize("strategy", _strategies(), ids=lambda s: s.name)
def test_contract_shape_and_quality(base, queries, strategy):
    """One call shape for every index: k rows per query, dense ranks,
    exact self-hit at rank 1, recall@10 well above random."""
    exact = knn_batch(base, queries, 10, id_col="id", round_to=6)
    out = strategy.search(base, queries, 10, round_to=6).cache()
    rows = out.collect()
    per_q = {}
    for r in rows:
        per_q.setdefault(r["query_id"], []).append(r)
    assert set(per_q) == {0, 1, 2, 3}
    for qid, rs in per_q.items():
        assert sorted(r["rank"] for r in rs) == list(range(1, 11))
        top = min(rs, key=lambda r: r["rank"])
        assert top["id"] == qid and top["score"] == pytest.approx(1.0)
    rec = mean_metric(recall_at_k(exact, out, 10, id_col="id"), "recall")
    assert rec >= 0.5, f"{strategy.name}: recall {rec}"


@pytest.mark.parametrize("strategy", _strategies()[:2], ids=lambda s: s.name)
def test_contract_reuses_prebuilt_relation(base, queries, strategy):
    """Passing built= skips re-bucketing — same results either way."""
    built = strategy.build_df(base, id_col="id").cache()
    a = sorted(map(tuple, strategy.search(base, queries, 5, round_to=6).collect()))
    b = sorted(map(tuple, strategy.search(
        base, queries, 5, round_to=6, built=built
    ).collect()))
    assert a == b


def test_contract_fallback_on_starved_queries(base, queries):
    """k larger than any candidate set -> the shared brute-force
    fallback still returns k rows per query (reference semantics)."""
    small = base.limit(40).cache()
    q1 = queries.limit(1)
    strategy = SignLSHIndex(SignLSH(dim=64, num_planes=6, seed=42))
    out = strategy.search(small, q1, 39, round_to=6)
    assert out.count() == 39


def test_collection_search_dispatches_index(spark, embeddings, tmp_path):
    from kowari_spark.catalog import CollectionManager

    mgr = CollectionManager(spark, str(tmp_path / "wh"))
    coll = mgr.create_collection("ann_dispatch", dimension=64)
    vecs = embeddings.select(
        F.col("vec_id").cast("string").alias("id"),
        "embedding",
        F.to_json(F.struct(F.col("vec_id").alias("k"))).alias("metadata"),
    ).limit(120)
    coll.add_df(vecs)
    qvec = [float(x) for x in embeddings.filter(F.col("vec_id") == 7)
            .first()["embedding"]]
    # probing every cell makes the ANN path exhaustive by construction,
    # so the dispatch must EQUAL the exact-scan path
    strategy = IVFIndex(IVF(n_lists=4, n_probe=4, max_iter=2, seed=42))
    got = coll.search_with_scores(qvec, 5, round_to=6, index=strategy).collect()
    assert len(got) == 5
    assert got[0]["id"] == "7" and got[0]["score"] == pytest.approx(1.0)
    exact = coll.search_with_scores(qvec, 5, round_to=6).collect()
    assert [(r["id"], r["score"]) for r in got] == [
        (r["id"], r["score"]) for r in exact
    ]
    assert len(coll.search(qvec, 5, index=strategy).collect()) == 5


def _ivfpq_strategy():
    from kowari_spark.operators.ann import IVFPQIndex
    from kowari_spark.operators.ivfpq import IVFPQ

    return IVFPQIndex(
        IVFPQ(IVF(n_lists=8, n_probe=4, max_iter=2, seed=42),
              PQ(m=8, k_sub=16, max_iter=2, seed=42)),
        rerank=8,
    )


def test_ivfpq_contract_shape_and_quality(base, queries):
    """The sixth strategy (IVF×PQ composition) drives through the same
    contract: k rows per query, dense ranks, exact self-hit, recall
    well above random."""
    exact = knn_batch(base, queries, 10, id_col="id", round_to=6)
    out = _ivfpq_strategy().search(base, queries, 10, round_to=6).cache()
    rows = out.collect()
    per_q = {}
    for r in rows:
        per_q.setdefault(r["query_id"], []).append(r)
    assert set(per_q) == {0, 1, 2, 3}
    for qid, rs in per_q.items():
        assert sorted(r["rank"] for r in rs) == list(range(1, 11))
        top = min(rs, key=lambda r: r["rank"])
        assert top["id"] == qid and top["score"] == pytest.approx(1.0)
    rec = mean_metric(recall_at_k(exact, out, 10, id_col="id"), "recall")
    assert rec >= 0.5, f"ivfpq: recall {rec}"


def test_filtered_search_respects_predicate(base, queries):
    """where= pre-filter: every hit satisfies the predicate and ranks
    stay dense (non-starved regime: ~half the corpus passes)."""
    strategy = SignLSHIndex(SignLSH(dim=64, num_planes=2, seed=42), probes=2)
    out = strategy.search(
        base, queries, 10, round_to=6, where=(F.col("id") % 2 == 0)
    ).collect()
    assert len(out) == 40
    assert all(r["id"] % 2 == 0 for r in out)
    per_q = {}
    for r in out:
        per_q.setdefault(r["query_id"], []).append(r["rank"])
    assert all(sorted(v) == list(range(1, 11)) for v in per_q.values())


def test_filtered_search_starved_falls_back_to_filtered_exact(base, queries):
    """A predicate that shrinks every bucket below k must brute-force
    the FILTERED corpus — result EQUALS exact filtered knn (the recall
    guarantee post-filtering the hits would lose)."""
    pred = F.col("id") % 31 == 0  # ~10 of 300 rows pass
    strategy = SignLSHIndex(SignLSH(dim=64, num_planes=6, seed=42))
    got = sorted(map(tuple, strategy.search(
        base, queries, 8, round_to=6, where=pred
    ).collect()))
    exact = sorted(map(tuple, knn_batch(
        base.filter(pred), queries, 8, id_col="id", round_to=6
    ).collect()))
    assert got == exact and len(got) > 0


def test_filtered_search_sql_string_predicate(base, queries):
    """where= accepts a SQL string too."""
    strategy = IVFIndex(IVF(n_lists=4, n_probe=4, max_iter=2, seed=42))
    out = strategy.search(
        base, queries.limit(1), 5, round_to=6, where="id % 2 = 1"
    ).collect()
    assert len(out) == 5 and all(r["id"] % 2 == 1 for r in out)


def test_collection_filtered_search(spark, embeddings, tmp_path):
    """Collection.search_with_scores(where=...) pre-filters on both the
    exact path and the index path; with every cell probed the two paths
    are exhaustive and must agree."""
    from kowari_spark.catalog import CollectionManager

    mgr = CollectionManager(spark, str(tmp_path / "whf"))
    coll = mgr.create_collection("ann_filtered", dimension=64)
    vecs = embeddings.select(
        F.col("vec_id").cast("string").alias("id"),
        "embedding",
        F.to_json(F.struct(F.col("vec_id").alias("k"))).alias("metadata"),
    ).limit(120)
    coll.add_df(vecs)
    qvec = [float(x) for x in embeddings.filter(F.col("vec_id") == 7)
            .first()["embedding"]]
    pred = "CAST(id AS INT) % 2 = 0"
    strategy = IVFIndex(IVF(n_lists=4, n_probe=4, max_iter=2, seed=42))
    got = coll.search_with_scores(qvec, 5, round_to=6, index=strategy,
                                  where=pred).collect()
    exact = coll.search_with_scores(qvec, 5, round_to=6, where=pred).collect()
    assert [(r["id"], r["score"]) for r in got] == [
        (r["id"], r["score"]) for r in exact
    ]
    assert all(int(r["id"]) % 2 == 0 for r in got) and len(got) == 5
