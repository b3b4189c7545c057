"""ANN index-strategy walkthrough: one call shape for all six indexes.

The reference hides brute force / LSH / HNSW behind one Index trait
(src/index.rs:8-12); ``kowari_spark.operators.ann`` is that trait as a
Spark contract — ``build_df`` produces the index RELATION (write it
``partitionBy(...)`` for the offline layout), ``candidates`` is the only
strategy-specific step, and the shared ``search`` drives exact rescore,
per-query top-k, and the brute-force fallback.

Run: python examples/ann_strategies.py [sf_dir]   (default sf0.001)
"""

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from pyspark.sql import functions as F

from kowari_spark import get_session
from kowari_spark.operators.ann import (
    CrossPolytopeIndex,
    HNSWIndex,
    IVFIndex,
    IVFPQIndex,
    PQIndex,
    SignLSHIndex,
)
from kowari_spark.operators.cplsh import CrossPolytopeLSH
from kowari_spark.operators.eval import mean_metric, recall_at_k
from kowari_spark.operators.hnsw import HNSW
from kowari_spark.operators.ivf import IVF
from kowari_spark.operators.ivfpq import IVFPQ
from kowari_spark.operators.lsh import SignLSH
from kowari_spark.operators.pq import PQ
from kowari_spark.operators.topk import knn_batch


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    spark = get_session(app="kowari_ann_strategies")
    base = (
        spark.read.parquet(f"{sf_dir}/embeddings.parquet")
        .select(F.col("vec_id").alias("id"), "embedding")
        .cache()
    )
    queries = base.filter(F.col("id") < 4).select(
        F.col("id").alias("query_id"), "embedding"
    )
    exact = knn_batch(base, queries, 10, id_col="id", round_to=6)

    strategies = [
        SignLSHIndex(SignLSH(dim=64, num_planes=2, seed=42), probes=2),
        CrossPolytopeIndex(
            CrossPolytopeLSH(dim=64, num_tables=16, seed=100), probes=2
        ),
        # seed_sample: farthest-first seeding over a driver-side sample —
        # the build shape that holds at 100 TB
        IVFIndex(IVF(n_lists=8, n_probe=3, max_iter=3, seed=42,
                     seed_sample=512)),
        HNSWIndex(HNSW(m=8, ef=32, seed=42)),
        # compressed families: ADC shortlist + exact re-rank
        PQIndex(PQ(m=8, k_sub=16, max_iter=2, seed=42), rerank=8),
        # the composed serving structure — n_lists="auto" sizes cells
        # at sqrt(n) from the persist-warming count (at this demo's
        # tiny n that means probing 1 of ~14 cells, so recall is low
        # by construction; the sizing targets big corpora — see
        # BASELINE.md's decade table and recall curve)
        IVFPQIndex(IVFPQ(
            IVF(n_lists="auto", n_probe="auto", max_iter=2, seed=42,
                round_centroids=6),
            PQ(m=8, k_sub=16, max_iter=2, seed=42),
        ), rerank=8),
    ]
    for s in strategies:
        out = s.search(base, queries, 10, round_to=6).cache()
        rec = mean_metric(recall_at_k(exact, out, 10, id_col="id"), "recall")
        top1 = {
            r["query_id"]: r["id"]
            for r in out.filter(F.col("rank") == 1).collect()
        }
        print(f"{s.name:>9}: recall@10={rec:.3f}  top1={top1}")

    # every strategy composes with metadata pre-filtering: the
    # predicate hits candidates BEFORE starvation accounting, so a
    # starved query brute-forces the FILTERED corpus (exact-filtered
    # semantics, never silent recall loss)
    filt = strategies[0].search(
        base, queries, 5, round_to=6, where=(F.col("id") % 2 == 0)
    )
    evens = [r["id"] for r in filt.collect()]
    assert all(i % 2 == 0 for i in evens)
    print(f"filtered (id mod 2 == 0) via {strategies[0].name}: "
          f"{len(evens)} hits, all even")

    spark.stop()


if __name__ == "__main__":
    main()
