"""ANN index-strategy walkthrough: one call shape for four indexes.

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
    SignLSHIndex,
)
from kowari_spark.operators.cplsh import CrossPolytopeLSH
from kowari_spark.operators.eval import mean_metric, recall_at_k
from kowari_spark.operators.hnsw import HNSW
from kowari_spark.operators.ivf import IVF
from kowari_spark.operators.lsh import SignLSH
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
    ]
    for s in strategies:
        out = s.search(base, queries, 10, round_to=6).cache()
        rec = mean_metric(recall_at_k(exact, out, 10, id_col="id"), "recall")
        top1 = {
            r["query_id"]: r["id"]
            for r in out.filter(F.col("rank") == 1).collect()
        }
        print(f"{s.name:>9}: recall@10={rec:.3f}  top1={top1}")

    spark.stop()


if __name__ == "__main__":
    main()
