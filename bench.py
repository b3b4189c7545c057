"""Benchmark harness — one JSON line on stdout.

Runs the engine's headline queries at $SPARK_GRAFT_SF_DIR (default
/root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS]. Each query is timed
end-to-end (plan + execute + fetch); the headline metric is the total
wall time of the suite.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from pyspark.sql import functions as F

import __spark_entry__ as entrymod
from kowari_spark import get_session
from kowari_spark.operators import knn_batch


def bench_queries(spark, sf_dir):
    """name -> zero-arg callable executing one benchmark query."""
    out = {}
    for name, fn in entrymod.queries().items():
        out[name] = (lambda f=fn: f(spark, sf_dir).toPandas())

    def knn_batch_100():
        base = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
        queries = base.filter(F.col("vec_id") < 100).select(
            F.col("vec_id").alias("query_id"), "embedding"
        )
        return knn_batch(
            base, queries, 10, metric="cosine", id_col="vec_id", round_to=6
        ).toPandas()

    out["exact_knn_batch_100"] = knn_batch_100
    return out


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    sf = float(sf_dir.rstrip("/").rsplit("sf", 1)[-1]) if "sf" in sf_dir else -1.0
    spark = get_session(app="kowari_bench")

    # warm the JVM + parquet footers so timings measure the queries
    spark.read.parquet(f"{sf_dir}/lineitem.parquet").count()

    timings = {}
    for name, fn in bench_queries(spark, sf_dir).items():
        t0 = time.perf_counter()
        fn()
        timings[name] = round(time.perf_counter() - t0, 3)

    print(
        json.dumps(
            {
                "metric": "suite_wall_seconds",
                "value": round(sum(timings.values()), 3),
                "unit": "sec",
                "queries": timings,
                "sf": sf,
            }
        )
    )


if __name__ == "__main__":
    main()
