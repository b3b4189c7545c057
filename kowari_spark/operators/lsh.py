"""Random-hyperplane (sign) LSH index.

Semantics parity (SURVEY.md §2.3 Q3/Q4): the reference samples
``num_planes`` random hyperplanes, buckets each vector by the packed sign
bits of v·plane (src/index.rs:99-107,124-156), probes the query's bucket,
and — crucially — falls back to a FULL brute-force scan whenever the
bucket holds fewer than ``top_k`` candidates (src/index.rs:161-170; its
tests rely on this, tests/integration_tests.rs:240-245). Hyperplanes here
are seeded (the reference uses unseeded thread_rng — SURVEY.md §7.2), so
declared queries are reproducible.

Spark-first design:
- the bucket is a plain LONG column computed by native zip_with/aggregate
  expressions (whole-stage codegen, no Python);
- ``build`` writes the table ``partitionBy("bucket")`` so a bucket probe
  is PARTITION PRUNING — at 100 TB a probe reads one partition, not the
  table (SURVEY.md §4.1 maps the reference's bucket probe to exactly
  this);
- batch probe = equi-join of queries to base on bucket (hash-partitioned
  both sides, co-located), fallback handled per-query by a union with the
  exact path for only the starved queries.
"""

from __future__ import annotations

from collections.abc import Sequence

import numpy as np
from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from kowari_spark.functions.vector import dot as dot_expr
from kowari_spark.operators.topk import knn, knn_batch


class SignLSH:
    """Seeded random-hyperplane LSH (reference defaults: 16 planes,
    src/index.rs:183-185)."""

    def __init__(self, dim: int, num_planes: int = 16, seed: int = 42):
        if num_planes > 62:
            raise ValueError("bucket is packed into a signed 64-bit long")
        self.dim = dim
        self.num_planes = num_planes
        self.seed = seed
        rng = np.random.RandomState(seed)
        # uniform [-1, 1) hyperplanes, matching the reference generator's
        # range (src/index.rs:134-143, utils.rs:26-39)
        self.planes = rng.uniform(-1.0, 1.0, size=(num_planes, dim))

    # -- hashing ---------------------------------------------------------

    def bucket_expr(self, vec_col: Column | str) -> Column:
        """Packed sign-bit bucket as a native column expression."""
        col = F.col(vec_col) if isinstance(vec_col, str) else vec_col
        acc = F.lit(0).cast("long")
        for i, plane in enumerate(self.planes):
            d = dot_expr(col, F.lit([float(x) for x in plane]))
            acc = acc + F.when(d >= 0.0, F.lit(1 << i).cast("long")).otherwise(F.lit(0).cast("long"))
        return acc

    def bucket_of(self, vec: Sequence[float]) -> int:
        """Driver-side bucket for a single query vector."""
        v = np.asarray(vec, dtype=np.float64)
        signs = (self.planes @ v) >= 0.0
        return int(sum(1 << i for i, s in enumerate(signs) if s))

    def with_buckets(self, df: DataFrame, vec_col: str = "embedding") -> DataFrame:
        return df.withColumn("bucket", self.bucket_expr(vec_col))

    # -- build (offline) --------------------------------------------------

    def build(self, df: DataFrame, path: str, vec_col: str = "embedding") -> None:
        """Materialize the bucketed layout: partitionBy(bucket) parquet.

        With 2^p buckets the probe becomes partition pruning; at scale
        this is the difference between reading one bucket and scanning
        the table. The repartition by bucket co-locates each bucket in
        one task so the write emits one file per bucket — without it
        every task writes a sliver of every bucket and the file count
        explodes as tasks x buckets. Size num_planes to the data: 2^p
        buckets should each hold many vectors (p=16 means 65k partitions
        — right at 100 TB, pathological at sf0.1).
        """
        self.with_buckets(df, vec_col).repartition(F.col("bucket")).write.mode(
            "overwrite"
        ).partitionBy("bucket").parquet(path)

    def load(self, spark: SparkSession, path: str) -> DataFrame:
        return spark.read.parquet(path)

    # -- query ------------------------------------------------------------

    def query(
        self,
        df: DataFrame,
        query: Sequence[float],
        k: int,
        metric: str = "cosine",
        id_col: str = "id",
        vec_col: str = "embedding",
        round_to: int | None = None,
    ) -> DataFrame:
        """Single-query probe with the reference's fallback semantic:
        if the query's bucket yields < k candidates, rank the FULL table
        instead (src/index.rs:158-173)."""
        qb = self.bucket_of(query)
        base = df if "bucket" in df.columns else self.with_buckets(df, vec_col)
        candidates = base.filter(F.col("bucket") == qb)
        if candidates.count() < k:
            candidates = base  # brute-force fallback
        return knn(
            candidates, query, k, metric=metric, id_col=id_col,
            vec_col=vec_col, round_to=round_to,
        )

    def query_batch(
        self,
        df: DataFrame,
        queries: DataFrame,
        k: int,
        metric: str = "cosine",
        id_col: str = "id",
        vec_col: str = "embedding",
        query_id_col: str = "query_id",
        query_vec_col: str = "embedding",
        round_to: int | None = None,
    ) -> DataFrame:
        """Batch probe: equi-join queries to base on bucket + per-query
        top-k; queries whose bucket has < k candidates are re-run through
        the exact path and unioned in (per-query fallback)."""
        from pyspark.sql.window import Window

        base = df if "bucket" in df.columns else self.with_buckets(df, vec_col)
        q = queries.select(
            F.col(query_id_col).alias("query_id"),
            F.col(query_vec_col).alias("__qvec"),
        ).withColumn("bucket", self.bucket_expr("__qvec"))

        bucket_sizes = base.groupBy("bucket").agg(F.count("*").alias("__n"))
        q_sized = q.join(F.broadcast(bucket_sizes), "bucket", "left").fillna(
            0, subset=["__n"]
        )
        q_ok = q_sized.filter(F.col("__n") >= k).drop("__n")
        q_fallback = q_sized.filter(F.col("__n") < k).drop("__n")

        from kowari_spark.operators.topk import _rounded, _score

        probed = (
            base.join(F.broadcast(q_ok), "bucket")
            .select(
                "query_id",
                F.col(id_col),
                _rounded(_score(metric, F.col(vec_col), F.col("__qvec")), round_to).alias(
                    "score"
                ),
            )
        )
        w = Window.partitionBy("query_id").orderBy(F.desc("score"), F.asc(id_col))
        probed_topk = (
            probed.withColumn("rank", F.row_number().over(w)).filter(F.col("rank") <= k)
        )

        parts = [probed_topk]
        if not q_fallback.isEmpty():
            fb = knn_batch(
                base.drop("bucket"),
                q_fallback.select("query_id", F.col("__qvec").alias("embedding")),
                k,
                metric=metric,
                id_col=id_col,
                vec_col=vec_col,
                round_to=round_to,
            )
            parts.append(fb.select("query_id", id_col, "score", "rank"))
        out = parts[0]
        for p in parts[1:]:
            out = out.unionByName(p)
        return out
