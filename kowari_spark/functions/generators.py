"""Seeded data generators (G1, reference utils.rs:26-39).

The reference generates n random vectors of dimension d, uniform[-1, 1),
with an unseeded thread_rng. Ours is seeded and DISTRIBUTED: built on
``spark.range`` (parallel id space) + per-element md5-hash uniforms, so
the same (n, dim, seed) always yields the same table on any cluster
layout — no RNG state, no driver-side materialization.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def generate_random_vectors(
    spark: SparkSession,
    n: int,
    dim: int,
    seed: int = 42,
    id_col: str = "id",
    vec_col: str = "embedding",
) -> DataFrame:
    """n vectors, dimension d, elements uniform[-1, 1) (G1 semantics).

    element(i, j) = hash-uniform(id=i, dim=j, seed) * 2 - 1, where the
    uniform is a 13-hex-digit md5 prefix scaled to [0, 1) — deterministic
    per (row, position, seed), independent of partitioning.
    """
    def u(j):
        h = F.conv(
            F.substring(
                F.md5(F.concat_ws("#", F.col(id_col).cast("string"),
                                  j.cast("string"), F.lit(str(seed)))),
                1, 13,
            ),
            16, 10,
        ).cast("double") / F.lit(float(16**13))
        return h * 2.0 - 1.0

    vec = F.transform(F.sequence(F.lit(0), F.lit(dim - 1)), lambda j: u(j).cast("float"))
    return spark.range(n).select(F.col("id").alias(id_col), vec.alias(vec_col))
