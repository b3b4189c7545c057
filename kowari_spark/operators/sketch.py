"""Deterministic cardinality sketch: KMV (k-minimum-values).

Spark's built-in approx_count_distinct is HyperLogLog++ — fine at scale
but its estimates can't be reproduced by another engine, so it can't be
oracle-checked. KMV over the engine's portable md5 hash is fully
deterministic: the estimate depends only on the DATA, not on RNG or
sketch-library internals, so DuckDB computes the identical number.

Estimator (Bar-Yossef et al.): hash every distinct value to u in (0,1);
if fewer than k distinct hashes exist the count is exact; otherwise
estimate = (k-1) / u_(k), the k-th smallest hash. Error ~ 1/sqrt(k).

Shape: distinct (group, hash) -> per-group k smallest via window -> one
row per group. The shuffle carries one row per distinct value (not per
input row — distinct is map-side partial), and the sketch state per
group is k scalars, the same property that makes KMV mergeable across
partitions.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from kowari_spark.functions.text import base_hash64

_HASH_SPACE = float(16**15)  # base_hash64 is uniform on [0, 16^15)


def kmv_distinct(
    df: DataFrame,
    group_cols: list[str],
    value_col: str,
    k: int = 64,
    est_col: str = "distinct_est",
) -> DataFrame:
    """Per-group approximate distinct count of ``value_col``.

    Output: (group_cols..., distinct_est double). Exact when a group has
    < k distinct values; relative error ~ 1/sqrt(k) above that.
    """
    hashed = df.select(
        *group_cols,
        (base_hash64(F.col(value_col).cast("string")).cast("double") / _HASH_SPACE).alias(
            "__u"
        ),
    ).distinct()
    w = Window.partitionBy(*group_cols).orderBy(F.col("__u").asc())
    kept = hashed.withColumn("__rn", F.row_number().over(w)).filter(F.col("__rn") <= k)
    est = F.when(
        F.max("__rn") < k, F.max("__rn").cast("double")
    ).otherwise(F.lit(float(k - 1)) / F.max("__u"))
    return kept.groupBy(*group_cols).agg(est.alias(est_col))
