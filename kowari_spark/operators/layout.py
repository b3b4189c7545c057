"""Data-layout operators: z-order clustering for multi-column skipping.

At 100 TB, partition pruning handles ONE coarse column (date, bucket);
queries filtering on several columns at once (e.g. ``l_shipdate`` AND
``l_suppkey``) need the rows CLUSTERED so parquet row-group min/max
statistics can skip files on every filtered column. Sorting by (a, b)
only clusters ``a``; z-ordering interleaves the bits of each column's
rank so file ranges stay tight on ALL participating columns — the same
technique Delta's OPTIMIZE ZORDER BY applies.

Shape: one pass to collect ~256 approximate quantile cut points per
column (driver-side, tiny), one narrow map to compute the z-value, one
``repartitionByRange`` (range shuffle) and a sorted write. Everything
after the cut-point collect is a single shuffle — no global sort.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _bucket_expr(col: Column, cuts: list[float]) -> Column:
    """Quantile-rank a column into [0, len(cuts)]: count of cut points
    <= value, as a native expression over a literal cut array (monotone,
    so adjacent values share buckets and ranges stay contiguous)."""
    from kowari_spark.functions.vector import lit_vec

    arr = lit_vec(cuts)
    v = col.cast("double")
    return F.aggregate(
        arr,
        F.lit(0),
        lambda acc, c: acc + F.when(v >= c, F.lit(1)).otherwise(F.lit(0)),
    )


def z_value(ranks: list[Column], bits: int = 8) -> Column:
    """Interleave ``bits`` low bits of each rank column (Morton code):
    bit j of column i lands at position j * len(ranks) + i."""
    out = F.lit(0).cast("long")
    for j in range(bits):
        for i, r in enumerate(ranks):
            bit = F.shiftright(r.cast("long"), j).bitwiseAND(F.lit(1))
            out = out + F.shiftleft(bit, j * len(ranks) + i)
    return out


def zorder_by(
    df: DataFrame,
    cols: list[str],
    bits: int = 8,
    n_partitions: int | None = None,
) -> DataFrame:
    """Cluster ``df`` by the z-order of ``cols``: quantile-rank each
    column to ``bits`` bits (cut points via approx quantiles — one cheap
    aggregate), interleave, range-partition + sort by the z-value. Write
    the result with ``.write.parquet(...)`` and every file holds a tight
    min/max range on EVERY listed column, so scans filtering any subset
    of them skip most files on parquet statistics alone."""
    n_buckets = (1 << bits) - 1
    qs = [i / n_buckets for i in range(1, n_buckets + 1)]
    # ONE driver job for every column's cut points (approxQuantile takes
    # a column list and runs a single multi-sketch aggregate)
    doubled = df.select(
        *[F.col(c).cast("double").alias(f"__q{i}") for i, c in enumerate(cols)]
    )
    all_cuts = doubled.approxQuantile(
        [f"__q{i}" for i in range(len(cols))], qs, 0.001
    )
    cuts = {c: sorted(set(all_cuts[i])) for i, c in enumerate(cols)}
    ranks = [_bucket_expr(F.col(c), cuts[c]) for c in cols]
    z = z_value(ranks, bits)
    out = df.withColumn("__z", z)
    # default output file count: never FEWER partitions than the input
    # has — a 100k-partition source range-shuffled into
    # shuffle.partitions (32) files would coarsen every file's min/max
    # span ~3000x and destroy the skipping this operator exists for
    n = n_partitions or max(
        int(df.sparkSession.conf.get("spark.sql.shuffle.partitions", "32")),
        df.rdd.getNumPartitions(),
        1,
    )
    return (
        out.repartitionByRange(n, F.col("__z"))
        .sortWithinPartitions("__z")
        .drop("__z")
    )
