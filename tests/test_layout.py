"""Z-order clustering layout (operators/layout.py)."""

import glob

from pyspark.sql import functions as F

from kowari_spark.operators.layout import z_value, zorder_by


def test_z_value_interleaves_bits(spark):
    df = spark.range(1).select(
        z_value([F.lit(0b11), F.lit(0b00)], bits=2).alias("a"),
        z_value([F.lit(0b00), F.lit(0b11)], bits=2).alias("b"),
        z_value([F.lit(1), F.lit(1)], bits=1).alias("c"),
    )
    r = df.first()
    assert r["a"] == 0b0101  # col0 bits land at even positions
    assert r["b"] == 0b1010
    assert r["c"] == 0b11


def test_zorder_write_clusters_both_columns(spark, tmp_path):
    """After z-ordering a uniform 64x64 grid into 8 range partitions,
    the TYPICAL parquet file must hold a tight range on BOTH columns —
    a plain sort by (x, y) leaves y spanning its full range in every
    file. Median, not max: repartitionByRange samples its boundaries,
    and a file straddling a z-curve quadrant edge legitimately spans one
    dimension."""
    import statistics

    n = 64
    grid = spark.range(n * n).select(
        (F.col("id") % n).alias("x"), (F.col("id") / n).cast("long").alias("y")
    )
    path = str(tmp_path / "z")
    zorder_by(grid, ["x", "y"], bits=6, n_partitions=8).write.parquet(path)
    files = sorted(glob.glob(f"{path}/part-*.parquet"))
    assert len(files) == 8
    spans = []
    for f in files:
        pdf = spark.read.parquet(f).toPandas()
        spans.append(max(pdf["x"].max() - pdf["x"].min(),
                         pdf["y"].max() - pdf["y"].min()))
    # interior files sit inside one 32x32 quadrant (span <= 31); allow
    # slop for sampled boundaries. A plain sort gives median span 63.
    assert statistics.median(spans) <= 45, spans


def test_zorder_default_partitions_never_below_input(spark):
    """Round-4 ADVICE low (a): a wide input (more partitions than
    spark.sql.shuffle.partitions) must not silently coarsen into
    shuffle.partitions files — the default output partition count is
    max(input partitions, shuffle.partitions)."""
    wide = (
        spark.range(2000)
        .repartition(48)  # wider than the session's 32 shuffle partitions
        .select(
            (F.col("id") % 40).alias("x"),
            (F.col("id") % 7).alias("y"),
        )
    )
    out = zorder_by(wide, ["x", "y"], bits=4)
    assert out.rdd.getNumPartitions() >= 48
    # explicit n_partitions still wins
    assert zorder_by(wide, ["x", "y"], bits=4,
                     n_partitions=8).rdd.getNumPartitions() == 8
