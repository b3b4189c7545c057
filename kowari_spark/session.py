"""SparkSession factory tuned for this engine.

Local mode in CI (local[N], one JVM); the configs below are the ones that
also matter on a real cluster: AQE for runtime re-planning (skew joins,
partition coalescing), Arrow for any pandas-UDF path, UTC session timezone
so timestamp semantics match the DuckDB oracle.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def get_session(
    app: str = "kowari_spark",
    master: str | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    """Build (or reuse) a SparkSession with engine defaults.

    ``SPARK_GRAFT_CPUS`` controls local parallelism (driver contract);
    shuffle partitions default to the core count — on a real cluster this
    would be set to ~2-3x total executor cores and AQE coalesces down.
    """
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "*")
    if master is None:
        master = f"local[{cpus}]"
    if shuffle_partitions is None:
        n = os.cpu_count() or 8 if cpus == "*" else int(cpus)
        shuffle_partitions = max(8, min(64, int(n)))

    builder = (
        SparkSession.builder.appName(app)
        .master(master)
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.driver.memory", os.environ.get("KOWARI_DRIVER_MEM", "8g"))
        .config("spark.ui.enabled", "false")
        .config("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
        # runtime row-level filtering: build a bloom filter from the
        # selective side of a big join and push it into the other side's
        # scan — at 100 TB this prunes shuffle input the way DPP prunes
        # partitions. KOWARI_BLOOM_FILTER=false turns it off; at small SF
        # the build-and-probe cost is pure overhead (see BASELINE.md A/B).
        .config(
            "spark.sql.optimizer.runtime.bloomFilter.enabled",
            os.environ.get("KOWARI_BLOOM_FILTER", "true"),
        )
    )
    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, v)
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark
