"""SparkSession factory tuned for this engine.

Local mode in CI (local[N], one JVM); the configs below are the ones that
also matter on a real cluster: AQE for runtime re-planning (skew joins,
partition coalescing), Arrow for any pandas-UDF path, UTC session timezone
so timestamp semantics match the DuckDB oracle.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def _env_bool(name: str, default: bool) -> str:
    """Read a boolean env knob tolerantly ('1'/'true'/'yes'/'on', any
    case, surrounding whitespace) and return the canonical 'true'/'false'
    string Spark's boolean confs require; raise a clear error on junk
    instead of letting the session builder fail far from the env var."""
    raw = os.environ.get(name)
    if raw is None:
        return "true" if default else "false"
    v = raw.strip().lower()
    if v in ("1", "true", "yes", "on"):
        return "true"
    if v in ("0", "false", "no", "off"):
        return "false"
    raise ValueError(
        f"{name}={raw!r} is not a boolean; use true/false (or 1/0, yes/no, on/off)"
    )


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
        # Long-lived sessions (serving, bench suites) accumulate
        # out-of-scope lazy-localCheckpoint RDD blocks and broadcast
        # pieces whose cleanup waits on a DRIVER GC (ContextCleaner
        # holds weak refs); the Spark default only forces one every
        # 30 min, longer than a whole suite, so storage fills and
        # late queries run against a pressured heap. 90 s keeps the
        # reclaim cadence well under block-accumulation rates at any
        # scale — the measured r15 suite effect was minutes of
        # late-suite inflation on untouched queries (e.g. a 0.6 s
        # normalize line reading 3.7 s after 100 lines).
        # KOWARI_PERIODIC_GC overrides (Spark duration string).
        .config(
            "spark.cleaner.periodicGC.interval",
            os.environ.get("KOWARI_PERIODIC_GC", "90s"),
        )
        .config("spark.ui.enabled", "false")
        # PySpark wraps EVERY DataFrame-level API call in call-site
        # capture when spark.python.sql.dataFrameDebugging.enabled
        # (default true): a conf read + origin set + clear = 3 extra
        # py4j roundtrips plus an inspect-stack walk PER CALL. Complex
        # probe constructions make hundreds of API calls — measured
        # ~25% of doc_hybrid_batch's construction wall (3.4 s -> 2.6 s
        # off). Cost of turning it off: error messages lose the
        # "called from file:line" DataFrame context, nothing else.
        # KOWARI_DF_DEBUGGING=true restores it for debugging sessions.
        .config(
            "spark.python.sql.dataFrameDebugging.enabled",
            _env_bool("KOWARI_DF_DEBUGGING", default=False),
        )
        .config("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
        # Path-based reads of partitioned layouts (2^p-bucket LSH/BM25
        # trees) re-list their partition dirs per open; above this many
        # paths Spark LAUNCHES A JOB to list (default 32) — a full
        # job round trip (~60-90 ms + task dispatch) to stat a few
        # dozen directories. Driver-side threaded listing is strictly
        # cheaper below a few hundred paths on any store; big tables
        # (thousands of partitions) still take the distributed path.
        # Measured: 2 listing jobs (~0.25 s) inside every
        # hybrid-over-MultiSignLSH probe construction.
        .config(
            "spark.sql.sources.parallelPartitionDiscovery.threshold",
            os.environ.get("KOWARI_LIST_JOB_THRESHOLD", "256"),
        )
        # runtime row-level filtering: build a bloom filter from the
        # selective side of a big join and push it into the other side's
        # scan — at 100 TB this prunes shuffle input the way DPP prunes
        # partitions. The BASELINE.md round-4 A/B measured ON vs OFF at
        # sf0.1 as a wash (75.6 s vs 77.1 s shared-query sum, both within
        # 2% of the round-1 baseline), so the cluster-right default (ON)
        # costs nothing locally; KOWARI_BLOOM_FILTER=false turns it off.
        .config(
            "spark.sql.optimizer.runtime.bloomFilter.enabled",
            _env_bool("KOWARI_BLOOM_FILTER", default=True),
        )
    )
    # file:// writes without the libhadoop native library fork a shell
    # per created file or dir (RawLocalFileSystem.setPermission ->
    # Shell.execCommand("chmod"); a checksummed write creates TWO
    # files) — thread dumps showed ~90% of a 5120-directory layout
    # write inside ProcessImpl.forkAndExec, and the same fork tax on
    # every sidecar/marker/catalog write. The packaged
    # NioLocalFileSystem issues the identical chmod(2) in-process
    # (cp T=40 layout build: 18.6 s -> 2.9 s steady-state). Only
    # file:// URIs are affected; hdfs://s3a:// resolution is
    # untouched, and KOWARI_FAST_LOCALFS=false opts out.
    _jar = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                        "jars", "kowari-localfs.jar")
    if (
        os.path.exists(_jar)
        and _env_bool("KOWARI_FAST_LOCALFS", default=True) == "true"
        and not (extra_conf or {}).get("spark.hadoop.fs.file.impl")
    ):
        builder = (
            builder.config("spark.hadoop.fs.file.impl",
                           "kowari.hadoop.NioLocalFileSystem")
            .config("spark.driver.extraClassPath", _jar)
            .config("spark.jars", _jar)
        )
    # Pre-import the numeric stack in the WORKER DAEMON so forked
    # Python workers inherit loaded numpy/pandas/pyarrow via
    # copy-on-write: a fresh worker's first Arrow/pandas task measured
    # ~2.5 s of pure import wall (x32 first-wave workers at local[32])
    # before this — the floor under every cold-session GEMM stage. The
    # module only pre-imports and then delegates to the stock
    # pyspark.daemon loop, so worker semantics are unchanged; workers
    # on a cluster resolve it from the same PYTHONPATH that already
    # ships kowari_spark's UDF closures. KOWARI_WORKER_PRELOAD=false
    # restores the stock daemon.
    if _env_bool("KOWARI_WORKER_PRELOAD", default=True) == "true":
        # the worker launcher builds the daemon's PYTHONPATH from the
        # JVM's inherited environment, not the driver's sys.path — make
        # the package root visible there BEFORE the gateway JVM starts
        # so `python -m kowari_spark.worker_daemon` resolves from any
        # launch cwd (no-op when kowari_spark is a site-package)
        pkg_root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
        pp = os.environ.get("PYTHONPATH", "")
        if pkg_root not in pp.split(os.pathsep):
            os.environ["PYTHONPATH"] = (
                pkg_root + (os.pathsep + pp if pp else "")
            )
        builder = builder.config(
            "spark.python.daemon.module", "kowari_spark.worker_daemon"
        )
    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, v)
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark
