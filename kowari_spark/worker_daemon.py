"""Python-worker daemon that pre-imports the heavy numeric stack.

PySpark's worker daemon (``pyspark.daemon``) forks one worker process
per concurrent task; each FRESH worker that runs an Arrow / pandas-UDF
task first pays the ``import pandas`` tax — measured on this engine's
box at ~2.5 s wall per first-wave worker (32 workers at local[32]), the
floor under every cold-session GEMM stage (hnsw/cplsh builds, mapInArrow
passes). Importing the stack ONCE here, in the daemon process *before*
it starts forking, makes every forked worker inherit the already-loaded
modules through copy-on-write for free — the standard preload pattern
(guide §4.5 "initialise heavyweight state once", applied one level up:
once per daemon instead of once per task).

Wired by ``kowari_spark.session.get_session`` via
``spark.python.daemon.module`` (opt out: KOWARI_WORKER_PRELOAD=false).
Failure-safe: a missing optional module is skipped; anything unexpected
still starts the stock daemon loop, so worker behavior is identical to
``pyspark.daemon`` in every way except the warm module cache.
"""

import importlib

for _mod in ("numpy", "pandas", "pyarrow", "pyspark.sql.pandas.serializers"):
    try:
        importlib.import_module(_mod)
    except Exception:  # optional at runtime; workers re-import on use
        pass

if __name__ == "__main__":
    from pyspark.daemon import manager

    manager()
