"""Per-line wall profile: construction vs execution, with repeats.

Usage: python tools/line_profile.py name1,name2,... [repeats]

For each declared query: time (a) the queries() callable building the
DataFrame (this is where hidden driver actions — layout builds,
query-vector .first()/.collect() fetches — run) and (b) the .toPandas()
execution, plus the noop-sink time of the same plan (guide §1.4),
repeated N times (default 3). Prints one line per repeat.
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import __spark_entry__ as entrymod
from kowari_spark import get_session


def main() -> int:
    names = [s.strip() for s in sys.argv[1].split(",") if s.strip()]
    repeats = int(sys.argv[2]) if len(sys.argv) > 2 else 3
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_session(app="line_profile")
    spark.read.parquet(f"{sf_dir}/lineitem.parquet").count()  # JVM warm

    qs = entrymod.queries()
    unknown = [n for n in names if n not in qs]
    if unknown:
        print(f"unknown: {unknown}")
        return 1
    for name in names:
        fn = qs[name]
        for i in range(repeats):
            spark.sparkContext.setJobDescription(f"{name} [{i}] build")
            t0 = time.perf_counter()
            df = fn(spark, sf_dir)
            t1 = time.perf_counter()
            spark.sparkContext.setJobDescription(f"{name} [{i}] noop")
            df.write.format("noop").mode("overwrite").save()
            t2 = time.perf_counter()
            spark.sparkContext.setJobDescription(f"{name} [{i}] toPandas")
            df.toPandas()
            t3 = time.perf_counter()
            print(
                f"{name} [{i}] construct={t1-t0:7.2f}s noop={t2-t1:7.2f}s "
                f"toPandas={t3-t2:7.2f}s total={t3-t0:7.2f}s", flush=True,
            )
            spark.sparkContext.setJobDescription(None)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
