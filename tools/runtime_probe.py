"""Runtime shape probe: run one query line and report its actual
executed plan (final AQE plan incl. ReusedExchange) plus job/stage/task
counts from the Spark UI REST API.

Usage: python tools/runtime_probe.py name1,name2,...
"""

from __future__ import annotations

import json
import os
import re
import sys
import time
import urllib.request

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import __spark_entry__ as entrymod
from kowari_spark import get_session


def _rest(port: int, path: str):
    with urllib.request.urlopen(f"http://localhost:{port}{path}", timeout=10) as r:
        return json.loads(r.read())


def main() -> int:
    names = [s.strip() for s in sys.argv[1].split(",") if s.strip()]
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_session(
        app="runtime_probe", extra_conf={"spark.ui.enabled": "true"}
    )
    port = int(spark.sparkContext.uiWebUrl.rsplit(":", 1)[1])
    app_id = spark.sparkContext.applicationId
    spark.read.parquet(f"{sf_dir}/lineitem.parquet").count()

    qs = entrymod.queries()
    for name in names:
        fn = qs[name]
        # steady state: one untimed pass first (layout caches warm)
        df = fn(spark, sf_dir)
        df.write.format("noop").mode("overwrite").save()

        jobs0 = _rest(port, f"/api/v1/applications/{app_id}/jobs")
        n0 = len(jobs0)
        t0 = time.perf_counter()
        df = fn(spark, sf_dir)
        t1 = time.perf_counter()
        df.write.format("noop").mode("overwrite").save()
        t2 = time.perf_counter()
        jobs = _rest(port, f"/api/v1/applications/{app_id}/jobs")
        new = jobs[: len(jobs) - n0]
        n_stages = sum(len(j.get("stageIds", [])) for j in new)
        n_tasks = sum(j.get("numTasks", 0) for j in new)
        print(
            f"\n=== {name}: construct={t1-t0:.2f}s exec={t2-t1:.2f}s "
            f"jobs={len(new)} stages={n_stages} tasks={n_tasks}"
        )
        for j in reversed(new):
            dur = ""
            try:
                from datetime import datetime

                st = datetime.strptime(
                    j["submissionTime"], "%Y-%m-%dT%H:%M:%S.%fGMT"
                )
                en = datetime.strptime(
                    j["completionTime"], "%Y-%m-%dT%H:%M:%S.%fGMT"
                )
                dur = f"{(en - st).total_seconds():6.2f}s"
            except Exception:  # noqa: BLE001
                pass
            print(
                f"  job {j['jobId']:4d} {dur} stages={len(j.get('stageIds', []))} "
                f"tasks={j.get('numTasks', 0):4d} {j.get('description', '')[:80]}"
            )
        # final executed plan of the last SQL execution: ReusedExchange?
        try:
            sqls = _rest(
                port,
                f"/api/v1/applications/{app_id}/sql?details=true&planDescription=true",
            )
            last = sqls[-1]
            plan = last.get("planDescription", "")
            reused = len(re.findall(r"ReusedExchange", plan))
            exch = len(re.findall(r"\bExchange\b", plan))
            print(f"  final plan: Exchange={exch} ReusedExchange={reused}")
        except Exception as e:  # noqa: BLE001
            print(f"  (sql api: {e})")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
