"""Dump .explain("formatted") for every declared query to plans/<tag>/.

Usage: python tools/plan_dump.py <tag> [suffix] [only1,only2,...]

Writes plans/<tag>/<name>_<suffix>.txt (suffix defaults to "before") and
prints a one-line census per query: Exchange count, join strategies,
Python-eval nodes — the plan-shape numbers OPTIMIZATION_r*.md cites.

Plan-only (no execution) except where a query's *construction* runs
driver actions (e.g. fetching a query vector, building a cached layout);
those run at their usual bench cost.
"""

from __future__ import annotations

import os
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import __spark_entry__ as entrymod
from kowari_spark import get_session


def census(plan: str) -> str:
    counts = {}
    for pat, label in [
        (r"\bExchange hashpartitioning", "ExHash"),
        (r"\bExchange rangepartitioning", "ExRange"),
        (r"\bExchange RoundRobinPartitioning", "ExRR"),
        (r"\bExchange SinglePartition", "ExSingle"),
        (r"\bBroadcastExchange\b", "BcastEx"),
        (r"\bBroadcastHashJoin\b", "BHJ"),
        (r"\bSortMergeJoin\b", "SMJ"),
        (r"\bShuffledHashJoin\b", "SHJ"),
        (r"\bBroadcastNestedLoopJoin\b", "BNLJ"),
        (r"\bCartesianProduct\b", "Cartesian"),
        (r"\bBatchEvalPython\b", "BatchPy"),
        (r"\bArrowEvalPython\b", "ArrowPy"),
        (r"\bMapInArrow\b|\bMapInPandas\b", "MapPy"),
        (r"\bWindow\b", "Window"),
        (r"\bGenerate\b", "Generate"),
    ]:
        n = len(re.findall(pat, plan))
        if n:
            counts[label] = n
    return " ".join(f"{k}={v}" for k, v in counts.items()) or "(none)"


def main() -> int:
    tag = sys.argv[1] if len(sys.argv) > 1 else "r15"
    suffix = sys.argv[2] if len(sys.argv) > 2 else "before"
    only = None
    if len(sys.argv) > 3:
        only = {s.strip() for s in sys.argv[3].split(",") if s.strip()}
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    outdir = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "plans", tag,
    )
    os.makedirs(outdir, exist_ok=True)
    spark = get_session(app="plan_dump")

    qs = entrymod.queries()
    if only:
        qs = {n: f for n, f in qs.items() if n in only}
    failures = 0
    for name, fn in qs.items():
        try:
            df = fn(spark, sf_dir)
            plan = df._jdf.queryExecution().explainString(
                spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
                    "formatted"
                )
            )
        except Exception as e:  # noqa: BLE001
            print(f"FAIL {name}: {type(e).__name__}: {e}")
            failures += 1
            continue
        with open(os.path.join(outdir, f"{name}_{suffix}.txt"), "w") as fh:
            fh.write(plan)
        print(f"{name}: {census(plan)}")
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main())
