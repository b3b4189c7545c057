"""Engine auto-selection for the dual expr/arrow operators.

Several operators ship two bit-identical engines: a pure-JVM
expression plan (the SQL-oracle shape, zero Python) and an
Arrow-vectorized ``mapInPandas`` plan (the 100 TB shape — interpreted
higher-order lambdas over per-token/per-subspace arrays are the
measured scale bottleneck: BASELINE.md's x100 tables put the
expression paths 3-170x behind). Both engines are parity-tested
bit-identical, so the choice is pure performance — which means it can
and should be automatic (the HNSW ``scorer="auto"`` precedent,
hnsw.py): arrow at/above a small corpus-size threshold, expr below it
(skips the session's first-Python-worker spinup; measured equal at
tiny n).

``resolve_engine`` sizes the choice with ONE BOUNDED probe —
``df.limit(threshold).count()`` — so the sizing decision never scans
more than ``auto_min_rows`` rows regardless of plan shape. (A bare
``count()`` is only free on a raw parquet scan; on a derived frame —
filters, joins, synthetic input — it executes the whole upstream plan
one extra time, a full extra pass at the 100 TB design point. The
limit stops the scan after the first task produces ``threshold`` rows;
ADVICE r7.) Callers that already know n pass it directly.
"""

from __future__ import annotations

from pyspark.sql import DataFrame

#: "auto" picks the arrow engine at/above this row count; below it the
#: expression plan is as fast and avoids Python-worker spinup. Matches
#: HNSW.AUTO_GEMM_MIN_ROWS — same boundary, same measurement.
AUTO_ARROW_MIN_ROWS = 1000


def resolve_engine(
    engine: str,
    df: DataFrame | None = None,
    n: int | None = None,
    auto_min_rows: int = AUTO_ARROW_MIN_ROWS,
) -> str:
    """Resolve ``engine`` ("auto" | "expr" | "arrow") to a concrete
    engine. "auto" = "arrow" when the frame has >= ``auto_min_rows``
    rows (pass ``n`` to skip the probe job), else "expr". The probe is
    ``df.limit(auto_min_rows).count()`` — bounded by the threshold, so
    it never runs the upstream plan to completion on a derived frame.
    Explicit engines pass through unchanged (the audit opt-out)."""
    if engine in ("expr", "arrow"):
        return engine
    if engine != "auto":
        raise ValueError(f"engine must be auto|expr|arrow, got {engine!r}")
    if n is None:
        if df is None:
            raise ValueError("engine='auto' needs df or n to size the choice")
        n = df.limit(auto_min_rows).count()
    return "arrow" if n >= auto_min_rows else "expr"
