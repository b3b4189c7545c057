"""Local simulation of the driver's correctness gate.

Runs every ``queries()`` entry on Spark and its ``oracle_sql()`` on DuckDB
at sf0.01, compares row count, column names/types, and an
order-insensitive value hash (rows sorted, floats kept as-is after the
contract's own rounding). Exit non-zero on any mismatch.
"""

from __future__ import annotations

import hashlib
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import duckdb
import pandas as pd

import __spark_entry__ as entrymod
from kowari_spark import get_session

TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()


def norm_pdf(pdf: pd.DataFrame) -> pd.DataFrame:
    pdf = pdf.reindex(sorted(pdf.columns), axis=1)
    for c in pdf.columns:
        if pdf[c].dtype == object:
            pdf[c] = pdf[c].astype(str)
    pdf = pdf.sort_values(by=list(pdf.columns)).reset_index(drop=True)
    return pdf


def value_hash(pdf: pd.DataFrame) -> str:
    """Stricter than the driver's: full-precision floats (%.17g is a
    round-trip repr, so any ulp difference shows) and a dtype-kind header
    (so DuckDB HUGEINT->float64 vs Spark int64 mismatches are caught even
    when the printed values coincide). Local green => driver green."""
    pdf = norm_pdf(pdf)
    kinds = ",".join(pdf[c].dtype.kind for c in pdf.columns)
    payload = (kinds + "\n" + pdf.to_csv(index=False, float_format="%.17g")).encode()
    return hashlib.sha256(payload).hexdigest()[:16]


def main(sf_dir: str = "/root/testdata/sf0.01", only: str | None = None) -> int:
    """``only`` = comma-separated queries() row names to check (skips the
    entry() smoke) — targeted re-verification after touching one operator."""
    spark = get_session(app="contract_check")
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'"
        )

    qs = entrymod.queries()
    oracles = entrymod.oracle_sql()
    failures = 0

    if only is not None:
        names = [n.strip() for n in only.split(",") if n.strip()]
        unknown = [n for n in names if n not in qs]
        if unknown:
            print(f"unknown queries() rows: {unknown}")
            return 1
        qs = {n: qs[n] for n in names}
    else:
        print("== entry() smoke ==")
        t0 = time.perf_counter()
        res = entrymod.entry(spark)
        n = res.count()
        print(f"entry: {n} rows in {time.perf_counter()-t0:.1f}s schema={[f.name for f in res.schema]}")
        assert n >= 0

    for name, fn in qs.items():
        t0 = time.perf_counter()
        try:
            sdf = fn(spark, sf_dir).toPandas()
        except Exception as e:
            print(f"FAIL {name}: spark error {type(e).__name__}: {e}")
            failures += 1
            continue
        spark_s = time.perf_counter() - t0
        if name not in oracles:
            print(f"ok?  {name}: rows={len(sdf)} (no oracle, rows-only) {spark_s:.1f}s")
            continue
        try:
            ddf = con.execute(oracles[name]).df()
        except Exception as e:
            print(f"FAIL {name}: duckdb error {type(e).__name__}: {e}")
            failures += 1
            continue
        ok_rows = len(sdf) == len(ddf)
        ok_cols = sorted(sdf.columns) == sorted(ddf.columns)
        hs, hd = value_hash(sdf), value_hash(ddf)
        ok_hash = hs == hd
        status = "PASS" if (ok_rows and ok_cols and ok_hash) else "FAIL"
        if status == "FAIL":
            failures += 1
        print(
            f"{status} {name}: rows {len(sdf)}/{len(ddf)} cols_ok={ok_cols} "
            f"hash {hs}/{hd} ({spark_s:.1f}s)"
        )
        if status == "FAIL" and ok_cols and ok_rows:
            a, b = norm_pdf(sdf), norm_pdf(ddf)
            diff = a.compare(b) if a.shape == b.shape else None
            if diff is not None and not diff.empty:
                print(diff.head(10))
            else:
                print("spark head:\n", a.head(5), "\nduck head:\n", b.head(5))
    print(f"\n{len(qs)} queries, {failures} failures")
    return 1 if failures else 0


if __name__ == "__main__":
    sys.exit(main(*sys.argv[1:]))
