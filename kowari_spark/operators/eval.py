"""Search-quality metrics: recall@k and precision@k.

Semantics parity (SURVEY.md §2.5 G3/G4, reference src/utils.rs:64-96):
- recall@k clamps k to BOTH list lengths, then
  |expected[..k'] ∩ actual[..k']| / k'  (0.0 when k'==0);
- precision@k compares actual[..k] against the FULL expected set, / k.

Implemented over ranked result relations (query_id, id, rank) with array
built-ins — no UDFs.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _ranked_lists(df: DataFrame, id_col: str, max_k: int | None) -> DataFrame:
    lst = F.transform(
        F.array_sort(
            F.collect_list(F.struct(F.col("rank"), F.col(id_col).alias("v")))
        ),
        lambda s: s["v"],
    )
    if max_k is not None:
        lst = F.slice(lst, 1, max_k)
    return df.groupBy("query_id").agg(lst.alias("ids"))


def recall_at_k(
    expected: DataFrame, actual: DataFrame, k: int, id_col: str = "id"
) -> DataFrame:
    """Per-query recall@k of ``actual`` vs ``expected`` ground truth.

    Both inputs: (query_id, id, rank). Output: (query_id, recall).
    """
    e = _ranked_lists(expected, id_col, k).withColumnRenamed("ids", "e_ids")
    a = _ranked_lists(actual, id_col, k).withColumnRenamed("ids", "a_ids")
    j = e.join(a, "query_id", "full")
    kc = F.least(F.lit(k), F.size("e_ids"), F.size("a_ids"))
    inter = F.size(
        F.array_intersect(F.slice("e_ids", 1, k), F.slice("a_ids", 1, k))
    )
    recall = F.when(kc <= 0, F.lit(0.0)).otherwise(inter.cast("double") / kc)
    return j.select("query_id", recall.alias("recall"))


def precision_at_k(
    expected: DataFrame, actual: DataFrame, k: int, id_col: str = "id"
) -> DataFrame:
    """Per-query precision@k: |actual[..k] ∩ expected(all)| / k."""
    e = _ranked_lists(expected, id_col, None).withColumnRenamed("ids", "e_ids")
    a = _ranked_lists(actual, id_col, k).withColumnRenamed("ids", "a_ids")
    j = e.join(a, "query_id", "full")
    inter = F.size(F.array_intersect("a_ids", "e_ids"))
    prec = F.when(F.lit(k) <= 0, F.lit(0.0)).otherwise(inter.cast("double") / k)
    return j.select("query_id", prec.alias("precision"))


def mean_metric(df: DataFrame, col: str) -> float:
    """Suite-level mean of a per-query metric."""
    row = df.agg(F.avg(col).alias("m")).first()
    return float(row["m"]) if row["m"] is not None else 0.0
