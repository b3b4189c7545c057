"""Distribution statistics: exact grouped quantiles (order statistics).

Beyond-reference surface: the reference has no aggregate statistics at
all; an analytics engine over 100 TB needs both the exact and the
approximate quantile path:

- ``exact_quantiles`` computes TRUE order statistics per group with one
  window sort per group (a single shuffle on the group key) — the form
  an oracle can check bit-for-bit, and the right choice whenever a
  group fits a partition's sort buffer;
- at whole-table 100 TB scale, prefer Spark's built-in
  ``percentile_approx`` (GK sketch, mergeable, bounded memory) — it is
  deliberately NOT oracle-checked here because its error bound is
  engine-specific.

Rank convention: quantile p = the value whose 1-based rank equals
``ceil(p * n)`` (discrete/lower quantile, no interpolation). The rank is
computed as IEEE ``ceil(double(p) * n)`` so an external engine running
the same expression lands on the same row even when p*n sits at a
representation boundary.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def exact_quantiles(
    df: DataFrame,
    key_cols: list[str],
    value_col: str,
    ps: Sequence[float] = (0.5, 0.95, 0.99),
) -> DataFrame:
    """Per-group exact quantiles of ``value_col``: one row per group with
    columns ``n`` and ``p<percent>`` (e.g. p50, p95, p99).

    One window sort per group (shuffle on the key), then each requested
    quantile is a conditional min over the ranked rows — ties in the
    value column are harmless because the SELECTED VALUE at a rank is
    invariant under tie order."""
    w = Window.partitionBy(*key_cols).orderBy(F.col("__v").asc())
    wn = Window.partitionBy(*key_cols)
    ranked = df.select(*key_cols, F.col(value_col).cast("double").alias("__v")).withColumn(
        "__rn", F.row_number().over(w)
    ).withColumn("__n", F.count("*").over(wn))
    aggs = [F.max("__n").cast("long").alias("n")]
    for p in ps:
        rank = F.greatest(F.ceil(F.lit(float(p)) * F.col("__n")), F.lit(1))
        name = f"p{str(p * 100).rstrip('0').rstrip('.').replace('.', '_')}"
        aggs.append(F.min(F.when(F.col("__rn") == rank, F.col("__v"))).alias(name))
    return ranked.groupBy(*key_cols).agg(*aggs)


def retention_cohorts(
    events: DataFrame,
    user_col: str = "user_id",
    ts_col: str = "ts",
) -> DataFrame:
    """Weekly cohort retention matrix: cohort = ISO week of the user's
    FIRST event, cell (cohort, week_n) = distinct users of that cohort
    active week_n weeks after their first event.

    Two shuffles — the first-event aggregate and the (cohort, week_n)
    distinct-count — both keyed on user/cohort, so a cluster
    co-partitions them; exact distinct (the oracle-checkable form),
    with approx_count_distinct the knob at whole-corpus scale. Output
    columns: cohort_week (yyyy-MM-dd string), week_n, users."""
    first = events.groupBy(user_col).agg(F.min(ts_col).alias("__t0"))
    joined = events.select(user_col, ts_col).join(first, user_col)
    week_n = F.floor(
        F.datediff(F.col(ts_col).cast("date"), F.col("__t0").cast("date")) / 7
    ).cast("long")
    cohort = F.date_format(F.date_trunc("week", F.col("__t0")), "yyyy-MM-dd")
    return (
        joined.select(
            cohort.alias("cohort_week"),
            week_n.alias("week_n"),
            F.col(user_col).alias("__u"),
        )
        .groupBy("cohort_week", "week_n")
        .agg(F.count_distinct("__u").cast("long").alias("users"))
    )
