"""As-of join — the canonical time-series operator Spark lacks natively
(task brief: "when the reference has an operator Spark lacks (e.g.,
as-of join, range join) implement it as a composition of existing
DataFrame ops").

``asof_join(left, right)`` attaches to every left row the LATEST right
row whose time is <= the left time, per key group (backward as-of; the
semantics of DuckDB's ASOF JOIN, pandas merge_asof, kdb aj).

Spark-first plan (one shuffle, no range explosion):
1. tag and union both sides — right rows carry their payload, left rows
   carry nulls;
2. one window per key ordered by (time, side-tag): ``last(payload,
   ignorenulls=True)`` carries the most recent right payload forward
   onto every left row;
3. filter back to left rows.

The union shuffles each row ONCE (by key) — compare a naive range join,
which is |left|x|right| per key before the per-row argmax. Ties (right
time == left time) match, mirroring ASOF JOIN's <=; among right rows
sharing (key, time) the one greatest in ``tiebreak`` order (default:
the value columns themselves) wins — a physical-order-independent rule,
so results are stable across runs and partitionings.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def asof_join(
    left: DataFrame,
    right: DataFrame,
    time_col: str,
    by: list[str],
    value_cols: list[str] | None = None,
    suffix: str = "_asof",
    tiebreak: list[str] | None = None,
) -> DataFrame:
    """Backward as-of join of ``right`` onto ``left``.

    Output: every left row + ``<value_col><suffix>`` columns holding the
    latest right values at-or-before the left row's time (null when no
    right row precedes it). ``tiebreak`` names right-side columns that
    deterministically order right rows sharing (key, time) — the
    greatest tuple wins; defaults to the value columns (pass an id
    column explicitly when values contain unorderable types like maps).
    """
    value_cols = value_cols or [
        c for c in right.columns if c not in by and c != time_col
    ]
    tiebreak = tiebreak or value_cols
    # tiebreak columns ride along through the union even when they are
    # not requested as outputs (dropped again at the end)
    carried = list(dict.fromkeys([*value_cols, *tiebreak]))
    lt = left.withColumn("__side", F.lit(1))
    for c in carried:
        out = c + suffix
        lt = lt.withColumn(out, F.lit(None).cast(right.schema[c].dataType))
    rt = right.select(
        *by,
        F.col(time_col),
        F.lit(0).alias("__side"),
        *[F.col(c).alias(c + suffix) for c in carried],
    )
    extra_left = [c for c in lt.columns if c not in rt.columns]
    for c in extra_left:
        rt = rt.withColumn(c, F.lit(None).cast(lt.schema[c].dataType))
    unioned = lt.unionByName(rt.select(lt.columns))

    # right rows (side 0) sort BEFORE left rows at equal time -> a right
    # row at exactly the left time is visible to it (<= semantics).
    # tiebreak columns (nulls first, so populated right rows outrank the
    # null-carrying left rows only via __side) make the order among
    # equal-(key, time) right rows total — without them last(ignorenulls)
    # would pick a physically arbitrary row.
    w = (
        Window.partitionBy(*by)
        .orderBy(
            F.col(time_col).asc(),
            F.col("__side").asc(),
            *[F.asc_nulls_first(c + suffix) for c in tiebreak],
        )
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    for c in value_cols:
        out = c + suffix
        unioned = unioned.withColumn(out, F.last(out, ignorenulls=True).over(w))
    extra = [c + suffix for c in carried if c not in value_cols]
    return unioned.filter(F.col("__side") == 1).drop("__side", *extra)
