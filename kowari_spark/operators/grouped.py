"""Grouped custom operators via applyInPandas (grouped-map pattern).

Completes the engine's Python-stage surface: mapInPandas (multimodal
decode), applyInPandasWithState (streaming state), and here
applyInPandas — whole-group pandas transforms for semantics that need
the full group in memory. Groups are hash-partitioned by key, so the
operator scales with the number of groups; per-group size must fit an
executor (document the skew hazard, mitigate upstream with
operators/skew.py when keys are hot).
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame


def grouped_standardize(
    df: DataFrame,
    key_cols: list[str],
    value_col: str,
    out_col: str = "zscore",
    ddof: int = 0,
) -> DataFrame:
    """Per-group z-score: (v - mean_group) / std_group (0 when the group
    is constant). Equivalent to the native window form — asserted in
    tests — and exists as the template for group transforms that
    genuinely need pandas (rank-normalize, per-group model scoring,
    resampling)."""
    import pyspark.sql.types as T

    out_schema = T.StructType(
        list(df.schema.fields) + [T.StructField(out_col, T.DoubleType())]
    )

    def standardize(pdf: pd.DataFrame) -> pd.DataFrame:
        v = pdf[value_col].astype(float)
        std = v.std(ddof=ddof)
        pdf = pdf.copy()
        pdf[out_col] = 0.0 if (std == 0 or pd.isna(std)) else (v - v.mean()) / std
        return pdf

    return df.groupBy(*key_cols).applyInPandas(standardize, out_schema)
