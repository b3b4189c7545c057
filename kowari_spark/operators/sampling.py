"""Deterministic sampling and dataset splits for training-data pipelines.

RNG-based sampling (``df.sample``) is irreproducible across partition
layouts and engines; at 100 TB a training pipeline needs samples and
splits that are a PURE FUNCTION of the row's identity:

- stable under repartitioning, retries, and incremental reprocessing
  (a row keeps its split forever — no train/test leakage when data is
  re-ingested);
- auditable: any engine can recompute membership (portable md5 hash,
  exact DuckDB oracle);
- streaming-safe: new rows assign themselves on arrival.

Mechanism: u = hash64(id || '#' || seed) / 2^60 is uniform in [0, 1);
a fraction-f sample keeps u < f, and an n-way split assigns the bucket
whose cumulative weight first exceeds u. All native expressions.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from kowari_spark.functions.text import base_hash64

# base_hash64 yields 60-bit values (15 hex chars)
_HASH_SPACE = float(1 << 60)


def hash_uniform(id_col: Column | str, seed: int = 42) -> Column:
    """Deterministic uniform [0, 1) draw from a row id (portable)."""
    col = F.col(id_col) if isinstance(id_col, str) else id_col
    return base_hash64(
        F.concat(col.cast("string"), F.lit(f"#{seed}"))
    ).cast("double") / F.lit(_HASH_SPACE)


def deterministic_sample(
    df: DataFrame, fraction: float, id_col: str = "doc_id", seed: int = 42
) -> DataFrame:
    """Keep ~``fraction`` of rows, chosen by id hash — same rows on
    every run, every engine, every partitioning."""
    return df.filter(hash_uniform(id_col, seed) < F.lit(float(fraction)))


def split_assign(
    id_col: Column | str,
    weights: dict[str, float],
    seed: int = 42,
) -> Column:
    """Split label column: buckets [0,w1), [w1,w1+w2), ... over the
    row's uniform draw. Weights must sum to ~1; the last bucket absorbs
    the remainder so every row is labeled."""
    names = list(weights)
    u = hash_uniform(id_col, seed)
    expr: Column | None = None
    acc = 0.0
    for name in names[:-1]:
        acc += float(weights[name])
        cond = u < F.lit(acc)
        expr = F.when(cond, F.lit(name)) if expr is None else expr.when(cond, F.lit(name))
    last = F.lit(names[-1])
    return last if expr is None else expr.otherwise(last)


def train_val_test(
    df: DataFrame,
    id_col: str = "doc_id",
    weights: dict[str, float] | None = None,
    seed: int = 42,
) -> DataFrame:
    """Stable train/val/test assignment as a ``split`` column."""
    weights = weights or {"train": 0.8, "val": 0.1, "test": 0.1}
    return df.withColumn("split", split_assign(id_col, weights, seed))


def stratified_sample(
    df: DataFrame,
    strata_col: str,
    fractions: dict[str, float],
    id_col: str = "doc_id",
    seed: int = 42,
    default_fraction: float = 0.0,
) -> DataFrame:
    """Per-stratum deterministic sampling (e.g. rebalance languages in a
    training mix): keep ~fractions[stratum] of each group, chosen by id
    hash — the same reproducibility guarantees as deterministic_sample,
    per group. Strata absent from ``fractions`` fall back to
    ``default_fraction``. The fraction lookup is a literal map (native
    expression), so the filter stays in whole-stage codegen."""
    pairs: list[Column] = []
    for k, v in fractions.items():
        pairs.append(F.lit(str(k)))
        pairs.append(F.lit(float(v)))
    frac = F.coalesce(
        F.element_at(F.create_map(*pairs), F.col(strata_col).cast("string")),
        F.lit(float(default_fraction)),
    )
    return df.filter(hash_uniform(id_col, seed) < frac)
