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


def mixture_rates(
    df: DataFrame,
    strata_col: str,
    target_weights: dict[str, float],
    max_rate: float = 1.0,
) -> DataFrame:
    """Per-stratum sampling rates that hit a TARGET MIXTURE with maximum
    data usage — the domain-reweighting step of a pretraining pipeline
    ("make the mix 70% web, 20% code, 10% books").

    With per-stratum counts c_s and target weights w_s, the largest
    achievable mixture-preserving sample keeps λ·w_s rows of stratum s
    where λ = min_s(c_s / w_s) — the scarcest stratum is used in full
    (rate 1) and abundant strata are downsampled to match. Returns the
    tiny relation (stratum, n_rows, rate).

    Strata absent from ``target_weights`` get no row (rate 0 — they are
    not part of the mix); target strata absent from the DATA are
    ignored when sizing λ (the mixture is achieved over the strata that
    exist). One aggregation job over the corpus; everything downstream
    joins this ≤|strata|-row result as a broadcast.
    """
    if not target_weights:
        raise ValueError("target_weights is empty")
    pairs: list[Column] = []
    for s, w in target_weights.items():
        if w <= 0:
            raise ValueError(f"weight for {s!r} must be > 0")
        pairs.append(F.lit(str(s)))
        pairs.append(F.lit(float(w)))
    w_col = F.element_at(
        F.create_map(*pairs), F.col(strata_col).cast("string")
    )
    counts = (
        df.select(F.col(strata_col).alias("stratum"), w_col.alias("__w"))
        .filter(F.col("__w").isNotNull())
        .groupBy("stratum", "__w")
        .agg(F.count("*").alias("n_rows"))
    )
    lam = counts.agg(
        F.min(F.col("n_rows") / F.col("__w")).alias("__lam")
    )
    return counts.crossJoin(F.broadcast(lam)).select(
        "stratum",
        "n_rows",
        F.least(
            F.col("__lam") * F.col("__w") / F.col("n_rows"),
            F.lit(float(max_rate)),
        ).alias("rate"),
    )


def mixture_sample(
    df: DataFrame,
    strata_col: str,
    target_weights: dict[str, float],
    id_col: str = "doc_id",
    seed: int = 42,
) -> DataFrame:
    """Deterministically sample ``df`` down to the target stratum
    mixture (see :func:`mixture_rates`): each row draws its stable
    hash-uniform and survives iff u < rate(stratum). Rows whose stratum
    is outside the target mix are dropped. The rates relation is tiny
    and broadcast, so the operator adds ZERO shuffles beyond the one
    counting aggregate — the filter itself is embarrassingly parallel
    and reproducible under repartitioning, retries, and streaming
    arrival."""
    # __-prefixed internals: a caller column named "rate"/"stratum"/
    # "n_rows" must survive the join untouched
    rates = F.broadcast(
        mixture_rates(df, strata_col, target_weights).select(
            F.col("stratum").alias("__stratum"),
            F.col("rate").alias("__rate"),
        )
    )
    return (
        df.join(
            rates,
            df[strata_col].cast("string") == rates["__stratum"],
        )
        .filter(hash_uniform(df[id_col], seed) < F.col("__rate"))
        .drop("__stratum", "__rate")
    )


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
