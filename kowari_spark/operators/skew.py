"""Skew-mitigation primitives: salting for hot keys.

At 100 TB a handful of hot keys (one viral document fingerprint, one
giant LSH bucket, one null-heavy join key) can pin a whole stage on one
task. AQE's skew-join split (enabled in session.py) handles sort-merge
joins; these helpers cover the remaining shapes:

- ``salted_aggregate``: two-stage aggregation — stage 1 groups on
  (key, salt) spreading a hot key over ``n_salts`` reducers, stage 2
  merges the partials. Correct for any algebraic aggregate expressed as
  (partial, merge) pairs.
- ``salted_join``: replicate the small side ``n_salts`` times, salt the
  big side uniformly — every (key, salt) partition holds 1/n of the hot
  key's rows. Use when the small side is too big to broadcast outright
  but hot keys break the shuffle join.

Both are deterministic: the salt is a hash of the row's OTHER columns
(or a provided column), not a random draw.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _salt(cols: list[str], n_salts: int) -> Column:
    """Deterministic salt in [0, n_salts): hash of the listed columns."""
    return F.pmod(F.hash(*[F.col(c) for c in cols]), F.lit(n_salts))


def salted_aggregate(
    df: DataFrame,
    key_cols: list[str],
    partials: dict[str, tuple[Column, Column]],
    salt_from: list[str],
    n_salts: int = 16,
) -> DataFrame:
    """Two-stage skew-safe aggregation.

    ``partials`` maps output name -> (stage1 aggregate over raw rows,
    stage2 aggregate over stage-1 partial column of the same name), e.g.

        {"n": (F.count("*"), F.sum("n")),
         "total": (F.sum("v"), F.sum("total")),
         "mx": (F.max("v"), F.max("mx"))}

    Stage 1 shuffles on (key, salt) — a key with 100M rows lands on
    n_salts reducers instead of one; stage 2 shuffles n_salts rows per
    key.
    """
    stage1 = (
        df.withColumn("__salt", _salt(salt_from, n_salts))
        .groupBy(*key_cols, "__salt")
        .agg(*[expr.alias(name) for name, (expr, _) in partials.items()])
    )
    return stage1.groupBy(*key_cols).agg(
        *[merge.alias(name) for name, (_, merge) in partials.items()]
    )


def salted_join(
    big: DataFrame,
    small: DataFrame,
    on: list[str],
    n_salts: int = 16,
    salt_from: list[str] | None = None,
    how: str = "inner",
) -> DataFrame:
    """Skew-safe equi-join: salt the big side, replicate the small side.

    Every (key, salt_i) bucket joins against its own replica of the
    small side's key rows, so a hot key's rows split across ``n_salts``
    tasks. Output equals ``big.join(small, on, how)`` exactly for the
    supported ``how`` modes — those where every output row is driven by
    a big-side row (each big row carries exactly one salt, so it meets
    exactly one replica). Right/full outer modes would emit one
    null-extended row per UNMATCHED small-side replica (n_salts
    duplicates) and are rejected.
    """
    allowed = {"inner", "left", "left_outer", "leftouter", "left_semi",
               "leftsemi", "left_anti", "leftanti", "semi", "anti", "cross"}
    if how.lower() not in allowed:
        raise ValueError(
            f"salted_join supports big-side-driven joins {sorted(allowed)}; "
            f"got how={how!r} — right/full outer would duplicate unmatched "
            "small-side rows once per salt replica"
        )
    salt_cols = salt_from or [c for c in big.columns if c not in on]
    if not salt_cols:
        salt_cols = on  # degenerate: key-only frame, salting is a no-op
    big_s = big.withColumn("__salt", _salt(salt_cols, n_salts))
    replicas = small.withColumn(
        "__salt", F.explode(F.sequence(F.lit(0), F.lit(n_salts - 1)))
    )
    return big_s.join(replicas, [*on, "__salt"], how).drop("__salt")
