"""Deterministic cardinality sketches: KMV (k-minimum-values) and a
portable HyperLogLog.

Spark's built-in approx_count_distinct is HyperLogLog++ — fine at scale
but its estimates can't be reproduced by another engine, so it can't be
oracle-checked. Both sketches here are built over the engine's portable
md5 hash and are fully deterministic: the estimate depends only on the
DATA, not on RNG or sketch-library internals, so DuckDB computes the
identical number. KMV keeps the k smallest hashes per group (shuffle
carries distinct values); hll_distinct keeps m = 2^p max-rank registers
per group (constant state, classic partial-aggregable HLL — Flajolet
et al. 2007).

KMV estimator (Bar-Yossef et al.): hash every distinct value to u in
(0,1); if fewer than k distinct hashes exist the count is exact;
otherwise estimate = (k-1) / u_(k), the k-th smallest hash. Error
~ 1/sqrt(k).

KMV shape: distinct (group, hash) -> per-group k smallest via window ->
one row per group. The shuffle carries one row per distinct value (not
per input row — distinct is map-side partial), and the sketch state per
group is k scalars, the same property that makes KMV mergeable across
partitions.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from kowari_spark.functions.text import base_hash64

_HASH_SPACE = float(16**15)  # base_hash64 is uniform on [0, 16^15)


def kmv_distinct(
    df: DataFrame,
    group_cols: list[str],
    value_col: str,
    k: int = 64,
    est_col: str = "distinct_est",
) -> DataFrame:
    """Per-group approximate distinct count of ``value_col``.

    Output: (group_cols..., distinct_est double). Exact when a group has
    < k distinct values; relative error ~ 1/sqrt(k) above that.
    """
    hashed = df.select(
        *group_cols,
        (base_hash64(F.col(value_col).cast("string")).cast("double") / _HASH_SPACE).alias(
            "__u"
        ),
    ).distinct()
    w = Window.partitionBy(*group_cols).orderBy(F.col("__u").asc())
    kept = hashed.withColumn("__rn", F.row_number().over(w)).filter(F.col("__rn") <= k)
    est = F.when(
        F.max("__rn") < k, F.max("__rn").cast("double")
    ).otherwise(F.lit(float(k - 1)) / F.max("__u"))
    return kept.groupBy(*group_cols).agg(est.alias(est_col))


# Bias-correction constants from Flajolet et al. 2007 §4 (public).
_HLL_ALPHA = {16: 0.673, 32: 0.697, 64: 0.709}


def hll_alpha(m: int) -> float:
    return _HLL_ALPHA.get(m, 0.7213 / (1.0 + 1.079 / m))


def hll_linear_count_sql(m: int, v_expr: str = "v") -> str:
    """The linear-counting correction ``round(m·ln(m/V), 9)`` as a SQL
    fragment matching :func:`hll_estimate`'s in-plan expression
    (round 15 — VERDICT r14 #5): rounding to 9 decimals pins the two
    engines' libm ``ln`` to a shared value (the idf rounded-ln parity
    trick), which is what lets p grow past 8 — the previous
    driver-side literal map needed 2^p CASE arms."""
    return f"ROUND({float(m)!r} * ln({float(m)!r} / ({v_expr})::DOUBLE), 9)"


def hll_distinct(
    df: DataFrame,
    group_cols: list[str],
    value_col: str,
    p: int = 6,
    est_col: str = "distinct_est",
) -> DataFrame:
    """Per-group HyperLogLog distinct count of ``value_col``, fully
    deterministic (portable md5 hash, driver-computed correction
    literals) so another engine reproduces the estimate bit-for-bit.

    Register assignment over the 60-bit hash h: register = low p bits,
    rank rho = leading-zero count of the remaining 60-p bits + 1
    (computed exactly via length(bin(w)) — integer, no float log).
    Estimate = alpha_m * m^2 / sum_j 2^(-M_j), with the standard
    small-range linear-counting correction round(m*ln(m/V), 9) when
    the raw estimate <= 2.5m and V registers are empty (in-plan, the
    idf rounded-ln parity trick — round 15 lifted the old p<=8 cap
    that the driver-side 2^p-literal correction map imposed).

    Scale shape (the reason HLL exists next to KMV):
    - the (group, register) max-aggregation is a classic partial agg —
      the shuffle carries at most m = 2^p rows per group regardless of
      input size, vs KMV's one row per DISTINCT value;
    - the 2^(-M) sum is computed exactly in scaled integer arithmetic
      (decimal sum of 2^(61-M)), so the result is independent of
      aggregation order — no float-fold pinning needed;
    - relative error ~ 1.04/sqrt(m): ~6.5% at p=8, ~1.6% at p=12,
      ~0.8% at p=14 (the production-HLL range).

    ``p`` must be in [4, 14]: below 4 the alpha constants don't
    apply; above 14 the per-group state (2^p rows) stops being
    sketch-scale and the 60-bit hash's rank field (60-p bits) starts
    costing accuracy.
    """
    regs = hll_registers(df, group_cols, value_col, p)
    return hll_estimate(regs, group_cols, p, est_col)


def hll_registers(
    df: DataFrame, group_cols: list[str], value_col: str, p: int
) -> DataFrame:
    """The per-group HLL register relation (group_cols..., __reg int,
    __M int) — the sketch STATE: at most m = 2^p rows per group, and
    MERGEABLE by per-register max (the Flajolet property that makes
    the sketch a layout: union of corpora == max-merge of registers,
    and re-merging the same rows is a no-op, so replays are benign by
    algebra, not by markers)."""
    if not 4 <= p <= 14:
        raise ValueError(f"p must be in [4, 14], got {p}")
    m = 1 << p
    wbits = 60 - p
    h = base_hash64(F.col(value_col).cast("string"))
    w = F.shiftright(h, p)
    rho = F.when(w > 0, F.lit(wbits + 1) - F.length(F.bin(w))).otherwise(
        wbits + 1
    )
    return (
        df.select(
            *group_cols,
            h.bitwiseAND(F.lit(m - 1)).cast("int").alias("__reg"),
            rho.cast("int").alias("__rho"),
        )
        .groupBy(*group_cols, "__reg")
        .agg(F.max("__rho").alias("__M"))
    )


def hll_estimate(
    regs: DataFrame,
    group_cols: list[str],
    p: int,
    est_col: str = "distinct_est",
) -> DataFrame:
    """Fold a register relation (:func:`hll_registers`) into per-group
    estimates — the probe half of the sketch, shared by the one-shot
    :func:`hll_distinct` and the stored layout so their documented
    bit-parity cannot drift."""
    m = 1 << p
    # Exact scaled-integer register sum: 2^(-M) * 2^61 is an int64 for
    # every legal M (1..61); decimal(38,0) holds the per-group total.
    term = F.expr("shiftleft(CAST(1 AS BIGINT), 61 - __M)").cast(
        "decimal(38,0)"
    )
    g = regs.groupBy(*group_cols).agg(
        F.count("*").alias("__n"), F.sum(term).alias("__s")
    )
    two61 = F.lit(1 << 61).cast("decimal(38,0)")
    v = F.lit(m) - F.col("__n")  # empty registers (never-hit => M=0 => 2^0)
    total = (F.col("__s") + v.cast("decimal(38,0)") * two61).cast("double")
    e_raw = F.lit(hll_alpha(m) * m * m * 2.0**61) / total
    # in-plan linear counting (round 15): round(m·ln(m/V), 9) pins the
    # libm ln to a value a SQL oracle reproduces — no 2^p literal map,
    # so p is free to reach the production 12-14 range
    lc = F.round(
        F.lit(float(m)) * F.log(F.lit(float(m)) / v.cast("double")), 9
    )
    est = F.when((e_raw <= F.lit(2.5 * m)) & (v > 0), lc).otherwise(e_raw)
    return g.select(*group_cols, est.alias(est_col))


# -- stored HLL sketch layout ----------------------------------------------
#
# The build-offline/probe-online pattern (ANN, signature, BM25, DSIR
# layouts) applied to cardinality tracking: a pipeline that wants
# "distinct users per event_type, kept current as batches land" should
# not re-scan history per question. The persisted state is the register
# relation itself — at most m = 2^p rows PER GROUP regardless of corpus
# size — and the merge is per-register max, which is idempotent and
# commutative: append(batch) twice == once, build(a)+append(b) ==
# build(a ∪ b), BIT-identically. So unlike the BM25 sink (whose stats
# roll has a documented replay hazard), a replayed HLL append is
# harmless by algebra. DELETES are refused: sketches are not
# subtractable (a register max cannot be un-raised) — rebuild over the
# survivors, which costs one scan of them.

_HLL_META_NAME = "_hll_meta.json"
_HLL_LAYOUT_VERSION = "hll-registers-v1"


def _sketch_recover(spark, path: str, meta_name: str) -> None:
    """Finish an append's interrupted sibling swap: a sidecar-complete
    ``.__sk_tmp`` IS the merged layout (promote it); otherwise a
    lingering ``.__sk_bak`` is the pre-append original (restore it).
    No-op when ``path`` exists. Shared by the HLL and KMV layouts.

    Runs from PROBE-side meta reads too, so it can race a live
    ``_sketch_swap`` (or another recover) in the gap between the
    swap's two renames: whoever loses the ``tmp -> path`` rename
    tolerates the refusal as long as the destination landed whole
    (ADVICE r14 — both sides converge on the same merged state)."""
    from kowari_spark.fsutil import delete, exists, rename

    if exists(spark, path):
        return
    tmp, bak = f"{path}.__sk_tmp", f"{path}.__sk_bak"
    if exists(spark, f"{tmp}/{meta_name}"):
        try:
            rename(spark, tmp, path)
        except OSError:
            if exists(spark, tmp) or not exists(spark, path):
                raise  # refused for a real reason, not a lost race
        delete(spark, bak)
    elif exists(spark, bak):
        try:
            rename(spark, bak, path)
        except OSError:
            if exists(spark, bak) or not exists(spark, path):
                raise


def _sketch_swap(
    spark, path: str, merged: DataFrame, meta_name: str,
    target_files: int = 1,
) -> None:
    """Publish a merged sketch state via sibling temp dir + two
    renames: the replacement is COMPLETE (data, sidecar copy, the
    streaming sink's ``_batches`` markers) before the original moves,
    so probes racing the swap read either old or new whole state and
    a crash anywhere is finished by :func:`_sketch_recover`.

    A probe's recover can slip into the gap between the two renames
    (it sees ``path`` missing with a sidecar-complete tmp and promotes
    tmp itself); the final rename then refuses even though the merged
    state landed — tolerated below by verifying the destination holds
    the promoted tmp (ADVICE r14)."""
    from kowari_spark.fsutil import (
        create_marker,
        delete,
        list_files,
        read_bytes,
        rename,
        write_bytes,
    )

    tmp, bak = f"{path}.__sk_tmp", f"{path}.__sk_bak"
    delete(spark, tmp)
    merged.repartition(target_files).write.parquet(tmp)
    write_bytes(spark, f"{tmp}/{meta_name}",
                read_bytes(spark, f"{path}/{meta_name}"))
    for name in list_files(spark, f"{path}/_batches"):
        create_marker(spark, f"{tmp}/_batches/{name}")
    delete(spark, bak)
    rename(spark, path, bak)
    try:
        rename(spark, tmp, path)
    except OSError:
        from kowari_spark.fsutil import exists

        # a concurrent _sketch_recover promoted tmp for us mid-gap:
        # the merged state is live iff tmp is gone and path is back
        if exists(spark, tmp) or not exists(spark, path):
            raise
    delete(spark, bak)


def _hll_meta(spark, path: str) -> dict:
    import json

    from kowari_spark.fsutil import exists, read_bytes

    _sketch_recover(spark, path, _HLL_META_NAME)
    meta_path = f"{path}/{_HLL_META_NAME}"
    if not exists(spark, meta_path):
        raise ValueError(
            f"no {_HLL_META_NAME} sidecar at {path}: not an HLL sketch "
            "layout built by build_hll_layout()"
        )
    meta = json.loads(read_bytes(spark, meta_path).decode())
    if meta.get("version") != _HLL_LAYOUT_VERSION:
        raise ValueError(
            f"HLL layout at {path} was built by {meta.get('version')!r}; "
            f"this code reads {_HLL_LAYOUT_VERSION!r} — rebuild"
        )
    return meta


def build_hll_layout(
    df: DataFrame,
    path: str,
    group_cols: list[str],
    value_col: str,
    p: int = 6,
    target_files: int = 1,
) -> None:
    """Sketch the corpus ONCE into a persisted register layout with a
    versioned params sidecar. State is ≤ 2^p rows PER GROUP, so the
    write is O(groups), never O(corpus); the default single output
    file fits the telemetry-dimension group counts sketches are for —
    raise ``target_files`` for group-heavy sketches (millions of
    groups) so the state write parallelizes."""
    import json

    from kowari_spark.fsutil import write_bytes

    regs = hll_registers(df, list(group_cols), value_col, p)
    regs.repartition(target_files).write.mode("overwrite").parquet(path)
    write_bytes(
        df.sparkSession,
        f"{path}/{_HLL_META_NAME}",
        json.dumps({
            "version": _HLL_LAYOUT_VERSION,
            "group_cols": list(group_cols),
            "value_col": value_col,
            "p": p,
        }).encode(),
    )


def append_hll_layout(
    spark, path: str, new_df: DataFrame, target_files: int = 1
) -> None:
    """Merge a new batch into the stored registers under the sidecar's
    params: union + per-(group, register) max, rewritten via a sibling
    temp dir + two renames (probes racing the swap read either the old
    or the new COMPLETE state; the sidecar is never touched). Cost is
    one pass over the BATCH plus the register-scale stored state.
    build(a) + append(b) == build(a ∪ b) bit-for-bit, and a replayed
    append is a no-op (max-merge idempotence) — parity-tested."""
    meta = _hll_meta(spark, path)
    gcols = meta["group_cols"]
    batch = hll_registers(new_df, gcols, meta["value_col"], meta["p"])
    stored = spark.read.parquet(path)
    merged = (
        stored.unionByName(batch)
        .groupBy(*gcols, "__reg")
        .agg(F.max("__M").alias("__M"))
    )
    _sketch_swap(spark, path, merged, _HLL_META_NAME, target_files)


def hll_layout_estimate(
    spark, path: str, est_col: str = "distinct_est"
) -> DataFrame:
    """Per-group estimates from the STORED registers — no corpus scan,
    bit-identical to :func:`hll_distinct` over everything the layout
    has seen (the shared :func:`hll_estimate` fold; parity-tested)."""
    meta = _hll_meta(spark, path)
    return hll_estimate(
        spark.read.parquet(path), meta["group_cols"], meta["p"], est_col
    )


# -- stored KMV sketch layout ----------------------------------------------
#
# KMV's state is the k smallest value-hashes per group — mergeable by
# union + keep-k-smallest, which like the HLL max-merge is idempotent
# (re-merging the same hashes changes nothing) and commutative, so the
# same layout pattern applies. Trade vs HLL (why both exist): KMV
# state is k rows per group with EXACT counts below k (the layout can
# answer "exactly how many distinct labels" for small groups), HLL is
# m rows with ~1.04/sqrt(m) error everywhere; KMV's merge shuffles at
# most k rows per group, HLL at most m.

_KMV_META_NAME = "_kmv_meta.json"
_KMV_LAYOUT_VERSION = "kmv-minima-v1"


def _kmv_meta(spark, path: str) -> dict:
    import json

    from kowari_spark.fsutil import exists, read_bytes

    _sketch_recover(spark, path, _KMV_META_NAME)
    meta_path = f"{path}/{_KMV_META_NAME}"
    if not exists(spark, meta_path):
        raise ValueError(
            f"no {_KMV_META_NAME} sidecar at {path}: not a KMV sketch "
            "layout built by build_kmv_layout()"
        )
    meta = json.loads(read_bytes(spark, meta_path).decode())
    if meta.get("version") != _KMV_LAYOUT_VERSION:
        raise ValueError(
            f"KMV layout at {path} was built by {meta.get('version')!r}; "
            f"this code reads {_KMV_LAYOUT_VERSION!r} — rebuild"
        )
    return meta


def kmv_minima(
    df: DataFrame, group_cols: list[str], value_col: str, k: int
) -> DataFrame:
    """The per-group KMV state (group_cols..., __u double): the k
    smallest distinct value-hashes. The distinct is map-side partial,
    so the shuffle carries one row per distinct value at most — and
    the kept state is ≤ k rows per group."""
    hashed = df.select(
        *group_cols,
        (
            base_hash64(F.col(value_col).cast("string")).cast("double")
            / _HASH_SPACE
        ).alias("__u"),
    ).distinct()
    w = Window.partitionBy(*group_cols).orderBy(F.col("__u").asc())
    return (
        hashed.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") <= k)
        .drop("__rn")
    )


def kmv_estimate(
    minima: DataFrame,
    group_cols: list[str],
    k: int,
    est_col: str = "distinct_est",
) -> DataFrame:
    """Fold a minima relation into per-group estimates — exact below
    k, (k-1)/u_(k) above; shared by :func:`kmv_distinct` and the
    stored layout (bit-parity by construction)."""
    w = Window.partitionBy(*group_cols).orderBy(F.col("__u").asc())
    kept = minima.withColumn("__rn", F.row_number().over(w)).filter(
        F.col("__rn") <= k
    )
    est = F.when(
        F.max("__rn") < k, F.max("__rn").cast("double")
    ).otherwise(F.lit(float(k - 1)) / F.max("__u"))
    return kept.groupBy(*group_cols).agg(est.alias(est_col))


def build_kmv_layout(
    df: DataFrame,
    path: str,
    group_cols: list[str],
    value_col: str,
    k: int = 64,
    target_files: int = 1,
) -> None:
    """Sketch the corpus once into a persisted minima layout (≤ k rows
    per group) with a versioned params sidecar (``target_files`` as in
    :func:`build_hll_layout` — raise it for group-heavy sketches)."""
    import json

    from kowari_spark.fsutil import write_bytes

    kmv_minima(df, list(group_cols), value_col, k).repartition(
        target_files
    ).write.mode("overwrite").parquet(path)
    write_bytes(
        df.sparkSession,
        f"{path}/{_KMV_META_NAME}",
        json.dumps({
            "version": _KMV_LAYOUT_VERSION,
            "group_cols": list(group_cols),
            "value_col": value_col,
            "k": k,
        }).encode(),
    )


def append_kmv_layout(
    spark, path: str, new_df: DataFrame, target_files: int = 1
) -> None:
    """Merge a batch into the stored minima: union + keep-k-smallest
    per group, rewritten via the sketch sibling swap. build(a) +
    append(b) == build(a ∪ b) bit-for-bit; replays are no-ops by
    algebra (parity-tested). Deletes are refused by absence: minima
    are not subtractable — rebuild over survivors."""
    meta = _kmv_meta(spark, path)
    gcols, k = meta["group_cols"], meta["k"]
    batch = kmv_minima(new_df, gcols, meta["value_col"], k)
    merged = (
        spark.read.parquet(path)
        .unionByName(batch)
        .distinct()  # the same hash arriving twice is one sample
    )
    w = Window.partitionBy(*gcols).orderBy(F.col("__u").asc())
    merged = (
        merged.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") <= k)
        .drop("__rn")
    )
    _sketch_swap(spark, path, merged, _KMV_META_NAME, target_files)


def kmv_layout_estimate(
    spark, path: str, est_col: str = "distinct_est"
) -> DataFrame:
    """Per-group estimates from the stored minima — no corpus scan,
    bit-identical to :func:`kmv_distinct` over everything the layout
    has seen."""
    meta = _kmv_meta(spark, path)
    return kmv_estimate(
        spark.read.parquet(path), meta["group_cols"], meta["k"], est_col
    )
