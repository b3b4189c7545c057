"""Shared deterministic-quantizer machinery for the IVF and PQ fits.

Both indexes train k-means codebooks under the same cross-engine
reproducibility contract (seeds are exact data vectors picked by a
Gonzalez maxmin traversal, distances are the sequential (x-y)^2 left
fold, Lloyd means land on a decimal grid), and both SQL oracles replay
that arithmetic CTE-for-CTE — so the arithmetic lives ONCE here and a
change to it breaks both oracles loudly instead of silently diverging
one engine (the py_hash64/_bm25_core extraction discipline).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def cents_lit(cents) -> Column:
    """Literal array<array<double>> of centroids, parsed from ONE SQL
    string (a nested F.lit costs one Py4J round-trip per element —
    ~0.7 s per call at 16x64). The D suffix keeps every element an
    exact DOUBLE literal (repr() is the shortest round-trip decimal)."""
    return F.expr(
        "array(" + ",".join(
            "array(" + ",".join(f"{float(x)!r}D" for x in c) + ")"
            for c in cents
        ) + ")"
    )


def d2_fold(vec: Column, c) -> Column:
    """Squared L2 as the identical per-element (x-y)^2 SEQUENTIAL fold
    both engines run — the parity contract of every fit built on it."""
    return F.aggregate(
        F.zip_with(
            vec, c,
            lambda x, y: (x.cast("double") - y) * (x.cast("double") - y),
        ),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def gonzalez_maxmin(pts, k: int) -> list[list[float]]:
    """Deterministic farthest-first traversal (Gonzalez 1985 maxmin —
    the greedy analog of k-means++ D^2 sampling) over ``pts`` =
    [(id, vector), ...] arriving in md5 seeding order: seed 0 is
    pts[0]; seed i+1 maximizes the min squared distance to the chosen
    set, ties -> lowest id. Every selected seed is an EXACT data vector
    (no arithmetic on it) and min-of-distances is order-independent, so
    an external engine re-running the traversal lands on identical
    seeds — the SQL replays (IVF's and PQ's fit CTEs) depend on this
    loop staying byte-for-byte equivalent to their unrolled chains."""

    def d2(a: list, b: list) -> float:
        acc = 0.0
        for x, y in zip(a, b):
            acc += (x - y) * (x - y)
        return acc

    seeds = [pts[0][1]]
    mind = {rid: d2(v, seeds[0]) for rid, v in pts}
    for _ in range(k - 1):
        best_id, best_vec = min(pts, key=lambda p: (-mind[p[0]], p[0]))
        seeds.append(best_vec)
        for rid, v in pts:
            dd = d2(v, best_vec)
            if dd < mind[rid]:
                mind[rid] = dd
    return seeds
