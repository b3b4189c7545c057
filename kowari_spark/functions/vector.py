"""Vector scalar functions as *native* Column expressions.

These are the engine's hot path: pure higher-order-function expressions
(``zip_with`` / ``aggregate`` / ``transform``) that stay inside Tungsten
whole-stage codegen — no Python round-trip, no UDF. Semantics parity with
the reference scalar functions (SURVEY.md §2.4):

- cosine_similarity  (reference: vector_db/src/utils.rs:4-14 — returns 0.0
  when either norm is zero, never NaN)
- euclidean_distance (utils.rs:16-19)
- manhattan_distance (utils.rs:21-24)
- normalize          (utils.rs:41-48 — zero vector maps to itself)
- magnitude          (vector_db/src/vector.rs:41-43)
- dimension          (vector.rs:37-39)
- negated-euclidean similarity score (src/index.rs:38)

All math is performed in float64 regardless of the stored element type
(the canonical store is array<float>); casting is explicit so plans are
deterministic and bit-comparable with the DuckDB oracle.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

ColumnOrName = Column | str


def _c(col: ColumnOrName) -> Column:
    return F.col(col) if isinstance(col, str) else col


def lit_vec(values) -> Column:
    """array<double> literal in ONE py4j call.

    ``F.lit(list)`` expands to ``array(lit(x) for x)`` — 65 py4j
    roundtrips for a 64-dim vector, ~3 ms each on the measured driver
    (a quarter of some probe constructions was literal building alone).
    A float64 ndarray takes py4j's NumpyArrayConverter path: one call,
    binary-exact doubles, the same array<double> Literal after constant
    folding."""
    import numpy as np

    return F.lit(np.asarray(list(values), dtype=np.float64))


def dot(a: ColumnOrName, b: ColumnOrName) -> Column:
    """Dot product of two array columns, accumulated in float64."""
    return F.aggregate(
        F.zip_with(_c(a), _c(b), lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def magnitude(v: ColumnOrName) -> Column:
    """L2 norm (reference: vector.rs:41-43)."""
    return F.sqrt(dot(v, v))


def dimension(v: ColumnOrName) -> Column:
    """Number of elements (reference: vector.rs:37-39)."""
    return F.size(_c(v))


def cosine_similarity(a: ColumnOrName, b: ColumnOrName) -> Column:
    """dot(a,b) / (|a| |b|), 0.0 (not NaN) when either norm is zero.

    Zero-norm guard per reference utils.rs:9-13.
    """
    na, nb = magnitude(a), magnitude(b)
    return F.when((na == F.lit(0.0)) | (nb == F.lit(0.0)), F.lit(0.0)).otherwise(
        dot(a, b) / (na * nb)
    )


def euclidean_distance(a: ColumnOrName, b: ColumnOrName) -> Column:
    """L2 distance (reference: utils.rs:16-19)."""
    return F.sqrt(
        F.aggregate(
            F.zip_with(
                _c(a),
                _c(b),
                lambda x, y: (x.cast("double") - y.cast("double"))
                * (x.cast("double") - y.cast("double")),
            ),
            F.lit(0.0),
            lambda acc, x: acc + x,
        )
    )


def manhattan_distance(a: ColumnOrName, b: ColumnOrName) -> Column:
    """L1 distance (reference: utils.rs:21-24)."""
    return F.aggregate(
        F.zip_with(_c(a), _c(b), lambda x, y: F.abs(x.cast("double") - y.cast("double"))),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def neg_euclidean_score(a: ColumnOrName, b: ColumnOrName) -> Column:
    """Negated euclidean distance used as a descending-sort similarity
    (reference: src/index.rs:38)."""
    return -euclidean_distance(a, b)


def normalize(v: ColumnOrName) -> Column:
    """v / |v|; zero vector returned unchanged (reference: utils.rs:41-48).

    Output is array<double> (math is float64 in this engine).
    """
    v = _c(v)
    mag = magnitude(v)
    as_double = F.transform(v, lambda x: x.cast("double"))
    return F.when(mag == F.lit(0.0), as_double).otherwise(
        F.transform(v, lambda x: x.cast("double") / mag)
    )


_METRICS = {
    "cosine": cosine_similarity,
    "euclidean": neg_euclidean_score,
    "manhattan": lambda a, b: -manhattan_distance(a, b),
    "dot": dot,
}


def similarity_expr(metric: str, a: ColumnOrName, b: ColumnOrName) -> Column:
    """Similarity score for a metric name — higher is always better.

    This is the engine's distance-metric registry (the reference's
    extension point is the ``Index`` trait + ``use_cosine`` flag,
    src/index.rs:25-48; ours is an open metric->expression map).
    """
    try:
        fn = _METRICS[metric]
    except KeyError:
        raise ValueError(f"unknown metric {metric!r}; one of {sorted(_METRICS)}") from None
    return fn(a, b)


def register_metric(name: str, fn) -> None:
    """Register a custom similarity metric (higher = more similar)."""
    _METRICS[name] = fn
