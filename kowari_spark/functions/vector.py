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
    if isinstance(col, str):
        # SQL snippets (array literals from lit_vec_sql, nested calls)
        # parse; plain names resolve as columns
        return F.expr(col) if "(" in col else F.col(col)
    return col


def _sql_name(col: str) -> str:
    """Column NAME -> SQL identifier. Plain identifiers (``embedding``,
    ``__qvec``) are backquoted; dotted names stay qualified exactly as
    ``F.col`` treats them; strings already shaped as SQL snippets (from
    the *_sql builders below) pass through verbatim."""
    if col.startswith("`") or "(" in col or "." in col:
        return col
    return f"`{col}`"


# -- SQL-string twins ------------------------------------------------------
# Each *_sql builder emits the SQL whose parsed tree constant-folds to the
# IDENTICAL expression the Column builders below produce (same zip_with/
# aggregate fold order, same casts, same guards — value parity pinned by
# tests/test_functions.py). Rationale: the Column builders cost ~10 py4j
# roundtrips per higher-order function (lambda registration), ~3-7 ms
# each on the measured driver; probe-shaped query lines are CONSTRUCTION
# bound once their plans are lean, and one F.expr parse replaces dozens
# of roundtrips (guide §7.3 — driver-side single-threaded work).


def dot_sql(a_sql: str, b_sql: str) -> str:
    return (
        f"aggregate(zip_with({a_sql}, {b_sql}, "
        "(x, y) -> CAST(x AS DOUBLE) * CAST(y AS DOUBLE)), "
        "0.0D, (acc, x) -> acc + x)"
    )


def magnitude_sql(v_sql: str) -> str:
    return f"sqrt({dot_sql(v_sql, v_sql)})"


def cosine_sql(a_sql: str, b_sql: str) -> str:
    na, nb = magnitude_sql(a_sql), magnitude_sql(b_sql)
    return (
        f"CASE WHEN ({na} = 0.0D) OR ({nb} = 0.0D) THEN 0.0D "
        f"ELSE {dot_sql(a_sql, b_sql)} / ({na} * {nb}) END"
    )


def euclidean_sql(a_sql: str, b_sql: str) -> str:
    return (
        f"sqrt(aggregate(zip_with({a_sql}, {b_sql}, "
        "(x, y) -> (CAST(x AS DOUBLE) - CAST(y AS DOUBLE)) "
        "* (CAST(x AS DOUBLE) - CAST(y AS DOUBLE))), "
        "0.0D, (acc, x) -> acc + x))"
    )


def manhattan_sql(a_sql: str, b_sql: str) -> str:
    return (
        f"aggregate(zip_with({a_sql}, {b_sql}, "
        "(x, y) -> abs(CAST(x AS DOUBLE) - CAST(y AS DOUBLE))), "
        "0.0D, (acc, x) -> acc + x)"
    )


def lit_vec_sql(values) -> str:
    """array<double> literal as SQL — bit-exact doubles (repr round-trips
    IEEE 754; the D suffix keeps exponent forms double-typed)."""
    return "array(" + ",".join(repr(float(v)) + "D" for v in values) + ")"


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
    if isinstance(a, str) and isinstance(b, str):
        return F.expr(dot_sql(_sql_name(a), _sql_name(b)))
    return F.aggregate(
        F.zip_with(_c(a), _c(b), lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def magnitude(v: ColumnOrName) -> Column:
    """L2 norm (reference: vector.rs:41-43)."""
    if isinstance(v, str):
        return F.expr(magnitude_sql(_sql_name(v)))
    return F.sqrt(dot(v, v))


def dimension(v: ColumnOrName) -> Column:
    """Number of elements (reference: vector.rs:37-39)."""
    return F.size(_c(v))


def cosine_similarity(a: ColumnOrName, b: ColumnOrName) -> Column:
    """dot(a,b) / (|a| |b|), 0.0 (not NaN) when either norm is zero.

    Zero-norm guard per reference utils.rs:9-13.
    """
    if isinstance(a, str) and isinstance(b, str):
        return F.expr(cosine_sql(_sql_name(a), _sql_name(b)))
    na, nb = magnitude(a), magnitude(b)
    return F.when((na == F.lit(0.0)) | (nb == F.lit(0.0)), F.lit(0.0)).otherwise(
        dot(a, b) / (na * nb)
    )


def euclidean_distance(a: ColumnOrName, b: ColumnOrName) -> Column:
    """L2 distance (reference: utils.rs:16-19)."""
    if isinstance(a, str) and isinstance(b, str):
        return F.expr(euclidean_sql(_sql_name(a), _sql_name(b)))
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
    if isinstance(a, str) and isinstance(b, str):
        return F.expr(manhattan_sql(_sql_name(a), _sql_name(b)))
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


_BUILTIN_METRICS = frozenset(_METRICS)


def similarity_expr(metric: str, a: ColumnOrName, b: ColumnOrName) -> Column:
    """Similarity score for a metric name — higher is always better.

    This is the engine's distance-metric registry (the reference's
    extension point is the ``Index`` trait + ``use_cosine`` flag,
    src/index.rs:25-48; ours is an open metric->expression map).

    Built-in metrics accept column names / SQL snippets (the one-parse
    construction path); custom registered metrics are handed Columns, the
    contract they were written against.
    """
    try:
        fn = _METRICS[metric]
    except KeyError:
        raise ValueError(f"unknown metric {metric!r}; one of {sorted(_METRICS)}") from None
    if metric not in _BUILTIN_METRICS:
        a, b = _c(a), _c(b)
    return fn(a, b)


def register_metric(name: str, fn) -> None:
    """Register a custom similarity metric (higher = more similar)."""
    _METRICS[name] = fn
