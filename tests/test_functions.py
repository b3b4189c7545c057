"""Golden-value tests for vector scalar functions.

Mirrors the reference's exact-metric assertions
(tests/integration_tests.rs:162-181): cos(e1,e2)=0, cos(e1,e1)=1,
eucl(e1,e2)=sqrt(2); plus the zero-vector guards (src/utils.rs:9-13,
43-47) and property checks the reference lacks (SURVEY.md §5.2.7).
"""

import math

import pytest
from pyspark.sql import functions as F

from kowari_spark.functions import (
    cosine_similarity,
    dimension,
    dot,
    euclidean_distance,
    magnitude,
    manhattan_distance,
    meta_field,
    normalize,
)

E1 = [1.0, 0.0, 0.0]
E2 = [0.0, 1.0, 0.0]
ZERO = [0.0, 0.0, 0.0]


def pair_df(spark, a, b):
    return spark.createDataFrame(
        [(a, b)], "a array<float>, b array<float>"
    )


@pytest.mark.parametrize(
    "a,b,expected",
    [
        (E1, E2, 0.0),
        (E1, E1, 1.0),
        (ZERO, E1, 0.0),  # zero-norm guard: 0.0, not NaN
        ([1.0, 2.0, 3.0], [2.0, 4.0, 6.0], 1.0),  # scale invariance
    ],
)
def test_cosine_golden(spark, a, b, expected):
    got = pair_df(spark, a, b).select(cosine_similarity("a", "b").alias("s")).first()["s"]
    assert got == pytest.approx(expected, abs=1e-9)


def test_euclidean_manhattan_golden(spark):
    row = (
        pair_df(spark, E1, E2)
        .select(
            euclidean_distance("a", "b").alias("e"),
            manhattan_distance("a", "b").alias("m"),
        )
        .first()
    )
    assert row["e"] == pytest.approx(math.sqrt(2.0), abs=1e-9)
    assert row["m"] == pytest.approx(2.0, abs=1e-9)


def test_magnitude_dimension_dot(spark):
    row = (
        pair_df(spark, [3.0, 4.0, 0.0], [1.0, 2.0, 3.0])
        .select(
            magnitude("a").alias("mag"),
            dimension("a").alias("dim"),
            dot("a", "b").alias("d"),
        )
        .first()
    )
    assert row["mag"] == pytest.approx(5.0)
    assert row["dim"] == 3
    assert row["d"] == pytest.approx(11.0)


def test_normalize(spark):
    row = (
        pair_df(spark, [3.0, 4.0, 0.0], ZERO)
        .select(normalize("a").alias("na"), normalize("b").alias("nb"))
        .first()
    )
    assert row["na"] == pytest.approx([0.6, 0.8, 0.0])
    assert row["nb"] == pytest.approx([0.0, 0.0, 0.0])  # zero vec unchanged


def test_sql_twin_parity_with_column_builders(spark, embeddings):
    """String inputs route the metric builders through ONE F.expr parse
    (the construction-cost fix); Column inputs keep the legacy per-op
    py4j builder. Both paths must be VALUE-identical (bit-exact doubles,
    "%r" round-trips) on real vectors, zero vectors and a literal query
    — the plans the knn/lsh probe rows now build."""
    from kowari_spark.functions.vector import lit_vec, lit_vec_sql, similarity_expr

    base = embeddings.select(
        F.col("embedding").alias("a"),
        F.reverse(F.col("embedding")).alias("b"),
    ).limit(64)
    zero = spark.createDataFrame(
        [([0.0] * 64, [1.0] * 64)], "a array<float>, b array<float>"
    )
    df = base.unionByName(zero)
    q = [0.25 * i - 3.0 for i in range(64)]
    pairs = [
        (dot("a", "b"), dot(F.col("a"), F.col("b"))),
        (magnitude("a"), magnitude(F.col("a"))),
        (cosine_similarity("a", "b"), cosine_similarity(F.col("a"), F.col("b"))),
        (euclidean_distance("a", "b"), euclidean_distance(F.col("a"), F.col("b"))),
        (manhattan_distance("a", "b"), manhattan_distance(F.col("a"), F.col("b"))),
        (
            similarity_expr("cosine", "a", lit_vec_sql(q)),
            similarity_expr("cosine", F.col("a"), lit_vec(q)),
        ),
        (
            similarity_expr("euclidean", "a", lit_vec_sql(q)),
            similarity_expr("euclidean", F.col("a"), lit_vec(q)),
        ),
    ]
    sel = []
    for i, (fast, legacy) in enumerate(pairs):
        sel += [fast.alias(f"f{i}"), legacy.alias(f"l{i}")]
    for row in df.select(*sel).collect():
        for i in range(len(pairs)):
            assert repr(row[f"f{i}"]) == repr(row[f"l{i}"]), f"pair {i}: {row}"


def test_cosine_symmetry_property(spark, embeddings):
    """cos(a,b) == cos(b,a) on real data."""
    df = embeddings.limit(20).alias("x").crossJoin(embeddings.limit(20).alias("y"))
    bad = df.select(
        (
            F.abs(
                cosine_similarity(F.col("x.embedding"), F.col("y.embedding"))
                - cosine_similarity(F.col("y.embedding"), F.col("x.embedding"))
            )
            > 1e-12
        ).alias("bad")
    ).filter("bad")
    assert bad.count() == 0


def test_meta_field(spark):
    df = spark.createDataFrame(
        [('{"features": {"category": "A", "priority": 3}, "label": "x"}',)],
        "metadata string",
    )
    row = df.select(
        meta_field("metadata", "features.category").alias("cat"),
        meta_field("metadata", "features.priority").alias("pri"),
    ).first()
    assert row["cat"] == "A"
    assert row["pri"] == "3"


def test_generate_random_vectors_deterministic(spark):
    from kowari_spark.functions.generators import generate_random_vectors

    a = generate_random_vectors(spark, 20, 8, seed=5)
    rows = {r["id"]: r["embedding"] for r in a.collect()}
    assert len(rows) == 20 and all(len(v) == 8 for v in rows.values())
    assert all(-1.0 <= x < 1.0 for v in rows.values() for x in v)
    # same seed -> identical, independent of partitioning
    b = generate_random_vectors(spark, 20, 8, seed=5).repartition(7)
    assert {r["id"]: r["embedding"] for r in b.collect()} == rows
    # different seed -> different values
    c = generate_random_vectors(spark, 20, 8, seed=6)
    assert {r["id"]: r["embedding"] for r in c.collect()} != rows


def test_quantization_roundtrip_and_knn_recall(spark, embeddings):
    from pyspark.sql import functions as F
    from kowari_spark.functions.quant import dequantize, with_quantized
    from kowari_spark.operators import knn
    from kowari_spark.operators.topk import knn_batch
    from kowari_spark.operators.eval import mean_metric, recall_at_k

    base = embeddings.limit(300)
    q = with_quantized(base).withColumn(
        "deq", dequantize("q_codes", "q_min", "q_scale")
    )
    row = q.first()
    # max reconstruction error is one scale step per element
    err = max(abs(float(a) - float(b)) for a, b in zip(row["embedding"], row["deq"]))
    assert err <= row["q_scale"] + 1e-12
    # codes really are int8-ranged
    assert all(-128 <= c <= 127 for c in row["q_codes"])

    # search over dequantized vectors ~ search over originals
    deq = q.select("vec_id", F.col("deq").alias("embedding"))
    queries = base.filter(F.col("vec_id") < 8).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    exact = knn_batch(base, queries, 10, id_col="vec_id", round_to=6)
    approx = knn_batch(deq, queries, 10, id_col="vec_id", round_to=6)
    rec = mean_metric(recall_at_k(exact, approx, 10, id_col="vec_id"), "recall")
    assert rec >= 0.8  # int8 loses little at 64 dims
