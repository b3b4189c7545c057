"""HNSW-style layered graph index — offline Spark build, batch query.

Semantics parity (SURVEY.md §2.3 Q5/Q6): the reference builds a simplified
HNSW — geometric random levels (p=0.5, src/index.rs:218-225), each new
node connected to prior nodes at shared levels and pruned to the M
closest by cosine distance (:231-282); queries greedily descend levels
then run an ef-bounded BFS at level 0 (:284-355).

The reference build is inherently sequential (every insert mutates the
global graph). A faithful distributed re-implementation is a research
problem (SURVEY.md §7.2), so this engine builds the *batch equivalent*:
per level L, the layer is {nodes with level >= L} and its edges are each
node's M nearest neighbors within the layer — a distributed exact k-NN
graph (same O(n²·d) work the reference spends, but spread across
executors via the partition-heap knn_batch). Quality is validated by
recall against brute force, not graph isomorphism.

Levels are assigned DETERMINISTICALLY (geometric via a seeded hash, same
distribution as the reference's coin flips) so builds are reproducible —
the reference uses unseeded thread_rng (SURVEY.md §7.2).

Online single-query serving sits outside Spark's lane (BASELINE.json
spark_approach); the batch query here evaluates query *sets* through the
graph with frontier-expansion joins (broadcast frontier × graph table),
each hop bounded by ef.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from kowari_spark.operators.topk import knn_batch, _score, _rounded


def assign_levels(
    df: DataFrame, id_col: str = "id", seed: int = 42, max_level: int = 16
) -> DataFrame:
    """Geometric(p=0.5) level per node, deterministic in (id, seed).

    u = uniform hash of id in (0,1]; level = floor(-log2(u)) capped.
    Matches the reference's coin-flip distribution (src/index.rs:218-225).
    """
    u = (
        F.conv(F.substring(F.md5(F.concat(F.col(id_col).cast("string"), F.lit(f"#{seed}"))), 1, 13), 16, 10)
        .cast("double")
        / F.lit(float(16**13))
    )
    # guard u=0; floor(-log2(u)) is the geometric level
    lvl = F.floor(-F.log2(F.greatest(u, F.lit(1e-15))))
    return df.withColumn("node_level", F.least(lvl, F.lit(max_level)).cast("int"))


class HNSW:
    """Offline-built layered neighbor graph (reference defaults M=16,
    ef=32, src/index.rs:364-368)."""

    def __init__(self, m: int = 16, ef: int = 32, seed: int = 42,
                 max_level: int = 16):
        self.m = m
        self.ef = ef
        self.seed = seed
        # levels are capped (the reference caps too, src/index.rs:218-225);
        # a lower cap trades descent granularity for fewer build rounds —
        # each level is one distributed knn-graph pass
        self.max_level = max_level

    # -- build -------------------------------------------------------------

    def build(
        self,
        df: DataFrame,
        id_col: str = "id",
        vec_col: str = "embedding",
        metric: str = "cosine",
    ) -> DataFrame:
        """Edges (src, dst, level): per level, each layer member's M
        nearest neighbors within the layer. Returns the edge DataFrame
        (persist with .write.partitionBy('level').parquet(...) for the
        pruned-probe layout)."""
        leveled = assign_levels(df.select(id_col, vec_col), id_col, self.seed,
                                self.max_level)
        top = leveled.agg(F.max("node_level")).first()[0] or 0
        edges = None
        for level in range(int(top) + 1):
            layer = leveled.filter(F.col("node_level") >= level)
            qs = layer.select(F.col(id_col).alias("query_id"), F.col(vec_col))
            nn = knn_batch(
                layer, qs, self.m + 1, metric=metric, id_col=id_col, vec_col=vec_col
            )
            lvl_edges = (
                nn.filter(F.col("query_id") != F.col(id_col))
                .select(
                    F.col("query_id").alias("src"),
                    F.col(id_col).alias("dst"),
                    F.lit(level).alias("level"),
                )
            )
            edges = lvl_edges if edges is None else edges.unionByName(lvl_edges)
        # materialize + truncate lineage: the union of per-level knn plans
        # is a huge tree that would otherwise be replayed (and re-planned)
        # by every downstream join
        return edges.localCheckpoint()

    # -- query -------------------------------------------------------------

    def entry_point(self, leveled: DataFrame, id_col: str = "id"):
        row = (
            leveled.orderBy(F.desc("node_level"), F.asc(id_col)).limit(1).collect()[0]
        )
        return row[id_col], row["node_level"]

    def query_batch(
        self,
        base: DataFrame,
        edges: DataFrame,
        queries: DataFrame,
        k: int,
        metric: str = "cosine",
        id_col: str = "id",
        vec_col: str = "embedding",
        query_id_col: str = "query_id",
        query_vec_col: str = "embedding",
        hops: int = 3,
        round_to: int | None = None,
    ) -> DataFrame:
        """Batch graph search: greedy one-hop descent through upper
        levels, then ``hops`` rounds of ef-bounded frontier expansion at
        level 0, then exact ranking of everything visited (reference
        lifecycle: src/index.rs:314-355 → final ranking :345-353).
        """
        spark = base.sparkSession
        leveled = assign_levels(base.select(id_col, vec_col), id_col, self.seed,
                                self.max_level)
        ep_id, top_level = self.entry_point(leveled, id_col)

        q = queries.select(
            F.col(query_id_col).alias("query_id"),
            F.col(query_vec_col).alias("__qvec"),
        )

        def with_scores(nodes: DataFrame) -> DataFrame:
            """attach similarity(query, node)."""
            return (
                nodes.join(base.select(F.col(id_col), F.col(vec_col)), id_col)
                .join(F.broadcast(q), "query_id")
                .select(
                    "query_id",
                    F.col(id_col),
                    _rounded(
                        _score(metric, F.col(vec_col), F.col("__qvec")), round_to
                    ).alias("score"),
                )
            )

        # start every query at the global entry point
        frontier = q.select("query_id").withColumn(id_col, F.lit(ep_id))
        best = with_scores(frontier).localCheckpoint()

        # greedy descent: one expansion per upper level, keep best-1
        for level in range(int(top_level), 0, -1):
            nbrs = (
                F.broadcast(best.select("query_id", id_col))
                .join(
                    edges.filter(F.col("level") == level),
                    F.col(id_col) == F.col("src"),
                )
                .select("query_id", F.col("dst").alias(id_col))
            )
            scored = with_scores(nbrs).unionByName(best)
            w = Window.partitionBy("query_id").orderBy(F.desc("score"), F.asc(id_col))
            best = (
                scored.withColumn("rn", F.row_number().over(w))
                .filter(F.col("rn") == 1)
                .drop("rn")
                .localCheckpoint()
            )

        # level-0 BFS: expand ef-bounded frontier `hops` times
        visited = best
        frontier = best.select("query_id", id_col)
        lvl0 = edges.filter(F.col("level") == 0)
        for _ in range(hops):
            nbrs = (
                F.broadcast(frontier)
                .join(lvl0, F.col(id_col) == F.col("src"))
                .select("query_id", F.col("dst").alias(id_col))
                .distinct()
            )
            scored = with_scores(nbrs)
            merged = (
                visited.unionByName(scored)
                .groupBy("query_id", id_col)
                .agg(F.max("score").alias("score"))
            )
            w = Window.partitionBy("query_id").orderBy(F.desc("score"), F.asc(id_col))
            nxt = (
                merged.withColumn("rn", F.row_number().over(w))
                .filter(F.col("rn") <= self.ef)
                .localCheckpoint()
            )
            frontier = nxt.select("query_id", id_col)
            visited = nxt.drop("rn")

        # final exact ranking of the visited set
        w = Window.partitionBy("query_id").orderBy(F.desc("score"), F.asc(id_col))
        return (
            visited.withColumn("rank", F.row_number().over(w))
            .filter(F.col("rank") <= k)
        )
