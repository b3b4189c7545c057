"""Cross-polytope LSH for cosine ANN — the measured recall/cost winner.

Round-3 ask: recall@10 >= 0.85 at candidate fraction <= 0.25 on the
synthetic embeddings. A full sweep of the sign-LSH design space
(num_planes x num_tables x multi-probe, BASELINE.md round-4 section)
tops out at ~0.77 recall within the 0.25 budget on this data —
near-isotropic vectors (10th-neighbor cosine ~0.32) sit close to the
hyperplane family's theoretical frontier (collision ratio
(1-θn/π)/(1-θr/π) per plane). Cross-polytope hashing (Andoni, Indyk,
Laarhoven, Razenshteyn, Schmidt, "Practical and Optimal LSH for Angular
Distance", NeurIPS 2015) has a strictly better exponent: hash = the
nearest signed basis vector of a pseudo-randomly rotated copy of the
vector, i.e. ``argmax over [Rv; -Rv]`` — 2d buckets per table. Measured
on the same data: T=40 tables at 1 probe -> recall 0.869 @ cand 0.245
(sign-LSH needs ~2.2x the candidates for the same recall).

Spark-first shape:
- hashing is ONE GEMM per Arrow batch inside a vectorized pandas_udf
  ((batch x d) @ (d x T·d), BLAS): the native-expression alternative is
  T·d dot-product expressions (2560 for d=64, T=40) — far past what
  whole-stage codegen handles gracefully; this is the documented
  "built-ins genuinely can't express it" boundary. The rotation stack
  ships to executors as a float32 **broadcast variable** (one torrent
  transfer per executor, cached), never a per-task closure constant —
  at d=1024, T=40 the stack is ~160 MB in float32; riding it in every
  serialized task would dominate scheduling at scale. The GEMM itself
  runs in float32 (2x the BLAS throughput, half the transfer); bucket
  choice is an argmax over well-separated rotated coordinates, so the
  reduced mantissa does not move the measured recall.
- everything downstream is the same JVM machinery as SignLSH: explode
  (table, bucket), broadcast equi-join on the probed buckets, distinct
  candidates, exact native-expression scoring, per-query window top-k,
  brute-force fallback for starved queries (reference semantics,
  src/index.rs:158-173 generalized).
- ``build`` persists partitionBy(__tbl, bucket) — a probe at 100 TB
  reads T partitions per query (storage x T, the standard multi-table
  trade; probes>1 widens the read, never the storage).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import ArrayType, IntegerType

#: literal-pruning cap for a prebuilt-layout probe: above this many
#: (table, bucket) pairs (Q·T·probes) the compiled IN-predicate would
#: dominate planning — the batch keeps the broadcast-join-only shape
_PROBE_PAIRS_MAX = 32768


class CrossPolytopeLSH:
    """Multi-table cross-polytope LSH (2·dim buckets per table).

    Bucket encoding: coordinate index into ``[Rv; -Rv]`` — ``j`` when
    the j-th rotated coordinate is the (positive) max, ``dim + j`` when
    its negation is. ``num_tables=40`` is the swept default hitting
    recall 0.869 @ candidate fraction 0.245 on the benchmark embeddings
    (BASELINE.md round-4 curve)."""

    def __init__(self, dim: int, num_tables: int = 40, seed: int = 100):
        self.dim = dim
        self.num_tables = num_tables
        self.seed = seed
        rots = []
        for t in range(num_tables):
            rng = np.random.RandomState(seed + t)
            q, _ = np.linalg.qr(rng.normal(size=(dim, dim)))
            rots.append(q)
        # (T*d, d) stacked projection: one GEMM hashes every table.
        # float32: half the broadcast bytes, 2x the GEMM throughput;
        # bucket argmaxes are ulp-insensitive on orthonormal rotations
        self._proj = np.concatenate(rots, axis=0).astype(np.float32)
        self._bc = None  # lazy per-SparkContext broadcast of _proj
        self._bc_ctx = None

    def _proj_bc(self, spark: SparkSession):
        """Broadcast the rotation stack once per SparkContext (torrent
        transfer + executor-side cache) instead of serializing T·d²
        floats into every task closure. Re-broadcasts if the index
        object outlives the session that first used it — a cached
        handle from a stopped context would fail at execution."""
        sc = spark.sparkContext
        if self._bc is None or self._bc_ctx is not sc:
            self._bc = sc.broadcast(self._proj)
            self._bc_ctx = sc
        return self._bc

    # -- hashing -----------------------------------------------------------

    @staticmethod
    def _hash_mat(mat: np.ndarray, proj: np.ndarray, num_tables: int,
                  dim: int) -> np.ndarray:
        """(n, d) vectors -> (n, T) int32 bucket ids (argmax encoding
        without materializing the 2d concat: abs-argmax + sign)."""
        y = (mat @ proj.T).reshape(len(mat), num_tables, dim)
        j = np.abs(y).argmax(axis=2)
        vals = np.take_along_axis(y, j[:, :, None], axis=2)[:, :, 0]
        return (j + dim * (vals < 0)).astype(np.int32)

    @staticmethod
    def _probe_mat(mat: np.ndarray, proj: np.ndarray, num_tables: int,
                   dim: int, probes: int) -> list:
        """(n, d) query vectors -> per-row list of T lists of up to
        ``probes`` bucket ids, best-first (largest coordinate of
        [Rv; -Rv] first — the axes the vector is closest to)."""
        y = (mat @ proj.T).reshape(len(mat), num_tables, dim)
        both = np.concatenate([y, -y], axis=2)  # (n, T, 2d)
        top = np.argsort(-both, axis=2)[:, :, :probes].astype(np.int32)
        return [[list(tbl) for tbl in row] for row in top]

    def _hash_rows(self, mat: np.ndarray) -> np.ndarray:
        return self._hash_mat(mat.astype(np.float32), self._proj,
                              self.num_tables, self.dim)

    def _probe_rows(self, mat: np.ndarray, probes: int) -> list:
        return self._probe_mat(mat.astype(np.float32), self._proj,
                               self.num_tables, self.dim, probes)

    def buckets_udf(self, spark: SparkSession | None = None) -> Column:
        """pandas_udf column factory: vec array -> array<int> of the
        per-table bucket ids (one GEMM per Arrow batch). The projection
        rides as a broadcast variable when a session is available (it
        always is from the public entry points)."""
        bc = self._proj_bc(spark) if spark is not None else None
        proj_local = self._proj if bc is None else None
        num_tables = self.num_tables
        dim = self.dim
        hash_mat = self._hash_mat

        @F.pandas_udf(ArrayType(IntegerType()))
        def _buckets(vecs: pd.Series) -> pd.Series:
            proj = bc.value if bc is not None else proj_local
            mat = np.array(vecs.tolist(), dtype=np.float32)
            if mat.size == 0:
                return pd.Series([], dtype=object)
            return pd.Series(list(hash_mat(mat, proj, num_tables, dim)))

        return _buckets

    def probes_udf(self, probes: int, spark: SparkSession | None = None) -> Column:
        """pandas_udf factory: vec array -> array<array<int>> — per
        table, the ``probes``-long probe sequence."""
        bc = self._proj_bc(spark) if spark is not None else None
        proj_local = self._proj if bc is None else None
        num_tables = self.num_tables
        dim = self.dim
        probe_mat = self._probe_mat

        @F.pandas_udf(ArrayType(ArrayType(IntegerType())))
        def _probes(vecs: pd.Series) -> pd.Series:
            proj = bc.value if bc is not None else proj_local
            mat = np.array(vecs.tolist(), dtype=np.float32)
            if mat.size == 0:
                return pd.Series([], dtype=object)
            return pd.Series(probe_mat(mat, proj, num_tables, dim, probes))

        return _probes

    def with_buckets(self, df: DataFrame, vec_col: str = "embedding") -> DataFrame:
        """Exploded (one row per table) bucketed relation. The GEMM
        hash is the heavy map work here — spread a few-split scan
        across the cluster first (guide §2.5; no-op at scale, where
        the scan already has more splits than cores)."""
        from kowari_spark.fsutil import scan_parallelism

        return scan_parallelism(df).select(
            "*",
            F.posexplode(self.buckets_udf(df.sparkSession)(F.col(vec_col))).alias(
                "__tbl", "bucket"
            ),
        )

    # -- build (offline layout) -------------------------------------------

    #: bucket ids depend on the projection dtype (argmax near ties can
    #: flip between float32/float64) — persisted layouts record it so a
    #: probe with mismatched hashing fails loudly instead of silently
    #: losing recall (ADVICE r5)
    _HASH_VERSION = "cplsh-f32-v1"
    _META_NAME = "_cplsh_meta.json"

    def _params(self) -> dict:
        return {
            "version": self._HASH_VERSION,
            "dim": self.dim,
            "num_tables": self.num_tables,
            "seed": self.seed,
        }

    def _write_meta(self, spark: SparkSession, path: str,
                    vec_col: str = "embedding", id_col: str = "id",
                    layout: str = "dirs") -> None:
        """Stamp the params sidecar (hash version + dim/tables/seed,
        plus family/vec_col/id_col provenance for param-free opens via
        ``dedup_index.open_lsh_layout``, plus the physical ``layout``
        format) — shared by ``build`` and the streaming sink's
        first-batch commit (the sink always stamps ``dirs``)."""
        import json

        from kowari_spark.fsutil import write_bytes

        write_bytes(
            spark, f"{path}/{self._META_NAME}",
            json.dumps(dict(
                self._params(), family="crosspolytope",
                vec_col=vec_col, id_col=id_col, layout=layout,
            )).encode(),
        )

    def layout_format(self, spark: SparkSession, path: str) -> str:
        """Physical format of a stored layout: ``"sorted"`` (bucket-
        sorted plain parquet, round 16) or ``"dirs"`` (the historical
        partitionBy(__tbl, bucket) tree; also any layout whose sidecar
        predates the field)."""
        import json

        from kowari_spark.fsutil import exists, read_bytes

        meta_path = f"{path}/{self._META_NAME}"
        if not exists(spark, meta_path):
            return "dirs"
        saved = json.loads(read_bytes(spark, meta_path).decode())
        return saved.get("layout", "dirs")

    def _check_meta(self, spark: SparkSession, path: str) -> None:
        """Verify an existing params sidecar against THIS instance's
        hashing (subset compare: provenance extras — family, column
        names — don't participate in the hashing contract). No sidecar
        → no-op (legacy layouts load unchecked; rebuild to gain the
        check)."""
        import json

        from kowari_spark.fsutil import exists, read_bytes

        meta_path = f"{path}/{self._META_NAME}"
        if not exists(spark, meta_path):
            return
        saved = json.loads(read_bytes(spark, meta_path).decode())
        want = self._params()
        if {k: saved.get(k) for k in want} != want:
            raise ValueError(
                f"CP-LSH layout at {path} was built with {saved}, but "
                f"this index hashes with {want}; rebuild the layout "
                "or construct a matching CrossPolytopeLSH"
            )

    def build(self, df: DataFrame, path: str, vec_col: str = "embedding",
              max_records_per_file: int | None = None,
              id_col: str = "id", layout: str = "sorted") -> None:
        """Persist the exploded (table, bucket) layout plus a params
        sidecar that ``load`` checks — probing a layout hashed by an
        incompatible build must error, not lose recall silently.

        ``layout="sorted"`` (round-16 default, VERDICT r15 ask #5):
        plain parquet hash-repartitioned by (__tbl, bucket) and SORTED
        within each task by (__tbl, bucket) — every (table, bucket)
        group lands whole and contiguous inside one file, so parquet
        row-group min/max stats carry the probe's literal
        ``(__tbl, bucket)`` predicate (``query_batch`` compiles one per
        batch). Rationale: the historical partitionBy tree creates
        2·dim·T directories+files (5120 at d=64, T=40 — the measured
        build wall was per-file creation, guide §6 "small files hurt
        twice"); the sorted form writes ``write_parallelism`` files
        total and prunes by row-group stats instead of directory
        listing. Same rows, same schema, same probe results (pinned by
        tests/test_cplsh.py sorted/dirs parity).

        ``layout="dirs"`` keeps the partitionBy(__tbl, bucket) tree —
        required for streaming micro-batch appends and partition-pruned
        MOR deletes (``delete_from_layout``), which work on directory
        geometry.

        ``max_records_per_file`` rolls big files/dirs into several
        scan-parallel pieces (either format)."""
        from kowari_spark.operators.lsh import _refuse_empty_build

        from kowari_spark.fsutil import write_parallelism

        if layout not in ("sorted", "dirs"):
            raise ValueError(f"layout must be sorted|dirs, got {layout!r}")
        _refuse_empty_build(df, "CrossPolytopeLSH.build")
        bucketed = self.with_buckets(df, vec_col).repartition(
            write_parallelism(df), F.col("__tbl"), F.col("bucket")
        )
        if layout == "sorted":
            bucketed = bucketed.sortWithinPartitions("__tbl", "bucket")
        w = bucketed.write.mode("overwrite")
        if max_records_per_file is not None:
            w = w.option("maxRecordsPerFile", str(max_records_per_file))
        if layout == "dirs":
            w = w.partitionBy("__tbl", "bucket")
        w.parquet(path)
        self._write_meta(df.sparkSession, path, vec_col, id_col, layout)

    def load(self, spark: SparkSession, path: str) -> DataFrame:
        """Open a built layout, verifying the params sidecar against
        THIS instance's hashing when present (``_check_meta``)."""
        self._check_meta(spark, path)
        return spark.read.parquet(path)

    # -- query -------------------------------------------------------------

    def query_batch(
        self,
        df: DataFrame,
        queries: DataFrame,
        k: int,
        metric: str = "cosine",
        id_col: str = "id",
        vec_col: str = "embedding",
        query_id_col: str = "query_id",
        query_vec_col: str = "embedding",
        round_to: int | None = None,
        probes: int = 1,
    ) -> DataFrame:
        """Batch OR-probe across tables (and probe sequences within each
        table when ``probes > 1``): candidates deduplicate across
        tables, score exactly with native expressions, per-query top-k;
        queries with < k distinct candidates fall back to the exact scan
        (the reference's fallback semantic).

        On a raw (non-prebuilt) input the whole search is ONE
        declarative plan — no driver action fires inside this call
        (tested). On a PREBUILT layout the batch's probed
        (table, bucket) pairs are collected once (bounded by
        Q·T·probes — query-side scale, the SignLSH round-15
        discipline) and compiled into a literal pushdown predicate, so
        the layout scan prunes at the source: partition pruning on the
        dirs format, row-group stats pruning on the sorted format. The
        fallback is built unconditionally from the left-anti starved
        lineage; when no query is starved its broadcast side
        materializes empty at runtime and AQE's empty-relation
        propagation collapses the subtree before the exact scan
        runs."""
        from pyspark.sql.window import Window

        from kowari_spark.operators.topk import (
            _rounded,
            _score,
            brute_force_fallback,
        )

        spark = df.sparkSession
        prebuilt = "__tbl" in df.columns
        # raw input: the corpus GEMM hash pass is the heavy map work —
        # project to the two needed columns, then spread a few-split
        # scan across the cluster (guide §2.3/§2.5; no-op at scale)
        from kowari_spark.fsutil import scan_parallelism

        bucketed = (
            df.select(F.col(id_col), "__tbl", "bucket")
            if prebuilt
            else scan_parallelism(df.select(F.col(id_col), F.col(vec_col))).select(
                F.col(id_col),
                F.posexplode(self.buckets_udf(spark)(F.col(vec_col))).alias(
                    "__tbl", "bucket"
                ),
            )
        )
        # every id appears exactly once PER TABLE in a built layout, so
        # table 0 alone is a duplicate-free (id, vector) set read from
        # 1/T of the layout's partitions (partition-pruned scan) — the
        # previous dropDuplicates over the full exploded relation
        # shuffled all T copies of every vector (whole-probe wall at
        # the 2M-vector scale bench: 96s -> 30s)
        base_vecs = (
            df.filter(F.col("__tbl") == 0).select(id_col, vec_col)
            if prebuilt
            else df.select(id_col, vec_col)
        )
        q = queries.select(
            F.col(query_id_col).alias("query_id"),
            F.col(query_vec_col).alias("__qvec"),
        )
        if probes <= 1:
            qb = q.select(
                "query_id",
                F.posexplode(self.buckets_udf(spark)(F.col("__qvec"))).alias(
                    "__tbl", "bucket"
                ),
            )
        else:
            qb = (
                q.select(
                    "query_id",
                    F.posexplode(self.probes_udf(probes, spark)(F.col("__qvec"))).alias(
                        "__tbl", "__pb"
                    ),
                )
                .select("query_id", "__tbl", F.explode("__pb").alias("bucket"))
            )
        if prebuilt:
            # static literal pruning (the SignLSH/bm25 round-15
            # discipline): collect the batch's probed (table, bucket)
            # pairs ONCE — bounded by Q·T·probes, the query side — and
            # compile them into a pushable predicate, so the layout
            # scan reads only the probed groups (partition pruning on
            # the dirs format, row-group stats pruning on the sorted
            # format) instead of relying on join-side pruning that
            # does not reach the parquet reader. The pairs are
            # EXECUTOR-computed by the same UDF that hashed the stored
            # rows (no driver-side re-hash → no cross-engine ULP
            # risk); the collected rows then REPLACE qb as a local
            # relation, so the probe UDF runs exactly once per batch.
            rows = qb.limit(_PROBE_PAIRS_MAX + 1).collect()
            if rows and len(rows) <= _PROBE_PAIRS_MAX:
                from pyspark.sql import types as T

                from kowari_spark.fsutil import local_df

                by_tbl: dict = {}
                for r in rows:
                    by_tbl.setdefault(r["__tbl"], set()).add(r["bucket"])
                pred = None
                for t in sorted(by_tbl):
                    term = (F.col("__tbl") == int(t)) & F.col(
                        "bucket"
                    ).isin(sorted(by_tbl[t]))
                    pred = term if pred is None else (pred | term)
                bucketed = bucketed.filter(pred)
                qb = local_df(
                    spark,
                    [(r["query_id"], r["__tbl"], r["bucket"]) for r in rows],
                    T.StructType([
                        T.StructField(
                            "query_id",
                            queries.schema[query_id_col].dataType,
                        ),
                        T.StructField("__tbl", T.IntegerType()),
                        T.StructField("bucket", T.IntegerType()),
                    ]),
                )
        # the candidate set feeds three consumers (starvation sizes, the
        # exact re-score, the fallback anti-join). No checkpoint: the
        # expensive subtree (scan -> GEMM hash -> bucket join -> partial
        # agg -> shuffle write) ends in the distinct's Exchange, and
        # Spark's exchange reuse serves every consumer from that one
        # shuffle — measured equal to an explicit localCheckpoint at
        # sf0.01/T=40 while keeping plan construction action-free
        # (a localCheckpoint under AQE executes the upstream stages at
        # PLAN time — the r5 driver-barrier complaint in new clothes)
        cand = (
            bucketed.join(F.broadcast(qb), ["__tbl", "bucket"])
            .select("query_id", id_col)
            .distinct()
        )
        sizes = cand.groupBy("query_id").agg(F.count("*").alias("__n"))
        ok_ids = sizes.filter(F.col("__n") >= k).select("query_id")
        starved = q.join(F.broadcast(ok_ids), "query_id", "left_anti")

        scored = (
            cand.join(F.broadcast(ok_ids), "query_id")
            .join(base_vecs, id_col)
            .join(F.broadcast(q), "query_id")
            .select(
                "query_id",
                F.col(id_col),
                _rounded(
                    _score(metric, F.col(vec_col), F.col("__qvec")), round_to
                ).alias("score"),
            )
        )
        w = Window.partitionBy("query_id").orderBy(F.desc("score"), F.asc(id_col))
        topk = scored.withColumn("rank", F.row_number().over(w)).filter(
            F.col("rank") <= k
        )

        fb = brute_force_fallback(
            base_vecs, starved, k, metric, id_col, vec_col, round_to
        )
        return topk.unionByName(fb)
