"""PQ (product quantization) ANN index — per-subspace codebooks +
asymmetric-distance (ADC) scoring over compressed codes.

Beyond-reference surface (task north star "similarity search"): the
reference ships brute force, sign-LSH and HNSW (src/index.rs); PQ
(Jegou, Douze, Schmid 2011 "Product quantization for nearest neighbor
search") is the classic memory-side scale path the roster was missing —
split each d-dim vector into ``m`` subvectors, quantize every subspace
independently against its own ``k_sub``-centroid codebook, and store
each vector as ``m`` small integer codes. At 100 TB the probe never
touches the raw vectors: it scans the (id, codes) relation — a
``m*4``-byte row instead of ``d*8`` bytes, 32x smaller at the default
shape — and scores each row by ``m`` table lookups into a per-query
distance table computed ONCE driver-side (ADC).

Spark-first design:
- **fit** reuses the IVF fit discipline (ivf.py): deterministic
  farthest-first (Gonzalez maxmin) seeding from ONE md5-ordered sample
  collect, then Lloyd iterations — but all ``m`` subspaces train in the
  SAME pass: one projection computes every subspace's assignment (a
  native argmin over a literal codebook), one posexplode keyed by
  (sub, code, dim) reduces the per-centroid sums map-side, so each
  Lloyd iteration shuffles m*k_sub*(d/m) = k_sub*d tiny rows total,
  never vectors, regardless of m. Centroids land on a fixed decimal
  grid (HALF_UP) each round so the whole fit is bit-reproducible across
  engines — same contract as IVF, and the SQL oracle re-derives the
  entire fit (seeding + Lloyd + encode + ADC) independently.
- **encode/build** is a single codegen projection (m unrolled argmin
  expressions over literal codebooks — no UDF, no shuffle); ``build``
  writes ONLY (id, codes) plus a ``_pq_meta.json`` sidecar (codebooks +
  params + hash version), so a later session probes the compressed
  layout without refitting or rereading vectors.
- **query** computes the m*k_sub distance table driver-side with the
  same sequential (x-y)^2 fold the engines use (bit-parity), then scores
  every code row with ``m`` element_at lookups summed in FIXED subspace
  order (float addition order is part of the plan) — one skinny scan,
  top-k via TakeOrderedAndProject (single query) or a per-query window
  (batch). Scores are approximate-by-construction (that's PQ); exact
  re-ranking composes via ann.PQIndex, whose candidates() takes the ADC
  top-(rerank*k) and the shared AnnIndex.search re-scores exactly.
"""

from __future__ import annotations

import json
from collections.abc import Sequence

import numpy as np
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from kowari_spark.numerics import round_half_up as _round_half_up

_META_NAME = "_pq_meta.json"
#: bump when the fit/encode arithmetic changes — load() refuses a layout
#: whose codes were produced by a different algorithm (the CP-LSH sidecar
#: lesson: probing with mismatched hashing silently loses recall)
_ALGO_VERSION = "pq-maxmin-v1"


class PQ:
    #: default sample size for "auto" seeding — one driver collect that
    #: seeds ALL m subspaces (the rows are sliced driver-side)
    AUTO_SEED_PER_CENTROID = 64

    def __init__(self, m: int = 4, k_sub: int = 16, max_iter: int = 3,
                 seed: int = 42, round_centroids: int | None = 6,
                 seed_sample: int | str | None = "auto",
                 encoder: str = "auto"):
        if m < 1:
            raise ValueError(f"m must be >= 1, got {m}")
        if k_sub < 1:
            raise ValueError(f"k_sub must be >= 1, got {k_sub}")
        if encoder not in ("auto", "expr", "arrow"):
            raise ValueError(
                f"encoder must be 'auto', 'expr' or 'arrow', got {encoder!r}"
            )
        # encode-path engine ("auto" default sizes the choice per call —
        # engines.resolve_engine, the HNSW scorer="auto" precedent; the
        # 629s-vs-3.7s x100 gap in BASELINE.md is what an unaware caller
        # of the expr default used to eat): "expr" = pure-JVM argmin over literal
        # codebooks (the oracle-parity default); "arrow" = the SAME
        # arithmetic vectorized in numpy inside mapInPandas — the
        # m*k_sub interpreted fold lambdas per row are the measured
        # build bottleneck at scale (x100: 629s -> see BASELINE.md).
        # Bit-identical by construction: distances accumulate
        # DIMENSION-BY-DIMENSION (one vectorized elementwise op per
        # dim — the same sequential left fold the expression engine
        # runs, the semantic-dedup GEMM-rescore discipline), and
        # np.argmin ties break on the first (lowest) index exactly like
        # array_position(array_min). Parity is pinned in tests.
        self.encoder = encoder
        self.m = m
        self.k_sub = k_sub
        self.max_iter = max_iter
        self.seed = seed
        # same cross-engine reproducibility contract as IVF: the only
        # ulp-level divergence (summation order inside a cell mean) is
        # absorbed by the decimal grid, after which every distance,
        # argmin and rank is exact IEEE arithmetic on identical inputs
        self.round_centroids = round_centroids
        self.seed_sample = seed_sample
        if isinstance(seed_sample, str) and seed_sample != "auto":
            raise ValueError(
                f"seed_sample must be an int, None (exact full-table "
                f"traversal) or 'auto', got {seed_sample!r}"
            )
        self.dim: int | None = None
        self.codebooks: np.ndarray | None = None  # (m, k_sub, d/m)

    # -- expression helpers -------------------------------------------------

    @property
    def _ds(self) -> int:
        if self.dim is None:
            raise ValueError("fit() or load() first")
        return self.dim // self.m

    # the literal/fold/seeding arithmetic is SHARED with IVF via
    # operators/quantizer.py — both SQL oracles replay it CTE-for-CTE,
    # so it must live exactly once
    @staticmethod
    def _cents_lit(cents) -> "F.Column":
        from kowari_spark.operators.quantizer import cents_lit

        return cents_lit(cents)

    @staticmethod
    def _d2_fold(sub: "F.Column", c) -> "F.Column":
        from kowari_spark.operators.quantizer import d2_fold

        return d2_fold(sub, c)

    def _sub_slice(self, vec_col, j: int) -> "F.Column":
        """Subvector j: elements [j*ds, (j+1)*ds) — F.slice is 1-based."""
        c = F.col(vec_col) if isinstance(vec_col, str) else vec_col
        return F.slice(c, j * self._ds + 1, self._ds)

    def _code_expr(self, vec_col, j: int) -> "F.Column":
        """code_j = argmin_c ||v_j - cb[j][c]||^2, ties -> lowest code."""
        dists = F.transform(
            self._cents_lit(self.codebooks[j]),
            lambda c: self._d2_fold(self._sub_slice(vec_col, j), c),
        )
        return (F.array_position(dists, F.array_min(dists)) - 1).cast("int")

    def _codes_expr(self, vec_col) -> "F.Column":
        return F.array(*[self._code_expr(vec_col, j) for j in range(self.m)])

    # -- fit ----------------------------------------------------------------

    def fit(self, df: DataFrame, id_col: str = "id",
            vec_col: str = "embedding", dim: int | None = None) -> "PQ":
        """Deterministic per-subspace k-means: ONE seeding collect covers
        all m subspaces, each Lloyd iteration is ONE distributed pass
        (all subspaces assigned and reduced together). Pass ``dim=`` to
        skip the first() inference job (repo-wide fast-path convention).

        The (id, vector) projection is persisted for the duration of the
        fit — every iteration re-scans it, and at 100 TB re-reading the
        source per iteration would dominate the build."""
        if dim is None:
            first = df.select(vec_col).first()
            if first is None:
                raise ValueError("cannot fit a PQ on an empty DataFrame")
            dim = len(first[0])
        if dim % self.m != 0:
            raise ValueError(
                f"dim={dim} is not divisible by m={self.m} subspaces"
            )
        self.dim = dim
        # degraded rows (null / shorter than dim) can't be fully encoded
        # (encode yields null codes by design) and would crash the Lloyd
        # reduce on the null code index — they carry no fittable signal,
        # so fit on the fully-covered rows only. Overlong vectors keep
        # encode's ignore-the-tail semantics.
        vecs = (
            df.select(id_col, vec_col)
            .filter(F.col(vec_col).isNotNull() & (F.size(vec_col) >= dim))
            .persist()
        )
        try:
            # resolve encoder="auto" ONCE for the whole fit (the count
            # also materializes the persist before the first Lloyd pass)
            from kowari_spark.engines import resolve_engine

            engine = resolve_engine(self.encoder, n=vecs.count())
            return self._fit(vecs, id_col, vec_col, engine)
        finally:
            vecs.unpersist()

    def _seed_rows(self, df: DataFrame, id_col: str, vec_col: str):
        """The md5-ordered seeding sample (ONE collect; ``None`` =
        whole table, the exact-traversal opt-in)."""
        n = (
            self.AUTO_SEED_PER_CENTROID * self.k_sub
            if self.seed_sample == "auto"
            else self.seed_sample
        )
        ordered = df.select(id_col, vec_col).orderBy(
            F.md5(F.concat(F.col(id_col).cast("string"),
                           F.lit(f"#{self.seed}")))
        )
        if n is not None:
            if n < self.k_sub:
                raise ValueError(f"seed_sample={n} < k_sub={self.k_sub}")
            ordered = ordered.limit(n)
        rows = ordered.collect()
        if len(rows) < self.k_sub:
            raise ValueError(
                f"need >= {self.k_sub} vectors to fit {self.k_sub} "
                f"centroids per subspace, got {len(rows)}"
            )
        return rows

    def _gonzalez(self, pts) -> list[list[float]]:
        """Farthest-first traversal over (id, subvector) points — the
        SAME shared maxmin loop IVF's sampled seeding runs
        (operators/quantizer.gonzalez_maxmin), so the SQL replay is
        identical CTE-for-CTE."""
        from kowari_spark.operators.quantizer import gonzalez_maxmin

        return gonzalez_maxmin(pts, self.k_sub)

    def _fit(self, df: DataFrame, id_col: str, vec_col: str,
             engine: str = "expr") -> "PQ":
        rows = self._seed_rows(df, id_col, vec_col)
        ds = self._ds
        books = []
        for j in range(self.m):
            pts = [
                (r[id_col], [float(x) for x in r[vec_col]][j * ds:(j + 1) * ds])
                for r in rows
            ]
            books.append(self._gonzalez(pts))
        self.codebooks = np.asarray(books, dtype=np.float64)

        for _ in range(self.max_iter):
            # one pass: every subspace's code (through the configured
            # encoder — the arrow path is the scale shape), then
            # (sub, code, local dim) partial sums — k_sub*d skinny rows
            # total on the wire
            coded = self.with_codes(
                df.select(vec_col), vec_col, code_col="__codes", engine=engine
            ).select(
                "__codes",
                F.posexplode(vec_col).alias("dim", "val"),
            ).select(
                (F.col("dim") / ds).cast("int").alias("sub"),
                (F.col("dim") % ds).alias("ldim"),
                F.element_at(
                    "__codes", (F.col("dim") / ds).cast("int") + 1
                ).alias("code"),
                F.col("val").cast("double").alias("val"),
            )
            sums = (
                coded.groupBy("sub", "code", "ldim")
                .agg(F.sum("val").alias("s"), F.count("*").alias("n"))
                .collect()
            )
            new_b = self.codebooks.copy()
            accs = {j: np.zeros((self.k_sub, ds)) for j in range(self.m)}
            cnts = {j: np.zeros(self.k_sub, dtype=np.int64) for j in range(self.m)}
            for r in sums:
                accs[r["sub"]][r["code"], r["ldim"]] = r["s"]
                cnts[r["sub"]][r["code"]] = r["n"]
            for j in range(self.m):
                for c in range(self.k_sub):
                    if cnts[j][c] == 0:
                        continue  # empty cells keep their centroid
                    mean = accs[j][c] / cnts[j][c]
                    if self.round_centroids is not None:
                        mean = [
                            _round_half_up(float(x), self.round_centroids)
                            for x in mean
                        ]
                    new_b[j, c] = mean
            if np.allclose(new_b, self.codebooks, atol=1e-12):
                self.codebooks = new_b
                break
            self.codebooks = new_b
        return self

    # -- encode / build -----------------------------------------------------

    def _codes_arrow(self, df: DataFrame, vec_col: str,
                     code_col: str) -> DataFrame:
        """Arrow encode path — the shared quantizer argmin encoder
        (operators/quantizer.argmin_codes_arrow, also the IVF arrow
        cell assignment): all m argmins per row from vectorized numpy
        inside ONE mapInPandas pass, zero shuffles, bit-identical to
        the expression engine (see __init__)."""
        from kowari_spark.operators.quantizer import argmin_codes_arrow

        return argmin_codes_arrow(df, self.codebooks, vec_col, code_col)

    def with_codes(self, df: DataFrame, vec_col: str = "embedding",
                   code_col: str = "codes",
                   engine: str | None = None) -> DataFrame:
        if self.codebooks is None:
            raise ValueError("fit() or load() first")
        from kowari_spark.engines import resolve_engine

        engine = resolve_engine(self.encoder if engine is None else engine, df)
        if engine == "arrow":
            return self._codes_arrow(df, vec_col, code_col)
        return df.withColumn(code_col, self._codes_expr(vec_col))

    def build(self, df: DataFrame, path: str, id_col: str = "id",
              vec_col: str = "embedding") -> None:
        """Materialize the compressed layout: ONLY (id, codes) — the
        whole point of PQ at scale is that the probe never reads the
        raw vectors. Codebooks + params ride the sidecar so ``load()``
        is probe-ready with no fit (offline-build/online-probe split)."""
        self.with_codes(df, vec_col).select(id_col, "codes").write.mode(
            "overwrite"
        ).parquet(path)
        meta = {
            "version": _ALGO_VERSION,
            "m": self.m,
            "k_sub": self.k_sub,
            "max_iter": self.max_iter,
            "seed": self.seed,
            "round_centroids": self.round_centroids,
            # full fit/encode provenance: codes are bit-identical across
            # encoders (tested), but the sidecar must say how the layout
            # was produced so load() restores an equivalent instance
            "seed_sample": self.seed_sample,
            "encoder": self.encoder,
            "dim": self.dim,
            "codebooks": [
                [[float(x) for x in c] for c in book] for book in self.codebooks
            ],
        }
        from kowari_spark.fsutil import write_bytes

        write_bytes(
            df.sparkSession, f"{path}/{_META_NAME}", json.dumps(meta).encode()
        )

    def load(self, spark: SparkSession, path: str) -> DataFrame:
        """Open a built codes layout; restores the codebooks from the
        sidecar and REFUSES a layout written by a different fit/encode
        algorithm version (mismatched codes silently lose recall) — or
        one with no sidecar at all: PQ codes are meaningless without the
        exact codebooks that produced them, so a bare parquet dir is a
        provenance failure, not a loadable layout (CP-LSH precedent:
        `_cplsh_meta.json` rejection)."""
        from kowari_spark.fsutil import exists, read_bytes

        meta_path = f"{path}/{_META_NAME}"
        if not exists(spark, meta_path):
            raise ValueError(
                f"no {_META_NAME} sidecar at {path}: not a PQ codes "
                "layout built by PQ.build() — codes are unusable "
                "without their codebooks; rebuild the layout"
            )
        meta = json.loads(read_bytes(spark, meta_path).decode())
        ver = meta.get("version")
        if ver != _ALGO_VERSION:
            raise ValueError(
                f"PQ layout at {path} was built by {ver!r}; this "
                f"code probes {_ALGO_VERSION!r} — rebuild the layout"
            )
        self.m = meta["m"]
        self.k_sub = meta["k_sub"]
        self.max_iter = meta["max_iter"]
        self.seed = meta["seed"]
        self.round_centroids = meta["round_centroids"]
        self.seed_sample = meta.get("seed_sample", self.seed_sample)
        self.encoder = meta.get("encoder", self.encoder)
        self.dim = meta["dim"]
        self.codebooks = np.asarray(meta["codebooks"], dtype=np.float64)
        return spark.read.parquet(path)

    # -- query (ADC) --------------------------------------------------------

    def _dist_table(self, query: Sequence[float]) -> list[list[float]]:
        """dt[j][c] = ||q_j - cb[j][c]||^2 with the same SEQUENTIAL fold
        the fit uses (bit-identical to aggregate(zip_with(...)) and to
        the oracle's list_dot_product on the difference)."""
        v = [float(x) for x in query]
        ds = self._ds
        dt = []
        for j in range(self.m):
            qj = v[j * ds:(j + 1) * ds]
            row = []
            for c in self.codebooks[j]:
                acc = 0.0
                for x, y in zip(qj, c):
                    acc += (x - float(y)) * (x - float(y))
                row.append(acc)
            dt.append(row)
        return dt

    def _adc_expr(self, dt: list[list[float]], code_col) -> "F.Column":
        """ADC distance = sum_j dt[j][codes[j]], folded in FIXED
        subspace order (float addition order is part of the plan — the
        oracle adds the same terms left-to-right)."""
        codes = F.col(code_col) if isinstance(code_col, str) else code_col
        acc = None
        for j in range(self.m):
            term = F.element_at(
                F.expr("array(" + ",".join(f"{float(x)!r}D" for x in dt[j]) + ")"),
                F.element_at(codes, j + 1) + 1,
            )
            acc = term if acc is None else acc + term
        return acc

    def query(self, codes_df: DataFrame, query: Sequence[float], k: int,
              id_col: str = "id", code_col: str = "codes",
              round_to: int | None = None) -> DataFrame:
        """Single-query ADC probe over the compressed codes relation:
        one skinny scan, m element_at lookups per row, top-k by
        (distance ASC, id ASC) via TakeOrderedAndProject. The distance
        is the PQ approximation (that's the operator); compose with
        ann.PQIndex for exact re-ranking."""
        if self.codebooks is None:
            raise ValueError("fit() or load() first")
        dist = self._adc_expr(self._dist_table(query), code_col)
        if round_to is not None:
            dist = F.round(dist, round_to) + F.lit(0.0)
        return (
            codes_df.select(F.col(id_col), dist.alias("distance"))
            .orderBy(F.asc("distance"), F.asc(id_col))
            .limit(k)
        )

    def query_batch(self, codes_df: DataFrame, queries: DataFrame, k: int,
                    id_col: str = "id", code_col: str = "codes",
                    query_id_col: str = "query_id",
                    query_vec_col: str = "embedding",
                    round_to: int | None = None) -> DataFrame:
        """Batch ADC: each query's flattened distance table broadcasts
        against ONE scan of the codes relation (lookup index =
        j*k_sub + code_j), per-query window top-k. The codes scan —
        the only big relation — is read exactly once for the whole
        batch."""
        from pyspark.sql.window import Window

        if self.codebooks is None:
            raise ValueError("fit() or load() first")
        qrows = queries.select(query_id_col, query_vec_col).collect()
        flat = [
            (r[0], [d for row in self._dist_table(r[1]) for d in row])
            for r in qrows
        ]
        spark = codes_df.sparkSession
        qtype = queries.schema[query_id_col].dataType.simpleString()
        from kowari_spark.fsutil import local_df

        dt_df = local_df(
            spark, flat, f"query_id {qtype}, __dt array<double>"
        )
        acc = None
        for j in range(self.m):
            term = F.element_at(
                "__dt", F.lit(j * self.k_sub) + F.element_at(code_col, j + 1) + 1
            )
            acc = term if acc is None else acc + term
        if round_to is not None:
            acc = F.round(acc, round_to) + F.lit(0.0)
        scored = codes_df.crossJoin(F.broadcast(dt_df)).select(
            "query_id", F.col(id_col), acc.alias("distance")
        )
        w = Window.partitionBy("query_id").orderBy(
            F.asc("distance"), F.asc(id_col)
        )
        return (
            scored.withColumn("rank", F.row_number().over(w))
            .filter(F.col("rank") <= k)
        )
