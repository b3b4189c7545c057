"""IVF×PQ composed ANN index — coarse cell pruning over compressed codes.

Beyond-reference surface (task north star "similarity search"): the
standard large-scale serving structure (Jégou, Douze & Schmid 2011 §V;
every production vector store's default) composes the repo's two
existing quantizers instead of duplicating either:

- **IVF** (operators/ivf.py) prunes the corpus to ``n_probe`` Voronoi
  cells per query — the probe reads a few partitions of the layout,
  never the whole relation;
- **PQ** (operators/pq.py) compresses each vector to ``m`` small codes
  — the pruned scan reads ~32x fewer bytes and scores each row with
  ``m`` table lookups (ADC), never touching raw vectors.

Flat PQ scans every code row per query; IVF re-reads full vectors
inside its cells. The composition does neither: at 100 TB the probe
cost is (cells touched / total cells) x (compressed bytes) — both
reduction factors multiply.

Spark-first shape:
- **fit** = the two existing fits, unchanged (both deterministic,
  grid-rounded, SQL-replayable — the ``ivfpq_knn`` oracle replays BOTH
  chains CTE-for-CTE and composes them, which is only possible because
  this module adds NO new arithmetic);
- **build** writes ONE relation (id, codes) ``partitionBy(list_id)``
  plus a sidecar carrying both quantizers — cell pruning becomes
  partition pruning on the filesystem layout, exactly like IVF's own
  layout, but each partition holds codes, not vectors;
- **query_batch** selects each query's ``n_probe`` cells driver-side
  (contract-small batch, same as IVFIndex), partition-prunes the codes
  layout with an ``isin`` filter, joins the broadcast per-query
  (cell, distance-table) relation, and folds the ADC lookups in FIXED
  subspace order (bit-identical to PQ.query_batch on the same rows);
- **IVFPQIndex** plugs the shortlist into the shared AnnIndex contract
  (ann.py) for exact re-ranking, brute-force starvation fallback, and
  ``where=`` filtered search — all inherited, none reimplemented.
"""

from __future__ import annotations

import json

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

_META_NAME = "_ivfpq_meta.json"
#: bump when the composed layout semantics change; the component
#: algo-versions (ivf.py/pq.py _ALGO_VERSION) are written into the
#: sidecar by build() and verified by load() — a PQ or IVF version bump
#: therefore refuses stale composed layouts without a composed-version
#: bump (ADVICE r7: previously only the composed string was checked)
_ALGO_VERSION = "ivfpq-v1"


def _component_versions() -> dict:
    from kowari_spark.operators.ivf import _ALGO_VERSION as _IVF_V
    from kowari_spark.operators.pq import _ALGO_VERSION as _PQ_V

    return {"ivf_version": _IVF_V, "pq_version": _PQ_V}


class IVFPQ:
    """Composed coarse+fine quantizer. ``ivf`` supplies cell pruning
    (its ``n_probe`` is the probe width), ``pq`` supplies the
    compressed ADC scoring. Fit either or both beforehand, or let
    ``fit`` fill in whichever is missing."""

    def __init__(self, ivf, pq):
        self.ivf = ivf
        self.pq = pq

    def fit(self, df: DataFrame, id_col: str = "id",
            vec_col: str = "embedding", dim: int | None = None) -> "IVFPQ":
        if self.ivf.centroids is None:
            self.ivf.fit(df, id_col=id_col, vec_col=vec_col)
        if self.pq.codebooks is None:
            self.pq.fit(df, id_col=id_col, vec_col=vec_col, dim=dim)
        return self

    def with_cells_codes(self, df: DataFrame, vec_col: str = "embedding",
                         code_col: str = "codes") -> DataFrame:
        """One projection adds BOTH the IVF cell and the PQ codes —
        single pass over the vectors, no shuffle."""
        return self.pq.with_codes(
            self.ivf.with_lists(df, vec_col), vec_col, code_col
        )

    def build(self, df: DataFrame, path: str, id_col: str = "id",
              vec_col: str = "embedding") -> None:
        """Materialize the composed layout: (id, codes) partitioned by
        list_id — cell pruning IS partition pruning, and a pruned
        partition holds only ~m bytes/row of codes. Both quantizers
        ride the sidecar so ``load()`` is probe-ready with no refit."""
        if self.ivf.centroids is None or self.pq.codebooks is None:
            raise ValueError("fit() both quantizers before build()")
        (
            self.with_cells_codes(df, vec_col)
            .select(id_col, "list_id", "codes")
            .write.mode("overwrite")
            .partitionBy("list_id")
            .parquet(path)
        )
        meta = {
            "version": _ALGO_VERSION,
            **_component_versions(),
            "ivf": {
                "n_lists": self.ivf.n_lists,
                "n_probe": self.ivf.n_probe,
                "max_iter": self.ivf.max_iter,
                "seed": self.ivf.seed,
                "round_centroids": self.ivf.round_centroids,
                "centroids": [
                    [float(x) for x in c] for c in self.ivf.centroids
                ],
            },
            "pq": {
                "m": self.pq.m,
                "k_sub": self.pq.k_sub,
                "max_iter": self.pq.max_iter,
                "seed": self.pq.seed,
                "round_centroids": self.pq.round_centroids,
                "dim": self.pq.dim,
                "codebooks": [
                    [[float(x) for x in c] for c in book]
                    for book in self.pq.codebooks
                ],
            },
        }
        from kowari_spark.fsutil import write_bytes

        write_bytes(
            df.sparkSession, f"{path}/{_META_NAME}", json.dumps(meta).encode()
        )

    def load(self, spark: SparkSession, path: str) -> DataFrame:
        """Open a built composed layout; restores BOTH quantizers from
        the sidecar and refuses a sidecar-less or version-mismatched
        dir (the PQ.load provenance rule: codes without their exact
        codebooks/centroids silently lose recall)."""
        import numpy as np

        from kowari_spark.fsutil import exists, read_bytes

        meta_path = f"{path}/{_META_NAME}"
        if not exists(spark, meta_path):
            raise ValueError(
                f"no {_META_NAME} sidecar at {path}: not an IVFPQ layout "
                "built by IVFPQ.build() — rebuild the layout"
            )
        meta = json.loads(read_bytes(spark, meta_path).decode())
        ver = meta.get("version")
        if ver != _ALGO_VERSION:
            raise ValueError(
                f"IVFPQ layout at {path} was built by {ver!r}; this code "
                f"probes {_ALGO_VERSION!r} — rebuild the layout"
            )
        want = _component_versions()
        got = {k: meta.get(k) for k in want}
        if got != want:
            raise ValueError(
                f"IVFPQ layout at {path} was built with component "
                f"versions {got}; this code probes {want} — a quantizer "
                "algo-version changed, rebuild the layout"
            )
        iv, pv = meta["ivf"], meta["pq"]
        self.ivf.n_lists = iv["n_lists"]
        self.ivf.n_probe = iv["n_probe"]
        self.ivf.max_iter = iv["max_iter"]
        self.ivf.seed = iv["seed"]
        self.ivf.round_centroids = iv["round_centroids"]
        self.ivf.centroids = np.asarray(iv["centroids"], dtype=np.float64)
        self.pq.m = pv["m"]
        self.pq.k_sub = pv["k_sub"]
        self.pq.max_iter = pv["max_iter"]
        self.pq.seed = pv["seed"]
        self.pq.round_centroids = pv["round_centroids"]
        self.pq.dim = pv["dim"]
        self.pq.codebooks = np.asarray(pv["codebooks"], dtype=np.float64)
        return spark.read.parquet(path)

    def query_batch(self, coded: DataFrame, queries: DataFrame, k: int,
                    id_col: str = "id", code_col: str = "codes",
                    query_id_col: str = "query_id",
                    query_vec_col: str = "embedding",
                    round_to: int | None = None) -> DataFrame:
        """Pruned ADC: each query scores ONLY the codes of its
        ``n_probe`` nearest cells. The (query, cell, distance-table)
        relation is driver-built from the contract-small query batch
        and broadcast; the codes scan is partition-pruned by the
        ``isin`` over the union of probed cells, then the broadcast
        join restricts each row to the queries that probed its cell.
        Distance values are bit-identical to ``PQ.query_batch`` on the
        same rows (same fixed-order ADC fold)."""
        from pyspark.sql.window import Window

        if self.ivf.centroids is None or self.pq.codebooks is None:
            raise ValueError("fit() or load() first")
        qrows = queries.select(query_id_col, query_vec_col).collect()
        flat = [
            (
                r[0],
                p,
                [d for row in self.pq._dist_table(r[1]) for d in row],
            )
            for r in qrows
            for p in self.ivf._probes_of(r[1])
        ]
        spark = coded.sparkSession
        qtype = queries.schema[query_id_col].dataType.simpleString()
        from kowari_spark.fsutil import local_df

        probe_df = local_df(
            spark, flat, f"query_id {qtype}, list_id int, __dt array<double>"
        )
        probed = sorted({p for _, p, _ in flat})
        acc = None
        for j in range(self.pq.m):
            term = F.element_at(
                "__dt",
                F.lit(j * self.pq.k_sub) + F.element_at(code_col, j + 1) + 1,
            )
            acc = term if acc is None else acc + term
        if round_to is not None:
            acc = F.round(acc, round_to) + F.lit(0.0)
        scored = (
            coded.filter(F.col("list_id").isin(probed))
            .join(F.broadcast(probe_df), "list_id")
            .select("query_id", F.col(id_col), acc.alias("distance"))
        )
        w = Window.partitionBy("query_id").orderBy(
            F.asc("distance"), F.asc(id_col)
        )
        return (
            scored.withColumn("rank", F.row_number().over(w))
            .filter(F.col("rank") <= k)
        )
