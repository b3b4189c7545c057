"""Collection catalog — managed vector tables on Parquet.

Parity surface (SURVEY.md §2.1-2.2): the reference's CollectionManager
keeps one directory per collection holding a SQLite catalog + a custom
`.kwi` binary store, dual-writes every vector, and tracks dimension /
created_at / updated_at / vector_count in a `system_info` KV table
(vector_db/src/collection_manager.rs:44-71,142-166;
sqlite_storage.rs:27-70,150-169).

Spark-first redesign: ONE columnar store per collection (a Parquet
directory — atomic commit per write, no dual-write divergence, columnar
pruning for free) plus a tiny `_meta.json` holding the catalog properties.
`vector_count` is computed, not stored (the reference's stored counter can
drift; see SURVEY.md §3.2). Point reads are predicate-pushdown filters —
the reference's 2-tier access-path choice (collection_manager.rs:168-179)
is subsumed by Catalyst.

Ingest modes (SURVEY.md §1.5): ``strict`` errors on duplicate ids
(src/storage.rs:30-36) and on deleting missing ids (:42-47); ``upsert``
replaces silently (vector_db/src/storage.rs:30-42, sqlite SQL INSERT OR
REPLACE, sqlite_storage.rs:83). Dimension is validated on every add
(collection_manager.rs:147-152) — uniformly, unlike the reference's
unchecked plain-Storage path (SURVEY.md §1.3).
"""

from __future__ import annotations

import json
import os
import shutil
import time
import uuid
from collections.abc import Iterable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from kowari_spark.errors import (
    CollectionNotFoundError,
    DimensionMismatchError,
    DuplicateIdError,
    MissingIdError,
)
from kowari_spark.schema import VECTOR_SCHEMA, vector_row

_META = "_meta.json"
_DATA = "data"


class Collection:
    """A managed vector table: Parquet data + catalog properties."""

    def __init__(self, spark: SparkSession, path: str, meta: dict):
        self.spark = spark
        self.path = path
        self.meta = meta

    # -- properties ------------------------------------------------------

    @property
    def name(self) -> str:
        return self.meta["name"]

    @property
    def dimension(self) -> int:
        return self.meta["dimension"]

    @property
    def mode(self) -> str:
        return self.meta.get("mode", "strict")

    def _data_path(self) -> str:
        return os.path.join(self.path, _DATA)

    def _touch(self) -> None:
        self.meta["updated_at"] = int(time.time())
        with open(os.path.join(self.path, _META), "w") as f:
            json.dump(self.meta, f)

    # -- reads -----------------------------------------------------------

    def df(self) -> DataFrame:
        """The collection as a DataFrame (S4 all_vectors — the scan)."""
        if not os.path.exists(self._data_path()):
            return self.spark.createDataFrame([], VECTOR_SCHEMA)
        return self.spark.read.schema(VECTOR_SCHEMA).parquet(self._data_path())

    def get(self, id: str):
        """Point lookup (S2); None when absent. Pushdown id filter."""
        rows = self.df().filter(F.col("id") == id).limit(1).collect()
        return rows[0] if rows else None

    def count(self) -> int:
        """Computed row count (S5/S19); never a stored counter."""
        return self.df().count()

    def info(self) -> dict:
        """C8 get_collection_info: catalog properties + computed count."""
        return {**self.meta, "vector_count": self.count()}

    # -- search (QueryEngine parity, vector_db/src/query.rs:15-52) -------

    def search_with_scores(
        self, query, k: int, metric: str = "cosine", round_to: int | None = None
    ):
        """Q8 search_with_scores: top-k records with scores. The index
        hit list resolves back to full records by inner join (missing
        ids silently drop, matching query.rs:18-24)."""
        from kowari_spark.operators import knn, resolve

        hits = knn(
            self.df(), [float(x) for x in query], k, metric=metric, round_to=round_to
        )
        return resolve(hits, self.df()).orderBy(
            F.desc("score"), F.asc("id")
        )

    def search(self, query, k: int, metric: str = "cosine"):
        """Q7/Q9 search (by raw vector): top-k full records, no score
        column."""
        return self.search_with_scores(query, k, metric=metric).drop("score")

    # -- writes ----------------------------------------------------------

    def _validate_dims(self, df: DataFrame) -> None:
        bad = df.filter(F.size("embedding") != self.dimension).limit(1).collect()
        if bad:
            got = len(bad[0]["embedding"])
            raise DimensionMismatchError(
                f"collection {self.name!r} expects dimension {self.dimension}, got {got}"
            )

    def add_df(self, df: DataFrame, mode: str | None = None) -> None:
        """Validated append of a vectors DataFrame (C5 add_vector, batched).

        strict: any incoming id already present -> DuplicateIdError
        (src/storage.rs:30-36); duplicate ids *within* the batch also error.
        upsert: existing rows with incoming ids are replaced
        (vector_db/src/storage.rs:30-33).
        """
        mode = mode or self.mode
        df = df.select(*[f.name for f in VECTOR_SCHEMA])
        self._validate_dims(df)
        if mode == "strict":
            dup_in_batch = (
                df.groupBy("id").count().filter(F.col("count") > 1).limit(1).collect()
            )
            if dup_in_batch:
                raise DuplicateIdError(f"duplicate id in batch: {dup_in_batch[0]['id']}")
            existing = self.df()
            clash = df.join(existing, "id", "left_semi").limit(1).collect()
            if clash:
                raise DuplicateIdError(f"vector with ID {clash[0]['id']} already exists")
            df.write.mode("append").parquet(self._data_path())
        elif mode == "upsert":
            existing = self.df()
            if existing.isEmpty():
                df.write.mode("append").parquet(self._data_path())
            else:
                merged = existing.join(df, "id", "left_anti").unionByName(df)
                self._rewrite(merged)
        else:
            raise ValueError(f"unknown ingest mode {mode!r}")
        self._touch()

    def add(self, embedding, metadata=None, id: str | None = None) -> str:
        """Single-vector add (C5). Returns the id."""
        row = vector_row(embedding, metadata, id)
        self.add_df(self.spark.createDataFrame([row], VECTOR_SCHEMA))
        return row[0]

    def delete(self, id: str, mode: str | None = None) -> None:
        """Delete by id (S3/C7). strict: missing id -> MissingIdError
        (src/storage.rs:42-47); upsert mode ignores missing ids
        (vector_db/src/storage.rs:39-42)."""
        mode = mode or self.mode
        existing = self.df()
        if mode == "strict":
            if self.get(id) is None:
                raise MissingIdError(f"vector with ID {id} not found")
        self._rewrite(existing.filter(F.col("id") != id))
        self._touch()

    def clear(self) -> None:
        """Truncate (S6)."""
        self._rewrite(self.df().limit(0))
        self._touch()

    def optimize(self, target_partitions: int | None = None) -> None:
        """Compaction (S14/C9): rewrite into right-sized files. The
        reference rewrites its `.kwi` dropping dead records
        (binary_index.rs:239-257); Parquet deletes already rewrote, so
        this is purely file-count/size hygiene."""
        df = self.df()
        n = target_partitions or max(1, df.count() // 500_000)
        self._rewrite(df.repartition(n))
        self._touch()

    def _rewrite(self, df: DataFrame) -> None:
        """Atomic-ish full rewrite: write to temp dir, swap."""
        tmp = self._data_path() + "." + uuid.uuid4().hex[:8]
        df.write.mode("overwrite").parquet(tmp)
        old = self._data_path()
        if os.path.exists(old):
            shutil.rmtree(old)
        os.rename(tmp, old)


class CollectionManager:
    """Multi-collection catalog rooted at a warehouse directory (C1-C4).

    Layout: ``<base>/<collection>/_meta.json`` + ``data/*.parquet``
    (replaces the reference's ``metadata.sqlite3`` + ``vectors.kwi``,
    collection_manager.rs:44-55).
    """

    def __init__(self, spark: SparkSession, base_path: str):
        self.spark = spark
        self.base_path = base_path
        os.makedirs(base_path, exist_ok=True)

    def _coll_path(self, name: str) -> str:
        return os.path.join(self.base_path, name)

    def create_collection(
        self, name: str, dimension: int, mode: str = "strict"
    ) -> Collection:
        """C1: register a collection with fixed dimension."""
        path = self._coll_path(name)
        if os.path.exists(os.path.join(path, _META)):
            raise ValueError(f"collection {name!r} already exists")
        os.makedirs(path, exist_ok=True)
        now = int(time.time())
        meta = {
            "name": name,
            "dimension": dimension,
            "mode": mode,
            "created_at": now,
            "updated_at": now,
        }
        with open(os.path.join(path, _META), "w") as f:
            json.dump(meta, f)
        return Collection(self.spark, path, meta)

    def get_collection(self, name: str) -> Collection:
        """C2: open an existing collection (lazy, from disk)."""
        path = self._coll_path(name)
        meta_file = os.path.join(path, _META)
        if not os.path.exists(meta_file):
            raise CollectionNotFoundError(f"collection {name!r} not found")
        with open(meta_file) as f:
            meta = json.load(f)
        return Collection(self.spark, path, meta)

    def list_collections(self) -> list[str]:
        """C3: names of directories holding a catalog entry."""
        out = []
        for d in sorted(os.listdir(self.base_path)):
            if os.path.exists(os.path.join(self.base_path, d, _META)):
                out.append(d)
        return out

    def delete_collection(self, name: str) -> None:
        """C4: drop collection recursively."""
        path = self._coll_path(name)
        if not os.path.exists(os.path.join(path, _META)):
            raise CollectionNotFoundError(f"collection {name!r} not found")
        shutil.rmtree(path)

    def add_vectors(self, name: str, rows: Iterable[tuple]) -> None:
        """Bulk validated ingest into a named collection."""
        coll = self.get_collection(name)
        coll.add_df(self.spark.createDataFrame(list(rows), VECTOR_SCHEMA))
