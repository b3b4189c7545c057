"""Canonical record schema and constructors.

The engine's base relation is the reference's ``Vector`` record
(reference: vector_db/src/vector.rs:5-10) mapped to a columnar schema:
``id`` string (UUID canonical form), ``embedding`` array<float>,
``metadata`` JSON text (schema-less, nullable).
"""

from __future__ import annotations

import json
import uuid
from collections.abc import Iterable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T

VECTOR_SCHEMA = T.StructType(
    [
        T.StructField("id", T.StringType(), False),
        T.StructField("embedding", T.ArrayType(T.FloatType(), containsNull=False), False),
        T.StructField("metadata", T.StringType(), True),
    ]
)


def new_id() -> str:
    """UUID v4 canonical 36-char form (reference: vector_db/src/vector.rs:15)."""
    return str(uuid.uuid4())


def vector_row(
    embedding: Iterable[float],
    metadata: dict | list | str | None = None,
    id: str | None = None,
) -> tuple[str, list[float], str | None]:
    """One record tuple; auto-id when none given (vector.rs:13-35)."""
    if metadata is not None and not isinstance(metadata, str):
        metadata = json.dumps(metadata, separators=(",", ":"))
    return (id or new_id(), [float(x) for x in embedding], metadata)


def vector_df(spark: SparkSession, rows: Iterable[tuple]) -> DataFrame:
    """Build a vectors DataFrame with the canonical schema."""
    from kowari_spark.fsutil import local_df

    return local_df(spark, list(rows), VECTOR_SCHEMA)
