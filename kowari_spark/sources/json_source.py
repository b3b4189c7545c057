"""JSON snapshot source/sink (S7-S9).

The reference persists collections as a pretty-printed JSON array of
records and implements append as load-all + push + save-all
(src/persistence.rs:18-29,53-62 — O(total) per append). Here: Spark's
JSON source with the canonical schema; append is a real file append
(new part files), which is the documented semantic replacement
(SURVEY.md §1.4).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from kowari_spark.schema import VECTOR_SCHEMA


def save_vectors(df: DataFrame, path: str) -> None:
    """S7: serialize all records to JSON (overwrite snapshot)."""
    df.select("id", "embedding", "metadata").write.mode("overwrite").json(path)


def load_vectors(spark: SparkSession, path: str) -> DataFrame:
    """S8: read records back with the canonical schema (no inference)."""
    return spark.read.schema(VECTOR_SCHEMA).json(path)


def append_vectors(df: DataFrame, path: str) -> None:
    """S9: append records — real append, not the reference's full
    rewrite (persistence.rs:53-62)."""
    df.select("id", "embedding", "metadata").write.mode("append").json(path)
