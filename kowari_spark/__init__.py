"""kowari_spark — a PySpark-native analytics engine with the query and
data-processing capabilities of the reference vector database
(neilthomass/kowari, surveyed in SURVEY.md).

Brand-new Spark-first design: DataFrame/SQL plans optimized by Catalyst,
Parquet columnar storage, native higher-order-function vector math, and
scale-out operators (broadcast + partition-heap top-k, bucket-partitioned
LSH) designed for multi-executor clusters even though CI runs local mode.

Nothing in this package is a translation of the reference's Rust code;
reference citations in docstrings (file:line) document *semantics parity*
only.
"""

from kowari_spark.session import get_session
from kowari_spark.schema import VECTOR_SCHEMA, vector_df
from kowari_spark.errors import (
    CollectionNotFoundError,
    DimensionMismatchError,
    DuplicateIdError,
    KowariError,
    MissingIdError,
)

__version__ = "0.1.0"

__all__ = [
    "get_session",
    "VECTOR_SCHEMA",
    "vector_df",
    "KowariError",
    "DuplicateIdError",
    "MissingIdError",
    "DimensionMismatchError",
    "CollectionNotFoundError",
]
