"""Schema-less JSON metadata access.

The reference stores arbitrary nested JSON per record
(vector_db/src/vector.rs:9) and filters it client-side
(vector_db/examples/local_storage_demo.rs:115-130). Here metadata
predicates are first-class Column expressions, so Catalyst can push them
*before* vector scoring (pre-filter -> score -> rank).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def meta_field(metadata: Column | str, path: str) -> Column:
    """Extract a JSON field as string; ``path`` like ``features.category``.

    Equivalent of the reference demo's nested navigation
    (local_storage_demo.rs:115-130).
    """
    col = F.col(metadata) if isinstance(metadata, str) else metadata
    json_path = "$." + path
    return F.get_json_object(col, json_path)


def meta_json(metadata: Column | str, schema: str) -> Column:
    """Parse metadata into a typed struct for repeated access."""
    col = F.col(metadata) if isinstance(metadata, str) else metadata
    return F.from_json(col, schema)
