"""Streaming ingest into a vector collection.

Beyond-reference surface: the reference ingests vectors one blocking
call at a time (collection_manager.rs:142-166); here a stream of vector
records (e.g. freshly embedded documents) lands in a collection
continuously via foreachBatch — each micro-batch goes through the SAME
validated `Collection.add_df` path (dimension check, strict/upsert
semantics), so streaming and batch ingest cannot diverge.

Scale notes: foreachBatch gives exactly-once appends per micro-batch id
when paired with a checkpoint; dimension validation is a metadata-only
filter (size(embedding) != d) that codegens into the scan.
"""

from __future__ import annotations

from pyspark.sql import DataFrame

from kowari_spark.catalog import Collection


def stream_vectors_into(
    stream_df: DataFrame,
    collection: Collection,
    checkpoint_dir: str,
    mode: str | None = None,
    trigger_available_now: bool = True,
):
    """Start a streaming query appending validated vectors into
    ``collection``. Returns the StreamingQuery.

    ``stream_df`` must carry the collection schema (id, embedding,
    metadata). With ``trigger_available_now`` the query drains all
    available input then stops — the batch-parity mode used in tests.
    """

    def _sink(batch_df: DataFrame, batch_id: int) -> None:
        if not batch_df.isEmpty():
            collection.add_df(batch_df, mode=mode)

    writer = (
        stream_df.writeStream.foreachBatch(_sink)
        .option("checkpointLocation", checkpoint_dir)
        .outputMode("append")
    )
    if trigger_available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()
