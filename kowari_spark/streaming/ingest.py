"""Streaming ingest into a vector collection.

Beyond-reference surface: the reference ingests vectors one blocking
call at a time (collection_manager.rs:142-166); here a stream of vector
records (e.g. freshly embedded documents) lands in a collection
continuously via foreachBatch — each micro-batch goes through the SAME
validated `Collection.add_df` path (dimension check, strict/upsert
semantics), so streaming and batch ingest cannot diverge.

Scale notes: foreachBatch alone is AT-LEAST-once — after a driver
restart the last un-checkpointed micro-batch replays, and a bare append
would double its rows. Exactly-once here comes from the collection's
transaction log: each micro-batch commits with an idempotence token
``<checkpoint_dir>:<batch_id>`` (the Delta streaming-sink pattern), so a
replayed batch whose token is already in a retained manifest is a no-op.
Dimension validation is a metadata-only filter (size(embedding) != d)
that codegens into the scan.
"""

from __future__ import annotations

from pyspark.sql import DataFrame

from kowari_spark.catalog import Collection
from kowari_spark.operators.lsh import SignLSH


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
            collection.add_df(
                batch_df, mode=mode, txn_id=f"{checkpoint_dir}:{batch_id}"
            )

    writer = (
        stream_df.writeStream.foreachBatch(_sink)
        .option("checkpointLocation", checkpoint_dir)
        .outputMode("append")
    )
    if trigger_available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def stream_into_lsh_layout(
    stream_df: DataFrame,
    lsh: SignLSH,
    path: str,
    checkpoint_dir: str,
    vec_col: str = "embedding",
    trigger_available_now: bool = True,
):
    """Maintain a bucket-partitioned LSH layout from a vector stream
    (SURVEY.md §7.1 step 9: streaming ingest + index maintenance).

    Each micro-batch computes its bucket column (narrow, codegen) and
    appends into ``partitionBy(bucket)`` parquet — new vectors land in
    the right partition immediately, so probes keep pruning without any
    rebuild. Compaction of small per-batch files within a bucket is the
    periodic maintenance job (``Collection.optimize`` semantics),
    orthogonal to correctness.
    """
    bucketed = lsh.with_buckets(stream_df, vec_col)
    return (
        bucketed.writeStream.format("parquet")
        .option("path", path)
        .option("checkpointLocation", checkpoint_dir)
        .partitionBy("bucket")
        .outputMode("append")
        .trigger(availableNow=trigger_available_now)
        .start()
    )
