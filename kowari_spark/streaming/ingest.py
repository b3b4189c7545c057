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
    rebuild.

    The sink is foreachBatch + plain parquet append, NOT the built-in
    parquet streaming sink: the built-in sink pins every reader to its
    ``_spark_metadata`` file log, which (a) makes the layout unreadable
    to non-Spark engines and (b) makes small-file compaction unsound —
    rewritten files aren't in the log, so batch readers would resolve
    the pre-compaction file list forever. Instead each micro-batch
    commits an idempotence marker ``_batches/<ck>-<batch_id>`` AFTER its
    files land (the same token pattern as ``Collection.add_df``): a
    replayed batch whose marker exists is a no-op, so restarts do not
    duplicate. The residual window — crash after some files, before the
    marker — is the documented no-transaction-log trade-off; the
    manifest-backed Collection path closes it when exactness matters
    more than layout portability.

    Small per-batch files accumulate; ``compact_bucketed_layout`` is the
    periodic maintenance job that bounds them (``Collection.optimize``
    semantics for index layouts).
    """
    import hashlib

    from kowari_spark import fsutil

    bucketed = lsh.with_buckets(stream_df, vec_col)
    ck_tag = hashlib.md5(checkpoint_dir.encode()).hexdigest()[:12]

    def _sink(batch_df: DataFrame, batch_id: int) -> None:
        spark = batch_df.sparkSession
        marker = f"{path}/_batches/{ck_tag}-{batch_id}"
        if fsutil.exists(spark, marker):
            return
        if not batch_df.isEmpty():
            batch_df.write.mode("append").partitionBy("bucket").parquet(path)
        fsutil.create_marker(spark, marker)

    return (
        bucketed.writeStream.foreachBatch(_sink)
        .option("checkpointLocation", checkpoint_dir)
        .outputMode("append")
        .trigger(availableNow=trigger_available_now)
        .start()
    )


def compact_bucketed_layout(
    spark,
    path: str,
    partition_col: str = "bucket",
    max_files: int = 4,
    target_files: int = 1,
) -> list[str]:
    """Compact oversized partitions of a partitioned parquet layout
    (streaming micro-batch appends leave one small file per batch per
    touched bucket; N batches x B buckets is the classic small-file
    problem). Returns the partition names that were rewritten.

    Scale shape:
    - partition file counts come from one Hadoop-FS listing (works on
      hdfs/s3a, not just local);
    - only partitions with more than ``max_files`` data files are
      rewritten — the read is PARTITION-PRUNED to those buckets, so
      compaction cost tracks the backlog, never the table;
    - ``repartition(n, partition_col)`` hash-routes every oversized
      bucket to exactly one task -> ``target_files`` file(s) per bucket
      (the write stays partitionBy-consistent so probes are unaffected);
    - the swap uses dynamic partition overwrite: ONLY the rewritten
      partitions are replaced, concurrent readers of other buckets never
      see change. Like any non-transactional parquet overwrite a reader
      racing the exact rewritten bucket can glimpse it mid-swap — run
      compaction in the maintenance window, or use the manifest-backed
      ``Collection.optimize`` path when transactional swap is required.

    Streaming-safe: the sink's checkpoint tracks offsets, not files, so
    compaction between micro-batches never confuses the writer.
    """
    from pyspark.sql import functions as F

    from kowari_spark.fsutil import count_data_files, list_dirs

    prefix = f"{partition_col}="
    oversized = []
    for d in list_dirs(spark, path):
        if d.startswith(prefix) and count_data_files(spark, f"{path}/{d}") > max_files:
            oversized.append(d[len(prefix):])
    if not oversized:
        return []

    # stage the backlog first: overwriting a path while lazily reading
    # from it races the scan against the commit's deletes. The staging
    # dir is underscore-prefixed (invisible to readers of ``path``) and
    # already repartitioned, so the final overwrite is a pure move-shaped
    # rewrite. Values arrive as directory-name strings; cast against the
    # layout's inferred partition type.
    from kowari_spark.fsutil import delete

    staging = f"{path}/_compact_staging"
    (
        spark.read.parquet(path)
        .filter(F.col(partition_col).cast("string").isin(oversized))
        .repartition(max(1, len(oversized) * target_files), F.col(partition_col))
        .write.mode("overwrite")
        .parquet(staging)
    )
    prev = spark.conf.get("spark.sql.sources.partitionOverwriteMode", "static")
    spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
    try:
        (
            spark.read.parquet(staging)
            .write.mode("overwrite")
            .partitionBy(partition_col)
            .parquet(path)
        )
    finally:
        spark.conf.set("spark.sql.sources.partitionOverwriteMode", prev)
        delete(spark, staging)
    return [f"{prefix}{v}" for v in oversized]
