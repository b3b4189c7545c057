"""Sequence packing for training-data pipelines (concat-and-chunk).

Beyond-reference surface (task north star): the standard LLM-pretraining
packing step — documents are concatenated into token streams and the
streams cut into fixed-budget chunks (sequences); a training example is
one chunk, and a document's tokens land in chunks
``first_chunk..last_chunk`` of its stream. This operator computes that
assignment DECLARATIVELY: per-document offsets into its stream via one
window cumulative sum, chunk ids via integer division — no UDFs, no
driver loop, no global sort.

Scale shape (the reason for ``num_streams``): a single global
concatenation order would be one window over one partition — the
classic single-partition window bottleneck. Real pipelines shard
packing across data-loader workers anyway, so the stream id IS the
shard: documents hash to ``num_streams`` independent streams
(engine-portable md5 hash, so the oracle reproduces the assignment),
the one shuffle partitions by stream, and each stream's cumulative sum
sorts only its own partition slice. At 100 TB, size ``num_streams`` ≈
cluster cores (or any multiple) — stream cardinality controls both
parallelism and per-task sort size, and the plan never needs a
single-partition exchange.

Determinism: (stream, position) of every document is a pure function of
(doc ids, token counts, budget, num_streams) — re-running on the same
corpus reproduces the same packing, which is what makes packed datasets
resumable/auditable.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from kowari_spark.functions.text import base_hash64, token_count


def pack_documents(
    df: DataFrame,
    budget: int,
    num_streams: int = 32,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Assign every document a (stream, token-offset, chunk-range) under
    concat-and-chunk packing with ``budget`` tokens per chunk.

    Output columns (one row per input document):

    - ``stream``     — which of the ``num_streams`` independent token
      streams the document concatenates into (portable md5 hash of id);
    - ``n_tokens``   — whitespace token count (``functions.text``);
    - ``start_pos`` / ``end_pos`` — the document's half-open token span
      within its stream: docs are concatenated in ascending-id order, so
      ``end_pos`` is the per-stream running sum and ``start_pos`` =
      ``end_pos - n_tokens``;
    - ``first_chunk`` / ``last_chunk`` — the budget-sized chunks the
      span touches (``start_pos // budget`` .. ``(end_pos-1) // budget``
      — a doc crossing a boundary spans several training sequences).

    One shuffle (hash by stream), one window per stream slice; every
    expression is native (codegen) and the whole result is
    oracle-exact in ANSI SQL (see ``__spark_entry__.doc_pack_chunks``).
    """
    if budget <= 0:
        raise ValueError(f"budget must be positive, got {budget}")
    if num_streams <= 0:
        raise ValueError(f"num_streams must be positive, got {num_streams}")
    toks = df.select(
        F.col(id_col),
        (base_hash64(F.col(id_col).cast("string")) % F.lit(num_streams)).alias(
            "stream"
        ),
        token_count(F.col(text_col)).alias("n_tokens"),
    )
    w = (
        Window.partitionBy("stream")
        .orderBy(id_col)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    spans = toks.withColumn("end_pos", F.sum("n_tokens").over(w)).withColumn(
        "start_pos", F.col("end_pos") - F.col("n_tokens")
    )
    return spans.select(
        id_col,
        "stream",
        "n_tokens",
        "start_pos",
        "end_pos",
        F.floor(F.col("start_pos") / budget).alias("first_chunk"),
        F.floor((F.col("end_pos") - 1) / budget).alias("last_chunk"),
    )


def pack_summary(packed: DataFrame, budget: int) -> DataFrame:
    """Per-stream packing stats from a ``pack_documents`` result:
    (stream, n_docs, n_tokens, n_chunks, fill) where ``n_chunks`` =
    ceil(stream tokens / budget) and ``fill`` is the mean occupancy of
    those chunks (tail chunk included — the padding the packing exists
    to minimize). Pure aggregation over the already-skinny span rows."""
    return (
        packed.groupBy("stream")
        .agg(
            F.count("*").alias("n_docs"),
            F.sum("n_tokens").alias("n_tokens"),
        )
        .select(
            "stream",
            "n_docs",
            "n_tokens",
            F.ceil(F.col("n_tokens") / budget).alias("n_chunks"),
            (
                F.col("n_tokens")
                / (F.ceil(F.col("n_tokens") / budget) * budget)
            ).alias("fill"),
        )
    )
