"""Structured Streaming operators over the events stream.

Beyond-reference surface: kowari has no streaming at all (SURVEY.md §2.6
— batch/point ops only), but the task north star requires watermarked
windowed aggregation, late-data handling, and custom stateful operators.
Everything here is expressed as transformations on an unbounded
DataFrame, so the SAME functions run in batch mode (a static DataFrame
in, a static DataFrame out) — that is how the oracle checks them: the
driver's batch `events_hourly` query is `hourly_rollup` applied to the
static table.

Scale design:
- windowed aggs are keyed by (window, event_type) / (window, user_id) —
  Spark keeps one state row per key per open window; the watermark bounds
  state (windows older than watermark are finalized and evicted);
- `streaming_dedup` uses dropDuplicatesWithinWatermark so the seen-ids
  state is also watermark-bounded;
- `user_running_stats` is applyInPandasWithState with one small state
  tuple per user — hash-partitioned by user_id, arbitrarily many users
  across executors.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import (
    DoubleType,
    LongType,
    StringType,
    StructField,
    StructType,
    TimestampType,
)

EVENT_SCHEMA = StructType(
    [
        StructField("event_id", LongType()),
        StructField("ts", TimestampType()),
        StructField("user_id", LongType()),
        StructField("event_type", StringType()),
        StructField("value", DoubleType()),
        StructField("props", StringType()),
    ]
)


def read_events_stream(
    spark: SparkSession, path: str, max_files_per_trigger: int | None = None
) -> DataFrame:
    """File-source stream of event parquet files dropped into ``path``.

    At scale this is the standard landing-zone pattern: upstream writers
    append parquet files; maxFilesPerTrigger bounds each micro-batch.
    """
    reader = spark.readStream.schema(EVENT_SCHEMA)
    if max_files_per_trigger is not None:
        reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
    return reader.parquet(path)


# -- windowed aggregations ---------------------------------------------------

def hourly_rollup(events: DataFrame, watermark: str = "2 hours") -> DataFrame:
    """Tumbling 1-hour window per event_type: count + sum(value).

    Watermark bounds state and admits late rows up to ``watermark`` after
    the window closes; later rows are dropped (the documented late-data
    policy). Works identically on a static DataFrame (watermark is a
    no-op in batch), which is how the DuckDB oracle validates it.
    """
    df = events.withWatermark("ts", watermark) if events.isStreaming else events
    return (
        df.groupBy(F.window("ts", "1 hour").alias("w"), "event_type")
        .agg(F.count("*").alias("n"), F.sum("value").alias("total_value"))
        .select(
            F.date_format(F.col("w.start"), "yyyy-MM-dd HH:mm:ss").alias("hour"),
            "event_type",
            "n",
            "total_value",
        )
    )


def sliding_rollup(
    events: DataFrame,
    window: str = "1 hour",
    slide: str = "15 minutes",
    watermark: str = "2 hours",
) -> DataFrame:
    """Sliding-window event counts per type (each row lands in
    window/slide overlapping windows)."""
    df = events.withWatermark("ts", watermark) if events.isStreaming else events
    return (
        df.groupBy(F.window("ts", window, slide).alias("w"), "event_type")
        .agg(F.count("*").alias("n"))
        .select(
            F.date_format(F.col("w.start"), "yyyy-MM-dd HH:mm:ss").alias("w_start"),
            "event_type",
            "n",
        )
    )


def session_rollup(
    events: DataFrame, gap: str = "30 minutes", watermark: str = "2 hours"
) -> DataFrame:
    """Session windows per user: a session closes after ``gap`` of
    inactivity. State is one open session per active user, evicted once
    the watermark passes session end."""
    df = events.withWatermark("ts", watermark) if events.isStreaming else events
    return (
        df.groupBy(F.session_window("ts", gap).alias("w"), "user_id")
        .agg(F.count("*").alias("n_events"), F.sum("value").alias("session_value"))
        .select(
            "user_id",
            F.date_format(F.col("w.start"), "yyyy-MM-dd HH:mm:ss").alias("session_start"),
            F.date_format(F.col("w.end"), "yyyy-MM-dd HH:mm:ss").alias("session_end"),
            "n_events",
            "session_value",
        )
    )


# -- stateful ops ------------------------------------------------------------

def streaming_dedup(events: DataFrame, watermark: str = "2 hours") -> DataFrame:
    """Exactly-once event_ids within the watermark horizon.

    dropDuplicatesWithinWatermark keeps the seen-set bounded: an id is
    remembered only until the watermark passes its event time (exact
    global dedup over an unbounded stream would need unbounded state).
    """
    if events.isStreaming:
        return events.withWatermark("ts", watermark).dropDuplicatesWithinWatermark(
            ["event_id"]
        )
    return events.dropDuplicates(["event_id"])


_USER_STATS_SCHEMA = StructType(
    [
        StructField("user_id", LongType()),
        StructField("n_events", LongType()),
        StructField("total_value", DoubleType()),
        StructField("max_value", DoubleType()),
    ]
)

_USER_STATE_SCHEMA = StructType(
    [
        StructField("n", LongType()),
        StructField("total", DoubleType()),
        StructField("mx", DoubleType()),
    ]
)


def _update_user_stats(key, pdfs, state: GroupState):
    (user_id,) = key
    n, total, mx = state.get if state.exists else (0, 0.0, float("-inf"))
    for pdf in pdfs:
        n += len(pdf)
        total += float(pdf["value"].sum())
        mx = max(mx, float(pdf["value"].max()))
    state.update((n, total, mx))
    yield pd.DataFrame(
        {"user_id": [user_id], "n_events": [n], "total_value": [total], "max_value": [mx]}
    )


def user_running_stats(events: DataFrame) -> DataFrame:
    """Custom stateful operator: running per-user event stats via
    applyInPandasWithState (arrow-batched, one state tuple per user).

    Emits the updated running totals for every user seen in each
    micro-batch (update semantics).
    """
    return (
        events.groupBy("user_id")
        .applyInPandasWithState(
            _update_user_stats,
            outputStructType=_USER_STATS_SCHEMA,
            stateStructType=_USER_STATE_SCHEMA,
            outputMode="update",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )
