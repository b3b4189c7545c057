from kowari_spark.streaming.events import (
    EVENT_SCHEMA,
    hourly_rollup,
    read_events_stream,
    session_rollup,
    sliding_rollup,
    streaming_dedup,
    user_running_stats,
)
from kowari_spark.streaming.ingest import stream_into_lsh_layout, stream_vectors_into

__all__ = [
    "EVENT_SCHEMA",
    "read_events_stream",
    "hourly_rollup",
    "sliding_rollup",
    "session_rollup",
    "streaming_dedup",
    "user_running_stats",
    "stream_vectors_into",
    "stream_into_lsh_layout",
]
