"""Structured Streaming operators (event-time windows + watermarks)."""

from ceneton_database_tools_spark.streaming.events import (  # noqa: F401
    events_stream,
    run_stream_to_batch,
)
