"""Structured Streaming surface.

The reference has no streaming (it is a batch job with a process pool,
eynollah.py:1994-2033); this module provides the streaming counterparts
of the engine's event-table operators so the same semantics run over
readStream sources: tumbling-window aggregation with watermarked late
data, and a custom stateful sessionizer (applyInPandasWithState).
"""

from eynollah_spark.streaming.windowed import (  # noqa: F401
    hourly_event_counts,
    read_events_stream,
    sessionize_stream,
)
