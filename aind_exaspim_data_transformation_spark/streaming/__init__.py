from .events import (
    read_events_stream,
    stream_dedup,
    stream_session_windows,
    stream_tumbling_counts,
)

__all__ = [
    "read_events_stream",
    "stream_tumbling_counts",
    "stream_session_windows",
    "stream_dedup",
]
