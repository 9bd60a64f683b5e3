from .incremental import (
    stream_event_counts,
    stream_session_windows,
    stream_validated_split,
)

__all__ = [
    "stream_event_counts",
    "stream_session_windows",
    "stream_validated_split",
]
