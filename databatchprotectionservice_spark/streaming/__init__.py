from .pipeline import (
    protect_stream,
    read_events_stream,
    sessionize_stream,
    windowed_event_rollup,
)

__all__ = [
    "read_events_stream",
    "protect_stream",
    "windowed_event_rollup",
    "sessionize_stream",
]
