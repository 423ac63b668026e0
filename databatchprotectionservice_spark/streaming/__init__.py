from .pipeline import (
    dedup_stream,
    protect_stream,
    read_events_stream,
    session_window_stream,
    sessionize_stream,
    stream_stream_click_attribution,
    windowed_event_rollup,
    write_protected_stream,
)

__all__ = [
    "read_events_stream",
    "protect_stream",
    "windowed_event_rollup",
    "sessionize_stream",
    "session_window_stream",
    "dedup_stream",
    "stream_stream_click_attribution",
    "write_protected_stream",
]
