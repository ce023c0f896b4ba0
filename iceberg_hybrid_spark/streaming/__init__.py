from .sync_stream import (
    EVENT_SCHEMA,
    read_event_stream,
    session_window_counts,
    status_transition_tracker,
    sync_events_foreach_batch,
    windowed_event_counts,
)

__all__ = [
    "EVENT_SCHEMA",
    "read_event_stream",
    "windowed_event_counts",
    "session_window_counts",
    "status_transition_tracker",
    "sync_events_foreach_batch",
]
