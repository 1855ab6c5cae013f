from .events_stream import event_schema, stream_events, windowed_counts  # noqa: F401
