from .events_stream import event_schema, stream_events, windowed_counts  # noqa: F401
from .state import (  # noqa: F401
    HDFS_PROVIDER,
    ROCKSDB_PROVIDER,
    state_store_provider,
)
