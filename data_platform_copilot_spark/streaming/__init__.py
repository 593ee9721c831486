from .change_feed import (
    FeedBehindRetentionError,
    VersionedChangeFeed,
)
from .stream_source import (
    VersionedStreamDataSource,
    register_stream_source,
)
from .events import (
    run_streaming_dedup,
    run_streaming_enriched_agg,
    run_streaming_hopping_agg,
    run_streaming_sessionization,
    run_streaming_tumbling_agg,
    streaming_events_source,
)

__all__ = [
    "FeedBehindRetentionError",
    "VersionedChangeFeed",
    "VersionedStreamDataSource",
    "register_stream_source",
    "run_streaming_dedup",
    "run_streaming_enriched_agg",
    "run_streaming_hopping_agg",
    "run_streaming_sessionization",
    "run_streaming_tumbling_agg",
    "streaming_events_source",
]
