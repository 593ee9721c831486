from .events import (
    run_streaming_dedup,
    run_streaming_enriched_agg,
    run_streaming_hopping_agg,
    run_streaming_sessionization,
    run_streaming_tumbling_agg,
    streaming_events_source,
)

__all__ = [
    "run_streaming_dedup",
    "run_streaming_enriched_agg",
    "run_streaming_hopping_agg",
    "run_streaming_sessionization",
    "run_streaming_tumbling_agg",
    "streaming_events_source",
]
