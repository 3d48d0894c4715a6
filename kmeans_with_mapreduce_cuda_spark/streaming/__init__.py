from .streams import (  # noqa: F401
    StreamingKMeans,
    dedup_stream,
    enriched_counts_stream,
    hourly_counts_stream,
    read_events_stream,
    running_user_totals,
    session_window_stream,
    sessionize_stream,
    sliding_counts_stream,
    stream_assign_kmeans,
    use_rocksdb_state,
    view_purchase_attribution_stream,
)
