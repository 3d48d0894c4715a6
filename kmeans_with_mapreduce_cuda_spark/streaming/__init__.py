from .streams import (  # noqa: F401
    StreamingKMeans,
    dedup_stream,
    hourly_counts_stream,
    read_events_stream,
    running_user_totals,
    sessionize_stream,
    stream_assign_kmeans,
)
