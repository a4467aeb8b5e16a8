from .ops import (  # noqa: F401
    near_dup_summary,
    session_window_features,
    stream_from_parquet_dir,
    stream_static_enrich,
    stream_stream_interval_join,
    streaming_dedup,
    streaming_near_dedup,
    streaming_session_counts,
    streaming_sessionize,
    windowed_event_counts,
)
