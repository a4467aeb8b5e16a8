from .ops import (  # noqa: F401
    session_window_features,
    stream_from_parquet_dir,
    streaming_dedup,
    streaming_session_counts,
    windowed_event_counts,
)
