from .windowed import (
    stream_attribution_outer,
    stream_click_attribution,
    stream_dedup_keys,
    stream_enriched_counts,
    stream_session_windows,
    stream_sliding_counts,
    stream_window_counts,
    streaming_device_activity,
)
from .sessionize import sessionize_bounded, streaming_sessionize
from .spend import streaming_spend_sessions
from .joinview import stream_join_view
from .upsert import stream_upsert_latest
from .sketch_stream import stream_kmv_distinct
from .quarantine import stream_quarantine
from .topk_stream import stream_top_users

__all__ = [
    "stream_attribution_outer",
    "stream_kmv_distinct",
    "stream_quarantine",
    "stream_top_users",
    "stream_click_attribution",
    "stream_dedup_keys",
    "stream_enriched_counts",
    "stream_session_windows",
    "stream_window_counts",
    "stream_sliding_counts",
    "streaming_device_activity",
    "sessionize_bounded",
    "streaming_sessionize",
    "streaming_spend_sessions",
    "stream_join_view",
    "stream_upsert_latest",
]
