from .windowed import stream_click_attribution, stream_dedup_keys, stream_window_counts, streaming_device_activity
from .sessionize import streaming_sessionize

__all__ = [
    "stream_click_attribution",
    "stream_dedup_keys",
    "stream_window_counts",
    "streaming_device_activity",
    "streaming_sessionize",
]
