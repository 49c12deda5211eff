from .windowed import stream_window_counts, streaming_device_activity

__all__ = ["stream_window_counts", "streaming_device_activity"]
