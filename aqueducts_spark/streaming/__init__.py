from .ops import (
    file_stream_source,
    run_available_now,
    sessionize_stream,
    windowed_aggregate,
)

__all__ = [
    "file_stream_source",
    "windowed_aggregate",
    "sessionize_stream",
    "run_available_now",
]
