from .ops import (
    dedup_stream,
    dedup_stream_within_watermark,
    distinct_sketch_stream,
    merge_stream_into_table,
    interval_join_stream,
    quota_stream,
    file_stream_source,
    quantile_sketch_stream,
    run_available_now,
    running_counts_stream,
    sessionize_stream,
    windowed_aggregate,
)

__all__ = [
    "file_stream_source",
    "windowed_aggregate",
    "sessionize_stream",
    "run_available_now",
    "quantile_sketch_stream",
    "distinct_sketch_stream",
    "dedup_stream",
    "dedup_stream_within_watermark",
    "running_counts_stream",
    "quota_stream",
    "interval_join_stream",
    "merge_stream_into_table",
]
