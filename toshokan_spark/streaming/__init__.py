"""Structured Streaming: segment ingestion + windowed aggregation."""

from toshokan_spark.streaming.ingest_stream import stream_index
from toshokan_spark.streaming.stateful import (
    bottomk_sample_and_estimate,
    heavy_hitters_topk,
    hll_distinct_estimate,
    running_totals,
    streaming_bottomk_sample,
    streaming_distinct_count,
    streaming_heavy_hitters,
    streaming_quantile_histogram,
    quantiles_from_histogram,
)
from toshokan_spark.streaming.windowed import (
    dedup_stream,
    session_windows,
    stream_conversion_join,
    stream_session_windows,
    stream_windowed_counts,
    windowed_counts,
)

__all__ = [
    "bottomk_sample_and_estimate",
    "dedup_stream",
    "heavy_hitters_topk",
    "hll_distinct_estimate",
    "running_totals",
    "streaming_bottomk_sample",
    "streaming_distinct_count",
    "session_windows",
    "stream_conversion_join",
    "stream_index",
    "stream_session_windows",
    "stream_windowed_counts",
    "streaming_heavy_hitters",
    "streaming_quantile_histogram",
    "quantiles_from_histogram",
    "windowed_counts",
]
