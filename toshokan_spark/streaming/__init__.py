"""Structured Streaming ingestion."""

from toshokan_spark.streaming.ingest_stream import stream_index

__all__ = ["stream_index"]
