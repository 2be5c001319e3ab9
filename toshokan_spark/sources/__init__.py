"""Sources: batch JSONL / stdin, Kafka batch + stream.

Reference: `src/commands/sources/` (trait at `mod.rs:27-44`)."""

from toshokan_spark.sources.jsonl import read_jsonl, read_stdin
from toshokan_spark.sources.kafka import kafka_batch, kafka_stream, parse_kafka_url

__all__ = ["read_jsonl", "read_stdin", "kafka_batch", "kafka_stream", "parse_kafka_url"]
