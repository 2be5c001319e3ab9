"""A broker-less Kafka stand-in built on Spark 4's Python DataSource
API — the closest this sandbox gets to the reference's live-broker
integration tests (`/root/reference/tests/kafka_indexing.rs:143-329`).

The "broker" is a directory of append-only topic logs:
``<dir>/<topic>.jsonl``, one message per line as
``{"key": str|null, "value": str|null}`` (``value: null`` is a
tombstone, like a compacted-topic delete). The emulator exposes the
Kafka connector's wire schema (key/value binary, topic, partition,
offset) for both batch and streaming reads, so the REAL
``sources/kafka.py`` code path — URL parsing, option building,
tombstone skip, UTF-8 decode — and the REAL streaming machinery —
checkpointed offsets, resume-after-restart, exactly-once manifest
commits — execute end-to-end in tests instead of being asserted by
configuration. Swap it in via ``spark.toshokan.kafka.format`` (see
``kafka.py``); production sessions never touch it.

Offsets are line numbers (single partition 0): ``startingOffsets``
honors ``earliest``/``latest`` exactly as the connector does, batch
reads run earliest -> current EOF, and the stream reader hands Spark
``{"offset": N}`` checkpoints — a restarted query resumes from its
checkpoint, not from the log head.
"""

from __future__ import annotations

import json
import os
from typing import Iterator, Tuple

from pyspark.sql.datasource import (
    DataSource,
    DataSourceReader,
    InputPartition,
    SimpleDataSourceStreamReader,
)
from pyspark.sql.types import StructType

SCHEMA = (
    "key binary, value binary, topic string, partition int, offset bigint"
)


def _topic_file(options: dict) -> str:
    d = options.get("path")
    topic = options.get("subscribe")
    if not d or not topic:
        raise ValueError("fake_kafka needs 'path' and 'subscribe' options")
    return os.path.join(d, f"{topic}.jsonl")


def _read_log(path: str) -> list[dict]:
    if not os.path.exists(path):
        return []
    with open(path, encoding="utf-8") as f:
        return [json.loads(ln) for ln in f if ln.strip()]


def _row(topic: str, offset: int, msg: dict) -> Tuple:
    key = msg.get("key")
    val = msg.get("value")
    return (
        key.encode("utf-8") if key is not None else None,
        val.encode("utf-8") if val is not None else None,
        topic,
        0,
        offset,
    )


class _BatchReader(DataSourceReader):
    def __init__(self, options: dict):
        self.options = options

    def read(self, partition: InputPartition) -> Iterator[Tuple]:
        topic = self.options["subscribe"]
        msgs = _read_log(_topic_file(self.options))
        # batch mode: earliest -> EOF, the connector's
        # startingOffsets=earliest / endingOffsets=latest contract
        start = 0
        if self.options.get("startingOffsets", "earliest") == "latest":
            start = len(msgs)
        for i, m in enumerate(msgs[start:], start=start):
            yield _row(topic, i, m)


class _StreamReader(SimpleDataSourceStreamReader):
    def __init__(self, options: dict):
        self.options = options

    def initialOffset(self) -> dict:
        if self.options.get("startingOffsets", "latest") == "earliest":
            return {"offset": 0}
        return {"offset": len(_read_log(_topic_file(self.options)))}

    def read(self, start: dict) -> Tuple[Iterator[Tuple], dict]:
        topic = self.options["subscribe"]
        msgs = _read_log(_topic_file(self.options))
        lo = int(start["offset"])
        rows = iter([_row(topic, i, m) for i, m in enumerate(msgs[lo:], start=lo)])
        return rows, {"offset": len(msgs)}

    def readBetweenOffsets(self, start: dict, end: dict) -> Iterator[Tuple]:
        # checkpoint replay of a committed-but-unprocessed range
        topic = self.options["subscribe"]
        msgs = _read_log(_topic_file(self.options))
        lo, hi = int(start["offset"]), int(end["offset"])
        return iter([_row(topic, i, m) for i, m in enumerate(msgs[lo:hi], start=lo)])


class FakeKafkaDataSource(DataSource):
    @classmethod
    def name(cls) -> str:
        return "fake_kafka"

    def schema(self) -> str:
        return SCHEMA

    def reader(self, schema: StructType) -> DataSourceReader:
        return _BatchReader(self.options)

    def simpleStreamReader(self, schema: StructType) -> SimpleDataSourceStreamReader:
        return _StreamReader(self.options)


def register(spark) -> None:
    spark.dataSource.register(FakeKafkaDataSource)
