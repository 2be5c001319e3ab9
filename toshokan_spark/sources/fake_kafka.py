"""A broker-less Kafka stand-in built on Spark 4's Python DataSource
API — the closest this sandbox gets to the reference's live-broker
integration tests (`/root/reference/tests/kafka_indexing.rs:143-329`).

The "broker" is a directory of append-only topic logs. A topic is
either a single file ``<dir>/<topic>.jsonl`` (one partition, id 0) or
a sharded set ``<dir>/<topic>-p<N>.jsonl`` (one file per partition,
like a real topic's partition logs). Messages are one per line as
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

Offsets are per-partition line numbers, exactly the connector's
model: batch reads plan ONE input split per partition (earliest ->
current EOF, executed in parallel like the real source's
topic-partition splits), and the stream reader hands Spark
``{"<pid>": N, ...}`` checkpoints — a restarted query resumes every
partition from its own checkpointed offset, not from the log head.
``startingOffsets`` honors ``earliest``/``latest`` per partition.
Partitions that appear after a checkpoint was taken resume from 0
(the connector's new-partition behavior).
"""

from __future__ import annotations

import glob
import json
import os
import re
from typing import Iterator, List, Tuple

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


def _broker_layout(options: dict) -> List[Tuple[int, str]]:
    """[(partition_id, log_path)] for the topic — the sharded
    ``<topic>-p<N>.jsonl`` layout when present, else the single-file
    ``<topic>.jsonl`` as partition 0."""
    d = options.get("path")
    topic = options.get("subscribe")
    if not d or not topic:
        raise ValueError("fake_kafka needs 'path' and 'subscribe' options")
    sharded = []
    for p in glob.glob(os.path.join(d, f"{topic}-p*.jsonl")):
        m = re.fullmatch(rf"{re.escape(topic)}-p(\d+)\.jsonl", os.path.basename(p))
        if m:
            sharded.append((int(m.group(1)), p))
    if sharded:
        return sorted(sharded)
    return [(0, os.path.join(d, f"{topic}.jsonl"))]


def _read_log(path: str) -> list[dict]:
    if not os.path.exists(path):
        return []
    with open(path, encoding="utf-8") as f:
        return [json.loads(ln) for ln in f if ln.strip()]


def _row(topic: str, pid: int, offset: int, msg: dict) -> Tuple:
    key = msg.get("key")
    val = msg.get("value")
    return (
        key.encode("utf-8") if key is not None else None,
        val.encode("utf-8") if val is not None else None,
        topic,
        pid,
        offset,
    )


class _TopicPartition(InputPartition):
    def __init__(self, pid: int, path: str):
        self.pid = pid
        self.path = path


class _BatchReader(DataSourceReader):
    def __init__(self, options: dict):
        self.options = options

    def partitions(self) -> List[InputPartition]:
        # one input split per topic partition — the planner
        # parallelizes partitions exactly like the real connector's
        # topic-partition splits
        return [_TopicPartition(pid, p) for pid, p in _broker_layout(self.options)]

    def read(self, partition: _TopicPartition) -> Iterator[Tuple]:
        topic = self.options["subscribe"]
        msgs = _read_log(partition.path)
        # batch mode: earliest -> EOF, the connector's
        # startingOffsets=earliest / endingOffsets=latest contract
        start = 0
        if self.options.get("startingOffsets", "earliest") == "latest":
            start = len(msgs)
        for i, m in enumerate(msgs[start:], start=start):
            yield _row(topic, partition.pid, i, m)


class _StreamReader(SimpleDataSourceStreamReader):
    def __init__(self, options: dict):
        self.options = options

    def _eof(self) -> dict:
        return {
            str(pid): len(_read_log(p)) for pid, p in _broker_layout(self.options)
        }

    def initialOffset(self) -> dict:
        if self.options.get("startingOffsets", "latest") == "earliest":
            return {str(pid): 0 for pid, _ in _broker_layout(self.options)}
        return self._eof()

    def read(self, start: dict) -> Tuple[Iterator[Tuple], dict]:
        topic = self.options["subscribe"]
        end = {}
        rows: list[Tuple] = []
        for pid, path in _broker_layout(self.options):
            msgs = _read_log(path)
            # a partition created after the checkpoint starts at 0
            lo = int(start.get(str(pid), 0))
            rows.extend(
                _row(topic, pid, i, m) for i, m in enumerate(msgs[lo:], start=lo)
            )
            end[str(pid)] = len(msgs)
        return iter(rows), end

    def readBetweenOffsets(self, start: dict, end: dict) -> Iterator[Tuple]:
        # checkpoint replay of a committed-but-unprocessed range,
        # per partition
        topic = self.options["subscribe"]
        rows: list[Tuple] = []
        for pid, path in _broker_layout(self.options):
            msgs = _read_log(path)
            lo = int(start.get(str(pid), 0))
            # a partition absent from the committed `end` checkpoint did
            # not exist when that range was committed, so it contributes
            # NOTHING to its replay (defaulting to len(msgs) would both
            # replay it here and re-read it from 0 in the next read(),
            # delivering its messages under two batch_ids)
            hi = int(end.get(str(pid), 0))
            rows.extend(
                _row(topic, pid, i, m) for i, m in enumerate(msgs[lo:hi], start=lo)
            )
        return iter(rows)


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
