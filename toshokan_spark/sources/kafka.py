"""Kafka sources.

Replaces the reference's 394-line rdkafka consumer
(`/root/reference/src/commands/sources/kafka_source.rs`) with Spark's
built-in Kafka connector — partition assignment, rebalance recovery,
offset checkpointing and backpressure are the connector's problem
(SURVEY §3.3). URL syntax parity: ``kafka://host:port/topic``
(`sources/mod.rs:46-63`).

* batch: ``startingOffsets=earliest`` consume-to-EOF, like the
  reference's non-stream mode (`kafka_source.rs:232-301`)
* stream: use with streaming/ingest_stream.py; offsets commit via
  ``checkpointLocation`` *after* the sink write -> the same
  at-least-once contract as the reference's checkpoint-after-upload
  (`kafka_source.rs:380-394`, `kafka_checkpoint.rs:59-85`)
* tombstone (null-value) messages are skipped
  (`kafka_source.rs:205-214`)

The Kafka connector JAR isn't bundled in this container, so these
fail at runtime with a clear message unless
``spark.jars.packages org.apache.spark:spark-sql-kafka-0-10...`` is
configured; unit tests cover URL parsing and the line-extraction
projection only.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def parse_kafka_url(url: str) -> tuple[str, str]:
    """``kafka://host:port/topic`` -> (bootstrap_servers, topic),
    mirroring `sources/mod.rs:46-63` / `kafka_source.rs:244-268`."""
    if not url.startswith("kafka://"):
        raise ValueError(f"not a kafka url: {url!r}")
    rest = url[len("kafka://"):]
    if "/" not in rest:
        raise ValueError(f"kafka url needs /topic: {url!r}")
    servers, topic = rest.split("/", 1)
    if not servers or not topic:
        raise ValueError(f"bad kafka url: {url!r}")
    return servers, topic


def _lines(df: DataFrame) -> DataFrame:
    # skip tombstones (`kafka_source.rs:205-214`), decode as UTF-8
    return (
        df.filter(F.col("value").isNotNull())
        .select(F.col("value").cast("string").alias("value"))
    )


def kafka_options(
    url: str,
    mode: str = "batch",
    starting_offsets: str | None = None,
    security: dict[str, str] | None = None,
) -> dict[str, str]:
    """Connector options for a ``kafka://`` URL — the exact settings
    the reference's consumer config encodes (`kafka_source.rs:244-268`:
    batch = earliest→EOF, stream = latest/checkpoint). Split out so the
    plumbing is unit-testable without a broker in the environment.

    ``security`` passes auth/TLS settings through to the connector
    with the required ``kafka.`` consumer-config prefix added when
    absent — e.g. ``{"security.protocol": "SASL_SSL",
    "sasl.mechanism": "SCRAM-SHA-512", "sasl.jaas.config": ...,
    "ssl.truststore.location": ...}``. Reserved read options
    (subscribe / offsets / bootstrap servers) cannot be overridden
    through it — a typo'd override would silently re-point the
    read."""
    servers, topic = parse_kafka_url(url)
    opts = {"kafka.bootstrap.servers": servers, "subscribe": topic}
    if mode == "batch":
        opts["startingOffsets"] = "earliest"
        opts["endingOffsets"] = "latest"
    elif mode == "stream":
        opts["startingOffsets"] = starting_offsets or "latest"
    else:
        raise ValueError(f"unknown kafka mode {mode!r}")
    for k, v in (security or {}).items():
        key = k if k.startswith("kafka.") else f"kafka.{k}"
        if key in ("kafka.bootstrap.servers",) or k in (
            "subscribe",
            "startingOffsets",
            "endingOffsets",
        ):
            raise ValueError(f"security option may not override {k!r}")
        opts[key] = v
    return opts


#: session conf keys for the connector seam: tests (and local dev
#: without a broker) swap the wire format for the fake_kafka emulator
#: while every line of THIS module still executes
FORMAT_CONF = "spark.toshokan.kafka.format"
EXTRA_OPT_PREFIX = "spark.toshokan.kafka.option."


def _format_and_extras(spark: SparkSession) -> tuple[str, dict[str, str]]:
    fmt = "kafka"
    try:
        fmt = spark.conf.get(FORMAT_CONF, "kafka")
    except Exception:
        pass
    extras: dict[str, str] = {}
    if fmt != "kafka":
        # pass-through options the substitute source needs (e.g. the
        # fake emulator's broker-log directory)
        for k, v in spark.sparkContext.getConf().getAll():
            if k.startswith(EXTRA_OPT_PREFIX):
                extras[k[len(EXTRA_OPT_PREFIX):]] = v
        for k in ("path",):
            try:
                extras[k] = spark.conf.get(EXTRA_OPT_PREFIX + k)
            except Exception:
                pass
    return fmt, extras


def kafka_batch(
    spark: SparkSession, url: str, security: dict[str, str] | None = None
) -> DataFrame:
    fmt, extras = _format_and_extras(spark)
    raw = (
        spark.read.format(fmt)
        .options(**kafka_options(url, "batch", security=security), **extras)
        .load()
    )
    return _lines(raw)


def kafka_stream(
    spark: SparkSession,
    url: str,
    starting_offsets: str = "latest",
    security: dict[str, str] | None = None,
) -> DataFrame:
    fmt, extras = _format_and_extras(spark)
    raw = (
        spark.readStream.format(fmt)
        .options(**kafka_options(url, "stream", starting_offsets, security=security), **extras)
        .load()
    )
    return _lines(raw)
