"""Windowed streaming aggregation with watermark-based late-data
handling — capability the reference lacks entirely (its only window is
the tumbling commit-interval batch and it has no late-data story,
SURVEY §2.8); in Spark it is declarative configuration.

Shape: ``withWatermark`` bounds aggregation state (a window finalizes
— and its state is dropped — once event time passes window_end +
watermark), so state size is O(active windows × keys) regardless of
stream length. Rows later than the watermark are dropped, the
standard at-most-this-late contract. With the parquet sink (append
mode) each finalized window is emitted exactly once.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming import StreamingQuery


def windowed_counts(
    events: DataFrame,
    time_col: str = "ts",
    window_duration: str = "1 hour",
    slide: str | None = None,
    watermark: str = "30 minutes",
    keys: tuple[str, ...] = (),
    aggs: tuple[Column, ...] = (),
) -> DataFrame:
    """Tumbling (or sliding, with *slide*) event-time window counts.

    Works on both batch and streaming DataFrames (same plan — that's
    the point of the unified model); on a stream the watermark bounds
    state and admits late rows up to *watermark*.
    """
    win = (
        F.window(F.col(time_col), window_duration, slide)
        if slide
        else F.window(F.col(time_col), window_duration)
    )
    src = events.withWatermark(time_col, watermark) if events.isStreaming else events
    return src.groupBy(win.alias("win"), *[F.col(k) for k in keys]).agg(
        F.count(F.lit(1)).alias("n_events"), *aggs
    )


def dedup_stream(
    events: DataFrame,
    keys: Sequence[str],
    time_col: str = "ts",
    watermark: str = "1 hour",
) -> DataFrame:
    """Streaming exact deduplication: keep the first row per key,
    dropping re-occurrences that arrive within *watermark* of event
    time. State is bounded — a key's entry is evicted once the
    watermark passes it (vs plain ``dropDuplicates``, whose state
    grows forever on an unbounded stream). The batch analog is
    ``operators.dedup.deduplicate_exact``."""
    return events.withWatermark(time_col, watermark).dropDuplicatesWithinWatermark(
        list(keys)
    )


def stream_windowed_counts(
    events: DataFrame,
    out_path: str,
    checkpoint_dir: str,
    time_col: str = "ts",
    window_duration: str = "1 hour",
    watermark: str = "30 minutes",
    keys: tuple[str, ...] = (),
    available_now: bool = True,
    commit_interval: str = "30 seconds",
) -> StreamingQuery:
    """Run the windowed aggregation as a stream into a Parquet sink
    (append mode: one row per finalized window, exactly once)."""
    agg = windowed_counts(
        events,
        time_col=time_col,
        window_duration=window_duration,
        watermark=watermark,
        keys=keys,
    )
    flat = agg.select(
        F.col("win.start").alias("window_start"),
        F.col("win.end").alias("window_end"),
        *[F.col(k) for k in keys],
        "n_events",
    )
    writer = (
        flat.writeStream.format("parquet")
        .outputMode("append")
        .option("path", out_path)
        .option("checkpointLocation", checkpoint_dir)
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    else:
        writer = writer.trigger(processingTime=commit_interval)
    return writer.start()
