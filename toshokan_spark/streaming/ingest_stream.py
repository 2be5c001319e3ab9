"""Streaming ingestion: micro-batches -> one segment per batch.

The Spark reshape of `toshokan index <index> kafka://... --stream`
(`/root/reference/src/commands/index.rs:106-124`): the reference
collects documents until ``commit_interval`` (default 30 s,
`src/args.rs:71-79`) then commits one index file per interval.
Structured Streaming's ``trigger(processingTime=...)`` is the same
micro-batch model; ``foreachBatch`` writes one Parquet segment +
manifest entry per non-empty micro-batch.

Delivery semantics: Spark commits stream offsets to
``checkpointLocation`` only after ``foreachBatch`` returns, i.e. after
data + manifest are durable -> at-least-once with possible duplicate
segments on crash, exactly the reference's contract
(`kafka_source.rs:380-394` commits checkpoints after upload; SURVEY
§2.7). Empty micro-batches are suppressed (`index.rs:164-170`).

Works with ANY streaming lines source (Kafka via sources/kafka.py,
file streams, rate+map in tests) — the sink logic is source-agnostic.
"""

from __future__ import annotations

import hashlib
import os
from typing import Optional

from pyspark.sql import DataFrame
from pyspark.sql.streaming import StreamingQuery

from toshokan_spark.catalog import FsCatalog
from toshokan_spark.indexer import write_segment
from toshokan_spark.ingest import ingest_projection


def stream_index(
    lines: DataFrame,
    catalog: FsCatalog,
    index_name: str,
    checkpoint_dir: str,
    commit_interval: str = "30 seconds",
    query_name: Optional[str] = None,
    available_now: bool = False,
    alerts_dir: Optional[str] = None,
) -> StreamingQuery:
    """Start the stream; returns the StreamingQuery handle.

    *lines* must be a streaming DataFrame with a string ``value``
    column (one JSON document per row). ``available_now=True`` drains
    everything currently available then stops (used by tests and
    catch-up runs); otherwise micro-batches fire every
    *commit_interval* like the reference's ``--stream`` loop.

    ``alerts_dir`` turns on streaming PERCOLATION: each micro-batch is
    additionally matched against the index's registered standing
    queries (``catalog.percolators`` — the stored-monitor set the
    ``percolator`` CLI manages) and the (id, query_id, batch)
    matches append as Parquet under *alerts_dir*. Monitors are
    re-read per batch, so a registration mid-stream applies from the
    next micro-batch — the alerting contract. The percolation is one
    extra width-Q projection over the already-projected batch (the
    batch is percolated, never the index), and an empty monitor set
    costs nothing."""
    config = catalog.get_index(index_name)
    # idempotence keys are scoped to the checkpoint: batch ids are only
    # unique within one checkpoint lineage (a fresh checkpoint restarts
    # at 0 and must not be deduplicated against the old one)
    ckpt_scope = hashlib.sha256(os.path.abspath(checkpoint_dir).encode()).hexdigest()[:12]

    def commit_batch(batch_df: DataFrame, batch_id: int) -> None:
        typed = ingest_projection(batch_df, config)
        if alerts_dir is not None:
            stored = list(catalog.percolators(index_name).items())
            if stored:
                from pyspark.sql import functions as F

                from toshokan_spark.search import percolate

                id_field = config.fields[0].name
                matches = percolate(typed, stored, config, id_field)
                # append-mode alerts: a replayed micro-batch may
                # re-emit its alerts (at-least-once alerting — alert
                # consumers dedup on (id, query_id, batch_id) if they
                # need exactly-once; the SEGMENT path stays exactly
                # once via the manifest batch_id)
                matches.withColumn(
                    "batch_id", F.lit(f"{ckpt_scope}:{batch_id}")
                ).write.mode("append").parquet(alerts_dir)
        # write_segment suppresses empty batches and appends the
        # manifest entry only after the Parquet data is durable; the
        # batch_id makes a checkpoint-replayed micro-batch a no-op
        # (exactly-once segments, vs the reference's at-least-once)
        write_segment(catalog, config, typed, batch_id=f"{ckpt_scope}:{batch_id}")

    writer = lines.writeStream.foreachBatch(commit_batch).option(
        "checkpointLocation", checkpoint_dir
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    else:
        writer = writer.trigger(processingTime=commit_interval)
    if query_name:
        writer = writer.queryName(query_name)
    return writer.start()
