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


def session_windows(
    events: DataFrame,
    keys: Sequence[str],
    time_col: str = "ts",
    gap: str = "5 minutes",
    watermark: str = "30 minutes",
    aggs: tuple[Column, ...] = (),
) -> DataFrame:
    """Session windows — dynamic-gap windowing: a session is a maximal
    run of a key's events with no silence longer than *gap*; the
    window CLOSES when event time advances past last_event + gap (vs
    the fixed grid of :func:`windowed_counts`). This is the streaming
    analog of the batch `user_sessions` query (gap-based sessionization
    via lag/cumsum): same semantics, but incremental — state per open
    session only, merged as late rows bridge two sessions, finalized
    and evicted by the watermark.

    Works on batch DataFrames too (same plan); on a stream the
    watermark is REQUIRED by Spark for session windows in append mode
    (unbounded sessions would never finalize).
    """
    src = events.withWatermark(time_col, watermark) if events.isStreaming else events
    return src.groupBy(
        F.session_window(F.col(time_col), gap).alias("session"),
        *[F.col(k) for k in keys],
    ).agg(F.count(F.lit(1)).alias("n_events"), *aggs)


def stream_session_windows(
    events: DataFrame,
    out_path: str,
    checkpoint_dir: str,
    keys: Sequence[str],
    time_col: str = "ts",
    gap: str = "5 minutes",
    watermark: str = "30 minutes",
    available_now: bool = True,
) -> StreamingQuery:
    """Run sessionization as a stream into a Parquet sink: one row per
    FINALIZED session (append mode — a session is emitted exactly once,
    after the watermark passes its close)."""
    agg = session_windows(
        events, keys, time_col=time_col, gap=gap, watermark=watermark
    )
    flat = agg.select(
        F.col("session.start").alias("session_start"),
        F.col("session.end").alias("session_end"),
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
    return writer.start()


def stream_conversion_join(
    left: DataFrame,
    right: DataFrame,
    key: str,
    left_ts: str = "ts",
    right_ts: str = "ts",
    window_seconds: int = 300,
    left_watermark: str = "10 minutes",
    right_watermark: str = "10 minutes",
) -> DataFrame:
    """Watermarked STREAM-STREAM interval join: pair each left event
    with right events of the same *key* within
    ``(left_ts, left_ts + window_seconds]`` — both sides unbounded
    streams (the streaming form of ``operators.asof.window_join``).

    Spark buffers each side's rows in state until the OTHER side's
    watermark proves no more matches can arrive, then evicts — the
    time-range condition is what makes state bounded, so it is part
    of the JOIN condition, not a post-filter. State per key is
    O(events within watermark + window), independent of stream
    length.

    Returns the joined pairs (left columns as-is, right's payload
    prefixed ``r_``); works only on streaming DataFrames (batch
    callers use ``asof.window_join``).
    """
    l = left.withWatermark(left_ts, left_watermark).alias("l")
    r_pref = right.select(
        F.col(key).alias(f"r_{key}"),
        *[F.col(c).alias(f"r_{c}") for c in right.columns if c != key],
    )
    r = r_pref.withWatermark(f"r_{right_ts}", right_watermark).alias("r")
    cond = (
        (F.col(f"l.{key}") == F.col(f"r.r_{key}"))
        & (F.col(f"r.r_{right_ts}") > F.col(f"l.{left_ts}"))
        & (
            F.col(f"r.r_{right_ts}")
            <= F.col(f"l.{left_ts}") + F.expr(f"INTERVAL {int(window_seconds)} SECONDS")
        )
    )
    return l.join(r, cond, "inner").drop(f"r_{key}")


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


def stream_dedup_against_corpus(
    docs: DataFrame,
    corpus_sigs: DataFrame | None,
    out_path: str,
    checkpoint_dir: str,
    id_col: str = "doc_id",
    text_col: str = "text",
    threshold: float = 0.5,
    available_now: bool = True,
    hash_family: str = "xxhash",
    corpus_table: str | None = None,
    hot_bands_table: str | None = None,
    plan_sink: list | None = None,
    grow_store: bool = False,
    store_buckets: int = 64,
) -> StreamingQuery:
    """Streaming NEAR-duplicate filtering against a standing corpus:
    each micro-batch runs ``incremental_minhash_matches`` against the
    precomputed signature store and only docs with NO corpus match at
    ``threshold`` survive into the Parquet sink — the streaming
    steady-state of a training-data ingest pipeline (hash the corpus
    once; every arriving batch pays its own signatures plus a
    band-bucket probe).

    ``foreachBatch`` is the right seam: the match is a multi-stage
    batch join (band fan-out, bucket join, verify, window), which
    streaming's incremental planner cannot express — inside the hook
    each micro-batch is a plain DataFrame, so the exact batch
    operator is reused unchanged.

    The corpus side: pass ``corpus_table`` (the BUCKETED table written
    by :func:`~toshokan_spark.operators.dedup.write_bucketed_signatures`)
    plus ``hot_bands_table``
    (:func:`~toshokan_spark.operators.dedup.write_hot_band_buckets`)
    and the per-batch plan touches the corpus only as a bucketed scan —
    no Exchange on the stored side, asserted in ``tests/test_streaming.py``.
    A plain ``corpus_sigs`` DataFrame also works (tests, ad-hoc runs)
    but recomputes the hot-bucket counts every batch.

    Delivery: the sink is idempotent per micro-batch — each batch
    overwrites its own ``batch_id=<scope>-<n>`` partition directory, so
    a crash between the parquet write and the checkpoint commit replays
    the batch into the SAME directory instead of double-appending
    (exactly-once in the sink, the same has_batch idea as
    ``indexer.write_segment``). The scope token ties batch ids to this
    checkpoint lineage: a fresh checkpoint restarts numbering at 0 and
    must not collide with an old run's directories. Readers see
    ``batch_id`` as a string partition column via partition discovery.
    """
    import hashlib
    import os

    from toshokan_spark.operators.dedup import (
        incremental_minhash_matches,
        validate_incremental_store,
    )
    from toshokan_spark.storage import strip_file_scheme

    if corpus_sigs is None and corpus_table is None:
        raise ValueError(
            "stream_dedup_against_corpus needs a corpus: pass corpus_sigs "
            "or corpus_table"
        )
    if grow_store and corpus_table is None:
        raise ValueError(
            "grow_store=True needs corpus_table (a bucketed store to "
            "append survivors' signatures into)"
        )

    # validate the store ONCE at construction (probes are two tiny
    # jobs — running them inside foreachBatch would tax every
    # micro-batch for parameters that cannot change mid-stream)
    session = docs.sparkSession
    _corpus0 = session.table(corpus_table) if corpus_table else corpus_sigs
    _hot0 = session.table(hot_bands_table) if hot_bands_table else None
    validate_incremental_store(
        _corpus0, hash_family=hash_family, corpus_hot_bands=_hot0
    )

    # scope token: normalize the checkpoint path (scheme stripped,
    # symlinks resolved) so equivalent spellings — 'file:///x' vs
    # '/x' — of the SAME checkpoint produce the SAME batch_id dirs;
    # otherwise a crash-replay under the other spelling double-appends
    ckpt_scope = hashlib.sha256(
        os.path.realpath(strip_file_scheme(checkpoint_dir)).encode()
    ).hexdigest()[:12]

    def drop_corpus_dups(batch: DataFrame, batch_id: int) -> None:
        if batch.isEmpty():
            return
        spark = batch.sparkSession
        if corpus_table:
            corpus = spark.table(corpus_table)
            # REPLAY FENCE: a crash between append_bucketed_signatures
            # and the checkpoint commit replays this epoch against a
            # store that already holds THIS epoch's own __batch
            # partition. Without the fence, within-batch survivors
            # (A~B, both kept in the first run) re-match each other via
            # the store and are BOTH dropped — the replayed overwrite
            # then commits the shrunk set, losing rows from sink and
            # store alike. Excluding the current epoch's partition
            # makes a replay see exactly the pre-epoch store, so the
            # replayed output is byte-identical to the first run.
            if "__batch" in corpus.columns:
                corpus = corpus.filter(
                    F.col("__batch") != f"{ckpt_scope}-{batch_id}"
                )
        else:
            corpus = corpus_sigs
        hot = spark.table(hot_bands_table) if hot_bands_table else None
        matches = incremental_minhash_matches(
            batch,
            corpus,
            id_col=id_col,
            text_col=text_col,
            threshold=threshold,
            hash_family=hash_family,
            corpus_hot_bands=hot,
            plan_sink=plan_sink,
            validate=False,  # validated at construction above
        ).select(F.col("new_id").alias(id_col))
        kept = batch.join(matches, id_col, "left_anti")
        kept.write.mode("overwrite").parquet(
            f"{out_path}/batch_id={ckpt_scope}-{batch_id}"
        )
        if grow_store:
            # the self-maintaining loop: survivors' signatures join the
            # store so LATER batches are deduplicated against them too
            # (batch N+1 vs batch N, not just vs the seed corpus).
            # Growth is exactly-once in two halves: the append lands in
            # the store's __batch partition keyed by the same
            # scope+epoch token as the sink directory, in dynamic
            # partition-overwrite mode — a crash-replay of this epoch
            # overwrites its own partition instead of double-appending
            # signatures (which would double-count band-bucket members
            # toward max_band_freq) — AND the replay fence above keeps
            # the replayed match step from seeing this partition, so
            # the overwrite rewrites identical content.
            # The hot-band table stays maintenance-refreshed
            # (refresh_hot_band_buckets), same staleness contract as
            # append_bucketed_signatures.
            from toshokan_spark.operators.dedup import (
                append_bucketed_signatures,
                corpus_minhash_signatures,
            )

            kept_sigs = corpus_minhash_signatures(
                kept.select(F.col(id_col), F.col(text_col)),
                id_col=id_col,
                text_col=text_col,
                hash_family=hash_family,
            )
            append_bucketed_signatures(
                kept_sigs,
                corpus_table,
                buckets=store_buckets,
                batch_token=f"{ckpt_scope}-{batch_id}",
            )

    writer = (
        docs.writeStream.foreachBatch(drop_corpus_dups)
        .option("checkpointLocation", checkpoint_dir)
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()
