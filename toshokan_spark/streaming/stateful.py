"""Custom stateful streaming operator via ``applyInPandasWithState``
— the escape hatch for aggregation logic the built-in windowed/
deduplication operators can't express (running totals emitted per
batch, custom eviction, cross-batch machine state).

The reference has no stateful processing at all (its only cross-batch
state is Kafka offsets, SURVEY §2.7); this demonstrates the pattern a
training-data pipeline needs for e.g. per-source ingest accounting or
quota enforcement over an unbounded stream.

Scale shape: state lives in Spark's state store partitioned by key —
each micro-batch touches only the keys present in the batch, Arrow
ships per-group batches to Python, and state size is O(distinct keys)
(bound it with a timeout in production)."""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import types as T
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout


def running_totals(
    events: DataFrame,
    key_col: str = "k",
    value_col: str = "v",
) -> DataFrame:
    """Per-key running (count, sum) over the whole stream, one output
    row per key per micro-batch in which the key appears."""
    out_schema = T.StructType(
        [
            T.StructField(key_col, T.StringType()),
            T.StructField("n_events", T.LongType()),
            T.StructField("total", T.DoubleType()),
        ]
    )
    state_schema = T.StructType(
        [T.StructField("n", T.LongType()), T.StructField("tot", T.DoubleType())]
    )

    def update(
        key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        n, tot = state.get if state.exists else (0, 0.0)
        for pdf in pdfs:
            n += len(pdf)
            tot += float(pdf[value_col].fillna(0.0).sum())
        state.update((n, tot))
        yield pd.DataFrame({key_col: [key[0]], "n_events": [n], "total": [tot]})

    return events.groupBy(key_col).applyInPandasWithState(
        update, out_schema, state_schema, "append", GroupStateTimeout.NoTimeout
    )


def streaming_heavy_hitters(
    events: DataFrame,
    key_col: str = "k",
    capacity: int = 16,
    shards: int = 8,
) -> DataFrame:
    """Approximate per-stream heavy hitters with BOUNDED state: a
    SpaceSaving (Metwally et al. 2005) summary per hash shard,
    maintained across micro-batches in the state store. This is the
    custom-eviction pattern the module docstring promises: when a
    shard's table is full, the minimum-count entry is evicted and the
    newcomer inherits its count as overestimation error — state stays
    O(shards x capacity) forever, whatever the stream's cardinality.

    Output: one row per (shard, item) of each UPDATED shard per
    micro-batch — ``count`` (upper bound on the item's true shard
    count), ``err`` (its maximum overestimation, so ``count - err``
    lower-bounds the truth), and ``epoch`` (the shard's monotone
    update counter: in an append sink, the rows with each shard's MAX
    epoch are its current summary, and stale epochs — including items
    since evicted — are ignored by the reader). The SpaceSaving
    guarantee carries per shard: any item whose true count exceeds
    shard_stream_length / capacity is guaranteed present. Merge
    shards with :func:`heavy_hitters_topk` over the sink — items
    never cross shards (hash-partitioned), so no cross-shard summary
    merge is ever needed.

    Scale: the stream shuffles once on the shard key (``shards``
    should be >= executor parallelism); Arrow ships per-shard batches
    to Python; eviction ties break lexicographically so replays are
    deterministic.

    MIGRATION: the epoch field was added to both the state and the
    output schema. A stream restarted from a checkpoint written
    before that change fails Spark's state-schema compatibility check
    — restart such a stream with a FRESH checkpoint (counts restart
    from the sink's last summaries); and :func:`heavy_hitters_topk`
    requires the ``epoch`` column, so pre-change sink rows must be
    dropped or backfilled with epoch 0."""
    from pyspark.sql import functions as F

    out_schema = T.StructType(
        [
            T.StructField("shard", T.LongType()),
            T.StructField("item", T.StringType()),
            T.StructField("count", T.LongType()),
            T.StructField("err", T.LongType()),
            T.StructField("epoch", T.LongType()),
        ]
    )
    state_schema = T.StructType(
        [
            T.StructField("items", T.ArrayType(T.StringType())),
            T.StructField("counts", T.ArrayType(T.LongType())),
            T.StructField("errs", T.ArrayType(T.LongType())),
            T.StructField("epoch", T.LongType()),
        ]
    )

    def update(
        key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        if state.exists:
            items, counts, errs, epoch = state.get
            table = {
                it: [int(c), int(er)]
                for it, c, er in zip(items, counts, errs)
            }
            epoch = int(epoch)
        else:
            table = {}
            epoch = 0
        for pdf in pdfs:
            for item in pdf["item"]:
                if item is None:
                    continue
                if item in table:
                    table[item][0] += 1
                elif len(table) < capacity:
                    table[item] = [1, 0]
                else:
                    # SpaceSaving eviction: replace the min-count entry
                    # (ties -> lexicographically smallest item, so a
                    # replayed batch evicts identically); the newcomer
                    # inherits min_count as its overestimation error
                    victim = min(table, key=lambda it: (table[it][0], it))
                    m = table[victim][0]
                    del table[victim]
                    table[item] = [m + 1, m]
        ordered = sorted(table.items(), key=lambda kv: (-kv[1][0], kv[0]))
        epoch += 1
        state.update((
            [it for it, _ in ordered],
            [c for _, (c, _) in ordered],
            [er for _, (_, er) in ordered],
            epoch,
        ))
        yield pd.DataFrame(
            {
                "shard": [key[0]] * len(ordered),
                "item": [it for it, _ in ordered],
                "count": [c for _, (c, _) in ordered],
                "err": [er for _, (_, er) in ordered],
                "epoch": [epoch] * len(ordered),
            }
        )

    ev = events.select(
        F.col(key_col).cast("string").alias("item"),
        F.pmod(F.xxhash64(F.col(key_col).cast("string")), F.lit(shards)).alias(
            "__shard"
        ),
    )
    return ev.groupBy("__shard").applyInPandasWithState(
        update, out_schema, state_schema, "append", GroupStateTimeout.NoTimeout
    )


def heavy_hitters_topk(summaries: DataFrame, k: int = 10) -> DataFrame:
    """Global top-k over a :func:`streaming_heavy_hitters` sink — the
    batch half that makes the operator consumable end-to-end.

    *summaries* is the append sink (or any collection of emitted
    summary rows): an append sink accumulates one summary per shard
    per micro-batch, and an item EVICTED in a later epoch must not be
    resurrected by its stale rows — so the reader first keeps only
    each shard's max-``epoch`` rows (its current summary), then ranks.

    Because items are hash-partitioned, an item's global count IS its
    shard count — merging shards is a plain union, never a summary
    merge. Output per item:

    * ``count``   — upper bound on the true count;
    * ``count_lb``— ``count - err``, lower bound on the true count
      (the SpaceSaving guarantee rule);
    * exact when ``err`` is 0 (the item was never an eviction heir).

    Ranking is by upper bound, ties by item, which preserves the
    exact-if-frequent guarantee: any item with true count >
    shard_len/capacity is in its shard's table, hence in this union.
    Cost: the sink holds O(shards × capacity) rows per epoch — the
    whole read is summary-sized, never stream-sized."""
    from pyspark.sql import functions as F

    latest = summaries.join(
        F.broadcast(
            summaries.groupBy("shard").agg(F.max("epoch").alias("epoch"))
        ),
        ["shard", "epoch"],
    )
    return (
        latest.select(
            "item",
            "count",
            (F.col("count") - F.col("err")).alias("count_lb"),
            "err",
            "shard",
        )
        .orderBy(F.col("count").desc(), F.col("item").asc())
        .limit(k)
    )


def streaming_distinct_count(
    events: DataFrame,
    key_col: str = "k",
    precision: int = 12,
    shards: int = 8,
) -> DataFrame:
    """Stream-lifetime approximate distinct count with BOUNDED state:
    a HyperLogLog register file (Flajolet et al. 2007) per hash
    shard, maintained across micro-batches — the cardinality sibling
    of :func:`streaming_heavy_hitters` (state O(shards × 2^precision)
    bytes forever, whatever the stream's cardinality; standard error
    ≈ 1.04/√2^precision, ~1.6% at the default 12).

    The 64-bit value hash is computed JVM-side (``xxhash64``) BEFORE
    the Arrow crossing; the Python side only folds hashed longs into
    registers. Shard = low bits, register index = top ``precision``
    bits, rank = leading zeros of the remainder — so the union of all
    shards' registers is EXACTLY the register file a single global
    HLL would hold (each value lands in one shard but its register
    position is shard-independent), and :func:`hll_distinct_estimate`
    merges by elementwise max, never by adding per-shard estimates.

    Output per updated shard per micro-batch: ``(shard, epoch,
    registers binary(2^precision))`` — epoch-stamped like the heavy
    hitters sink so an append sink has a well-defined current
    summary."""
    from pyspark.sql import functions as F

    if not 4 <= precision <= 16:
        raise ValueError(f"precision must be in [4, 16], got {precision}")
    m = 1 << precision

    out_schema = T.StructType(
        [
            T.StructField("shard", T.LongType()),
            T.StructField("epoch", T.LongType()),
            T.StructField("registers", T.BinaryType()),
        ]
    )
    state_schema = T.StructType(
        [
            T.StructField("registers", T.BinaryType()),
            T.StructField("epoch", T.LongType()),
        ]
    )
    rem_bits = 64 - precision
    rem_mask = (1 << rem_bits) - 1

    def update(
        key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        if state.exists:
            regs_b, epoch = state.get
            regs = bytearray(regs_b)
            epoch = int(epoch)
        else:
            regs = bytearray(m)
            epoch = 0
        for pdf in pdfs:
            for h in pdf["h"]:
                if h is None:
                    continue
                u = int(h) & 0xFFFFFFFFFFFFFFFF
                idx = u >> rem_bits
                rem = u & rem_mask
                # rank: leading-zero count of the remainder within its
                # rem_bits field, + 1; an all-zero remainder saturates
                rank = rem_bits - rem.bit_length() + 1
                if rank > regs[idx]:
                    regs[idx] = min(rank, 255)
        epoch += 1
        state.update((bytes(regs), epoch))
        yield pd.DataFrame(
            {"shard": [key[0]], "epoch": [epoch], "registers": [bytes(regs)]}
        )

    ev = events.select(
        F.xxhash64(F.col(key_col).cast("string")).alias("h"),
        F.pmod(F.xxhash64(F.col(key_col).cast("string")), F.lit(shards)).alias(
            "__shard"
        ),
    )
    return ev.groupBy("__shard").applyInPandasWithState(
        update, out_schema, state_schema, "append", GroupStateTimeout.NoTimeout
    )


def hll_distinct_estimate(summaries: DataFrame) -> float:
    """Merge a :func:`streaming_distinct_count` sink into ONE
    cardinality estimate: keep each shard's max-epoch registers,
    elementwise-max across shards (valid because register positions
    are shard-independent — see the operator docstring), then the
    standard HLL estimator with the small-range linear-counting
    correction. The read is register-file-sized (shards × 2^p bytes),
    never stream-sized; the collect is model-sized by construction."""
    import math

    from pyspark.sql import functions as F

    latest = summaries.join(
        F.broadcast(
            summaries.groupBy("shard").agg(F.max("epoch").alias("epoch"))
        ),
        ["shard", "epoch"],
    )
    rows = latest.select("registers").collect()
    if not rows:
        return 0.0
    m = len(rows[0].registers)
    merged = bytearray(m)
    for r in rows:
        regs = r.registers
        for i in range(m):
            if regs[i] > merged[i]:
                merged[i] = regs[i]
    # Flajolet et al. 2007 estimator
    alpha = 0.7213 / (1.0 + 1.079 / m)
    inv_sum = sum(2.0 ** -v for v in merged)
    raw = alpha * m * m / inv_sum
    zeros = merged.count(0)
    if raw <= 2.5 * m and zeros:
        return m * math.log(m / zeros)  # linear counting
    return raw


def streaming_bottomk_sample(
    events: DataFrame,
    key_col: str = "k",
    k: int = 64,
    shards: int = 8,
) -> DataFrame:
    """Stream-lifetime uniform sample of DISTINCT keys with bounded
    state: a bottom-k sketch (Cohen & Kaplan 2007) per hash shard —
    keep the ``k`` smallest ``xxhash64`` values ever seen. Because the
    hash is a fixed uniform permutation of the key space, the kept
    keys are a uniform without-replacement sample of the distinct
    keys, the sketch is DETERMINISTIC (same stream content → same
    sample, any arrival order — exactly testable, unlike an RNG
    reservoir), repeats dedupe for free, and merging shards is a
    plain union-then-bottom-k.

    State: O(shards × k) forever. Output per updated shard per
    micro-batch: the shard's current bottom-k as ``(shard, epoch,
    item, h)`` rows. Read the sink with
    :func:`bottomk_sample_and_estimate`, which also turns the k-th
    smallest hash into a distinct-count estimate — the classic KMV
    estimator ``(k-1) · 2^64 / h_(k)`` — cross-checking
    :func:`streaming_distinct_count` with an entirely different
    sketch family."""
    from pyspark.sql import functions as F

    out_schema = T.StructType(
        [
            T.StructField("shard", T.LongType()),
            T.StructField("epoch", T.LongType()),
            T.StructField("item", T.StringType()),
            T.StructField("h", T.LongType()),
        ]
    )
    state_schema = T.StructType(
        [
            T.StructField("items", T.ArrayType(T.StringType())),
            T.StructField("hs", T.ArrayType(T.LongType())),
            T.StructField("epoch", T.LongType()),
        ]
    )

    def update(
        key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        if state.exists:
            items, hs, epoch = state.get
            table = dict(zip(items, hs))
            epoch = int(epoch)
        else:
            table = {}
            epoch = 0
        for pdf in pdfs:
            for item, h in zip(pdf["item"], pdf["h"]):
                if item is None or item in table:
                    continue
                table[item] = int(h)
        # keep the k smallest hashes (ties impossible per item; equal
        # hashes across items break by item for determinism)
        kept = sorted(table.items(), key=lambda kv: (kv[1], kv[0]))[:k]
        epoch += 1
        state.update((
            [it for it, _ in kept],
            [h for _, h in kept],
            epoch,
        ))
        yield pd.DataFrame(
            {
                "shard": [key[0]] * len(kept),
                "epoch": [epoch] * len(kept),
                "item": [it for it, _ in kept],
                "h": [h for _, h in kept],
            }
        )

    ev = events.select(
        F.col(key_col).cast("string").alias("item"),
        F.xxhash64(F.col(key_col).cast("string")).alias("h"),
        F.pmod(F.xxhash64(F.col(key_col).cast("string")), F.lit(shards)).alias(
            "__shard"
        ),
    )
    return ev.groupBy("__shard").applyInPandasWithState(
        update, out_schema, state_schema, "append", GroupStateTimeout.NoTimeout
    )


def bottomk_sample_and_estimate(summaries: DataFrame, k: int) -> dict:
    """Merge a :func:`streaming_bottomk_sample` sink: latest epoch per
    shard, union, global bottom-k. Returns ``{"sample": [items...],
    "distinct_estimate": float}`` — the KMV estimate uses the k-th
    smallest hash mapped to [0, 1) over the full signed-64 range;
    with fewer than k distinct keys the sample IS the exact distinct
    set and the estimate its exact size. Reads are sketch-sized."""
    from pyspark.sql import functions as F

    latest = summaries.join(
        F.broadcast(
            summaries.groupBy("shard").agg(F.max("epoch").alias("epoch"))
        ),
        ["shard", "epoch"],
    )
    rows = sorted(
        ((r.h, r.item) for r in latest.select("h", "item").collect())
    )
    kept = rows[:k]
    if len(kept) < k:
        return {
            "sample": [it for _, it in kept],
            "distinct_estimate": float(len(kept)),
        }
    # map signed xxhash64 onto [0, 1): (h - MIN) / 2^64
    frac = (kept[-1][0] + (1 << 63)) / float(1 << 64)
    return {
        "sample": [it for _, it in kept],
        "distinct_estimate": (k - 1) / frac if frac > 0 else float(k),
    }


def streaming_quantile_histogram(
    events: DataFrame,
    value_col: str = "v",
    lo: float = 0.0,
    hi: float = 1000.0,
    n_bins: int = 64,
    shards: int = 8,
) -> DataFrame:
    """Stream-lifetime approximate QUANTILES with bounded state: a
    fixed-width bin histogram per hash shard, maintained across
    micro-batches — the percentile sibling of
    :func:`streaming_distinct_count` (state O(shards × n_bins × 8)
    bytes forever; quantile error ≤ one bin width of the value
    range, the classic mergeable-histogram trade).

    Bin assignment runs JVM-side BEFORE the Arrow crossing (a clamp +
    floor column expression — out-of-range values saturate into the
    edge bins, so the sketch never drops data, it only widens the
    edge bins' error). Python folds pre-binned integers into a count
    array. Counts are ADDITIVE across shards and batches, so the
    merged histogram equals the one a single global sketch would
    hold — :func:`quantiles_from_histogram` just sums register files.

    Output per updated shard per micro-batch: ``(shard, epoch, n,
    counts binary(8 * n_bins, big-endian u64))`` — epoch-stamped like
    the other stateful sinks so an append sink has a well-defined
    current summary."""
    import struct as _struct

    from pyspark.sql import functions as F

    if n_bins < 2:
        raise ValueError(f"n_bins must be >= 2, got {n_bins}")
    if not hi > lo:
        raise ValueError(f"need hi > lo, got [{lo}, {hi}]")

    out_schema = T.StructType(
        [
            T.StructField("shard", T.LongType()),
            T.StructField("epoch", T.LongType()),
            T.StructField("n", T.LongType()),
            T.StructField("counts", T.BinaryType()),
        ]
    )
    state_schema = T.StructType(
        [
            T.StructField("counts", T.BinaryType()),
            T.StructField("n", T.LongType()),
            T.StructField("epoch", T.LongType()),
        ]
    )
    fmt = f">{n_bins}Q"

    def update(
        key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        if state.exists:
            counts_b, n, epoch = state.get
            counts = list(_struct.unpack(fmt, counts_b))
            n, epoch = int(n), int(epoch)
        else:
            counts = [0] * n_bins
            n, epoch = 0, 0
        for pdf in pdfs:
            for b in pdf["__bin"]:
                if b is None:
                    continue
                counts[int(b)] += 1
                n += 1
        epoch += 1
        packed = _struct.pack(fmt, *counts)
        state.update((packed, n, epoch))
        yield pd.DataFrame(
            {"shard": [key[0]], "epoch": [epoch], "n": [n],
             "counts": [packed]}
        )

    width = (hi - lo) / n_bins
    v = F.col(value_col).cast("double")
    bin_ = F.least(
        F.lit(n_bins - 1),
        F.greatest(F.lit(0), F.floor((v - lo) / width).cast("int")),
    )
    ev = events.where(v.isNotNull()).select(
        bin_.alias("__bin"),
        F.pmod(F.xxhash64(v.cast("string")), F.lit(shards)).alias("__shard"),
    )
    return ev.groupBy("__shard").applyInPandasWithState(
        update, out_schema, state_schema, "append", GroupStateTimeout.NoTimeout
    )


def quantiles_from_histogram(
    summaries: DataFrame,
    qs: "list[float]",
    lo: float = 0.0,
    hi: float = 1000.0,
) -> "dict[float, float]":
    """Merge a :func:`streaming_quantile_histogram` sink into
    quantile estimates: keep each shard's max-epoch counts, ADD the
    count arrays (valid because bins are value-determined, not
    shard-determined), then for each q return the UPPER EDGE of the
    first bin whose cumulative count reaches ``ceil(q * n)`` — every
    true quantile lies within one bin width below the answer. The
    read is sketch-sized (shards × n_bins longs), never
    stream-sized."""
    import math
    import struct as _struct

    from pyspark.sql import functions as F

    latest = summaries.join(
        F.broadcast(
            summaries.groupBy("shard").agg(F.max("epoch").alias("epoch"))
        ),
        ["shard", "epoch"],
    )
    rows = latest.select("counts").collect()
    if not rows:
        return {q: float("nan") for q in qs}
    n_bins = len(rows[0].counts) // 8
    fmt = f">{n_bins}Q"
    merged = [0] * n_bins
    for r in rows:
        for i, c in enumerate(_struct.unpack(fmt, r.counts)):
            merged[i] += c
    total = sum(merged)
    width = (hi - lo) / n_bins
    out: "dict[float, float]" = {}
    for q in qs:
        if total == 0:
            out[q] = float("nan")
            continue
        target = max(1, math.ceil(q * total))
        acc = 0
        ans = hi
        for i, c in enumerate(merged):
            acc += c
            if acc >= target:
                ans = lo + (i + 1) * width
                break
        out[q] = ans
    return out
