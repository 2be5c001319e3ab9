"""Shared operator plumbing."""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_DEFAULT_MAX_PARTITION_BYTES = 128 * 1024 * 1024


def _size_bytes(s: str) -> int:
    s = s.strip().lower()
    for suf, mult in (("g", 1 << 30), ("m", 1 << 20), ("k", 1 << 10), ("b", 1)):
        if s.endswith(suf):
            return int(float(s[: -len(suf)]) * mult)
    return int(s)


def finalize_cached(result: DataFrame, *cached: DataFrame) -> DataFrame:
    """Materialize *result* now (``localCheckpoint``, one job during
    which the persisted intermediates give their cache hits), then
    release every intermediate's cache entry.

    Why not just return the lazy plan: ``DataFrame.persist()``
    registers the plan in the session-wide CacheManager, which holds
    a reference until an explicit ``unpersist()`` — in a long-lived
    pipeline service each operator call would leak its cached
    partitions forever. The checkpointed result's blocks are only
    plan-referenced, so the ContextCleaner frees them once the caller
    drops the returned DataFrame. The results this wraps (candidate /
    duplicate pairs) are output-sized — tiny next to the corpus —
    so eager materialization is the cheap side of the trade.
    The materialization MUST run through the adaptive (AQE) plan:
    ``localCheckpoint()`` alone compiles ``queryExecution.toRdd``, a
    physical plan WITHOUT adaptive execution — no runtime shuffle
    coalescing, no dynamic broadcast/skew joins — which at sf0.1 made
    the banded-LSH self-join ~4× slower, and at 100 TB would forfeit
    the skew handling that matters most. So: persist the result, run
    ``count()`` (a Dataset action — executes WITH AQE and fills the
    cache), and only then ``localCheckpoint()`` — whose physical plan
    is a trivial ``InMemoryTableScan`` over the already-computed
    blocks instead of a non-adaptive recompute.
    """
    try:
        result = result.persist()
        result.count()
        return result.localCheckpoint()
    finally:
        result.unpersist()
        for df in cached:
            df.unpersist()


def salted_join(
    big: DataFrame,
    small: DataFrame,
    on: Sequence[str] | str,
    salt: int = 16,
    how: str = "inner",
    salt_cols: Sequence[str] | None = None,
) -> DataFrame:
    """Equi-join with explicit key salting — the manual remedy for a
    join whose key distribution is so skewed that one key's rows
    exceed an executor (AQE's skew-join split handles moderate skew
    automatically, but it can only SPLIT a sort-merge partition; when
    a single hot key dominates a join against a non-broadcastable
    side, salting is the standard fix):

    * the BIG side gets a deterministic per-row salt in [0, salt),
      splitting each hot key across ``salt`` reducers;
    * the SMALL side is exploded ``salt``-fold so every (key, salt)
      bucket finds its match.

    Use when `small` is too big to broadcast but far smaller than
    `big` (a dim table of millions of rows): costs salt× duplication
    of the small side in exchange for salt-way parallelism on every
    hot key. Results are identical to the plain join (asserted by
    test).

    Only ``inner`` and ``left`` joins are supported: under right/full
    semantics every unmatched (key, salt) copy of the small side
    would surface as its own null-padded output row (salt× duplicated
    unmatched rows).

    The salt is a hash of big-row CONTENT, never
    ``monotonically_increasing_id`` — a recomputed map task after a
    shuffle-fetch failure must assign every row the same salt, or the
    retry silently duplicates/drops rows. Pass ``salt_cols`` (columns
    that vary WITHIN a hot key — a row id, a timestamp) to salt on
    ``keys + salt_cols`` only; by default the salt hashes every
    hashable big-side column (map-typed columns are skipped —
    ``xxhash64`` cannot hash them). Hashing the keys ALONE would be
    useless: constant per key, so a hot key would land on one salt.
    Identical full rows colliding on one salt merely spreads a touch
    less."""
    keys = [on] if isinstance(on, str) else list(on)
    if how not in ("inner", "left", "leftouter", "left_outer"):
        raise ValueError(
            f"salted_join supports inner/left joins only, got {how!r}: "
            "right/full would duplicate unmatched small-side rows salt times"
        )
    if salt < 2:
        return big.join(small, keys, how)
    if salt_cols is not None:
        hash_cols = [*keys, *salt_cols]
    else:
        from pyspark.sql.types import MapType

        hash_cols = [
            f.name
            for f in big.schema.fields
            if not isinstance(f.dataType, MapType)
        ]
    b = big.withColumn(
        "__salt",
        F.pmod(F.xxhash64(*[F.col(c) for c in hash_cols]), F.lit(salt)).cast("int"),
    )
    s = small.withColumn(
        "__salt", F.explode(F.sequence(F.lit(0), F.lit(salt - 1)))
    )
    return b.join(s, [*keys, "__salt"], how).drop("__salt")


def spread(df: DataFrame, min_factor: int = 1) -> DataFrame:
    """Repartition ``df`` up to the cluster's default parallelism when
    the scan would produce fewer partitions than cores.

    Why: per-row-heavy operators (shingling, 128-way MinHash, SimHash
    bit votes, pairwise cosine) are narrow — Spark runs them with the
    scan's partitioning, and a small parquet file arrives as ONE
    partition, serializing the whole pass on one core. The round-robin
    exchange costs one shuffle of the (slim, pre-projected) input and
    buys full-cluster parallelism for the expensive expression work.

    The decision uses the optimizer's size estimate (plan stats), NOT
    ``df.rdd.getNumPartitions()`` — materializing the RDD lineage per
    operator call compiles a non-AQE physical plan on the driver and
    defeats AQE's own runtime coalescing. An input larger than
    cores × maxPartitionBytes already scans as ≥ one split per core,
    so this is a no-op at real scale (a 100 TB table is tens of
    thousands of splits).
    """
    spark = df.sparkSession
    target = spark.sparkContext.defaultParallelism * min_factor
    try:
        size = int(df._jdf.queryExecution().optimizedPlan().stats().sizeInBytes())
    except Exception:
        return df.repartition(target)
    try:
        max_pb = _size_bytes(
            spark.conf.get("spark.sql.files.maxPartitionBytes", str(_DEFAULT_MAX_PARTITION_BYTES))
        )
    except Exception:
        max_pb = _DEFAULT_MAX_PARTITION_BYTES
    if size <= target * max_pb:
        return df.repartition(target)
    return df
