"""Shared operator plumbing."""

from __future__ import annotations

from pyspark.sql import DataFrame


def spread(df: DataFrame, min_factor: int = 1) -> DataFrame:
    """Repartition ``df`` up to the cluster's default parallelism when
    the scan produced fewer partitions than cores.

    Why: per-row-heavy operators (shingling, 128-way MinHash, SimHash
    bit votes, pairwise cosine) are narrow — Spark runs them with the
    scan's partitioning, and a small parquet file arrives as ONE
    partition, serializing the whole pass on one core. The round-robin
    exchange costs one shuffle of the (slim, pre-projected) input and
    buys full-cluster parallelism for the expensive expression work.

    At real scale this is a no-op: a 100 TB table scans as tens of
    thousands of splits, which already exceeds ``defaultParallelism``,
    so no exchange is added.
    """
    target = df.sparkSession.sparkContext.defaultParallelism * min_factor
    if df.rdd.getNumPartitions() < target:
        return df.repartition(target)
    return df
