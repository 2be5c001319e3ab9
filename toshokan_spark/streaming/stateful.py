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
