"""As-of join — attach to each left row the most recent right row at
or before its timestamp, per key.

Spark has no native ASOF JOIN (DuckDB/Pandas do); the naive encoding
``l JOIN r ON key AND r.ts <= l.ts`` + window is a range join that
materializes O(|matches|) pairs — quadratic per hot key. This
implementation is the union+window formulation:

1. tag right rows 0 and left rows 1, union them (plan-level concat,
   no shuffle);
2. ONE shuffle: window over (key) ordered by (ts, tag) — at equal
   timestamps the right row sorts first, giving inclusive
   ``right_ts <= left_ts`` semantics;
3. ``last(payload, ignorenulls=True)`` over the running frame carries
   the latest right payload forward; keep only left rows.

Cost: one exchange of |L|+|R| slim rows and a per-partition sort —
the same shape as any windowed aggregation, independent of match
multiplicity. Skewed keys behave like any window (AQE-visible), never
a pair blow-up.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: Sequence[str],
    left_ts: str,
    right_ts: str,
    payload: Sequence[str],
    prefix: str = "asof_",
) -> DataFrame:
    """For every *left* row: the latest *right* row with
    ``right_ts <= left_ts`` and equal *on* keys; payload columns are
    appended as ``{prefix}{col}`` (null when no prior right row).
    """
    keys = list(on)
    pay = list(payload)

    r = right.select(
        *keys,
        F.col(right_ts).alias("__ts"),
        F.lit(0).alias("__tag"),
        *[F.col(c).alias(f"__p_{c}") for c in pay],
    )
    l = left.select(
        "*",
        F.col(left_ts).alias("__ts"),
        F.lit(1).alias("__tag"),
        *[F.lit(None).alias(f"__p_{c}") for c in pay],
    )
    # align schemas: right side carries only keys + ts + tag + payload
    r_aligned = r.select(
        *[
            F.col(c) if c in r.columns else F.lit(None).alias(c)
            for c in l.columns
        ]
    )
    u = l.unionByName(r_aligned)

    w = (
        Window.partitionBy(*keys)
        .orderBy(F.col("__ts").asc(), F.col("__tag").asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    filled = u.select(
        "*",
        *[
            F.last(F.col(f"__p_{c}"), ignorenulls=True).over(w).alias(f"{prefix}{c}")
            for c in pay
        ],
    )
    return filled.filter(F.col("__tag") == 1).drop(
        "__ts", "__tag", *[f"__p_{c}" for c in pay]
    )
