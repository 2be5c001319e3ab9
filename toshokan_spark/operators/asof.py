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


def window_join(
    left: DataFrame,
    right: DataFrame,
    on: Sequence[str],
    left_ts: str,
    right_ts: str,
    window_seconds: int,
) -> DataFrame:
    """Interval (range) join — pair every *left* row with the *right*
    rows of equal *on* keys whose timestamp lands strictly after the
    left's, within ``window_seconds``::

        left_ts < right_ts <= left_ts + window_seconds

    The conversion-window / attribution primitive (click -> purchases
    within 30 min). Spark plans the naive encoding
    ``l JOIN r ON key AND r.ts BETWEEN ...`` as an equi-join on the
    key alone with the range as a post-filter — every (left, right)
    pair per key materializes first, quadratic on hot keys. This
    implementation time-buckets both sides at the window width and
    joins on ``(key, bucket)``: a left row in bucket b can only match
    right rows in buckets {b, b+1}, so the left side is exploded to
    those two bucket keys (2x a slim projection) and the equi-join's
    fan-out is bounded by per-key density within ~2 windows, never by
    the key's total history. One shuffle, both sides narrow.

    Returns the matched pairs with left columns as-is and right
    payload columns prefixed ``r_`` (inner semantics — aggregate and
    re-join to the left set for left-outer counts).
    """
    if int(window_seconds) <= 0:
        raise ValueError(
            f"window_seconds must be positive, got {window_seconds} "
            "(0 would silently bucket every row to null and match nothing)"
        )
    w_us = int(window_seconds) * 1_000_000
    keys = list(on)
    l_us = F.unix_micros(F.col(left_ts))
    r_us = F.unix_micros(F.col(right_ts))
    l = left.select(
        "*",
        l_us.alias("__l_us"),
        F.explode(
            F.array(
                F.floor(l_us / w_us).cast("long"),
                (F.floor(l_us / w_us) + 1).cast("long"),
            )
        ).alias("__bucket"),
    )
    r = right.select(
        *[F.col(k) for k in keys],
        r_us.alias("__r_us"),
        F.floor(r_us / w_us).cast("long").alias("__bucket"),
        *[
            F.col(c).alias(f"r_{c}")
            for c in right.columns
            if c not in keys
        ],
    )
    pairs = l.join(r, [*keys, "__bucket"]).filter(
        (F.col("__r_us") > F.col("__l_us"))
        & (F.col("__r_us") <= F.col("__l_us") + F.lit(w_us))
    )
    return pairs.drop("__l_us", "__r_us", "__bucket")


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
