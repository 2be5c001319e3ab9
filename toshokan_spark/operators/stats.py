"""Corpus-level statistical fitting with per-row scoring.

The simplest genuinely *learned-from-the-corpus* model that stays
fully value-oracled: ordinary least squares via the normal equations,
computed with one partial-aggregated pass of ``decimal(38,18)`` sums
(exact, associative — the fit is independent of partition order), the
model (a scalar row) materialized and broadcast, and a second narrow
pass scoring every row with its residual and z-score.

This is the shape of every "fit stats, then score the corpus" step in
a data pipeline (length-vs-diversity calibration, per-source drift
baselines, feature anomaly flags): the model state crossing the
driver is O(1), both corpus passes are narrow, and the arithmetic is
mirrored verbatim in the DuckDB oracle.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _dec(c: Column) -> Column:
    return c.cast("decimal(38,18)")


def linear_fit(df: DataFrame, x: Column, y: Column) -> DataFrame:
    """One-row OLS fit of ``y = intercept + slope * x``.

    Moment sums run in decimal (exact); the closing arithmetic is
    double in a FIXED operation order so the oracle reproduces every
    bit: means first, then central second moments as E[..] - product
    of means, then slope/intercept/r2.

    Returns (n, mean_x, mean_y, slope, intercept, r2, resid_sd), all
    rounded to 6. ``resid_sd`` is the population residual standard
    deviation sqrt(var_y * (1 - r2)) — the scale for z-scoring.
    """
    agg = df.agg(
        F.count(F.lit(1)).cast("double").alias("n"),
        F.sum(_dec(x)).cast("double").alias("sx"),
        F.sum(_dec(y)).cast("double").alias("sy"),
        F.sum(_dec(x * x)).cast("double").alias("sxx"),
        F.sum(_dec(x * y)).cast("double").alias("sxy"),
        F.sum(_dec(y * y)).cast("double").alias("syy"),
    )
    mx = F.col("sx") / F.col("n")
    my = F.col("sy") / F.col("n")
    vx = F.col("sxx") / F.col("n") - mx * mx
    vy = F.col("syy") / F.col("n") - my * my
    cxy = F.col("sxy") / F.col("n") - mx * my
    slope = cxy / vx
    intercept = my - slope * mx
    r2 = (cxy * cxy) / (vx * vy)
    return agg.select(
        F.col("n").cast("long").alias("n"),
        F.round(mx, 6).alias("mean_x"),
        F.round(my, 6).alias("mean_y"),
        F.round(slope, 6).alias("slope"),
        F.round(intercept, 6).alias("intercept"),
        F.round(r2, 6).alias("r2"),
        F.round(F.sqrt(vy * (1.0 - r2)), 6).alias("resid_sd"),
    )


def grouped_linear_fit(
    df: DataFrame,
    group_col: str,
    x: Column,
    y: Column,
) -> DataFrame:
    """Per-group OLS — one row per group with the same closing
    arithmetic as :func:`linear_fit` (drift baselines per source:
    compare slopes across sources, alert when a new batch's fit
    leaves the historical band). One partial-aggregated groupBy;
    group count rows of O(1) model state. Groups with a single row or
    zero x-variance yield null slope/intercept (SQL semantics both
    engines share) rather than failing the whole fit."""
    agg = df.groupBy(group_col).agg(
        F.count(F.lit(1)).cast("double").alias("n"),
        F.sum(_dec(x)).cast("double").alias("sx"),
        F.sum(_dec(y)).cast("double").alias("sy"),
        F.sum(_dec(x * x)).cast("double").alias("sxx"),
        F.sum(_dec(x * y)).cast("double").alias("sxy"),
        F.sum(_dec(y * y)).cast("double").alias("syy"),
    )
    mx = F.col("sx") / F.col("n")
    my = F.col("sy") / F.col("n")
    vx = F.col("sxx") / F.col("n") - mx * mx
    vy = F.col("syy") / F.col("n") - my * my
    cxy = F.col("sxy") / F.col("n") - mx * my
    slope = F.when(vx > 0, cxy / vx)
    intercept = F.when(vx > 0, my - (cxy / vx) * mx)
    r2 = F.when((vx > 0) & (vy > 0), (cxy * cxy) / (vx * vy))
    return agg.select(
        group_col,
        F.col("n").cast("long").alias("n"),
        F.round(slope, 6).alias("slope"),
        F.round(intercept, 6).alias("intercept"),
        F.round(r2, 6).alias("r2"),
    )


def linear_residuals(
    df: DataFrame,
    x: Column,
    y: Column,
    id_col: str = "doc_id",
    z_threshold: float = 2.0,
) -> DataFrame:
    """Per-row residuals against the corpus OLS fit: ``resid = y -
    (intercept + slope * x)``, z-scored by the fit's residual sd, with
    an outlier flag at ``|z| > z_threshold``.

    The fit row is materialized (``localCheckpoint`` — O(1) driver
    state) and broadcast so the scoring pass reads the corpus exactly
    once; without it the composed plan would re-derive the moment
    aggregation per reference. The per-row arithmetic uses the
    ROUNDED model coefficients — exactly what :func:`linear_fit`
    publishes — so scores are reproducible from the persisted model
    alone (and bit-equal in the oracle)."""
    fit = linear_fit(df, x, y).localCheckpoint()
    scored = df.select(
        F.col(id_col),
        F.round(x, 6).alias("x"),
        F.round(y, 6).alias("y"),
    ).crossJoin(F.broadcast(fit.select("slope", "intercept", "resid_sd")))
    resid = F.col("y") - (F.col("intercept") + F.col("slope") * F.col("x"))
    # a (near-)perfect fit has resid_sd 0 — z is then defined as 0,
    # not NaN (nothing deviates from a perfect fit)
    z = F.when(F.col("resid_sd") > 0, resid / F.col("resid_sd")).otherwise(
        F.lit(0.0)
    )
    return scored.select(
        id_col,
        "x",
        "y",
        F.round(resid, 6).alias("resid"),
        F.round(z, 6).alias("z"),
        (F.abs(F.round(z, 6)) > z_threshold).alias("outlier"),
    )


def length_histogram(
    df: DataFrame,
    group_col: str = "source",
    value_col: str = "n_chars",
) -> DataFrame:
    """Per-group log2-bucketed histogram of a positive numeric column
    — the corpus length profile a data report leads with (and the
    input to length-balanced mixing decisions). Returns one row per
    (group, bucket): bucket index, the [lo, hi] value range it
    covers, the count and the within-group fraction.

    The bucket index is the INTEGER bit length minus one
    (``length(conv(v, 10, 2)) - 1``), not ``floor(log2(v))``: at
    exact powers of two a floating log2 can land a hair under the
    integer in one engine and on it in another, flipping the bucket —
    bit length is integer-exact everywhere. Non-positive values are
    excluded (no bit length).

    Scale: one groupBy shuffle of (group, bucket) keys plus a window
    over the group-bucket aggregate — the frame is
    |groups| x ~64 rows regardless of corpus size.
    """
    from pyspark.sql.window import Window

    v = F.col(value_col).cast("long")
    bucket = (F.length(F.conv(v.cast("string"), 10, 2)) - 1).cast("long")
    agg = (
        df.filter(v > 0)
        .select(F.col(group_col), bucket.alias("bucket"))
        .groupBy(group_col, "bucket")
        .agg(F.count(F.lit(1)).cast("long").alias("n_docs"))
    )
    w = Window.partitionBy(group_col)
    # the pyspark shiftleft() wrapper only takes a LITERAL bit count;
    # the SQL function accepts a column expression
    return agg.select(
        group_col,
        "bucket",
        F.expr("shiftleft(1L, int(bucket))").alias("lo"),
        F.expr("shiftleft(1L, int(bucket) + 1) - 1L").alias("hi"),
        "n_docs",
        F.round(F.col("n_docs") / F.sum("n_docs").over(w), 6).alias("pct"),
    )
