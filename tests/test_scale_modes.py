"""Scale-safe modes for the per-source rank/cumsum operators
(VERDICT r7 directive 1): the default modes window-partition by
``source`` — correct, but at 100× a handful of sources funnels every
document of a source through ONE task. The scale modes replace the
per-group window with the two-level prefix decomposition
(``operators/util.py::grouped_prefix``) and must be (a) value-EQUAL
to the window modes, (b) free of any window partitioned by the group
column alone."""

import pytest
from pyspark.sql import Row
from pyspark.sql import functions as F

from toshokan_spark.operators.sampling import token_budget_pack
from toshokan_spark.operators.text import lm_quality_buckets
from toshokan_spark.operators.util import grouped_prefix, numeric_order_proxy


@pytest.fixture(scope="module")
def docs(spark, sf_dir):
    return spark.read.parquet(f"{sf_dir}/documents.parquet")


def test_lm_quality_buckets_scale_mode_value_equal(spark, docs):
    a = sorted(tuple(r) for r in lm_quality_buckets(docs).collect())
    b = sorted(
        tuple(r) for r in lm_quality_buckets(docs, scale_mode=True).collect()
    )
    assert a == b


def test_token_budget_pack_scale_mode_value_equal(spark, docs):
    with_tokens = docs.select(
        "doc_id", "source", F.size(F.split("text", r"\s+")).alias("n_tokens")
    )
    a = sorted(
        tuple(r) for r in token_budget_pack(with_tokens, 2000).collect()
    )
    b = sorted(
        tuple(r)
        for r in token_budget_pack(with_tokens, 2000, scale_mode=True).collect()
    )
    assert a == b


def test_token_budget_pack_scale_mode_string_order_col(spark, docs):
    """The coarse-bucket proxy must handle non-numeric order columns:
    ordering by a STRING key exercises the hex byte-fold proxy."""
    with_tokens = docs.select(
        F.format_string("doc-%06d", F.col("doc_id")).alias("key"),
        "source",
        F.size(F.split("text", r"\s+")).alias("n_tokens"),
    )
    a = sorted(
        tuple(r)
        for r in token_budget_pack(with_tokens, 2000, order_col="key").collect()
    )
    b = sorted(
        tuple(r)
        for r in token_budget_pack(
            with_tokens, 2000, order_col="key", scale_mode=True
        ).collect()
    )
    assert a == b


def test_scale_mode_plans_have_no_per_group_window(spark, docs):
    """THE point of scale mode: every window in the plan must be
    partitioned by (group, __coarse) — never by the group alone,
    which would serialize a whole source through one task. Checked on
    the un-materialized plan (materialize=False skips the eager
    localCheckpoint that would hide it)."""
    with_tokens = docs.select(
        "doc_id", "source", F.size(F.split("text", r"\s+")).alias("n_tokens")
    )
    for df in (
        lm_quality_buckets(docs, scale_mode=True, materialize=False),
        token_budget_pack(with_tokens, 2000, scale_mode=True, materialize=False),
    ):
        plan = df._jdf.queryExecution().optimizedPlan().toString()
        specs = [
            seg.split(")")[0]
            for seg in plan.split("windowspecdefinition(")[1:]
        ]
        assert specs, "scale-mode plan lost its window"
        for spec in specs:
            assert "__coarse" in spec, (
                "window partitioned without __coarse — a per-source "
                "single-task window is back: " + spec
            )


def test_grouped_prefix_exact_under_boundary_ties(spark):
    """Rank exactness when the proxy collides across an approx-
    percentile boundary: duplicate scores MUST share a coarse bucket
    (assignment is by strict comparison against boundaries), and the
    in-bucket order key breaks the ties — global rank and cumsum
    match the single-window answers on pathological tie-heavy data,
    including groups far smaller than n_coarse."""
    from pyspark.sql.window import Window

    rows = [
        Row(g="a", k=i, s=float(v), w=i % 3 + 1)
        # 60 rows over only 5 distinct scores: every quantile boundary
        # lands ON a duplicated value
        for i, v in enumerate([1, 1, 2, 2, 2, 3] * 10)
    ] + [Row(g="tiny", k=0, s=9.0, w=5)]
    df = spark.createDataFrame(rows)
    out = grouped_prefix(
        df,
        "g",
        F.col("s").cast("double"),
        [F.col("s").asc(), F.col("k").asc()],
        value=F.col("w"),
        n_coarse=8,
    )
    w = Window.partitionBy("g").orderBy(F.col("s").asc(), F.col("k").asc())
    expect = df.withColumn("__rank", F.row_number().over(w)).withColumn(
        "__cumsum",
        F.sum("w").over(
            w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
        ),
    )
    got = {(r.g, r.k): (r["__rank"], r["__cumsum"]) for r in out.collect()}
    want = {(r.g, r.k): (r["__rank"], r["__cumsum"]) for r in expect.collect()}
    assert got == want


def test_grouped_prefix_null_proxy_routes_last(spark):
    """Null proxies (desc-nulls-last / asc-nulls-last composite
    orderings) land in the LAST coarse bucket and rank after every
    non-null row, matching the single-window order."""
    from pyspark.sql.window import Window

    rows = [Row(g="x", k=i, s=None if i % 4 == 0 else float(i)) for i in range(20)]
    df = spark.createDataFrame(rows, "g string, k int, s double")
    out = grouped_prefix(
        df, "g", F.col("s"), [F.col("s").asc_nulls_last(), F.col("k").asc()],
        n_coarse=4,
    )
    w = Window.partitionBy("g").orderBy(
        F.col("s").asc_nulls_last(), F.col("k").asc()
    )
    expect = df.withColumn("__rank", F.row_number().over(w))
    got = {r.k: r["__rank"] for r in out.collect()}
    want = {r.k: r["__rank"] for r in expect.collect()}
    assert got == want


def test_grouped_prefix_warns_on_collapsed_boundaries(spark, caplog):
    """A near-constant proxy collapses the approx_percentile
    boundaries and one coarse bucket silently holds the whole group —
    reverting to the single-task window the function exists to avoid.
    The operator must WARN naming the group (so scale-mode callers
    see the degeneration) and still return the exact answer
    (VERDICT r8 #3)."""
    import logging

    from pyspark.sql.window import Window

    rows = [Row(g="flat", k=i, s=1.0) for i in range(40)] + [
        Row(g="spread", k=i, s=float(i)) for i in range(40)
    ]
    df = spark.createDataFrame(rows)
    with caplog.at_level(logging.WARNING, logger="toshokan_spark.operators.util"):
        out = grouped_prefix(
            df, "g", F.col("s"), [F.col("s").asc(), F.col("k").asc()],
            n_coarse=16,
        )
        got = {(r.g, r.k): r["__rank"] for r in out.collect()}
    w = Window.partitionBy("g").orderBy(F.col("s").asc(), F.col("k").asc())
    want = {
        (r.g, r.k): r["__rank"]
        for r in df.withColumn("__rank", F.row_number().over(w)).collect()
    }
    assert got == want
    flat_warned = [
        r for r in caplog.records if "'flat'" in r.getMessage()
    ]
    assert flat_warned, "no collapsed-boundary warning for the flat group"
    assert not any("'spread'" in r.getMessage() for r in caplog.records), (
        "well-spread group falsely flagged"
    )
    # n_coarse=2 has a single requested boundary — the floor must cap
    # to it, so a perfectly-spread proxy is NOT flagged (review r9)
    caplog.clear()
    with caplog.at_level(logging.WARNING, logger="toshokan_spark.operators.util"):
        out2 = grouped_prefix(
            df.filter(F.col("g") == "spread"), "g",
            F.col("s"), [F.col("s").asc(), F.col("k").asc()], n_coarse=2,
        )
        out2.collect()
    assert not any("'spread'" in r.getMessage() for r in caplog.records), (
        "n_coarse=2 falsely flags a spread proxy"
    )


def test_numeric_order_proxy_string_is_monotone(spark):
    """The 7-byte hex fold must never invert Spark's own string
    ordering — the classic trap is variable-length values ('az' > 'b'
    numerically when folded without padding). Non-strict monotone is
    the contract: proxy order may tie, never invert."""
    vals = ["", "a", "az", "b", "ba", "Z", "0", "zz", "é", "中文",
            "abcdefgh", "abcdefg", "abcdefgz", "same-prefix-very-long-1",
            "same-prefix-very-long-2"]
    df = spark.createDataFrame([(v,) for v in vals], "v string")
    proxy = numeric_order_proxy(F.col("v"), df.schema["v"].dataType)
    got = [
        (r.v, r.p)
        for r in df.select("v", proxy.alias("p")).orderBy("v").collect()
    ]
    ps = [p for _, p in got]
    assert all(x <= y for x, y in zip(ps, ps[1:])), got


def test_grouped_prefix_randomized_against_window(spark):
    """Seeded randomized ground-truth check: many groups with wildly
    different shapes (heavy ties, singletons, negative and huge
    values, null-free) in ONE frame, several n_coarse settings —
    rank and cumsum must equal the single-window answers exactly."""
    import random

    from pyspark.sql.window import Window

    rng = random.Random(0xC0FFEE)
    rows = []
    for g in range(12):
        n = rng.choice([1, 2, 3, 7, 40, 150])
        # small value domains force ties; large domains force spread
        dom = rng.choice([2, 5, 10**9])
        for i in range(n):
            rows.append((f"g{g}", i, float(rng.randrange(-dom, dom)),
                         rng.randrange(1, 100)))
    df = spark.createDataFrame(rows, "g string, k int, s double, w int")
    w = Window.partitionBy("g").orderBy(F.col("s").asc(), F.col("k").asc())
    expect = (
        df.withColumn("r", F.row_number().over(w))
        .withColumn(
            "c",
            F.sum("w").over(
                w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
            ),
        )
    )
    want = {(r.g, r.k): (r.r, r.c) for r in expect.collect()}
    for n_coarse in (2, 8, 64):
        out = grouped_prefix(
            df, "g", F.col("s").cast("double"),
            [F.col("s").asc(), F.col("k").asc()],
            value=F.col("w"), n_coarse=n_coarse,
        )
        got = {
            (r.g, r.k): (r["__rank"], r["__cumsum"]) for r in out.collect()
        }
        assert got == want, f"n_coarse={n_coarse}"


def test_token_budget_pack_scale_mode_null_order_keys_match(spark):
    """Null order keys rank NULLS FIRST in the window mode (plain
    asc()); scale mode must route null proxies to the FIRST coarse
    bucket so the kept set is identical (review finding r8: the
    default nulls-last routing made the two modes keep different
    rows near the budget boundary)."""
    rows = [("s", None, 500), ("s", "doc-1", 500), ("s", "doc-2", 500)]
    df = spark.createDataFrame(rows, "source string, key string, n_tokens int")
    a = sorted(
        (r.key, r.cum_tokens)
        for r in token_budget_pack(df, 600, order_col="key").collect()
    )
    b = sorted(
        (r.key, r.cum_tokens)
        for r in token_budget_pack(
            df, 600, order_col="key", scale_mode=True
        ).collect()
    )
    assert a == b == [(None, 500)]


def test_curriculum_order_plan_has_no_global_window(spark, docs):
    """curriculum_order is BUILT on the two-level scan: every window
    in its plan must carry __coarse in the partition spec — a global
    row_number/ntile window (partitioned by nothing or by stage
    alone) would funnel the corpus through one task."""
    from toshokan_spark.operators.sampling import curriculum_order

    df = curriculum_order(
        docs, F.col("n_chars").cast("long"), n_stages=3, seed=7,
        materialize=False,
    )
    plan = df._jdf.queryExecution().optimizedPlan().toString()
    specs = [
        seg.split(")")[0]
        for seg in plan.split("windowspecdefinition(")[1:]
    ]
    assert specs, "curriculum plan lost its windows"
    for spec in specs:
        assert "__coarse" in spec, (
            "window without __coarse — a single-task global window: "
            + spec
        )


def test_curriculum_order_randomized_against_window(spark):
    """Seeded randomized ground truth: curriculum_order's two-level
    machinery must equal the single-window reference (ntile over the
    difficulty order + global row_number over (stage, bucket, id))
    exactly, across corpus shapes (heavy difficulty ties, N < k,
    N % k != 0) and n_coarse settings."""
    import random

    from pyspark.sql.window import Window

    from toshokan_spark.operators.sampling import (
        curriculum_order,
        sample_key,
    )

    rng = random.Random(0xBEEF)
    for trial, (n, k) in enumerate(
        [(1, 3), (2, 5), (9, 3), (40, 4), (151, 7)]
    ):
        dom = rng.choice([2, 5, 10**6])
        rows = [
            (i, rng.randrange(0, dom)) for i in range(1, n + 1)
        ]
        df = spark.createDataFrame(rows, "doc_id int, d int")
        seed = trial * 11
        ref = (
            df.withColumn(
                "stage",
                F.ntile(k).over(
                    Window.orderBy(F.col("d").asc(), F.col("doc_id").asc())
                ).cast("long"),
            )
            .withColumn("b", sample_key(F.col("doc_id").cast("string"), seed))
            .withColumn(
                "position",
                F.row_number().over(
                    Window.orderBy("stage", "b", "doc_id")
                ).cast("long"),
            )
        )
        want = {r.doc_id: (r.stage, r.position) for r in ref.collect()}
        for n_coarse in (2, 16):
            out = curriculum_order(
                df, F.col("d").cast("long"), n_stages=k, seed=seed,
                n_coarse=n_coarse,
            )
            got = {r["doc_id"]: (r["stage"], r["position"]) for r in out.collect()}
            assert got == want, f"n={n} k={k} n_coarse={n_coarse}"


def test_curriculum_order_null_difficulty_matches_window(spark):
    """Null difficulties follow Spark's plain-asc convention (NULLS
    FIRST = easiest stage), exactly like the single-window reference
    — the nulls_last routing and the window order must agree."""
    from pyspark.sql import Row
    from pyspark.sql.window import Window

    from toshokan_spark.operators.sampling import curriculum_order, sample_key

    rows = [Row(doc_id=i, d=(None if i % 5 == 0 else (i * 7) % 13))
            for i in range(1, 31)]
    df = spark.createDataFrame(rows, "doc_id int, d int")
    ref = (
        df.withColumn(
            "stage",
            F.ntile(4).over(
                Window.orderBy(F.col("d").asc(), F.col("doc_id").asc())
            ).cast("long"),
        )
        .withColumn("b", sample_key(F.col("doc_id").cast("string"), 3))
        .withColumn(
            "position",
            F.row_number().over(Window.orderBy("stage", "b", "doc_id")).cast("long"),
        )
    )
    want = {r.doc_id: (r.stage, r.position) for r in ref.collect()}
    out = curriculum_order(
        df, F.col("d").cast("long"), n_stages=4, seed=3, n_coarse=4
    )
    got = {r["doc_id"]: (r["stage"], r["position"]) for r in out.collect()}
    assert got == want


def test_grouped_prefix_total_col_and_fixed_bounds(spark):
    """The r16 job-count options: *total_col* must equal the plain
    per-group count for every row, and *fixed_bounds* (literal
    monotone boundaries instead of the percentile sketch) must leave
    rank and cumsum bit-identical to the sketch path — including a
    boundary list that buckets badly (exactness never depended on
    boundary placement) and null proxies routed first/last."""
    from pyspark.sql.window import Window

    rows = [
        Row(g="a", k=i, s=None if i % 7 == 0 else float(i * 13 % 50), w=i % 4)
        for i in range(60)
    ] + [Row(g="b", k=i, s=float(i % 5), w=1) for i in range(9)]
    df = spark.createDataFrame(rows, "g string, k int, s double, w int")
    order = [F.col("s").asc_nulls_last(), F.col("k").asc()]
    w = Window.partitionBy("g").orderBy(*order)
    expect = df.withColumn("__rank", F.row_number().over(w)).withColumn(
        "__cumsum",
        F.sum("w").over(
            w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
        ),
    )
    want = {
        (r.g, r.k): (r["__rank"], r["__cumsum"]) for r in expect.collect()
    }
    counts = {"a": 60, "b": 9}
    for bounds in ([10.0, 20.0, 30.0, 40.0], [2.0, 2.0, 47.0], [999.0]):
        out = grouped_prefix(
            df, "g", F.col("s"), order,
            value=F.col("w"), fixed_bounds=bounds, total_col="__n",
        )
        got = {
            (r.g, r.k): (r["__rank"], r["__cumsum"]) for r in out.collect()
        }
        assert got == want, f"fixed_bounds={bounds}"
        assert all(
            r["__n"] == counts[r.g] for r in out.collect()
        ), f"total_col wrong for fixed_bounds={bounds}"
    # sketch path with total_col, nulls routed FIRST (plain asc order)
    order_nf = [F.col("s").asc(), F.col("k").asc()]
    w_nf = Window.partitionBy("g").orderBy(*order_nf)
    expect_nf = df.withColumn("__rank", F.row_number().over(w_nf))
    out_nf = grouped_prefix(
        df, "g", F.col("s"), order_nf,
        n_coarse=4, nulls_last=False, total_col="__n",
    )
    got_nf = {(r.g, r.k): r["__rank"] for r in out_nf.collect()}
    want_nf = {(r.g, r.k): r["__rank"] for r in expect_nf.collect()}
    assert got_nf == want_nf
    assert all(r["__n"] == counts[r.g] for r in out_nf.collect())


def test_grouped_prefix_literal_map_adversarial_group_names(spark):
    """The materialize path re-enters boundaries/offsets as SQL-text
    literal maps (one F.expr parse — r17); group names containing
    quotes, backslashes and unicode must round-trip the rendering
    exactly, and unrenderable key types must fall back to the join
    path rather than mis-render. Ranks must equal the single-window
    answers either way."""
    from pyspark.sql.window import Window

    names = ["pl'ain", 'dq"uote', "back\\slash", "uni·中文", "  ", ""]
    rows = [
        Row(g=g, k=i, s=float((i * 7 + j) % 5))
        for j, g in enumerate(names)
        for i in range(9)
    ]
    df = spark.createDataFrame(rows)
    out = grouped_prefix(
        df, "g", F.col("s"), [F.col("s").asc(), F.col("k").asc()],
        n_coarse=4,
    )
    w = Window.partitionBy("g").orderBy(F.col("s").asc(), F.col("k").asc())
    want = {
        (r.g, r.k): r["__rank"]
        for r in df.withColumn("__rank", F.row_number().over(w)).collect()
    }
    got = {(r.g, r.k): r["__rank"] for r in out.collect()}
    assert got == want
