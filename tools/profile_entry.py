"""Isolate one or more queries() entries: fresh local session, noop
sink timing (guide §1.4), optional formatted-plan dump (guide §1/7.2).

Usage: python tools/profile_entry.py [--plans DIR] [--suffix before|after]
                                     [--runs N] [sf_dir] query [query ...]

Writes plans to DIR/<query>_<suffix>.txt when --plans is given and
prints per-entry best-of-N seconds. The session matches bench.py's
configuration so numbers are comparable.
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> int:
    args = sys.argv[1:]
    plans_dir = None
    suffix = "before"
    runs = 2
    while args and args[0].startswith("--"):
        if args[0] == "--plans":
            plans_dir = args[1]
            args = args[2:]
        elif args[0] == "--suffix":
            suffix = args[1]
            args = args[2:]
        elif args[0] == "--runs":
            runs = int(args[1])
            args = args[2:]
        else:
            raise SystemExit(f"unknown flag {args[0]}")
    if args and os.path.isdir(args[0]):
        sf_dir, names = args[0], args[1:]
    else:
        sf_dir, names = "/root/testdata/sf0.1", args
    if not names:
        raise SystemExit("no query names given")

    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    from pyspark.sql import SparkSession

    spark = (
        SparkSession.builder.master(f"local[{cpus}]")
        .appName("toshokan_spark_profile")
        .config("spark.sql.shuffle.partitions", str(max(int(cpus) * 2, 8)))
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.ui.enabled", "false")
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.ui.showConsoleProgress", "false")
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "8g"))
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    import __spark_entry__ as entry

    qs = entry.queries()
    missing = [n for n in names if n not in qs]
    if missing:
        raise SystemExit(f"unknown queries: {missing}")

    # untimed warmup (JVM classload + codegen), same as bench.py
    try:
        warm = qs[names[0]](spark, sf_dir)
        warm.write.format("noop").mode("overwrite").save()
    except Exception as e:  # pragma: no cover
        print(f"# warmup failed: {e}", file=sys.stderr)

    for name in names:
        fn = qs[name]
        if plans_dir:
            os.makedirs(plans_dir, exist_ok=True)
            # --plan-at seam (VERDICT r16 finding 2): operators that end
            # in finalize_cached return a checkpoint whose explain() is a
            # bare Scan ExistingRDD. Install the finalize-time plan sink
            # so every materialized intermediate's EXECUTED (post-AQE)
            # plan is captured during construction and written alongside
            # the (possibly truncated) final plan.
            from toshokan_spark.operators import util as _util

            _util.PLAN_SINK = sink = []
            try:
                df = fn(spark, sf_dir)
            finally:
                _util.PLAN_SINK = None
            plan = df._sc._jvm.PythonSQLUtils.explainString(
                df._jdf.queryExecution(), "formatted"
            )
            with open(os.path.join(plans_dir, f"{name}_{suffix}.txt"), "w") as f:
                f.write(plan)
                for i, p in enumerate(sink):
                    f.write(
                        f"\n\n== Materialized intermediate {i + 1} "
                        f"(executed plan at finalize_cached, post-AQE) ==\n"
                    )
                    f.write(p)
        best, times = None, []
        for _ in range(runs):
            spark.sparkContext.setJobDescription(f"profile:{name}")
            t0 = time.monotonic()
            fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
            dt = time.monotonic() - t0
            times.append(round(dt, 3))
            best = dt if best is None else min(best, dt)
        print(f"{name}: best {best:.3f}s  runs {times}", flush=True)
    spark.stop()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
