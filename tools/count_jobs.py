"""Count the Spark JOBS an entry runs (deterministic pass-count
evidence where wall-clock is too noisy — guide §1: plan/job shape
over stopwatch). Sets a job group per entry and reads the status
tracker's id list for that group after one noop-sink execution.

Usage: python tools/count_jobs.py [sf_dir] query [query ...]
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> int:
    args = sys.argv[1:]
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
        .appName("toshokan_spark_count_jobs")
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

    sc = spark.sparkContext
    try:
        warm = qs[names[0]](spark, sf_dir)
        warm.write.format("noop").mode("overwrite").save()
    except Exception as e:  # pragma: no cover
        print(f"# warmup failed: {e}", file=sys.stderr)

    for name in names:
        group = f"jobs:{name}"
        sc.setJobGroup(group, name)
        qs[name](spark, sf_dir).write.format("noop").mode("overwrite").save()
        sc.setJobGroup("idle", "idle")
        ids = sc.statusTracker().getJobIdsForGroup(group)
        print(f"{name}: {len(ids)} jobs", flush=True)
    spark.stop()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
