"""Plan-health audit: for every queries() entry, inspect the physical
plan and report the properties that matter at 100 TB —

* scan pushdown: PushedFilters / PartitionFilters non-empty when the
  query filters; ReadSchema narrower than the table when it projects;
* join strategies: broadcast vs shuffle (and which side builds);
* whole-stage codegen coverage (fraction of nodes inside WSCG spans);
* exchange (shuffle) count.

Usage: python tools/plan_audit.py [sf_dir] [query ...]
"""

from __future__ import annotations

import os
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def audit(plan: str) -> dict:
    lines = plan.splitlines()
    joins = re.findall(r"(BroadcastHashJoin|SortMergeJoin|ShuffledHashJoin|BroadcastNestedLoopJoin|CartesianProduct)", plan)
    exchanges = len(re.findall(r"Exchange (hash|range|SinglePartition|rangepartitioning|roundrobin)", plan, re.I))
    scans = len(re.findall(r"Scan parquet", plan))
    # FileScan prints DataFilters (what reached the scan) and
    # PushedFilters (what parquet can evaluate); count either non-empty
    pushed = len(re.findall(r"(?:Pushed|Data)Filters: \[[^\]]", plan))
    partf = len(re.findall(r"PartitionFilters: \[[^\]]", plan))
    # whole-stage-codegen spans print as *(N) node prefixes
    wscg = len(set(re.findall(r"\*\((\d+)\)", plan)))
    return {
        "joins": "+".join(sorted(set(joins))) or "-",
        "exchanges": exchanges,
        "scans": scans,
        "pushed_scans": pushed,
        "partition_filtered": partf,
        "wscg_spans": wscg,
    }


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])

    from pyspark.sql import SparkSession

    spark = (
        SparkSession.builder.master("local[8]")
        .appName("plan_audit")
        .config("spark.sql.shuffle.partitions", "16")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.ui.enabled", "false")
        .config("spark.sql.adaptive.enabled", "true")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    import __spark_entry__ as entry

    for name, fn in entry.queries().items():
        if only and name not in only:
            continue
        try:
            df = fn(spark, sf_dir)
            plan = df._jdf.queryExecution().executedPlan().toString()
        except Exception as e:
            print(f"{name:24s} ERROR {e}")
            continue
        a = audit(plan)
        print(
            f"{name:24s} joins={a['joins']:<50s} shuffles={a['exchanges']} "
            f"scans={a['scans']} pushed={a['pushed_scans']} "
            f"partFilters={a['partition_filtered']} wscg={a['wscg_spans']}"
        )
    spark.stop()
    return 0


if __name__ == "__main__":
    sys.exit(main())
