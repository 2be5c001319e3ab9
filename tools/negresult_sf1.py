"""Negative-result re-measure at sf1 (VERDICT r16 directive 8): the
r16 ledger recorded that persisting the hashed-feature stream in
langid_classifier measured SLOWER than recomputing it (2.33 → 2.85 s
at sf0.1) — the "recompute beats cache" finding. At sf0.1 a corpus
scan costs ~nothing, so the finding could be an artifact of the toy
scale; this tool re-runs the same A/B at sf1 (10× data), where the
double feature pass the persist would save is 10× more expensive,
to check whether the trade-off holds where scans cost something.

Variant B is produced by monkeypatching
``text._hashed_features`` to persist its return — the function is
called once and its frame referenced twice (per-doc count + scoring
join), so persisting the return IS the reverted r16 experiment,
byte-for-byte the same downstream plan.

Usage: python tools/negresult_sf1.py [sf1_dir]   (default .sf1data)
Writes NEGRESULT_SF1.json.
"""

from __future__ import annotations

import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def main() -> int:
    sf1_dir = sys.argv[1] if len(sys.argv) > 1 else os.path.join(
        REPO, ".sf1data")
    if not os.path.exists(os.path.join(sf1_dir, "documents.parquet")):
        print(f"run tools/gen_sf.py 1.0 {sf1_dir} first", file=sys.stderr)
        return 2

    from pyspark.sql import SparkSession

    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    spark = (
        SparkSession.builder.master(f"local[{cpus}]")
        .appName("toshokan_spark_negresult_sf1")
        .config("spark.sql.shuffle.partitions", str(max(int(cpus) * 2, 8)))
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.ui.enabled", "false")
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.ui.showConsoleProgress", "false")
        .config("spark.driver.memory", "8g")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    from toshokan_spark.operators import text

    docs = spark.read.parquet(os.path.join(sf1_dir, "documents.parquet"))

    def run_shipped() -> float:
        t0 = time.time()
        text.langid_classifier(docs).write.format("noop").mode(
            "overwrite").save()
        return time.time() - t0

    orig = text._hashed_features

    def run_persisted() -> float:
        frames = []

        def patched(*a, **kw):
            f = orig(*a, **kw).persist()
            frames.append(f)
            return f

        text._hashed_features = patched
        try:
            t0 = time.time()
            text.langid_classifier(docs).write.format("noop").mode(
                "overwrite").save()
            return time.time() - t0
        finally:
            text._hashed_features = orig
            for f in frames:
                f.unpersist()

    def run_param() -> float:
        # the SHIPPED persist_features=True path (persist +
        # finalize_cached release) — what production actually runs
        t0 = time.time()
        text.langid_classifier(docs, persist_features=True).write.format(
            "noop").mode("overwrite").save()
        return time.time() - t0

    # warmup, then interleaved best-of-3 so host drift hits both arms
    run_shipped()
    a, b, c = [], [], []
    for _ in range(3):
        a.append(run_shipped())
        b.append(run_persisted())
        c.append(run_param())

    doc = {
        "metric": "negative_result_sf1_recheck",
        "cpus": int(cpus),
        "finding": "langid_classifier recompute-beats-cache (r16 ledger)",
        "sf0_1_reference": {"no_persist_sec": 2.33, "persist_sec": 2.85},
        "sf1": {
            "no_persist_sec": round(min(a), 3),
            "persist_sec": round(min(b), 3),
            "persist_features_param_sec": round(min(c), 3),
            "no_persist_runs": [round(x, 3) for x in a],
            "persist_runs": [round(x, 3) for x in b],
            "persist_features_param_runs": [round(x, 3) for x in c],
        },
    }
    doc["sf1"]["holds"] = doc["sf1"]["no_persist_sec"] <= \
        doc["sf1"]["persist_sec"]
    with open(os.path.join(REPO, "NEGRESULT_SF1.json"), "w") as f:
        json.dump(doc, f, indent=2)
        f.write("\n")
    print(json.dumps(doc, indent=2))
    spark.stop()
    return 0


if __name__ == "__main__":
    sys.exit(main())
