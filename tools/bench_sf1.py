"""sf1 scale probe (VERDICT r14 directive 4): run the heaviest bench
entries once at sf0.1 (the driver testdata) and once at sf1
(tools/gen_sf.py output, 10x the synthetic documents/embeddings/
events volume) in ONE session, and record per-entry times + the
scaling ratio to BENCH_SF1.json.

The 2x bench gate runs at sf0.1; every 100x-design claim above 600k
rows was argued from plans until this probe. A ratio at or below the
10x data ratio (plus fixed scheduling overhead, which SHRINKS
relatively with volume) is the "scales ≲ linearly" evidence; a
superlinear entry is a finding to fix or explain.

Usage: python tools/bench_sf1.py [sf1_dir]  (default .sf1data)
"""

from __future__ import annotations

import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

#: the heaviest builder-map entries (BENCH_LOCAL_r14.json top cohort,
#: VERDICT r14 directive 4's list) — all on the synthetic tables the
#: generator scales
HEAVY = [
    "train_quality_classifier", "quality_ensemble",
    "select_training_set", "dedup_minhash_lsh", "dsir_select",
    "cluster_size_histogram", "dedup_canonical", "minhash_calibration",
    "dedup_incremental_minhash", "semantic_clusters",
    "leakage_safe_split", "dsir_weights", "lm_quality_buckets_scaled",
    "dedup_clusters", "kmeans_embeddings", "knn_graph",
    "curriculum_order", "dedup_minhash_char",
    # search/aggregation surface (VERDICT r15 directive 6): the r14/r15
    # probes were all LLM-pipeline heavies; these run on the scaled
    # documents/events tables too
    "search_significant_terms", "search_panel", "search_composite",
    "search_span_near",
    # r17-touched entries (VERDICT r16 directive 2: every optimization
    # claim carries an sf1 before/after)
    "dedup_ngram_jaccard", "containment_pairs", "dedup_incremental",
    "dedup_simhash", "dedup_crosscheck", "kcenter_select",
    "domain_pagerank", "token_budget_pack_scaled",
    "search_phrase_suggest",
]


def _percolate_q500_probe(spark, sf_dir: str) -> dict:
    """percolate at Q=500 (VERDICT r15 directive 6): 500 deterministic
    monitors over the documents table at a realistic alerting mix —
    dominated by term / term+range / disjunction monitors with a 10%
    exotic tail (slop phrase, regexp). The exotic shapes are
    per-monitor LINEAR re-scans of every text cell (the r15 survey
    measured 200 of them alone at 65 s over just sf0.01's 5k docs —
    a 50/50 exotic mix is a DoS at sf1, not a probe). Records
    CONSTRUCTION (driver-side compile of all 500 into one fused
    expression) and EXECUTION (one width-Q scan) separately — the
    two costs the r15 SQL-text backend split apart."""
    import __spark_entry__ as entry
    from toshokan_spark.search import percolate

    vocab = (
        "spark table scan query filter join group agg sort hash line "
        "column order part value key stream window batch vector fast "
        "slow small customer supplier region nation segment index "
        "merge commit shard token"
    ).split()
    nv = len(vocab)
    mons: "list[tuple[str, str]]" = []
    for i in range(500):
        w1, w2 = vocab[i % nv], vocab[(i * 7 + 3) % nv]
        shape = i % 20
        if shape < 7:
            q = f"text:{w1}"
        elif shape < 13:
            q = f"text:{w1} AND n_chars:>={(i % 40) * 10}"
        elif shape < 18:
            q = f"text:{w1} OR lang:{'en' if i % 2 else 'de'}"
        elif shape == 18:
            q = f'text:"{w1} {w2}"~1'
        else:
            q = f"text:/{w1[:3]}.*/"
        mons.append((f"m{i:03d}", q))
    docs = spark.read.parquet(os.path.join(sf_dir, "documents.parquet"))
    t0 = time.time()
    out = percolate(docs, mons, entry.DOCS_CONFIG, "doc_id")
    t_build = time.time() - t0
    t0 = time.time()
    out.write.format("noop").mode("overwrite").save()
    t_exec = time.time() - t0
    return {"build_sec": round(t_build, 3), "exec_sec": round(t_exec, 3)}


def main() -> int:
    sf1_dir = sys.argv[1] if len(sys.argv) > 1 else os.path.join(
        REPO, ".sf1data")
    sf01_dir = "/root/testdata/sf0.1"
    if not os.path.exists(os.path.join(sf1_dir, "documents.parquet")):
        print(f"run tools/gen_sf.py 1.0 {sf1_dir} first",
              file=sys.stderr)
        return 2

    from pyspark.sql import SparkSession

    # $SPARK_GRAFT_CPUS honors the driver's scaling protocol: an sf1
    # run at 8 vs 32 cores is the parallel-scaling evidence the sf0.1
    # bench can no longer provide (r16 scaling block: at sf0.1 every
    # entry is job-floor-bound and 8 cores BEAT 32)
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    out_path = os.environ.get(
        "SPARK_GRAFT_SF1_OUT", os.path.join(REPO, "BENCH_SF1.json"))
    spark = (
        SparkSession.builder.master(f"local[{cpus}]")
        .appName("toshokan_spark_sf1_probe")
        .config("spark.sql.shuffle.partitions", str(max(int(cpus) * 2, 8)))
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.ui.enabled", "false")
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.ui.showConsoleProgress", "false")
        .config("spark.driver.memory", "8g")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    import __spark_entry__ as entry

    qs = entry.queries()

    def run(name: str, sf_dir: str) -> float:
        best = -1.0
        for _ in range(2):  # best-of-2 against host bursts
            t0 = time.time()
            qs[name](spark, sf_dir).write.format("noop").mode(
                "overwrite").save()
            dt = time.time() - t0
            best = dt if best < 0 else min(best, dt)
        return round(best, 3)

    # warmup (JVM/codegen)
    qs[HEAVY[0]](spark, sf01_dir).write.format("noop").mode(
        "overwrite").save()

    out: dict[str, dict] = {}
    for name in HEAVY:
        try:
            t_small = run(name, sf01_dir)
            t_big = run(name, sf1_dir)
        except Exception as e:
            out[name] = {"error": str(e)[:300]}
            print(f"{name}: FAILED {e}", file=sys.stderr)
            continue
        ratio = round(t_big / t_small, 2) if t_small > 0 else None
        out[name] = {"sf0.1_sec": t_small, "sf1_sec": t_big,
                     "ratio": ratio}
        print(f"{name}: sf0.1 {t_small}s  sf1 {t_big}s  x{ratio}")

    # percolate Q=500: build + exec at both scales (documents table)
    perc = {}
    for tag, d in (("sf0.1", sf01_dir), ("sf1", sf1_dir)):
        try:
            perc[tag] = _percolate_q500_probe(spark, d)
        except Exception as e:
            perc[tag] = {"error": str(e)[:300]}
    out["percolate_q500"] = perc
    print(f"percolate_q500: {perc}")

    doc = {
        "metric": "sf1_scale_probe",
        "data_ratio": 10.0,
        "cpus": int(cpus),
        "note": ("per-entry best-of-2, one session, "
                 f"local[{cpus}]; "
                 "sf1 tables from tools/gen_sf.py (50k docs / 20k "
                 "embeddings / 1M events, x10 each at sf1)"),
        "entries": out,
    }
    with open(out_path, "w") as f:
        json.dump(doc, f, indent=2)
        f.write("\n")
    print(json.dumps({"metric": "sf1_scale_probe",
                      "n": len(out),
                      "superlinear": [
                          n for n, v in out.items()
                          if v.get("ratio") and v["ratio"] > 10.0]}))
    spark.stop()
    return 0


if __name__ == "__main__":
    sys.exit(main())
