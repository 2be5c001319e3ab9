"""knn_graph scale probe beyond sf1 (VERDICT r16 directive 3 — the
round's one `perf_weak`): the r16 sf1 probe measured ×11.43 wall at
10× data and ATTRIBUTED it to sf1 being the first scale where the
density-adaptive refinement round triggers (sf0.1 never enters it),
but "linear at 100×" remained an argument. This probe adds the sf2
point and logs the refinement counters (`drop_stats`) at every
scale, so the claim "the ratio plateaus once refinement is active"
becomes a measurement: if sf1→sf2 tracks the 2× data ratio (instead
of sf0.1→sf1's refinement-activation jump), the superlinearity was
the one-time activation, not a scaling law.

Also records the multiprobe_radius=2 variant at each scale — the
recall lever (0.71 → 0.92 recall@5 at sf1 density,
ANN_RECALL_SF1.json) — so the radius default can be decided against
measured cost at more than one density.

Usage: python tools/knn_scale_probe.py [sf1_dir] [sf2_dir]
(defaults .sf1data / .sf2data; generate with tools/gen_sf.py 1.0 /
2.0). Writes KNN_SCALE_PROBE.json.
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
    sf2_dir = sys.argv[2] if len(sys.argv) > 2 else os.path.join(
        REPO, ".sf2data")
    scales = [
        ("sf0.1", "/root/testdata/sf0.1", 1.0),
        ("sf1", sf1_dir, 10.0),
        ("sf2", sf2_dir, 20.0),
    ]
    for _tag, d, _r in scales[1:]:
        if not os.path.exists(os.path.join(d, "embeddings.parquet")):
            print(f"missing {d} — run tools/gen_sf.py first",
                  file=sys.stderr)
            return 2

    from pyspark.sql import SparkSession

    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    spark = (
        SparkSession.builder.master(f"local[{cpus}]")
        .appName("toshokan_spark_knn_scale_probe")
        .config("spark.sql.shuffle.partitions", str(max(int(cpus) * 2, 8)))
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.ui.enabled", "false")
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.ui.showConsoleProgress", "false")
        .config("spark.driver.memory", "8g")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    from toshokan_spark.operators import similarity

    def run(sf_dir: str, radius: int) -> "tuple[float, dict, int]":
        emb = spark.read.parquet(
            os.path.join(sf_dir, "embeddings.parquet"))
        best, stats, edges = -1.0, {}, 0
        for _ in range(2):
            ds: dict = {}
            t0 = time.time()
            out = similarity.knn_graph(
                emb, k=5, num_planes=8, hash_family="lcg",
                multiprobe_radius=radius, drop_stats=ds,
            )
            out.write.format("noop").mode("overwrite").save()
            dt = time.time() - t0
            if best < 0 or dt < best:
                best, stats = dt, ds
                edges = out.count()
        return round(best, 3), stats, edges

    # warmup
    run(scales[0][1], 1)

    out: dict = {}
    for tag, d, ratio in scales:
        for radius in (1, 2):
            key = f"{tag}_r{radius}"
            try:
                sec, stats, edges = run(d, radius)
            except Exception as e:
                out[key] = {"error": str(e)[:300]}
                print(f"{key}: FAILED {e}", file=sys.stderr)
                continue
            out[key] = {
                "sec": sec, "data_ratio": ratio, "edges": edges,
                "drop_stats": stats,
            }
            print(f"{key}: {sec}s  edges={edges}  {stats}")

    doc = {"metric": "knn_graph_scale_probe", "cpus": int(cpus),
           "entries": out}
    for a, b, dr in (("sf0.1_r1", "sf1_r1", 10.0),
                     ("sf1_r1", "sf2_r1", 2.0),
                     ("sf0.1_r2", "sf1_r2", 10.0),
                     ("sf1_r2", "sf2_r2", 2.0)):
        if a in out and b in out and "sec" in out[a] and "sec" in out[b]:
            doc[f"ratio_{a}_to_{b}"] = {
                "wall": round(out[b]["sec"] / out[a]["sec"], 2),
                "data": dr,
            }
    with open(os.path.join(REPO, "KNN_SCALE_PROBE.json"), "w") as f:
        json.dump(doc, f, indent=2)
        f.write("\n")
    print(json.dumps({k: v for k, v in doc.items()
                      if k.startswith("ratio_")}))
    spark.stop()
    return 0


if __name__ == "__main__":
    sys.exit(main())
