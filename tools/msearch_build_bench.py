"""_msearch Q=100 build-time before/after (VERDICT r15 directive 4):
time the driver-side predicate CONSTRUCTION of 100 mixed-shape
queries on the documents schema through the Column backend
(query.compile_query — one py4j trip per operator node) and through
the promoted default path (query_sql.compile_query_fast — one
rendered SQL string per query, one F.expr parse). Construction only:
no execution, the cost that multiplies per query in msearch/panel/
percolate fan-outs.

Usage: python tools/msearch_build_bench.py
Prints one JSON line; paste the numbers into SURVEY.md's round
narrative."""

from __future__ import annotations

import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

VOCAB = (
    "spark table scan query filter join group agg sort hash line "
    "column order part value key stream window batch vector"
).split()


def queries_q100() -> list[str]:
    out = []
    nv = len(VOCAB)
    for i in range(100):
        w1, w2 = VOCAB[i % nv], VOCAB[(i * 7 + 3) % nv]
        shape = i % 8
        out.append([
            f"text:{w1}",
            f"text:{w1} AND n_chars:>={(i % 40) * 10}",
            f'text:"{w1} {w2}"',
            f"text:{w1}* OR lang:en",
            f"text:/{w1[:3]}.*/",
            f'text:"{w1} {w2}"~1',
            f"+text:{w1} -text:{w2} source:web*",
            f"n_chars:[{i * 3} TO {i * 30}] OR {w1}",
        ][shape])
    return out


def main() -> int:
    from pyspark.sql import SparkSession

    spark = (
        SparkSession.builder.master("local[4]")
        .appName("msearch_build_bench")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    import __spark_entry__ as entry
    from toshokan_spark.query import compile_query
    from toshokan_spark.query_sql import compile_query_fast

    cols = {"doc_id", "text", "lang", "source", "n_chars"}
    qs = queries_q100()
    # warmup both paths (JVM parser init)
    compile_query(qs[0], entry.DOCS_CONFIG, cols)
    compile_query_fast(qs[0], entry.DOCS_CONFIG, cols)

    def bench(fn) -> float:
        best = None
        for _ in range(3):
            t0 = time.time()
            for q in qs:
                fn(q, entry.DOCS_CONFIG, cols)
            dt = time.time() - t0
            best = dt if best is None else min(best, dt)
        return round(best, 3)

    t_col = bench(compile_query)
    t_sql = bench(compile_query_fast)
    print(json.dumps({
        "metric": "msearch_q100_build_seconds",
        "column_backend_sec": t_col,
        "sql_text_backend_sec": t_sql,
        "speedup": round(t_col / t_sql, 1) if t_sql > 0 else None,
        "n_queries": len(qs),
    }))
    spark.stop()
    return 0


if __name__ == "__main__":
    sys.exit(main())
