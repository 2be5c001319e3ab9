"""Bench-regression gate: the five most expensive driver queries run
at sf0.01 and must stay under 2.5× a checked-in wall-time floor.

Why this exists: round 3 shipped a plan regression (a helper
materialized results through the non-AQE physical plan) that made
`dedup_minhash_lsh` ~4× slower, and nothing in CI caught it — the
correctness suite doesn't time anything and the bench only runs
per-round. This gate would have tripped on that change.

Calibration: floors are ~1.3× the warm best-of-3 measured on the test
session config (local[4], 8 shuffle partitions, sf0.01) on an idle
host. The 2.5× multiplier gives total headroom of ~3× over the
typical warm time — loose enough for this host's episodic CPU-steal
bursts (each query takes its best of three runs, and a JVM/JIT warmup
query runs untimed first), tight enough that a 4× plan regression
still trips every entry.

If a LEGITIMATE change moves a floor (e.g. an operator gains work on
purpose), re-measure with three warm runs on an idle machine and
update FLOORS with the new best — don't widen the multiplier.
"""

import os
import time

import pytest

SF_DIR = "/root/testdata/sf0.01"

#: query -> wall-time floor in seconds (see calibration note above)
FLOORS = {
    "dedup_minhash_lsh": 2.2,       # r7 recalibration: warm best 1.62
    "dedup_clusters": 2.4,
    "select_training_set": 2.9,
    "dedup_ngram_jaccard": 1.5,
    "knn_ivf": 2.6,
    "dedup_minhash_char": 1.2,      # r7: warm best 0.84 (was 3.0 pre-fix)
    # r14 recalibration: warm best drifted from r7's ~1.7 to ~3.1-3.6
    # on the current host/testdata vintage (5-run spread 3.06-7.15 —
    # heavy I/O-burst variance; code unchanged since r8), and the old
    # 2.3 floor false-tripped the full-suite run at 12.54s best-of-3
    # during a long host stall
    "dedup_incremental_minhash": 3.6,
    "text_dup_ngrams": 2.0,
    "dedup_canonical": 1.8,
    # round-7 additions (warm best-of-3 on this config: 1.14/1.36/1.68)
    "cluster_size_histogram": 1.5,
    "minhash_calibration": 1.8,
    "kmeans_embeddings": 2.2,
    # round-8 additions (warm best on this config: 0.87/1.22/0.64/0.39)
    "containment_pairs": 1.2,        # single-pass both-directions fix
    "lm_quality_buckets_scaled": 1.6,
    "token_budget_pack_scaled": 0.9,
    "search_bm25": 0.6,              # manifest-stats path (post-build)
    # round-15 additions (warm best-of-3 on this config: 2.71/0.89 —
    # change_point's cost is stage-scheduling overhead across its
    # groupBy/window/broadcast/argmax chain, not data: at sf0.1 on
    # local[32] it runs 0.85 s)
    "search_change_point": 3.5,
    "search_frequent_item_sets": 1.2,
    # round-8 batch-2 operators (warm best: 0.98/1.39/0.56/0.60/0.93/
    # 0.37/0.81/1.56/0.95/0.90)
    "knn_graph": 1.3,
    "semantic_clusters": 1.8,
    "substring_spans": 0.8,
    "substring_spans_incremental": 0.9,
    "leakage_safe_split": 1.3,
    "ccnet_select": 0.6,
    "quality_classifier": 1.1,
    "dsir_weights": 2.0,
    "bpe_merges": 1.3,
    "bpe_token_counts": 1.2,
    "kcenter_select": 1.4,         # 5 argmax rounds, warm best ~1.0
    # round-9: the r8-vs-sealed noisy deltas re-measured best-of-3 on
    # an idle host (VERDICT r8 directive 7) — all at/below historical
    # warm bests, confirming load noise, and now floored: 0.25/0.92/
    # 0.45 (select_training_set re-measured 1.30, floor unchanged)
    "user_sessions": 0.4,
    "dedup_crosscheck": 1.2,
    "decontaminate": 0.6,
    # round-9 additions (warm best-of-3: 1.46/0.60)
    "dsir_select": 1.9,
    "line_dedup": 0.8,
    # round-9 batch-2 (warm best-of-3: 0.49/0.79/0.83/2.13 — the
    # ensemble is three grouped_prefix materializations by design)
    "search_significant_terms": 0.7,
    "bitext_margin": 1.1,
    "embedding_covariance": 1.1,
    "quality_ensemble": 2.8,
    # round-10: the VERDICT r9 dedup-family "regression" re-measured
    # on an IDLE host — it reproduces in a FRESH session with
    # byte-identical operator code (dedup.py last touched r8), so it
    # is environmental (driver-regenerated sf0.1 testdata between
    # rounds shifts row-group layout/content), not a plan change;
    # the 137-query common subset is flat round-over-round (109.7 ->
    # 109.9 s). The two family members without floors gain them here
    # (sf0.01 warm best-of-3: 1.00/0.67)
    "dedup_incremental": 1.3,
    "dedup_simhash": 0.9,
    # round-10 additions (sf0.01 warm best-of-3: 3.69/0.64/0.29 —
    # knn_pq's cost is codegen compile of the literal-codebook
    # expression tree, a one-time per-plan cost that does not grow
    # with the corpus; the executed scan is single-pass)
    # r14: PQ encode/LUT expressions now build as ONE parsed SQL
    # string instead of ~1500 py4j Column calls — plan construction
    # fell from 4.5s to 0.01s per query, floors re-measured (sf0.01
    # warm best-of-3: 1.65/1.43/1.92)
    "knn_pq": 2.0,
    "q21_suppliers_kept_waiting": 0.9,
    "search_panel": 0.4,
    # round-12: seals the r10 watch pair as ENVIRONMENTAL (VERDICT
    # r10 directive 8 / r11 #3). r10's sf0.1 driver bench moved
    # rollup_revenue 0.83->1.38 s and text_bigram_logprob
    # 1.31->1.64 s with NO code change; the code-unchanged r11 driver
    # re-run (BENCH_r11.json) reverted them to 1.19 s / 1.56 s,
    # confirming session noise, not a plan change. Floored here from
    # sf0.01 warm best-of-3 on an idle host: 0.27/0.64.
    "rollup_revenue": 0.5,
    "text_bigram_logprob": 0.9,
    # round-12 additions (sf0.01 warm best-of-3: 2.40/1.06/2.69/
    # 0.76/0.88/0.65 — train_quality_classifier is 3 GD rounds +
    # apply by design; knn_pq_persisted pays the encode+write+LUT
    # codegen once per plan, the executed query scans 16 B/vector)
    "train_quality_classifier": 3.2,
    "langid_classifier": 1.4,
    "knn_pq_persisted": 1.8,
    "q2_min_cost_supplier": 1.0,
    "q9_product_type_profit": 1.2,
    "dedup_incremental_url": 0.9,
    # round-13 additions (sf0.01 warm best-of-3: 5.13/2.44/1.84/
    # 0.82 — knn_pq_rerank composes knn_pq's literal-codebook
    # codegen cost (see knn_pq note) plus the shortlist refine;
    # domain_pagerank is 5 chained iterations in one lazy job;
    # matryoshka_recall is 4 brute-force passes by design)
    "knn_pq_rerank": 2.4,
    "domain_pagerank": 3.2,
    "matryoshka_recall": 2.4,
    "audience_overlap": 1.1,
    # round-13 second-session additions (warm best-of-3 on this
    # config: 1.81/1.21/0.96/0.87/0.72/0.41/0.45/0.39).
    # text_char_entropy's floor specifically guards the HOF-staging
    # rule: un-staging the sorted char array re-sorts it per element
    # (interpreted O(n²)/row — measured minutes, not seconds, at
    # sf0.1) and would blow straight through this bound.
    "search_phrase_suggest": 2.4,
    "search_more_like_this": 1.6,
    "search_multi_match": 1.3,
    "search_dis_max": 1.2,
    "mmr_rerank": 1.0,
    "search_string_stats": 0.6,
    "search_cumulative_cardinality": 0.6,
    "text_char_entropy": 0.6,
    # round-14: span_near rebuilt as a single linear aggregate fold
    # over the token array (sf0.01 warm best-of-3: 0.55; sf0.1:
    # 0.7-1.1 s vs 18-23 s for the r13 staged-positions plan, whose
    # filter Catalyst pushed through the staging projections,
    # inlining the tokenizer per probed position — O(positions x
    # tokens) per row). This floor plus the plan pin in
    # test_plan_audit.py guards against that shape returning.
    "search_span_near": 0.7,
    # percolator: width-4 standing-query projection, one scan
    # (sf0.01 warm best-of-3: 0.35). The width-500 cliff guard lives
    # in tests/test_cli_panels.py::test_percolate_500_standing_queries.
    "search_percolate": 0.5,
}
MULTIPLIER = 2.5
RUNS = 3
EXTRA_RUNS = 2


@pytest.mark.skipif(not os.path.isdir(SF_DIR), reason="sf0.01 testdata absent")
def test_expensive_queries_within_wall_time_floor(spark):
    import __spark_entry__ as entry

    qs = entry.queries()

    # untimed warmup: first JVM/JIT/codegen pass of the session should
    # not count against any query's budget
    qs["dedup_ngram_jaccard"](spark, SF_DIR).write.format("noop").mode(
        "overwrite"
    ).save()

    failures = []
    for name, floor in FLOORS.items():
        best = None
        # RUNS normal attempts, plus EXTRA_RUNS only when still over
        # budget: a multi-run host I/O stall (observed: three
        # consecutive slow runs during a full-suite session) should
        # exhaust retries before tripping the gate, while a REAL plan
        # regression fails every extra run too
        for _ in range(RUNS + EXTRA_RUNS):
            t0 = time.monotonic()
            qs[name](spark, SF_DIR).write.format("noop").mode("overwrite").save()
            dt = time.monotonic() - t0
            best = dt if best is None else min(best, dt)
            if best <= floor * MULTIPLIER:
                break  # already inside budget — skip remaining runs
        if best > floor * MULTIPLIER:
            failures.append(f"{name}: best-of-{RUNS + EXTRA_RUNS} "
                            f"{best:.2f}s > {MULTIPLIER}×floor({floor}s)")
    assert not failures, "bench regression gate tripped:\n" + "\n".join(failures)
