"""End-to-end curation pipeline: the operators composed the way a
real training-data run composes them, with the cross-stage invariants
asserted — composition is where unit-green operators disagree about
schemas, id columns, and ordering assumptions.

Stages (a RefinedWeb/CCNet-shaped recipe):
  ingest JSONL -> canonicalize -> exact dedup -> near-dup clusters
  -> quality filter (Gopher flags) -> CCNet tail thinning
  -> leakage-safe split -> pack the train split into sequences
"""

import json

import pytest
from pyspark.sql import functions as F


@pytest.fixture(scope="module")
def corpus(spark, tmp_path_factory):
    """A small corpus with every hazard the pipeline must handle:
    exact dups (composed vs decomposed unicode), near-dups, a
    low-quality symbol doc, and unique filler."""
    rows = []
    base = ("the quick brown fox jumps over the lazy dog and then "
            "runs far away into the quiet green forest tonight")
    # 0/1: exact dups after canonicalization (NFC é vs e+combining)
    rows.append({"doc_id": 0, "source": "web",
                 "text": base + " café"})
    rows.append({"doc_id": 1, "source": "web",
                 "text": base + " café"})
    # 2: near-dup of 0 (one word appended)
    rows.append({"doc_id": 2, "source": "web", "text": base + " café again"})
    # 3: junk (symbol soup, fails gopher alpha fraction)
    rows.append({"doc_id": 3, "source": "web",
                 "text": "$$$ ### @@@ %%% ^^^ &&& *** $$$ ### @@@ %%% ^^^"})
    # 4..43: unique filler over two sources
    words = ("alpha beta gamma delta epsilon zeta eta theta iota kappa "
             "lambda mu nu xi omicron pi rho sigma tau upsilon").split()
    for i in range(4, 44):
        src = "web" if i % 2 == 0 else "books"
        text = " ".join(words[(i + j) % len(words)] for j in range(30))
        rows.append({"doc_id": i, "source": src, "text": text + f" tail{i}"})
    p = tmp_path_factory.mktemp("pipe") / "corpus.jsonl"
    p.write_text("\n".join(json.dumps(r) for r in rows) + "\n")
    return spark.read.json(str(p))


def test_curation_pipeline_end_to_end(spark, corpus):
    from toshokan_spark.operators import dedup, sampling
    from toshokan_spark.operators import text as textops

    # 1. canonicalize: unicode twins must converge
    norm = textops.normalize_text(corpus)
    docs = corpus.drop("text").join(
        norm.select("doc_id", F.col("text_norm").alias("text")), "doc_id"
    )
    t01 = {r.doc_id: r.text for r in docs.filter(F.col("doc_id") < 2).collect()}
    assert t01[0] == t01[1], "NFC canonicalization did not converge the twins"

    # 2. exact dedup: one of {0, 1} survives (min id wins per keep_first)
    exact = dedup.deduplicate_exact(docs)
    kept_ids = {r.doc_id for r in exact.select("doc_id").collect()}
    assert 0 in kept_ids and 1 not in kept_ids

    # 3. near-dup clusters over the exact-deduped set: 2 clusters with 0
    pairs = dedup.ngram_jaccard_pairs(exact, k=3, threshold=0.5)
    labels = dedup.duplicate_clusters(pairs)
    lab = {r.doc_id: r.cluster_id for r in labels.collect()}
    assert lab.get(2) == 0, f"near-dup 2 should cluster with 0: {lab}"

    # 4. quality filter: the symbol-soup doc fails Gopher rules
    flags = textops.gopher_rules(exact)
    bad = {r.doc_id for r in flags.filter(~F.col("passes")).collect()}
    assert 3 in bad
    quality = exact.join(
        flags.filter(F.col("passes")).select("doc_id"), "doc_id"
    )

    # 5. CCNet tail thinning keeps head+middle whole
    selected = textops.ccnet_select(quality, n_buckets=3, tail_rate=0.5)
    n_head = selected.filter(F.col("kept_by") == "head_middle").count()
    full_buckets = textops.lm_quality_buckets(quality)
    assert n_head == full_buckets.filter(F.col("bucket") < 3).count()
    kept = quality.join(selected.select("doc_id"), "doc_id")

    # 6. leakage-safe split: near-dup cluster members share a split
    split = sampling.leakage_safe_split(
        kept.select("doc_id", "source"), labels,
        {"train": 0.6, "valid": 0.2, "test": 0.2},
    )
    by_cluster: dict = {}
    for r in split.collect():
        by_cluster.setdefault(r.cluster_id, set()).add(r.split)
    assert all(len(s) == 1 for s in by_cluster.values())
    if 0 in {r.doc_id for r in kept.select("doc_id").collect()} and 2 in {
        r.doc_id for r in kept.select("doc_id").collect()
    }:
        s = {r.doc_id: r.split for r in split.collect()}
        assert s[0] == s[2], "near-dups 0 and 2 landed in different splits"

    # 7. pack the train split: contiguous, gap-free sequence layout
    train = kept.join(
        split.filter(F.col("split") == "train").select("doc_id"), "doc_id"
    ).select(
        "doc_id", "source",
        F.size(F.split(F.trim("text"), r"\s+")).alias("n_tokens"),
    )
    packed = sampling.pack_training_sequences(train, seq_len=64)
    rows = sorted(
        ((r.source, r.start_tok, r.end_tok) for r in packed.collect())
    )
    pos = {}
    for src, start, end in rows:
        assert start == pos.get(src, 0), f"gap in {src} at {start}"
        pos[src] = end
    # every train doc placed exactly once
    assert packed.count() == train.count()


def test_model_filter_and_span_report_compose(spark, corpus):
    """The round-8 stages slot into the same chain: the hashed linear
    classifier gates docs (dense all-positive model keeps everything
    — plumbing check), the substring-span report flags the verbatim
    prefix shared by the near-dup pair, and DSIR ranks the wordy docs
    above symbol soup against a clean target."""
    from pyspark.sql import Row

    from toshokan_spark.operators import dedup
    from toshokan_spark.operators import text as textops

    docs = corpus
    # classifier gate: all-positive dense model keeps every doc
    w = spark.createDataFrame([Row(idx=i, w=1.0) for i in range(1024)])
    gated = docs.join(
        textops.hashed_linear_score(docs, w, dim=1024)
        .filter(F.col("label"))
        .select("doc_id"),
        "doc_id",
    )
    assert gated.count() == docs.count()

    # span report: docs 0/1/2 share a long verbatim prefix; with
    # k=5 word windows the LOWEST id owns and the others are covered
    spans = {
        r.doc_id: r.covered_tokens
        for r in dedup.exact_substring_spans(docs, k=5).collect()
    }
    assert spans[0] == 0          # owner
    assert spans[1] > 15          # full exact dup, fully covered
    assert spans[2] > 15          # near-dup: shared prefix covered
    # the fillers are rotations of ONE cyclic word stream with period
    # 20 over 30 words: even the lowest-id filler (4) repeats ITSELF —
    # gram positions 20..25 duplicate 0..5, union [20, 30) = 10
    # covered tokens — and later rotations are owned by earlier docs
    # almost entirely
    assert spans[4] == 10
    assert spans[24] > spans[4]

    # DSIR with the filler docs as target: every in-target doc must
    # outrank every off-target one (0..3 — the English-y prose and
    # the symbol soup are both absent from the filler vocabulary; the
    # log weight is a count-weighted SUM, so the LONGER off-target
    # docs are the most negative, which is correct DSIR behavior)
    target = docs.filter(F.col("doc_id") >= 4)
    dsir = {r.doc_id: r.log_weight for r in
            textops.dsir_log_weights(docs, target, dim=1024).collect()}
    worst_target = min(v for k, v in dsir.items() if k >= 4)
    best_off = max(v for k, v in dsir.items() if k < 4)
    assert best_off < worst_target, dsir


def test_repeat_curriculum_pack_compose(spark, corpus):
    """The round-9 additions composed the way a training run uses
    them: temperature mixture -> repetition plan -> epoch expansion
    -> curriculum ordering of the expanded instances -> packing the
    ordered stream. Cross-stage invariants: copies are exact and
    distinct, positions are a permutation, stages are difficulty-
    monotone, and the packed stream is gap-free in curriculum
    order."""
    from toshokan_spark.operators import sampling

    tokens = corpus.select(
        "doc_id", "source",
        F.size(F.split(F.trim("text"), r"\s+")).alias("n_tokens"),
    )
    total = tokens.agg(F.sum("n_tokens")).collect()[0][0]
    weights = sampling.source_mixture(tokens, alpha=0.5)
    plan = sampling.repeat_plan(weights, budget_tokens=int(total * 1.5))
    p = {r["source"]: r for r in plan.collect()}

    expanded = sampling.epoch_expand(tokens, plan, seed=11)
    inst = expanded.join(tokens, ["doc_id", "source"])
    # every (doc, copy) occurs once; per-doc copy counts are nf or nf+1
    assert inst.count() == inst.select("doc_id", "copy").distinct().count()
    per_doc = {
        r["doc_id"]: r["n"]
        for r in inst.groupBy("doc_id").agg(F.count("*").alias("n")).collect()
    }
    src_of = {r["doc_id"]: r["source"] for r in tokens.collect()}
    for d, n in per_doc.items():
        nf = p[src_of[d]]["n_full_copies"]
        assert n in (nf, nf + 1), f"doc {d}: {n} copies vs plan {nf}"

    # curriculum over the expanded INSTANCES (repetitions shuffle
    # independently): synthetic instance id = doc*100 + copy
    inst_id = inst.select(
        (F.col("doc_id") * 100 + F.col("copy")).alias("inst_id"),
        "n_tokens",
    )
    ordered = sampling.curriculum_order(
        inst_id, F.col("n_tokens").cast("long"), n_stages=3, seed=5,
        id_col="inst_id",
    )
    rows = ordered.join(inst_id, "inst_id").collect()
    n = len(rows)
    assert sorted(r["position"] for r in rows) == list(range(1, n + 1))
    by_stage: dict = {}
    for r in rows:
        by_stage.setdefault(r["stage"], []).append(r["n_tokens"])
    stages = sorted(by_stage)
    for a, b in zip(stages, stages[1:]):
        assert max(by_stage[a]) <= min(by_stage[b]), (
            f"stage {a} harder than stage {b}"
        )

    # pack the curriculum stream: one global shard in position order
    stream = ordered.join(inst_id, "inst_id").select(
        "inst_id", F.lit("all").alias("shard"), "position", "n_tokens"
    )
    packed = sampling.pack_training_sequences(
        stream, seq_len=64, shard_col="shard", order_col="position"
    )
    placed = sorted(
        (r["start_tok"], r["end_tok"]) for r in packed.collect()
    )
    pos = 0
    for start, end in placed:
        assert start == pos, f"gap at {start}"
        pos = end
    assert packed.count() == n
