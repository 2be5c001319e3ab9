"""Semantics of the ES relevance-query family
(toshokan_spark/operators/relevance.py): more_like_this term
selection and scoring, multi_match / dis_max combining, function_score
decay curves, terms_set counting."""

import math

import pytest
from pyspark.sql import functions as F

from toshokan_spark.operators.relevance import (
    dis_max,
    exp_decay,
    field_value_factor,
    gauss_decay,
    linear_decay,
    mlt_select_terms,
    more_like_this,
    multi_match,
    terms_set_match,
)


@pytest.fixture()
def corpus(spark):
    rows = [
        (0, "alpha alpha beta beta gamma", "en"),
        (1, "alpha beta", "en"),
        (2, "alpha gamma delta", "en"),
        (3, "beta beta beta", "en"),
        (4, "delta epsilon", "fr"),
        (5, "alpha beta gamma", "fr"),
        (6, "zeta zeta", "fr"),
    ]
    return spark.createDataFrame(rows, "doc_id long, text string, lang string")


def test_mlt_select_terms_filters_and_ranks(corpus):
    # seed 0 repeats alpha and beta (tf=2 each); gamma has tf=1 and is
    # cut by min_term_freq. alpha df=4, beta df=4 -> equal tf*idf ->
    # term-asc tie: alpha first.
    terms = mlt_select_terms(
        corpus, 0, min_term_freq=2, min_doc_freq=1, max_query_terms=5
    )
    assert terms == ["alpha", "beta"]
    # min_doc_freq cuts candidates rarer than the floor
    assert mlt_select_terms(corpus, 0, min_term_freq=2, min_doc_freq=5) == []
    # max_query_terms truncates after ranking
    assert mlt_select_terms(
        corpus, 0, min_term_freq=2, min_doc_freq=1, max_query_terms=1
    ) == ["alpha"]
    # absent seed -> no terms
    assert mlt_select_terms(corpus, 99) == []


def test_more_like_this_excludes_seed_and_ranks(corpus):
    out = more_like_this(
        corpus, 0, min_term_freq=2, min_doc_freq=1, max_query_terms=5, k=10
    ).collect()
    ids = [r.doc_id for r in out]
    assert 0 not in ids
    # every returned doc contains alpha or beta
    assert set(ids) <= {1, 2, 3, 5}
    # scores are sorted (desc), ties by id asc
    scores = [r.mlt for r in out]
    assert scores == sorted(scores, reverse=True)
    # doc 3 (beta x3) must outscore doc 2 (alpha x1): higher tf, shorter dl
    s = {r.doc_id: r.mlt for r in out}
    assert s[3] > s[2]
    # no selectable terms -> empty frame with the contract columns
    empty = more_like_this(corpus, 6, min_term_freq=3, min_doc_freq=1)
    assert empty.columns == ["doc_id", "mlt"] and empty.count() == 0


def test_multi_match_best_vs_most_fields(corpus):
    docs = corpus.withColumn("lang", F.col("lang"))
    best = multi_match(
        docs, "alpha en", [("text", "default"), ("lang", "default")],
        mode="best_fields", tie_breaker=0.0, k=10,
    ).collect()
    most = multi_match(
        docs, "alpha en", [("text", "default"), ("lang", "default")],
        mode="most_fields", tie_breaker=0.0, k=10,
    ).collect()
    b = {r.doc_id: r for r in best}
    m = {r.doc_id: r for r in most}
    # doc 0 matches both fields: best == max, most == sum
    assert b[0].score == pytest.approx(max(b[0].s_text, b[0].s_lang), abs=1e-9)
    assert m[0].score == pytest.approx(m[0].s_text + m[0].s_lang, abs=1e-9)
    assert m[0].score > b[0].score
    # tie_breaker interpolates between the two
    mid = multi_match(
        docs, "alpha en", [("text", "default"), ("lang", "default")],
        mode="best_fields", tie_breaker=0.5, k=10,
    ).collect()
    md = {r.doc_id: r for r in mid}
    assert b[0].score < md[0].score < m[0].score
    # a doc matching only one field (doc 3: lang=en, no alpha in
    # text) scores that field alone in every mode
    assert b[3].s_text == 0.0
    assert b[3].score == pytest.approx(b[3].s_lang, abs=1e-9)
    assert m[3].score == pytest.approx(b[3].score, abs=1e-9)


def test_dis_max_takes_best_clause(corpus):
    out = dis_max(
        corpus, ["alpha", "zeta"], tie_breaker=0.0, k=10
    ).collect()
    d = {r.doc_id: r for r in out}
    # doc 6 matches only clause 1; its score is exactly s_q1
    assert d[6].score == pytest.approx(d[6].s_q1, abs=1e-9)
    assert d[6].s_q0 == 0.0
    # every score == max(clauses) when tie_breaker=0
    for r in out:
        assert r.score == pytest.approx(max(r.s_q0, r.s_q1), abs=1e-9)


def test_decay_curves(spark):
    df = spark.createDataFrame(
        [(0.0,), (1.0,), (8.0,), (12.0,), (15.0,), (100.0,)], "d double"
    )
    rows = df.select(
        "d",
        gauss_decay(F.col("d"), scale=7.0, offset=1.0, decay=0.5).alias("g"),
        exp_decay(F.col("d"), scale=7.0, offset=1.0, decay=0.5).alias("e"),
        linear_decay(F.col("d"), scale=7.0, offset=1.0, decay=0.5).alias("l"),
    ).collect()
    by = {r.d: r for r in rows}
    # inside the offset every curve scores 1.0
    for c in ("g", "e", "l"):
        assert by[0.0][c] == pytest.approx(1.0)
        assert by[1.0][c] == pytest.approx(1.0)
    # at offset+scale every curve scores exactly `decay`
    for c in ("g", "e", "l"):
        assert by[8.0][c] == pytest.approx(0.5, rel=1e-9)
    # gauss falls fastest beyond the scale, exp slowest (well inside
    # the linear support)...
    assert by[12.0].g < by[12.0].l < by[12.0].e
    # ...and linear hits exactly 0 at offset + scale/(1-decay) = 15
    assert by[15.0].l == 0.0
    assert by[100.0].l == 0.0
    assert 0.0 < by[100.0].e < 1e-3


def test_field_value_factor_modifiers(spark):
    df = spark.createDataFrame([(9.0,)], "v double")
    r = df.select(
        field_value_factor(F.col("v"), 1.0, "none").alias("n"),
        field_value_factor(F.col("v"), 1.0, "log1p").alias("lg"),
        field_value_factor(F.col("v"), 1.0, "ln1p").alias("ln"),
        field_value_factor(F.col("v"), 4.0, "sqrt").alias("sq"),
        field_value_factor(F.col("v"), 2.0, "square").alias("s2"),
    ).collect()[0]
    assert r.n == 9.0
    assert r.lg == pytest.approx(1.0)  # log10(10)
    assert r.ln == pytest.approx(math.log(10.0))
    assert r.sq == pytest.approx(6.0)
    assert r.s2 == pytest.approx(324.0)
    with pytest.raises(ValueError):
        field_value_factor(F.col("v"), 1.0, "reciprocal")


def test_terms_set_counts_distinct_matches(corpus):
    out = terms_set_match(
        corpus, ["alpha", "beta", "gamma"], min_match=2
    ).collect()
    got = {r.doc_id: r.n_matched for r in out}
    # repeats don't inflate the count: doc 0 has alpha x2 beta x2
    # gamma x1 -> 3 distinct
    assert got == {0: 3, 1: 2, 2: 2, 5: 3}
    # query terms are analyzed (case-folded) like any term
    up = terms_set_match(corpus, ["ALPHA", "Beta"], min_match=2).collect()
    assert {r.doc_id for r in up} == {0, 1, 5}


def test_mmr_diversifies_vs_pure_relevance(spark):
    """MMR demotes a near-duplicate of an already-selected hit; with
    λ=1 the greedy degenerates to pure relevance order."""
    from toshokan_spark.operators.similarity import mmr_rerank

    rows = [
        (0, [1.0, 0.0, 0.0]),      # query
        (1, [0.99, 0.10, 0.0]),    # most relevant
        (2, [0.98, 0.11, 0.0]),    # near-duplicate of 1
        (3, [0.70, 0.70, 0.0]),    # diverse, less relevant
    ]
    emb = spark.createDataFrame(
        rows, "vec_id long, embedding array<double>"
    )
    out = mmr_rerank(emb, 0, k=3, pool=3, lam=0.3).collect()
    order = [r.vec_id for r in out]
    assert order[0] == 1            # best relevance first
    assert order[1] == 3            # diversity beats the near-dup
    assert order[2] == 2
    assert [r["rank"] for r in out] == [1, 2, 3]
    # λ=1: pure relevance order, mmr == lam·relevance
    pure = mmr_rerank(emb, 0, k=3, pool=3, lam=1.0).collect()
    assert [r.vec_id for r in pure] == [1, 2, 3]
    for r in pure:
        assert r.mmr == pytest.approx(r.relevance, abs=2e-6)
    # k > pool truncates to the pool
    assert mmr_rerank(emb, 0, k=10, pool=2).count() == 2


def test_span_near_ordered_and_unordered(spark):
    """span_near: slop counts INTERVENING tokens; unordered accepts
    either direction, ordered only a-then-b; span_gap is the minimum
    over all occurrence pairs."""
    from toshokan_spark.operators.relevance import span_near

    rows = [
        (1, "alpha x beta"),          # gap 1, a before b
        (2, "beta alpha"),            # gap 0, b before a
        (3, "alpha x y z beta"),      # gap 3
        (4, "alpha only here"),       # no beta
        (5, "beta z alpha q beta"),   # pairs: gaps 1 and 1
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")

    un = {r.doc_id: r.span_gap for r in span_near(
        df, "text", "alpha", "beta", slop=1).collect()}
    assert un == {1: 1, 2: 0, 5: 1}
    # ordered: doc 2 (b-then-a) drops; doc 5 keeps the a->b pair
    o = {r.doc_id: r.span_gap for r in span_near(
        df, "text", "alpha", "beta", slop=1, in_order=True).collect()}
    assert o == {1: 1, 5: 1}
    # widening the slop admits the distant pair
    assert 3 in {r.doc_id for r in span_near(
        df, "text", "alpha", "beta", slop=3).collect()}
    # multi-token clauses are rejected
    import pytest as _pytest

    with _pytest.raises(ValueError):
        span_near(df, "text", "alpha beta", "x", slop=1)


def test_span_near_same_term_needs_two_spans(spark):
    """Lucene SpanNearQuery parity (ADVICE r13): with term_a ==
    term_b, a clause pair needs TWO distinct, non-overlapping
    occurrences — one occurrence must not match itself in unordered
    mode. The fold computes each gap against the PREVIOUS occurrence
    before updating state, so self-pairs never form."""
    from toshokan_spark.operators.relevance import span_near

    rows = [
        (1, "x alone here"),     # single occurrence: no match
        (2, "x y x"),            # two occurrences, gap 1
        (3, "q x x r"),          # adjacent pair, gap 0
        (4, "no hits at all"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    un = {r.doc_id: r.span_gap for r in span_near(
        df, "text", "x", "x", slop=1).collect()}
    assert un == {2: 1, 3: 0}
    o = {r.doc_id: r.span_gap for r in span_near(
        df, "text", "x", "x", slop=1, in_order=True).collect()}
    assert o == {2: 1, 3: 0}


def test_empty_query_frames_carry_caller_id_type(spark):
    """bm25_explain's empty-query fallback and mmr_rerank's output
    must derive the id column's type from the input frame — a
    string-typed id corpus previously got a hardcoded long id in the
    empty/grouped frame, breaking unions against populated results
    (ADVICE r13)."""
    from toshokan_spark.functions.bm25 import bm25_explain
    from toshokan_spark.operators.similarity import mmr_rerank

    docs = spark.createDataFrame(
        [("d-1", "alpha beta"), ("d-2", "beta gamma")],
        "doc_id string, text string",
    )
    empty = bm25_explain(docs, "???", k=2)  # analyzes to no terms
    assert empty.count() == 0
    assert empty.schema["doc_id"].dataType.simpleString() == "string"
    populated = bm25_explain(docs, "alpha", k=2)
    # the union the finding called out: schemas must line up
    empty.unionByName(populated).collect()

    emb = spark.createDataFrame(
        [("v-0", [1.0, 0.0]), ("v-1", [0.9, 0.1]), ("v-2", [0.0, 1.0])],
        "vec_id string, embedding array<double>",
    )
    out = mmr_rerank(emb, "v-0", k=2, pool=2)
    assert out.schema["vec_id"].dataType.simpleString() == "string"
    assert out.count() == 2


def test_rank_feature_functions_and_pinned_promotion(spark):
    """rank_feature: saturation/log/sigmoid are monotone boosts added
    to the BM25 score, negatives clamp to 0; distance_feature decays
    symmetrically around the origin with nulls contributing zero;
    pinned: listed ids rank first IN LIST ORDER even as organic
    non-matches (score 0), organic matches follow, pinned never
    duplicate."""
    from toshokan_spark.operators.relevance import (
        distance_feature_score,
        pinned_query,
        rank_feature_score,
    )

    docs = spark.createDataFrame(
        [(1, "alpha beta", 100), (2, "alpha beta", 900),
         (3, "alpha", 900), (4, "nothing", 900), (5, "alpha", None)],
        "doc_id long, text string, stars long",
    )
    sat = {r.doc_id: r.score for r in rank_feature_score(
        docs, "alpha", "stars", pivot=100.0, k=10).collect()}
    # same text => same bm25; doc 2's larger feature must outrank 1
    assert sat[2] > sat[1]
    # null feature clamps to 0 => no boost, but doc still matches
    assert 5 in sat
    assert set(sat) == {1, 2, 3, 5}  # doc 4 never matches
    logs = {r.doc_id: r.score for r in rank_feature_score(
        docs, "alpha", "stars", function="log",
        scaling_factor=1.0, k=10).collect()}
    assert logs[2] > logs[1]
    sig = {r.doc_id: r.score for r in rank_feature_score(
        docs, "alpha", "stars", function="sigmoid",
        pivot=100.0, exponent=2.0, k=10).collect()}
    assert sig[2] > sig[1]
    import pytest as _pytest

    with _pytest.raises(ValueError):
        rank_feature_score(docs, "alpha", "stars", function="nope")

    dist = {r.doc_id: r.score for r in distance_feature_score(
        docs, "alpha", origin=100.0, distance_col="stars",
        pivot=50.0, k=10).collect()}
    # doc 1 sits AT the origin: full boost; doc 2 is 800 away
    assert dist[1] > dist[2]
    assert 5 in dist  # null distance: zero boost, match kept

    out = pinned_query(docs, "alpha", [4, 2], k=10).collect()
    ids = [r.doc_id for r in out]
    # 4 is an organic NON-match yet pins first with score 0
    assert ids[:2] == [4, 2]
    assert out[0].score == 0.0 and out[0].pinned
    assert not out[2].pinned
    # organic remainder excludes the pinned ids and keeps matches only
    assert set(ids[2:]) == {1, 3, 5}


def test_boosting_query_demotes_not_excludes(spark):
    """boosting: negative matches stay in the result with score x
    negative_boost; an empty negative analysis is a no-op factor."""
    from toshokan_spark.operators.relevance import boosting_query

    # docs 1 and 2 have identical length and tf so their base BM25
    # matches; only the negative term differs
    docs = spark.createDataFrame(
        [(1, "alpha beta gamma"), (2, "alpha beta legacy"), (3, "delta")],
        "doc_id long, text string",
    )
    out = {r.doc_id: r for r in boosting_query(
        docs, "alpha", "legacy", negative_boost=0.5, k=10).collect()}
    assert set(out) == {1, 2}          # demoted, never excluded
    assert out[2].demoted == 1 and out[1].demoted == 0
    assert out[2].score == pytest.approx(out[1].score * 0.5, abs=1e-6)
    noneg = {r.doc_id: r.score for r in boosting_query(
        docs, "alpha", "???", negative_boost=0.5, k=10).collect()}
    assert noneg[2] == pytest.approx(out[1].score, abs=1e-6)


def test_review_r14_hardening(spark):
    """Round-14 review findings: duplicate pinned ids dedup silently
    (ES behavior) instead of raising Spark's duplicate-map-key error;
    a negative corpus mean never becomes the rank_feature pivot (zero
    denominator / complex exponent); explicit non-positive pivots are
    rejected."""
    from toshokan_spark.operators.relevance import (
        pinned_query,
        rank_feature_score,
    )

    docs = spark.createDataFrame(
        [(1, "alpha beta", -10), (2, "alpha", -2), (3, "gamma", -5)],
        "doc_id long, text string, delta long",
    )
    out = pinned_query(docs, "alpha", [3, 3, 1], k=10).collect()
    assert [r.doc_id for r in out][:2] == [3, 1]
    # all-negative feature: pivot default must clamp to a positive
    sat = rank_feature_score(docs, "alpha", "delta", k=10).collect()
    assert all(r.score is not None for r in sat)
    sig = rank_feature_score(
        docs, "alpha", "delta", function="sigmoid", exponent=0.5, k=10
    ).collect()
    assert all(r.score is not None for r in sig)
    import pytest as _pytest

    with _pytest.raises(ValueError, match="positive"):
        rank_feature_score(docs, "alpha", "delta", pivot=-1.0)
