"""ES relevance-query family: more_like_this / multi_match / dis_max
/ function_score / terms_set — compositions over the BM25 scorer.

The reference exposes only tantivy's QueryParser surface with one
implicit BM25 ranking (`/root/reference/src/commands/search.rs:188`);
these are the ES/Lucene query-DSL features a search user expects next,
built Spark-first as documented extensions (SURVEY §2.8):

* ``more_like_this`` — Lucene's MLT: pick the seed document's most
  characteristic terms by tf·idf, then BM25-rank the corpus against
  them (`MoreLikeThis#retrieveInterestingTerms` semantics).
* ``multi_match`` — one analyzed query scored per field, combined
  ``best_fields`` (max + tie_breaker·rest) or ``most_fields`` (sum).
* ``dis_max`` — the same combiner over arbitrary sub-queries.
* ``function_score`` building blocks — ``gauss_decay`` /
  ``exp_decay`` / ``linear_decay`` on a numeric/datetime distance and
  ``field_value_factor``, multiplied into (or replacing) the query
  score.
* ``terms_set_match`` — match documents containing at least
  ``min_match`` of the given terms (ES ``terms_set`` query).

Scale shape (100 TB): every scorer is one corpus scan + a 1-row
broadcast of corpus statistics (the `with_bm25` shape — no per-term
shuffle, no explode); MLT adds only model-sized probes of the single
seed document (≤ max_query_terms literals fold into the plan exactly
like the PQ codebooks in operators/similarity.py). Combiners join the
per-field/per-clause score projections on the id — each side is
already the match set, orders of magnitude below the corpus. Decay /
factor scoring is pure column algebra in whole-stage codegen.
"""

from __future__ import annotations

import math

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from toshokan_spark.functions.bm25 import with_bm25
from toshokan_spark.functions.tokenizers import analyze_term, tokenize

__all__ = [
    "more_like_this",
    "mlt_select_terms",
    "multi_match",
    "dis_max",
    "gauss_decay",
    "exp_decay",
    "linear_decay",
    "field_value_factor",
    "terms_set_match",
    "rank_feature_score",
    "distance_feature_score",
    "pinned_query",
    "boosting_query",
]


def mlt_select_terms(
    docs: DataFrame,
    seed_id,
    id_col: str = "doc_id",
    text_col: str = "text",
    tokenizer: str = "default",
    max_query_terms: int = 5,
    min_term_freq: int = 2,
    min_doc_freq: int = 5,
    stats_provider=None,
) -> list[str]:
    """The seed document's ``max_query_terms`` most characteristic
    terms, Lucene-MLT style: candidates are the seed's analyzed terms
    with tf ≥ min_term_freq, kept when corpus df ≥ min_doc_freq,
    ranked by seed-tf · BM25-idf (rounded to 6 decimals — the
    cross-engine-stable comparison key), ties to the lexicographically
    smaller term.

    ``stats_provider`` (the :func:`~toshokan_spark.functions.bm25.
    merged_stats_provider` contract) sources N and per-candidate df
    from the index's commit-time stats parquets instead of a corpus
    aggregation — at index scale the df probe becomes a
    metadata-sized read, and only the one seed document is fetched
    from data files (its id filter pushes to the scan).

    Returns a plain list (model-sized: one document's vocabulary cut
    to a handful) so the scorer can fold the terms into the plan as
    literals — the same folding discipline as the PQ codebooks.
    """
    seed = (
        docs.filter(F.col(id_col) == F.lit(seed_id))
        .select(tokenize(F.col(text_col), tokenizer).alias("__toks"))
        .limit(1)
    )
    seed_rows = seed.collect()  # one row — the seed document probe
    if not seed_rows or not seed_rows[0]["__toks"]:
        return []
    tf: dict[str, int] = {}
    for t in seed_rows[0]["__toks"]:
        tf[t] = tf.get(t, 0) + 1
    cands = sorted(t for t, c in tf.items() if c >= min_term_freq)
    if not cands:
        return []

    if stats_provider is not None:
        # metadata path: N and df come from the merged commit-time
        # segment stats (same column contract as with_bm25's provider)
        stats = stats_provider(cands).collect()[0]
    else:
        toks = tokenize(F.col(text_col), tokenizer)
        stats = docs.agg(
            F.count(F.lit(1)).alias("__n"),
            *[
                F.sum(F.array_contains(toks, F.lit(t)).cast("int")).alias(f"__df{i}")
                for i, t in enumerate(cands)
            ],
        ).collect()[0]  # 1-row corpus-stats probe
    n = stats["__n"]
    scored = []
    for i, t in enumerate(cands):
        df = stats[f"__df{i}"] or 0
        if df < min_doc_freq:
            continue
        idf = math.log(1.0 + (n - df + 0.5) / (df + 0.5))
        scored.append((round(tf[t] * idf, 6), t))
    scored.sort(key=lambda p: (-p[0], p[1]))
    return [t for _, t in scored[:max_query_terms]]


def more_like_this(
    docs: DataFrame,
    seed_id,
    id_col: str = "doc_id",
    text_col: str = "text",
    tokenizer: str = "default",
    max_query_terms: int = 5,
    min_term_freq: int = 2,
    min_doc_freq: int = 5,
    k: int = 10,
    stats_provider=None,
) -> DataFrame:
    """ES/Lucene ``more_like_this``: (id, mlt) for the top *k*
    documents most similar to the seed, scored by BM25 over the
    selected interesting terms, the seed itself excluded. Ranking is
    the repo-standard cross-engine total order (rounded score desc,
    id asc).

    With ``stats_provider`` both statistics consumers — the
    term-selection df probe and the BM25 scorer — answer from the
    index's commit-time stats parquets, so the only corpus-sized
    work left is the single scoring scan."""
    terms = mlt_select_terms(
        docs, seed_id, id_col, text_col, tokenizer,
        max_query_terms, min_term_freq, min_doc_freq,
        stats_provider=stats_provider,
    )
    base = docs.select(F.col(id_col).alias("id"), F.col(text_col))
    if not terms:
        return base.select(
            F.col("id").alias(id_col), F.lit(0.0).alias("mlt")
        ).limit(0)
    scored = with_bm25(
        base, " ".join(terms), text_col=text_col,
        out_col="mlt", tokenizer=tokenizer,
        stats_provider=stats_provider,
    )
    return (
        scored.filter(F.col("id") != F.lit(seed_id))
        .orderBy(F.col("mlt").desc(), F.col("id").asc())
        .limit(k)
        .select(F.col("id").alias(id_col), "mlt")
    )


def _combine_scores(
    parts: list[DataFrame],
    id_col: str,
    mode: str,
    tie_breaker: float,
) -> DataFrame:
    """Full-outer join the (id, score_i) projections and combine:
    ``best_fields`` = max + tie_breaker·(sum − max), ``most_fields``
    = sum. Each part is a match set (already orders of magnitude
    below the corpus), so the join is cheap; absent sides contribute
    0."""
    assert mode in ("best_fields", "most_fields"), mode
    out = parts[0]
    for i, p in enumerate(parts[1:], start=1):
        out = out.join(p, on=id_col, how="full_outer")
    score_cols = [c for c in out.columns if c != id_col]
    vals = [F.coalesce(F.col(c), F.lit(0.0)) for c in score_cols]
    total = vals[0]
    for v in vals[1:]:
        total = total + v
    if mode == "most_fields":
        combined = total
    else:
        best = F.greatest(*vals) if len(vals) > 1 else vals[0]
        combined = best + F.lit(tie_breaker) * (total - best)
    return out.select(
        id_col,
        *[F.coalesce(F.col(c), F.lit(0.0)).alias(c) for c in score_cols],
        F.round(combined, 6).alias("score"),
    )


def multi_match(
    docs: DataFrame,
    query: str,
    fields: list[tuple[str, str]],
    id_col: str = "doc_id",
    mode: str = "best_fields",
    tie_breaker: float = 0.0,
    k: int = 10,
    stats_providers=None,
) -> DataFrame:
    """ES ``multi_match``: the analyzed query BM25-scored per field
    (each with its own tokenizer and per-field corpus statistics —
    Lucene scores fields as independent inverted indexes), combined
    ``best_fields``/``most_fields``. Output: id, per-field scores
    (``s_<field>``), combined ``score``; top *k* by (score desc, id
    asc).

    ``stats_providers`` maps field name → a ``merged_stats_provider``
    so each field's N/Σdl/df come from the index's commit-time stats
    parquets (its own rows — per-field statistics are exactly what
    the stats parquet keys on); fields absent from the map fall back
    to the corpus aggregation."""
    parts = []
    for col, tok in fields:
        provider = (stats_providers or {}).get(col)
        scored = with_bm25(
            docs.select(F.col(id_col).alias("__id"), F.col(col)),
            query, text_col=col, out_col=f"s_{col}", tokenizer=tok,
            stats_provider=provider,
        ).select(F.col("__id").alias(id_col), f"s_{col}")
        parts.append(scored)
    out = _combine_scores(parts, id_col, mode, tie_breaker)
    return out.orderBy(F.col("score").desc(), F.col(id_col).asc()).limit(k)


def dis_max(
    docs: DataFrame,
    queries: list[str],
    id_col: str = "doc_id",
    text_col: str = "text",
    tokenizer: str = "default",
    tie_breaker: float = 0.0,
    k: int = 10,
    stats_provider=None,
) -> DataFrame:
    """ES ``dis_max``: each sub-query scored independently over the
    same field, a document's score = its best clause + tie_breaker ×
    the rest. Output: id, ``s_q0..s_q{n-1}``, ``score``; top *k* by
    (score desc, id asc). ``stats_provider`` (one field, so one
    provider) routes every clause's N/Σdl/df to the index's
    commit-time stats parquets."""
    parts = []
    for i, q in enumerate(queries):
        scored = with_bm25(
            docs.select(F.col(id_col).alias("__id"), F.col(text_col)),
            q, text_col=text_col, out_col=f"s_q{i}", tokenizer=tokenizer,
            stats_provider=stats_provider,
        ).select(F.col("__id").alias(id_col), f"s_q{i}")
        parts.append(scored)
    out = _combine_scores(parts, id_col, "best_fields", tie_breaker)
    return out.orderBy(F.col("score").desc(), F.col(id_col).asc()).limit(k)


def _decay_sigma2(scale: float, decay: float) -> float:
    # ES GaussDecayFunction: sigma^2 = -scale^2 / (2 ln(decay))
    return -(scale * scale) / (2.0 * math.log(decay))


def gauss_decay(
    dist: Column, scale: float, offset: float = 0.0, decay: float = 0.5
) -> Column:
    """ES ``gauss`` decay on an absolute distance column (caller
    supplies ``|field − origin|`` in whatever unit *scale*/*offset*
    are in): exp(−max(0, d−offset)² / 2σ²), σ² = −scale²/(2·ln decay).
    Scores 1.0 inside the offset, *decay* at offset+scale."""
    d = F.greatest(dist - F.lit(offset), F.lit(0.0))
    return F.exp(-(d * d) / F.lit(2.0 * _decay_sigma2(scale, decay)))


def exp_decay(
    dist: Column, scale: float, offset: float = 0.0, decay: float = 0.5
) -> Column:
    """ES ``exp`` decay: exp(λ·max(0, d−offset)), λ = ln(decay)/scale."""
    lam = math.log(decay) / scale
    d = F.greatest(dist - F.lit(offset), F.lit(0.0))
    return F.exp(F.lit(lam) * d)


def linear_decay(
    dist: Column, scale: float, offset: float = 0.0, decay: float = 0.5
) -> Column:
    """ES ``linear`` decay: max(0, (s − d)/s), s = scale/(1 − decay),
    clamped at 0 beyond the support (ES's piecewise-linear ramp)."""
    s = scale / (1.0 - decay)
    d = F.greatest(dist - F.lit(offset), F.lit(0.0))
    return F.greatest((F.lit(s) - d) / F.lit(s), F.lit(0.0))


def field_value_factor(
    col: Column, factor: float = 1.0, modifier: str = "none"
) -> Column:
    """ES ``field_value_factor``: modifier(factor · value). Supported
    modifiers: none / log1p / ln1p / sqrt / square (the deterministic
    subset)."""
    v = col.cast("double") * F.lit(factor)
    if modifier == "none":
        return v
    if modifier == "log1p":
        return F.log10(F.lit(1.0) + v)
    if modifier == "ln1p":
        return F.log(F.lit(1.0) + v)
    if modifier == "sqrt":
        return F.sqrt(v)
    if modifier == "square":
        return v * v
    raise ValueError(f"unsupported modifier: {modifier}")


def terms_set_match(
    docs: DataFrame,
    terms: list[str],
    min_match: int,
    id_col: str = "doc_id",
    text_col: str = "text",
    tokenizer: str = "default",
) -> DataFrame:
    """ES ``terms_set`` query: documents whose analyzed token set
    contains at least *min_match* of the (analyzed) query terms.
    Output: (id, n_matched) — n_matched counts DISTINCT matched
    terms, the Lucene CoveringQuery semantics. One scan, the term
    list folds into an ``array_intersect`` against the token array —
    no explode, no shuffle beyond the caller's."""
    analyzed = list(dict.fromkeys(
        t for q in terms for t in analyze_term(q, tokenizer)
    ))
    toks = tokenize(F.col(text_col), tokenizer)
    n_matched = F.size(
        F.array_intersect(
            F.array_distinct(toks),
            F.array(*[F.lit(t) for t in analyzed]),
        )
    )
    return (
        docs.select(F.col(id_col), n_matched.alias("n_matched"))
        .filter(F.col("n_matched") >= F.lit(min_match))
    )


def span_near(
    docs: DataFrame,
    text_col: str,
    term_a: str,
    term_b: str,
    slop: int = 0,
    in_order: bool = False,
    tokenizer: str = "default",
) -> DataFrame:
    """ES/Lucene ``span_near`` for a two-clause span: documents where
    *term_a* and *term_b* occur within *slop* intervening token
    positions — ``in_order=False`` accepts either order (the case a
    sloppy PHRASE cannot express: our phrase slop, like the
    reference's, is ordered). Terms are analyzed with the field's
    tokenizer. Returns the matching rows plus ``span_gap``, the
    MINIMUM intervening-token count over all occurrence pairs.

    One narrow scan, O(tokens) per document: a single ``aggregate``
    fold walks the token array once carrying (position, last-seen
    position of each term, running minimum gap) — the classic
    min-distance scan. The minimal pair always involves the LAST
    occurrence of the other term before the current one, so the fold
    finds the exact pairwise minimum without materializing position
    arrays or probing pairs. This shape is robust to Catalyst's
    predicate-pushdown substitution: even fully inlined into the
    source filter, each evaluation is one linear pass (the earlier
    staged-positions variant degraded to O(positions x tokens)
    re-tokenization when the optimizer substituted the staging
    aliases through — see tests/test_plan_audit.py, which pins the
    tokenize count in the executed plan).

    Lucene ``SpanNearQuery`` parity: two clauses must be distinct,
    non-overlapping spans, so with ``term_a == term_b`` a document
    needs TWO occurrences — the fold computes each gap against the
    PREVIOUS occurrence before updating state, which excludes
    self-matches in both modes."""
    from toshokan_spark.functions.tokenizers import analyze_term, tokenize

    ta = analyze_term(term_a, tokenizer)
    tb = analyze_term(term_b, tokenizer)
    if len(ta) != 1 or len(tb) != 1:
        raise ValueError("span_near wants single-token clauses")
    wa, wb = ta[0], tb[0]
    cols = docs.columns
    big = F.lit(1 << 30).cast("long")
    neg = F.lit(-1).cast("long")

    def _step(acc, tok):
        i = acc["i"] + F.lit(1).cast("long")  # 1-based position of tok
        is_a, is_b = tok == F.lit(wa), tok == F.lit(wb)
        # gaps against the PREVIOUS state (pre-update), so a token
        # never pairs with itself when term_a == term_b
        gap_ab = F.when(
            is_b & (acc["la"] >= F.lit(0)), i - acc["la"] - F.lit(1)
        ).otherwise(big)
        if in_order:
            g = F.least(acc["g"], gap_ab)
        else:
            gap_ba = F.when(
                is_a & (acc["lb"] >= F.lit(0)), i - acc["lb"] - F.lit(1)
            ).otherwise(big)
            g = F.least(acc["g"], gap_ab, gap_ba)
        return F.struct(
            i.alias("i"),
            F.when(is_a, i).otherwise(acc["la"]).alias("la"),
            F.when(is_b, i).otherwise(acc["lb"]).alias("lb"),
            g.alias("g"),
        )

    init = F.struct(
        F.lit(0).cast("long").alias("i"),
        neg.alias("la"),
        neg.alias("lb"),
        big.alias("g"),
    )
    min_gap = F.aggregate(
        tokenize(F.col(text_col), tokenizer), init, _step, lambda a: a["g"]
    )
    return (
        docs.withColumn("span_gap", min_gap)
        .filter(F.col("span_gap") <= F.lit(slop))
        .select(*cols, F.col("span_gap").cast("int").alias("span_gap"))
    )


def rank_feature_score(
    docs: DataFrame,
    query: str,
    feature_col: str,
    function: str = "saturation",
    pivot: float | None = None,
    scaling_factor: float = 1.0,
    exponent: float = 1.0,
    boost: float = 1.0,
    id_col: str = "doc_id",
    text_col: str = "text",
    tokenizer: str = "default",
    k: int = 10,
    stats_provider=None,
) -> DataFrame:
    """ES ``rank_feature`` query as a scoring ``should`` clause: the
    BM25 text relevance plus ``boost`` times a monotone function of a
    numeric feature field —

    * ``saturation``: x / (x + pivot)   (ES default; pivot defaults
      to the corpus MEAN of the feature, a deterministic stand-in for
      ES's approximate geometric-mean default)
    * ``log``:        log(scaling_factor + x)
    * ``sigmoid``:    x^exp / (x^exp + pivot^exp)

    Output: top-*k* ``(id_col, score)`` by (rounded score desc, id
    asc). One corpus scan: the feature function is a pure column
    expression fused into the same whole-stage-codegen projection as
    the BM25 arithmetic; the optional pivot default costs a 1-row
    aggregate probe (model-sized, like the MLT stats probe).

    Negative/null features clamp to 0 (ES requires positive features;
    clamping keeps the operator total rather than erroring mid-scan).
    """
    if function not in ("saturation", "log", "sigmoid"):
        raise ValueError(f"unknown rank_feature function {function!r}")
    if function in ("saturation", "sigmoid") and pivot is None:
        row = docs.agg(F.avg(F.col(feature_col))).first()
        pivot = float(row[0] or 1.0)  # 1-row pivot-default probe
        # features are clamped to >= 0 at scoring, so the pivot must
        # be positive too: a negative corpus mean would put a zero in
        # saturation's denominator and a complex number under
        # sigmoid's fractional exponent
        if pivot <= 0.0:
            pivot = 1.0
    if pivot is not None and float(pivot) <= 0.0:
        raise ValueError("rank_feature pivot must be positive")
    base = docs.select(
        F.col(id_col).alias("id"), F.col(text_col), F.col(feature_col)
    )
    scored = with_bm25(
        base, query, text_col=text_col, out_col="__bm25",
        tokenizer=tokenizer, stats_provider=stats_provider,
    )
    x = F.greatest(
        F.coalesce(F.col(feature_col).cast("double"), F.lit(0.0)),
        F.lit(0.0),
    )
    if function == "saturation":
        feat = x / (x + F.lit(float(pivot)))
    elif function == "log":
        feat = F.log(F.lit(float(scaling_factor)) + x)
    else:
        xp = F.pow(x, F.lit(float(exponent)))
        feat = xp / (xp + F.lit(float(pivot) ** float(exponent)))
    out = scored.select(
        "id",
        F.round(F.col("__bm25") + F.lit(float(boost)) * feat, 6)
        .alias("score"),
    )
    return (
        out.orderBy(F.col("score").desc(), F.col("id").asc())
        .limit(k)
        .select(F.col("id").alias(id_col), "score")
    )


def distance_feature_score(
    docs: DataFrame,
    query: str,
    origin,
    distance_col: str,
    pivot: float,
    boost: float = 1.0,
    id_col: str = "doc_id",
    text_col: str = "text",
    tokenizer: str = "default",
    k: int = 10,
    stats_provider=None,
) -> DataFrame:
    """ES ``distance_feature`` query: BM25 text relevance plus
    ``boost · pivot / (pivot + |field − origin|)`` — full boost at
    the origin, half at ``pivot`` away, monotonically decaying. The
    recency/proximity ranking primitive (ES supports date and
    numeric/geo fields; this is the numeric form — pass epoch
    seconds for dates, with ``origin``/``pivot`` in the same unit).

    One corpus scan, same fused-projection shape as
    :func:`rank_feature_score`; null distances contribute zero boost
    (ES skips docs missing the field — a zero contribution keeps the
    text match in the ranking, which is the ``should``-clause
    reading)."""
    base = docs.select(
        F.col(id_col).alias("id"), F.col(text_col), F.col(distance_col)
    )
    scored = with_bm25(
        base, query, text_col=text_col, out_col="__bm25",
        tokenizer=tokenizer, stats_provider=stats_provider,
    )
    dist = F.abs(F.col(distance_col).cast("double") - F.lit(float(origin)))
    contrib = F.when(
        F.col(distance_col).isNotNull(),
        F.lit(float(boost)) * F.lit(float(pivot))
        / (F.lit(float(pivot)) + dist),
    ).otherwise(F.lit(0.0))
    out = scored.select(
        "id", F.round(F.col("__bm25") + contrib, 6).alias("score")
    )
    return (
        out.orderBy(F.col("score").desc(), F.col("id").asc())
        .limit(k)
        .select(F.col("id").alias(id_col), "score")
    )


def pinned_query(
    docs: DataFrame,
    query: str,
    pinned_ids: list,
    id_col: str = "doc_id",
    text_col: str = "text",
    tokenizer: str = "default",
    k: int = 10,
    stats_provider=None,
) -> DataFrame:
    """ES ``pinned`` query: the listed ids rank first IN LIST ORDER
    (whether or not they match the organic query — ES promotes pinned
    docs unconditionally), followed by the organic BM25 matches minus
    the pinned set. Output: top-*k* ``(id_col, rank, score)`` where
    pinned rows carry their organic score (0.0 for non-matches) but
    owe their rank to the pin.

    Scale shape: ONE full scoring scan (the match set), the pin order
    folded in as a literal map (no join), plus pinned NON-matches
    recovered through an id-IN-pruned scan (reads the pins' row
    groups, not the corpus) anti-joined against the ≤|pins| matched
    pins — every join side is pin-list-sized and broadcast. The
    earlier shape left-joined the match set onto a corpus-wide id
    projection, which at index scale is a corpus shuffle."""
    # ES dedups pinned ids silently; without this, a duplicate key in
    # the literal map raises Spark's duplicate-map-key error mid-query
    pinned_ids = list(dict.fromkeys(pinned_ids))
    npin = len(pinned_ids)
    pin_order = F.create_map(
        *[x for i, p in enumerate(pinned_ids)
          for x in (F.lit(p), F.lit(i))]
    )
    base = docs.select(F.col(id_col).alias("id"), F.col(text_col))
    scored = with_bm25(
        base, query, text_col=text_col, out_col="__bm25",
        tokenizer=tokenizer, stats_provider=stats_provider,
    ).select("id", F.round(F.col("__bm25"), 6).alias("score"))
    matched = scored.select(
        "id", "score",
        F.coalesce(pin_order[F.col("id")], F.lit(npin)).alias("__pin"),
    )
    if pinned_ids:
        # pinned docs that did NOT match organically: the id filter
        # pushes to the scan (pin-sized read), the anti join's build
        # side is the matched pins (≤ |pins| rows, broadcast)
        matched_pins = matched.filter(
            F.col("id").isin(list(pinned_ids))
        ).select("id")
        missing = (
            docs.filter(F.col(id_col).isin(list(pinned_ids)))
            .select(F.col(id_col).alias("id"))
            .join(F.broadcast(matched_pins), "id", "left_anti")
            .select(
                "id", F.lit(0.0).alias("score"),
                pin_order[F.col("id")].alias("__pin"),
            )
        )
        matched = matched.unionByName(missing)
    out = (
        matched.orderBy(
            F.col("__pin").asc(), F.col("score").desc(), F.col("id").asc()
        )
        .limit(k)
        .select(F.col("id").alias(id_col), "score",
                (F.col("__pin") < F.lit(npin)).alias("pinned"))
    )
    return out


def boosting_query(
    docs: DataFrame,
    positive: str,
    negative: str,
    negative_boost: float = 0.5,
    id_col: str = "doc_id",
    text_col: str = "text",
    tokenizer: str = "default",
    k: int = 10,
    stats_provider=None,
) -> DataFrame:
    """ES ``boosting`` query: rank by the *positive* query's BM25,
    DEMOTING (not excluding — the whole point over a must_not) any
    document that also matches the *negative* query by multiplying
    its score with ``negative_boost`` (0..1). The match set is the
    positive query's; the negative side only reweights.

    One scan, no join, no subquery, ONE tokenize per row: the
    negative match is an ``arrays_overlap`` against the negative term
    literals over the SAME staged token array the scorer reads
    (``with_bm25(tokens_col=...)`` — VERDICT r14 directive 6; the r14
    shape paid a second linear tokenize because the scorer could not
    see the caller's array). ``tests/test_plan_audit.py`` pins the
    executed plan's tokenize count, span_near-style."""
    neg_terms = list(dict.fromkeys(analyze_term(negative, tokenizer)))
    base = docs.select(F.col(id_col).alias("id"), F.col(text_col))
    if neg_terms:
        base = base.withColumn(
            "__tokspre", tokenize(F.col(text_col), tokenizer)
        ).withColumn(
            "__neg",
            F.arrays_overlap(
                F.col("__tokspre"),
                F.array(*[F.lit(t) for t in neg_terms]),
            ),
        )
        scored = with_bm25(
            base, positive, text_col=text_col, out_col="__bm25",
            tokenizer=tokenizer, stats_provider=stats_provider,
            tokens_col="__tokspre",
        )
    else:
        scored = with_bm25(
            base, positive, text_col=text_col, out_col="__bm25",
            tokenizer=tokenizer, stats_provider=stats_provider,
        )
    if neg_terms:
        factor = F.when(
            F.col("__neg"), F.lit(float(negative_boost))
        ).otherwise(F.lit(1.0))
    else:
        factor = F.lit(1.0)
    out = scored.select(
        "id",
        F.round(F.col("__bm25") * factor, 6).alias("score"),
        (factor < F.lit(1.0)).alias("demoted"),
    )
    return (
        out.orderBy(F.col("score").desc(), F.col("id").asc())
        .limit(k)
        .select(F.col("id").alias(id_col), "score",
                F.col("demoted").cast("int").alias("demoted"))
    )
