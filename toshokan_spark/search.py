"""Search: manifest scan -> compiled predicate -> limit -> JSON docs.

Replaces the reference's per-segment tantivy search + mpsc merge
(`/root/reference/src/commands/search.rs:111-238`) with one
declarative plan::

    spark.read.parquet(*manifested_segments).filter(pred).limit(k)

Catalyst/Parquet give predicate pushdown, column pruning, partition
pruning (on the time_field layout) and a short-circuiting global
limit. Two deliberate deviations from the reference, both stricter
(SURVEY §2.5, §3.1):

* results are globally deterministic under ``sort_by`` — the
  reference returns the first ``limit`` docs to arrive over a channel
  with no cross-file re-rank;
* only segments of the *queried* index are opened — the reference
  opens every file of every index (`src/commands/mod.rs:107`).

Output shaping parity (`search.rs:25-94`): one JSON object per doc,
keys sorted lexically, ``_dynamic`` keys spliced into the top level,
static objects emitted nested, datetimes as RFC3339 ``Z``, absent /
null fields omitted. The shaping runs driver-side over the ≤ limit
collected rows — O(k), while the scan/filter stays distributed.
"""

from __future__ import annotations

import json
from datetime import datetime, timezone
from decimal import Decimal
from typing import Optional

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from toshokan_spark.catalog import FsCatalog
from toshokan_spark.config import DYNAMIC_FIELD_NAME, IndexConfig
from toshokan_spark.ingest import is_internal
from toshokan_spark.query import QueryCompiler, compile_query, time_bounds
from toshokan_spark.plans.ast import parse_query


def read_segments(
    spark: SparkSession, paths: list[str], partitioned: bool = False
) -> DataFrame:
    """Scan of all manifested segments (the reference's equivalent is
    the implicit union-of-segments at search, `search.rs:162-204`).

    Unpartitioned indexes get ONE multi-path scan node —
    ``mergeSchema`` makes cross-segment schema drift behave exactly
    like ``unionByName(allowMissingColumns=True)`` (missing columns
    null-fill) while keeping the plan a single scan: a 10k-segment
    index analyzes in O(1) plan nodes instead of a 10k-arm union
    (footer reads for the merged schema run as one distributed job).

    Indexes with the ``__day=`` time-partition layout fall back to
    per-segment scans + ``unionByName``: Spark's partition discovery
    rejects multiple partitioned roots (CONFLICTING_DIRECTORY_
    STRUCTURES — the ``seg-*`` level between the roots and the
    ``__day=`` dirs is not a partition component), and collapsing the
    layout would forfeit PartitionFilters pruning. The union is a
    plan-level concat, not a shuffle, and Catalyst still pushes
    filters/pruning into every arm.
    """
    if len(paths) == 1:
        return spark.read.parquet(paths[0])
    if not partitioned:
        try:
            return spark.read.option("mergeSchema", "true").parquet(*paths)
        except Exception:
            # unexpected layout (e.g. partition dirs without the
            # partitioned hint) — per-segment fallback below
            pass
    dfs = [spark.read.parquet(p) for p in paths]
    out = dfs[0]
    for d in dfs[1:]:
        out = out.unionByName(d, allowMissingColumns=True)
    return out


def _pruned_segments(config, segs, node, verdict_sink=None):
    """MANIFEST-LEVEL pruning: drop segments whose recorded stats
    cannot overlap the query's bounds BEFORE building any scan — the
    day range against the query's time bounds, and each NUMBER
    field's [min, max] zone map (``SegmentEntry.field_stats``)
    against the query's numeric bounds. At 10k segments this
    collapses the per-segment union to the overlapping few; Catalyst
    partition pruning and parquet row-group stats then prune WITHIN
    the survivors. Segments without recorded stats are conservatively
    kept. Returns ``(lo, hi, surviving_segments)``.

    ``verdict_sink``: optional list; when given, one
    ``(segment_id, rule)`` tuple is appended per segment — the rule
    that PRUNED it (``"day-range"``, ``"time-zone-map"``,
    ``"zone-map:<field>"``, ``"bloom:<field>"``) or ``None`` when it
    is kept — so ``explain`` can show WHY a scan touches N files (at
    100× scale the audit trail for an unexpectedly wide scan)."""
    from toshokan_spark.functions.bloom import (
        bloom_absent_any,
        required_term_tokens,
    )
    from toshokan_spark.query import ip_bounds, numeric_bounds, raw_term_bounds

    # required query tokens per TOKENIZED text field (term/phrase
    # conjuncts) — probed against each segment's manifest token bloom
    # (SegmentEntry.token_blooms); computed once, O(query size)
    req_tokens: dict[str, set[str]] = {}
    for f in config.fields:
        if f.type == "text" and (f.tokenizer != "raw" or f.array):
            req = required_term_tokens(node, f.name, f.tokenizer)
            if req:
                req_tokens[f.name] = req

    lo = hi = None
    lo_us = hi_us = None
    if config.time_field:
        lo, hi = time_bounds(node, config.time_field)
        # sub-day pruning compares in the epoch-micros space the
        # manifest records (lo/hi are tz-aware UTC datetimes)
        if lo is not None:
            lo_us = int(lo.timestamp() * 1_000_000)
        if hi is not None:
            hi_us = int(hi.timestamp() * 1_000_000)
    num_bounds = {}
    for f in config.fields:
        if f.array:
            continue  # no zone maps for array columns
        if f.type == "number":
            nlo, nhi = numeric_bounds(node, f.name)
        elif f.type == "text" and f.tokenizer == "raw":
            nlo, nhi = raw_term_bounds(node, f.name)
        elif f.type == "ip":
            nlo, nhi = ip_bounds(node, f.name)
        else:
            continue
        if nlo is not None or nhi is not None:
            num_bounds[f.name] = (nlo, nhi)
    out = []
    for s in segs:
        rule = _segment_prune_rule(
            s, config, lo, hi, lo_us, hi_us, num_bounds, req_tokens,
            bloom_absent_any,
        )
        if verdict_sink is not None:
            verdict_sink.append((s.id, rule))
        if rule is None:
            out.append(s)
    return lo, hi, out


def _segment_prune_rule(
    s, config, lo, hi, lo_us, hi_us, num_bounds, req_tokens, bloom_absent_any
):
    """The FIRST rule that proves segment *s* cannot match, or None
    (kept). Rule order = cheapest check first, same order the prune
    loop always ran them."""
    if s.min_day and s.max_day:
        if hi is not None and s.min_day > str(hi.date()):
            return "day-range"
        if lo is not None and s.max_day < str(lo.date()):
            return "day-range"
    # sub-day time zone map: at streaming cadence many segments
    # share a day — the recorded [min, max] epoch micros drop the
    # non-overlapping micro-batches the day range cannot
    ts = (s.field_stats or {}).get(config.time_field) if config.time_field else None
    if ts:
        if (hi_us is not None and ts[0] > hi_us) or (
            lo_us is not None and ts[1] < lo_us
        ):
            return "time-zone-map"
    if num_bounds and s.field_stats:
        for name, (nlo, nhi) in num_bounds.items():
            st = s.field_stats.get(name)
            if not st:
                continue
            smin, smax = st
            if (nhi is not None and smin > nhi) or (
                nlo is not None and smax < nlo
            ):
                return f"zone-map:{name}"
    if req_tokens and s.token_blooms:
        for fname, req in req_tokens.items():
            bl = s.token_blooms.get(fname)
            if not bl:
                continue  # no bloom for this field: cannot prune
            if bloom_absent_any(bl, req):
                return f"bloom:{fname}"  # a REQUIRED token provably absent
    return None


def search_df(
    spark: SparkSession,
    catalog: FsCatalog,
    index_name: str,
    query: str,
    limit: Optional[int] = 1,
    sort_by: Optional[list] = None,
) -> DataFrame:
    """The distributed part: scan manifested segments, filter, limit."""
    from toshokan_spark.storage import join_path

    config = catalog.get_index(index_name)
    segs = catalog.segments(index_name)
    node = parse_query(query)
    lo, hi, segs = _pruned_segments(config, segs, node)
    paths = [join_path(config.path, s.file_name) for s in segs]
    if not paths:
        return spark.createDataFrame([], config.spark_schema())
    df = read_segments(spark, paths, partitioned=config.time_field is not None)
    pred = QueryCompiler(config, set(df.columns)).compile(node)
    # resurrect the reference's dead time_field as real partition
    # pruning: a range/cmp on the time field also constrains the
    # ``__day`` layout, so whole day-directories (and at 100 TB,
    # whole object-store prefixes) drop out of the scan
    if config.time_field and "__day" in df.columns:
        if lo is not None:
            pred = pred & (F.col("__day") >= F.lit(lo.date()))
        if hi is not None:
            pred = pred & (F.col("__day") <= F.lit(hi.date()))
    out = df.filter(pred)
    if sort_by:
        out = out.orderBy(*sort_by)
    if limit is not None:
        if limit == 0:
            # early exit (`search.rs:117-119`)
            return out.limit(0)
        out = out.limit(limit)
    return out


def scored_search_df(
    spark: SparkSession,
    catalog: FsCatalog,
    index_name: str,
    query: str,
    score_field: str,
    limit: int = 10,
) -> DataFrame:
    """BM25-ranked search (the reference's relevance path,
    `search.rs:188` — but globally re-ranked, SURVEY §2.5 deviation):
    docs matching the compiled query, ordered by the BM25 score of the
    query's positive term literals against *score_field*.

    Corpus statistics come from the commit-time per-segment stats
    parquets when every manifested segment has one (integer sums
    across segments reproduce the corpus-level N / Σdl / df exactly,
    and the term filter pushes down to the stats scan) — so scoring
    costs one scan of the index for MATCHING, zero for stats. Indexes
    with pre-stats segments, or score fields outside the declared
    text schema, fall back to the full-corpus aggregation.

    Time-bounded queries prune at the MANIFEST level before either
    scan is built (same :func:`_pruned_segments` walk as unscored
    search): both the match scan and the stats read list only the
    surviving segments' files, so at 10k segments a one-day query
    plans and scores against the overlapping few. Trade-off: the BM25
    corpus becomes the set of time-OVERLAPPING segments (Lucene-style
    per-segment stats), so scores depend on segment layout — a
    compaction that merges a window-overlapping segment with others
    enlarges the stats corpus and can shift time-bounded scores.
    Full-corpus stats (the fallback path) are the merge-invariant
    choice; pruned stats are the cheaper one at 10k segments."""
    from toshokan_spark.functions.bm25 import merged_stats_provider, with_bm25
    from toshokan_spark.indexer import stats_path, text_stat_fields
    from toshokan_spark.plans import ast
    from toshokan_spark.storage import join_path

    config = catalog.get_index(index_name)
    segs = catalog.segments(index_name)
    node = parse_query(query)
    lo, hi, segs = _pruned_segments(config, segs, node)
    paths = [join_path(config.path, s.file_name) for s in segs]
    if not paths:
        # keep the scored shape (schema + _score) even when pruning
        # eliminates every segment
        return (
            spark.createDataFrame([], config.spark_schema())
            .withColumn("_score", F.lit(0.0))
        )

    def positive_terms(node: ast.Node) -> list[str]:
        if isinstance(node, (ast.Term, ast.Phrase)):
            if node.field is None or node.field == (score_field,):
                return [node.text]
            return []
        if isinstance(node, ast.BoolQuery):
            out: list[str] = []
            for child in node.must + node.should:  # never must_not
                out.extend(positive_terms(child))
            return out
        return []

    terms = " ".join(positive_terms(ast.parse_query(query)))
    fld = next((f for f in config.fields if f.name == score_field), None)
    tokenizer = getattr(fld, "tokenizer", None) or "default"

    df = read_segments(spark, paths, partitioned=config.time_field is not None)
    pred = compile_query(query, config, set(df.columns))
    # same partition-level pruning as unscored search: the query's
    # time bounds also constrain the __day layout inside survivors
    if config.time_field and "__day" in df.columns:
        if lo is not None:
            pred = pred & (F.col("__day") >= F.lit(lo.date()))
        if hi is not None:
            pred = pred & (F.col("__day") <= F.lit(hi.date()))
    matched = df.filter(pred)

    provider = None
    if any(n == score_field for n, _ in text_stat_fields(config)):
        st = catalog.data_storage(config)
        spaths = [stats_path(config, s.file_name) for s in segs]
        if all(st.exists(p) for p in spaths):
            provider = merged_stats_provider(spark, spaths, score_field)
    # corpus-level stats (N / avgdl / df — one 1-row frame broadcast
    # back); from the per-segment stats parquets when available, else
    # one full-index agg. Either way NEVER over the filtered match
    # set — idf over matches would distort multi-term weights vs the
    # reference's corpus-stats BM25
    scored = with_bm25(
        matched, terms, text_col=score_field, out_col="_score",
        tokenizer=tokenizer, corpus=df, stats_provider=provider,
    )
    return scored.orderBy(F.col("_score").desc()).limit(limit)


def search(
    spark: SparkSession,
    catalog: FsCatalog,
    index_name: str,
    query: str,
    limit: int = 1,
    sort_by: Optional[list] = None,
) -> list[str]:
    """Reference-CLI-shaped search: JSON lines, prettified."""
    if limit == 0:
        return []
    df = search_df(spark, catalog, index_name, query, limit, sort_by)
    config = catalog.get_index(index_name)
    return [prettify_doc(r.asDict(recursive=True), config) for r in df.collect()]


# ---------------------------------------------------------------------------
# output shaping (`search.rs:25-94`)
# ---------------------------------------------------------------------------

def _json_value(v):
    if isinstance(v, datetime):
        # stored UTC; RFC3339 with Z and no sub-second when zero, the
        # shape the reference's goldens assert ("2016-04-13T06:46:53Z")
        dt = v if v.tzinfo else v.replace(tzinfo=timezone.utc)
        dt = dt.astimezone(timezone.utc)
        if dt.microsecond:
            return dt.strftime("%Y-%m-%dT%H:%M:%S.%f").rstrip("0") + "Z"
        return dt.strftime("%Y-%m-%dT%H:%M:%SZ")
    if isinstance(v, Decimal):
        return int(v) if v == v.to_integral_value() else float(v)
    if isinstance(v, dict):
        return {k: _json_value(x) for k, x in v.items() if x is not None}
    if isinstance(v, (list, tuple)):
        return [_json_value(x) for x in v]
    return v


def prettify_doc(row: dict, config: IndexConfig) -> str:
    doc: dict = {}
    for k, v in row.items():
        if is_internal(k) or k == DYNAMIC_FIELD_NAME or v is None:
            continue
        doc[k] = _json_value(v)
    # splice _dynamic to the top level (`search.rs:47-60`); values are
    # exact raw-JSON text captured at ingest
    dyn = row.get(DYNAMIC_FIELD_NAME) or {}
    for k, raw in dyn.items():
        if raw is None or k in doc:
            continue
        try:
            doc[k] = json.loads(raw)
        except (ValueError, TypeError):
            doc[k] = raw
    # keys in sorted (BTreeMap) order, compact separators — the golden
    # outputs compare exact strings
    return json.dumps(doc, sort_keys=True, separators=(",", ":"), ensure_ascii=False)


def facet_counts(
    hits: DataFrame,
    by: str,
    k: "int | None" = None,
    value_col: "str | None" = None,
) -> DataFrame:
    """Terms aggregation over a query's hit set — the Kibana /
    quickwit-style facet panel the reference CLI has no analog for
    (search-layer extension): per distinct ``by`` value, hit count
    (plus the sum of ``value_col`` when given), optionally top-``k``
    facets by descending count (ties by value, deterministic).

    Scale: the hit FILTER stays pushed at the scan (this consumes the
    already-compiled search DataFrame), the facet groupBy partial-
    aggregates map-side to a cardinality-sized frame, and top-k is
    ``orderBy().limit()`` — Spark's distributed take-ordered, never a
    global sort of the facet table."""
    aggs = [F.count(F.lit(1)).cast("long").alias("n_hits")]
    if value_col is not None:
        aggs.append(
            F.round(
                F.sum(F.col(value_col).cast("decimal(38,6)")).cast("double"), 6
            ).alias("total_value")
        )
    out = hits.groupBy(F.col(by)).agg(*aggs)
    if k is not None:
        out = out.orderBy(
            F.col("n_hits").desc(), F.col(by).asc()
        ).limit(k)
    return out


def date_histogram(
    hits: DataFrame,
    time_col: str,
    interval_seconds: int,
    value_col: "str | None" = None,
) -> DataFrame:
    """Date-histogram aggregation over a query's hit set (the other
    half of the log-analytics panel): hits bucketed into fixed
    ``interval_seconds`` windows aligned to the epoch, per-bucket hit
    count and optional value sum. One partial-aggregated groupBy on
    the bucket key — bucket count is time-range/interval, never
    corpus-sized."""
    if interval_seconds <= 0:
        raise ValueError(
            f"interval_seconds must be positive, got {interval_seconds}"
        )
    m = interval_seconds * 1_000_000
    # unix_micros is unambiguous in every engine; pmod aligns
    # pre-epoch timestamps to the bucket START (floor-div semantics)
    # and `div` keeps the arithmetic integral end-to-end (a double
    # quotient would lose exactness past 2^53 us)
    u = f"unix_micros(`{time_col}`)"
    bucket = F.expr(
        f"CAST((({u} - pmod({u}, {m})) div {m}) * {interval_seconds} AS BIGINT)"
    ).alias("bucket_epoch")
    aggs = [F.count(F.lit(1)).cast("long").alias("n_hits")]
    if value_col is not None:
        aggs.append(
            F.round(
                F.sum(F.col(value_col).cast("decimal(38,6)")).cast("double"), 6
            ).alias("total_value")
        )
    return hits.groupBy(bucket).agg(*aggs)
