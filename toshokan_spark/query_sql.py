"""Query compiler, SQL-text backend: query string -> ONE SQL boolean
expression string, parsed by Spark in a single ``F.expr`` call.

Why this exists next to :mod:`toshokan_spark.query` (the Column
backend): building a Column tree pays one py4j round trip per
operator node, which is invisible for a single query but dominates
when HUNDREDS of queries compile into one plan — the percolator's
width-Q projection measured 27 s of pure plan CONSTRUCTION for Q=500
at sf0.01 against 1.5 s of execution (VERDICT r14 directive 5; the
same build-vs-execute split that made the PQ codebook expressions
slow, fixed the same way — render the expression as one parsed SQL
string, `operators/similarity.py`).

This module renders the SAME semantics as ``QueryCompiler`` for the
WHOLE query language — term/phrase (any slop, the positional fold
included)/phrase-prefix/range/cmp/bool/exists/prefix/fuzzy/regexp/
wildcard, qualified and unqualified (the default-fields fan-outs
with their ``_dynamic`` remainder arms), over declared scalar and
array fields of every type, static-object paths, ``_dynamic``
routing. ``None`` remains only for environment-driven gaps: en_stem
fields without a shadow tokens column (the stemmer is a pandas UDF)
and ip comparisons without a shadow key column. Callers fall back to
the Column
backend per query, so coverage gaps cost speed, never correctness.
``tests/test_query_sql.py`` pins bit-equivalence against
``compile_query`` row-for-row across every rendered shape.

The renderer is deliberately CONSERVATIVE: any resolution it is not
sure of returns ``None`` rather than guessing — the Column backend
is the semantics of record (and the one that raises the user-facing
CompileError for genuinely bad queries).
"""

from __future__ import annotations

import logging
import re
from dataclasses import dataclass
from typing import Optional

from toshokan_spark.config import DYNAMIC_FIELD_NAME, IndexConfig
from toshokan_spark.functions.ip import ip_literal_key
from toshokan_spark.functions.tokenizers import TOKEN_BYTE_LIMIT, analyze_term
from toshokan_spark.ingest import ipkey_col, tokens_col
from toshokan_spark.plans.ast import (
    All,
    BoolQuery,
    Cmp,
    Fuzzy,
    Node,
    Phrase,
    PhrasePrefix,
    Prefix,
    RangeQ,
    Regex,
    Term,
    Wildcard,
    parse_query,
)
from toshokan_spark.query import _NON_ALNUM_RE, QueryCompiler

#: the `default` tokenizer split pattern (tokenizers._NON_ALNUM)
_NON_ALNUM_SPLIT = r"[^\p{L}\p{N}]+"


def _q(name: str) -> str:
    """Backtick-quote an identifier."""
    return "`" + name.replace("`", "``") + "`"


def _s(text: str) -> str:
    """Single-quote a SQL string literal (backslash escapes on)."""
    return "'" + text.replace("\\", "\\\\").replace("'", "\\'") + "'"


def _ip_target(t: "_SqlTarget") -> str:
    """The comparison target: the hex ip key for ip fields (raises
    when the shadow key column is unavailable — that comparison needs
    the pandas-UDF key, Column backend only), else the value."""
    if t.kind == "ip":
        if t.ipkey is None:
            raise _Unrenderable
        return t.ipkey
    return t.col


def _dbl(v: float) -> str:
    """A DOUBLE literal (plain ``5.0`` would parse as DECIMAL)."""
    import math

    if not math.isfinite(v):
        raise _Unrenderable
    return f"CAST({v!r} AS DOUBLE)"


def _tok_sql(col_sql: str, tokenizer: str) -> Optional[str]:
    """SQL text of ``tokenize(col, tokenizer)`` — the exact Column
    chain from functions/tokenizers.py. en_stem is a pandas UDF, not
    renderable."""
    if tokenizer == "default":
        return (
            f"transform(filter(split({col_sql}, {_s(_NON_ALNUM_SPLIT)}, -1), "
            f"__t -> length(__t) > 0 AND octet_length(__t) <= "
            f"{TOKEN_BYTE_LIMIT}), __t -> lower(__t))"
        )
    if tokenizer == "raw":
        return (
            f"CASE WHEN {col_sql} IS NULL THEN NULL "
            f"ELSE array({col_sql}) END"
        )
    if tokenizer == "whitespace":
        return (
            f"filter(split({col_sql}, {_s(chr(92) + 's+')}, -1), "
            f"__t -> length(__t) > 0)"
        )
    return None  # en_stem


class _Unrenderable(Exception):
    """Internal signal: this query needs the Column backend."""


def _token_seq_match_sql(toks: str, words: list, slop: int) -> str:
    """SQL text of ``query._token_seq_match`` — the greedy
    earliest-match in-order proximity fold (exact for in-order
    proximity; O(k) nodes). Same MAX_* clamps; beyond them the
    renderer falls back so the Column backend raises the user-facing
    CompileError."""
    from toshokan_spark.query import MAX_PHRASE_WORDS, MAX_SLOP

    k = len(words)
    slop = min(max(slop, 0), MAX_SLOP)
    if k == 1:
        return f"array_contains({toks}, {_s(words[0])})"
    if k > MAX_PHRASE_WORDS:
        raise _Unrenderable
    n = f"size({toks})"
    rest = "array(" + ",".join(_s(w) for w in words[1:]) + ")"
    lim = k - 1 + slop
    window = (
        f"slice({toks}, CAST(__acc + 2 AS INT), "
        f"CAST(greatest(least(CAST(__i + {lim} AS BIGINT) - __acc, "
        f"CAST({n} AS BIGINT)), CAST(0 AS BIGINT)) AS INT))"
    )
    rel = f"array_position({window}, __w)"
    step = (
        f"CASE WHEN (__acc >= 0) AND ({rel} > 0) THEN __acc + {rel} "
        f"ELSE CAST(-1 AS BIGINT) END"
    )
    init = (
        f"CASE WHEN get({toks}, __i) = {_s(words[0])} "
        f"THEN CAST(__i AS BIGINT) ELSE CAST(-1 AS BIGINT) END"
    )
    match_at = (
        f"coalesce(aggregate({rest}, {init}, "
        f"(__acc, __w) -> {step}) >= 0, false)"
    )
    # containment pre-guard (r16): the positional scan is
    # O(n·k·window) per row, and in a width-Q percolation every slop
    # monitor pays it on EVERY document — measured 0.8 s per monitor
    # per 5k docs. A doc missing ANY phrase word can never match, so
    # k cheap array_contains conjuncts short-circuit the fold for the
    # overwhelming majority of rows (the inverted-index discipline:
    # intersect postings first, verify positions on candidates only).
    guard = " AND ".join(
        f"array_contains({toks}, {_s(w)})" for w in words)
    return (
        f"CASE WHEN {n} >= {k} AND {guard} THEN "
        f"coalesce(exists(sequence(0, {n} - {k}), __i -> {match_at}), "
        f"false) ELSE false END"
    )


@dataclass
class _SqlTarget:
    kind: str  # text|number|boolean|datetime|ip|dynamic
    col: str  # SQL text of the value column
    tokenizer: str = "default"
    array: bool = False
    number_type: str = "i64"
    tokens: Optional[str] = None  # SQL text of the analyzed array
    ipkey: Optional[str] = None


def _token_seq_prefix_match_sql(toks: str, words: list,
                                prefix: str) -> str:
    """SQL text of ``query._token_seq_prefix_match``: the slop-0
    adjacency chain with one startswith step appended."""
    from toshokan_spark.query import MAX_PHRASE_WORDS

    if not words:
        return (f"coalesce(exists({toks}, __t2 -> "
                f"startswith(__t2, {_s(prefix)})), false)")
    k = len(words)
    if k + 1 > MAX_PHRASE_WORDS:
        raise _Unrenderable
    n = f"size({toks})"
    if len(words) > 1:
        rest = "array(" + ",".join(_s(w) for w in words[1:]) + ")"
    else:
        # an empty literal array() is ARRAY<VOID>; the fold needs
        # string elements (the Column backend's F.array() of zero
        # string literals resolves the same way via the lambda)
        rest = "CAST(array() AS ARRAY<STRING>)"
    nxt = f"get({toks}, CAST(__acc + 1 AS INT))"
    step = (
        f"CASE WHEN (__acc >= 0) AND ({nxt} = __w) THEN __acc + 1 "
        f"ELSE CAST(-1 AS BIGINT) END"
    )
    init = (
        f"CASE WHEN get({toks}, __i) = {_s(words[0])} "
        f"THEN CAST(__i AS BIGINT) ELSE CAST(-1 AS BIGINT) END"
    )
    last = f"aggregate({rest}, {init}, (__acc, __w) -> {step})"
    match_at = (
        f"coalesce(({last} >= 0) AND startswith("
        f"get({toks}, CAST({last} + 1 AS INT)), {_s(prefix)}), false)"
    )
    return (
        f"CASE WHEN {n} >= {k + 1} THEN "
        f"coalesce(exists(sequence(0, {n} - {k + 1}), "
        f"__i -> {match_at}), false) ELSE false END"
    )


class SqlQueryRenderer:
    """Mirror of :class:`toshokan_spark.query.QueryCompiler` emitting
    SQL text. Every branch cites the Column-backend method it
    reproduces; the equivalence test compares both backends value-
    for-value on live data."""

    def __init__(self, config: IndexConfig,
                 available_columns: Optional[set] = None):
        self.config = config
        self.cols = available_columns

    def _have(self, name: str) -> bool:
        return self.cols is None or name in self.cols

    # -- field resolution (QueryCompiler.resolve) ----------------------
    def resolve(self, path: tuple) -> _SqlTarget:
        fc = self.config.field(path[0])
        if fc is None:
            return self._dynamic_target(DYNAMIC_FIELD_NAME, path)
        if fc.type == "static_object":
            col = _q(fc.name)
            cur = fc
            for seg in path[1:]:
                child = next(
                    (f for f in cur.fields if f.name == seg), None)
                if child is None or cur.type != "static_object":
                    raise _Unrenderable  # compiler raises CompileError
                col = f"{col}.{_q(seg)}"
                cur = child
            if cur.type == "static_object":
                raise _Unrenderable
            return self._leaf_target(cur, col, shadow_ok=False)
        if fc.type == "dynamic_object":
            if len(path) == 1:
                raise _Unrenderable
            return self._dynamic_target(
                fc.name, path[1:], tokenizer=fc.tokenizer)
        if len(path) > 1:
            raise _Unrenderable
        if not self._have(fc.name):
            ddl = next(
                sf.dataType for sf in self.config.spark_schema().fields
                if sf.name == fc.name
            ).simpleString()
            return self._leaf_target(
                fc, f"CAST(NULL AS {ddl})", shadow_ok=False)
        return self._leaf_target(fc, _q(fc.name), shadow_ok=True)

    def _leaf_target(self, fc, col: str, shadow_ok: bool) -> _SqlTarget:
        tokens = None
        ipkey = None
        if fc.type == "text":
            shadow = tokens_col(fc.name)
            if shadow_ok and self._have(shadow):
                tokens = _q(shadow)
            elif fc.array:
                elem = _tok_sql("__e", fc.tokenizer)
                if elem is None:
                    raise _Unrenderable
                tokens = (
                    f"array_distinct(flatten(transform({col}, "
                    f"__e -> {elem})))"
                )
            else:
                tokens = _tok_sql(col, fc.tokenizer)
                if tokens is None:
                    raise _Unrenderable  # en_stem without a shadow
        if fc.type == "ip":
            shadow = ipkey_col(fc.name)
            if shadow_ok and self._have(shadow):
                ipkey = _q(shadow)
            # else: leave None — the pandas-UDF key is unrenderable,
            # but only a clause that actually COMPARES the ip needs
            # it (an unqualified term whose literal isn't an IP skips
            # the field entirely, like the Column backend)
        return _SqlTarget(
            kind=fc.type, col=col, tokenizer=fc.tokenizer,
            array=fc.array, number_type=fc.number_type,
            tokens=tokens, ipkey=ipkey,
        )

    def _dynamic_target(self, map_col: str, path: tuple,
                        tokenizer: str = "default") -> _SqlTarget:
        m = _q(map_col)
        dotted = ".".join(path)
        first = f"{m}[{_s(dotted)}]"
        if len(path) > 1:
            rest = "$." + ".".join(path[1:])
            col = (
                f"coalesce({m}[{_s(dotted)}], "
                f"get_json_object({m}[{_s(path[0])}], {_s(rest)}))"
            )
        else:
            col = first
        return _SqlTarget(kind="dynamic", col=col, tokenizer=tokenizer)

    # -- literal coercion (QueryCompiler._typed_lit) --------------------
    def _typed_lit(self, t: _SqlTarget, lit: str) -> Optional[str]:
        if t.kind in ("text", "dynamic"):
            return _s(lit)
        if t.kind == "number":
            n = QueryCompiler._num(lit)
            if n is None:
                return None
            if t.number_type == "f64":
                return _dbl(float(n))
            if t.number_type == "u64":
                if isinstance(n, int) and 0 <= n <= (1 << 64) - 1:
                    return f"CAST({_s(str(n))} AS DECIMAL(20,0))"
                if not isinstance(n, int):
                    return _dbl(float(n))
                return None
            if float(n).is_integer():
                return f"CAST({int(n)} AS BIGINT)"
            return _dbl(float(n))
        if t.kind == "boolean":
            low = lit.strip().lower()
            if low in ("true", "false"):
                return low
            return None
        if t.kind == "datetime":
            dt = QueryCompiler._datetime_lit(lit)
            if dt is None:
                return None
            from datetime import timezone

            naive = dt.astimezone(timezone.utc).replace(tzinfo=None)
            txt = naive.strftime("%Y-%m-%d %H:%M:%S")
            if naive.microsecond:
                txt += f".{naive.microsecond:06d}"
            return f"TIMESTAMP '{txt}'"
        if t.kind == "ip":
            try:
                return _s(ip_literal_key(lit))
            except ValueError:
                return None
        raise _Unrenderable

    # -- node rendering --------------------------------------------------
    def render(self, node: Node) -> str:
        if isinstance(node, All):
            return "true"
        if isinstance(node, Term):
            return self._render_term(node)
        if isinstance(node, Phrase):
            return self._render_phrase(node)
        if isinstance(node, PhrasePrefix):
            return self._render_phrase_prefix(node)
        if isinstance(node, Prefix):
            return self._render_prefix(node)
        if isinstance(node, Fuzzy):
            return self._render_fuzzy(node)
        if isinstance(node, Regex):
            return self._render_regex(node)
        if isinstance(node, Wildcard):
            if node.field is None:
                # QueryCompiler._compile_wildcard's fan-out: indexed
                # text fields + the case-folded anchored glob over
                # the _dynamic remainder's default tokens
                parts = ["false"]
                for f in self.config.fields:
                    if f.type != "text" or not f.indexed:
                        continue
                    parts.append(
                        f"coalesce(({self.render(Wildcard((f.name,), node.pattern))}), false)"
                    )
                if self._have(DYNAMIC_FIELD_NAME):
                    anchored = "^(?:" + node.to_regex().lower() + ")$"
                    vals = f"map_values({_q(DYNAMIC_FIELD_NAME)})"
                    arr = _tok_sql("__v", "default")
                    parts.append(
                        f"coalesce(exists({vals}, __v -> "
                        f"exists({arr}, __t3 -> __t3 RLIKE "
                        f"{_s(anchored)})), false)"
                    )
                return " OR ".join(f"({p})" for p in parts)
            t = self.resolve(node.field)
            pat = node.to_regex()
            if t.tokenizer in ("default", "en_stem"):
                pat = pat.lower()
            return self._render_regex(Regex(node.field, pat))
        if isinstance(node, RangeQ):
            return self._render_range(node)
        if isinstance(node, Cmp):
            lo_inc = node.op == ">="
            hi_inc = node.op == "<="
            if node.op.startswith(">"):
                return self._render_range(
                    RangeQ(node.field, node.value, None, lo_inc, False))
            return self._render_range(
                RangeQ(node.field, None, node.value, False, hi_inc))
        if isinstance(node, BoolQuery):
            return self._render_bool(node)
        raise _Unrenderable  # Phrase/PhrasePrefix/Regex/Wildcard

    def _render_bool(self, node: BoolQuery) -> str:
        if node.must:
            out = " AND ".join(
                f"({self.render(n)})" for n in node.must)
        elif node.should:
            out = " OR ".join(
                f"({self.render(n)})" for n in node.should)
        else:
            out = "false"
        for n in node.must_not:
            out = (f"({out}) AND NOT "
                   f"coalesce(({self.render(n)}), false)")
        return out

    def _token_match(self, t: _SqlTarget, text: str) -> str:
        if t.tokenizer == "raw":
            if t.kind == "text" and t.array:
                return f"array_contains({t.col}, {_s(text)})"
            return f"{t.col} <=> {_s(text)}"
        toks = analyze_term(text, t.tokenizer)
        if not toks:
            return "false"
        if len(toks) == 1:
            if t.kind == "dynamic":
                arr = _tok_sql(t.col, t.tokenizer)
                if arr is None:
                    raise _Unrenderable
                return f"array_contains({arr}, {_s(toks[0])})"
            return f"array_contains({t.tokens}, {_s(toks[0])})"
        return self._adjacency(t, toks)

    def _adjacency(self, t: _SqlTarget, words: list,
                   slop: int = 0) -> str:
        """QueryCompiler._adjacency: regex strategy for slop-0 on
        non-stemmed targets, the positional fold otherwise."""
        stemmed = t.tokenizer == "en_stem"
        if slop == 0 and not stemmed:
            pat = (
                f"(^|{_NON_ALNUM_RE})"
                + f"{_NON_ALNUM_RE}+".join(re.escape(w) for w in words)
                + f"({_NON_ALNUM_RE}|$)"
            )
            if t.kind == "text" and t.array:
                return (f"exists({t.col}, "
                        f"__e -> lower(__e) RLIKE {_s(pat)})")
            return f"lower({t.col}) RLIKE {_s(pat)}"
        # positional path (required for stems and any nonzero slop)
        if t.kind == "text" and t.array:
            elem = _tok_sql("__el", t.tokenizer)
            if elem is None:
                raise _Unrenderable
            return (f"exists({t.col}, __el -> "
                    f"{_token_seq_match_sql(elem, words, slop)})")
        if t.kind == "text" and t.tokens is not None:
            return _token_seq_match_sql(t.tokens, words, slop)
        arr = _tok_sql(t.col, t.tokenizer or "default")
        if arr is None:
            raise _Unrenderable
        return _token_seq_match_sql(arr, words, slop)

    def _render_term(self, node: Term) -> str:
        if node.field is None:
            return self._default_fields_match(node.text)
        t = self.resolve(node.field)
        if t.kind in ("text", "dynamic"):
            return f"coalesce(({self._token_match(t, node.text)}), false)"
        lit = self._typed_lit(t, node.text)
        if lit is None:
            return "false"
        target = _ip_target(t)
        if t.array:
            return f"coalesce(array_contains({target}, {lit}), false)"
        return f"{target} <=> {lit}"

    def _render_phrase(self, node: Phrase) -> str:
        """QueryCompiler._compile_phrase, including the unqualified
        fan-out (every indexed text field + the _dynamic remainder)."""
        if node.field is None:
            parts = ["false"]
            for f in self.config.fields:
                if f.type == "text" and f.indexed:
                    parts.append(
                        f"coalesce(({self._render_phrase(Phrase((f.name,), node.text, node.slop))}), false)"
                    )
            parts.append(self._dynamic_any_term(node.text))
            return " OR ".join(f"({p})" for p in parts)
        t = self.resolve(node.field)
        if t.tokenizer == "raw" and t.kind == "text":
            if t.array:
                return f"array_contains({t.col}, {_s(node.text)})"
            return f"{t.col} <=> {_s(node.text)}"
        words = analyze_term(
            node.text, t.tokenizer if t.kind == "text" else "default")
        if not words:
            return "false"
        if len(words) == 1:
            return (f"coalesce(({self._token_match(t, words[0])}), "
                    f"false)")
        return (f"coalesce(({self._adjacency(t, words, node.slop)}), "
                f"false)")

    def _default_fields_match(self, text: str) -> str:
        """QueryCompiler._default_fields_match: unqualified term — OR
        over every indexed scalar/array field that can interpret the
        literal, plus the ``_dynamic`` remainder. Note the plain
        ``=`` (not ``<=>``) inside coalesce, matching the Column
        backend exactly."""
        parts = ["false"]
        for f in self.config.fields:
            if not f.indexed or f.type in ("static_object",
                                           "dynamic_object"):
                continue
            if not self._have(f.name):
                continue  # absent declared field: no clause
            t = self._leaf_target(f, _q(f.name), shadow_ok=True)
            if f.type == "text":
                parts.append(
                    f"coalesce(({self._token_match(t, text)}), false)")
            else:
                lit = self._typed_lit(t, text)
                if lit is not None:
                    tgt = _ip_target(t)
                    if f.array:
                        parts.append(
                            f"coalesce(array_contains({tgt}, {lit}), "
                            f"false)")
                    else:
                        parts.append(
                            f"coalesce(({tgt} = {lit}), false)")
        parts.append(self._dynamic_any_term(text))
        return " OR ".join(f"({p})" for p in parts)

    def _dynamic_any_term(self, text: str) -> str:
        toks = analyze_term(text, "default")
        if not toks:
            return "false"
        if not self._have(DYNAMIC_FIELD_NAME):
            return "false"  # no remainder map on this frame
        vals = f"map_values({_q(DYNAMIC_FIELD_NAME)})"
        if len(toks) == 1:
            arr = _tok_sql("__v", "default")
            return (
                f"coalesce(exists({vals}, __v -> "
                f"array_contains({arr}, {_s(toks[0])})), false)"
            )
        pat = (
            f"(^|{_NON_ALNUM_RE})"
            + f"{_NON_ALNUM_RE}+".join(re.escape(w) for w in toks)
            + f"({_NON_ALNUM_RE}|$)"
        )
        return (f"coalesce(exists({vals}, __v -> "
                f"lower(__v) RLIKE {_s(pat)}), false)")

    def _render_phrase_prefix(self, node: PhrasePrefix) -> str:
        """QueryCompiler._compile_phrase_prefix (qualified): words in
        order, the LAST matched as a case-folded-only prefix —
        boundary regex without the trailing anchor for slop-0
        non-stemmed scalars, the positional prefix chain for stems
        and flattened arrays, startswith for raw fields."""
        if node.field is None:
            raise _Unrenderable
        t = self.resolve(node.field)
        if t.kind not in ("text", "dynamic"):
            return "false"
        if t.tokenizer == "raw":
            if t.kind == "text" and t.array:
                return (f"coalesce(exists({t.col}, __e -> "
                        f"startswith(__e, {_s(node.text)})), false)")
            return (f"coalesce(startswith({t.col}, {_s(node.text)}), "
                    f"false)")
        raw_words = [w for w in node.text.split() if w]
        if not raw_words:
            return "false"
        lead = analyze_term(" ".join(raw_words[:-1]), t.tokenizer)
        pfx_toks = analyze_term(raw_words[-1], "default")
        if not pfx_toks:
            return "false"
        prefix = pfx_toks[-1]
        lead = lead + pfx_toks[:-1]
        stemmed = t.tokenizer == "en_stem"
        if not stemmed and not (t.kind == "text" and t.array):
            words = lead + [prefix]
            pat = (
                f"(^|{_NON_ALNUM_RE})"
                + f"{_NON_ALNUM_RE}+".join(re.escape(w) for w in words)
            )
            return (f"coalesce(lower({t.col}) RLIKE {_s(pat)}, "
                    f"false)")
        if t.kind == "text" and t.array:
            elem = _tok_sql("__el", t.tokenizer)
            if elem is None:
                raise _Unrenderable
            body = _token_seq_prefix_match_sql(elem, lead, prefix)
            return (f"coalesce(exists({t.col}, __el -> {body}), "
                    f"false)")
        toks = t.tokens if t.tokens is not None else _tok_sql(
            t.col, t.tokenizer or "default")
        if toks is None:
            raise _Unrenderable
        return (f"coalesce(({_token_seq_prefix_match_sql(toks, lead, prefix)}), "
                f"false)")

    def _analyzed_probe(self, t: _SqlTarget, text: str) -> str:
        return (text.lower()
                if t.tokenizer in ("default", "en_stem") else text)

    def _render_prefix(self, node: Prefix) -> str:
        if node.field is None:
            # QueryCompiler._compile_prefix's fan-out: indexed text
            # fields (absent ones contribute no clause) + the
            # _dynamic remainder probed with the default tokenizer
            parts = ["false"]
            for f in self.config.fields:
                if f.type != "text" or not f.indexed:
                    continue
                if not self._have(f.name):
                    continue
                parts.append(
                    f"coalesce(({self._render_prefix(Prefix((f.name,), node.text))}), false)"
                )
            if self._have(DYNAMIC_FIELD_NAME):
                vals = f"map_values({_q(DYNAMIC_FIELD_NAME)})"
                arr = _tok_sql("__v", "default")
                lp = node.text.lower()
                parts.append(
                    f"coalesce(exists({vals}, __v -> exists({arr}, "
                    f"__t3 -> startswith(__t3, {_s(lp)}))), false)"
                )
            return " OR ".join(f"({p})" for p in parts)
        t = self.resolve(node.field)
        if t.kind not in ("text", "dynamic"):
            return "false"
        p = self._analyzed_probe(t, node.text)
        if t.tokenizer == "raw":
            if t.kind == "text" and t.array:
                m = f"exists({t.col}, __e -> startswith(__e, {_s(p)}))"
            else:
                m = f"startswith({t.col}, {_s(p)})"
        else:
            arr = (_tok_sql(t.col, t.tokenizer)
                   if t.kind == "dynamic" else t.tokens)
            if arr is None:
                raise _Unrenderable
            m = f"exists({arr}, __t -> startswith(__t, {_s(p)}))"
        return f"coalesce(({m}), false)"

    def _render_fuzzy(self, node: Fuzzy) -> str:
        if node.field is None:
            # QueryCompiler._compile_fuzzy's fan-out: indexed text
            # fields only (no dynamic arm, matching the backend)
            parts = ["false"]
            for f in self.config.fields:
                if f.type != "text" or not f.indexed:
                    continue
                if not self._have(f.name):
                    continue
                parts.append(
                    f"coalesce(({self._render_fuzzy(Fuzzy((f.name,), node.text, node.distance))}), false)"
                )
            return " OR ".join(f"({p})" for p in parts)
        t = self.resolve(node.field)
        if t.kind not in ("text", "dynamic"):
            return "false"
        p = self._analyzed_probe(t, node.text)
        d = int(node.distance)
        if t.tokenizer == "raw":
            if t.kind == "text" and t.array:
                m = (f"exists({t.col}, "
                     f"__e -> levenshtein(__e, {_s(p)}) <= {d})")
            else:
                m = f"levenshtein({t.col}, {_s(p)}) <= {d}"
        else:
            arr = (_tok_sql(t.col, t.tokenizer)
                   if t.kind == "dynamic" else t.tokens)
            if arr is None:
                raise _Unrenderable
            m = (
                f"exists({arr}, __t -> "
                f"abs(length(__t) - {len(p)}) <= {d} "
                f"AND levenshtein(__t, {_s(p)}) <= {d})"
            )
        return f"coalesce(({m}), false)"

    def _render_regex(self, node: Regex) -> str:
        """QueryCompiler._compile_regex: full-match on some analyzed
        token (``^(?:...)$`` anchors), raw == whole value, non-text
        on the string rendering."""
        t = self.resolve(node.field)
        pat = _s("^(?:" + node.pattern + ")$")
        if t.kind in ("text", "dynamic"):
            if t.tokenizer == "raw":
                if t.kind == "text" and t.array:
                    m = f"exists({t.col}, __e -> __e RLIKE {pat})"
                else:
                    m = f"{t.col} RLIKE {pat}"
                return f"coalesce(({m}), false)"
            arr = (_tok_sql(t.col, t.tokenizer)
                   if t.kind == "dynamic" else t.tokens)
            if arr is None:
                raise _Unrenderable
            return (f"coalesce(exists({arr}, "
                    f"__t -> __t RLIKE {pat}), false)")
        target = _ip_target(t)
        if t.array:
            return (f"coalesce(exists({target}, __e -> "
                    f"CAST(__e AS STRING) RLIKE {pat}), false)")
        return (f"coalesce(CAST({target} AS STRING) RLIKE {pat}, "
                f"false)")

    def _render_range(self, node: RangeQ) -> str:
        t = self.resolve(node.field)
        target = _ip_target(t)
        if t.kind == "dynamic":
            bounds_num = [
                QueryCompiler._num(b)
                for b in (node.lo, node.hi) if b is not None
            ]
            if bounds_num and all(b is not None for b in bounds_num):
                target = f"try_cast({t.col} AS DOUBLE)"
                mk = lambda b: _dbl(  # noqa: E731
                    float(QueryCompiler._num(b)))
            else:
                mk = _s
        else:
            mk = lambda b: self._typed_lit(t, b)  # noqa: E731

        def bound(side_val, inc, is_lo):
            if side_val is None:
                return None
            litc = mk(side_val)
            if litc is None:
                return "false"
            if t.array:
                op = (">=" if inc else ">") if is_lo else \
                    ("<=" if inc else "<")
                return f"exists({target}, __e -> __e {op} {litc})"
            op = (">=" if inc else ">") if is_lo else \
                ("<=" if inc else "<")
            return f"{target} {op} {litc}"

        lo_c = bound(node.lo, node.lo_inc, True)
        hi_c = bound(node.hi, node.hi_inc, False)
        if lo_c is None and hi_c is None:
            return f"{target} IS NOT NULL"
        if t.array and lo_c is not None and hi_c is not None:
            litlo, lithi = mk(node.lo), mk(node.hi)
            if litlo is None or lithi is None:
                # A non-coercible bound (e.g. ``nums:[abc TO 5]``)
                # matches nothing — mirror bound()'s "false" instead of
                # interpolating Python ``None`` into the SQL text
                # (which would raise UNRESOLVED_COLUMN and, fused into
                # one percolate F.expr, kill the whole batch).
                return "false"
            lo_op = ">=" if node.lo_inc else ">"
            hi_op = "<=" if node.hi_inc else "<"
            return (
                f"coalesce(exists({target}, __e -> "
                f"__e {lo_op} {litlo} AND __e {hi_op} {lithi}), false)"
            )
        if lo_c is not None and hi_c is not None:
            return f"({lo_c}) AND ({hi_c})"
        return lo_c if lo_c is not None else hi_c


def render_query_sql(
    query: str, config: IndexConfig,
    available_columns: Optional[set] = None,
) -> Optional[str]:
    """Render *query* to one SQL boolean expression, or ``None`` when
    any part of it needs the Column backend. Syntax errors raise
    :class:`~toshokan_spark.plans.ast.ParseError` exactly like
    ``compile_query`` (the caller must not silently fall back on a
    malformed query)."""
    return render_node_sql(parse_query(query), config, available_columns)


def render_node_sql(
    node: Node, config: IndexConfig,
    available_columns: Optional[set] = None,
) -> Optional[str]:
    """Render an ALREADY-PARSED query node to one SQL boolean
    expression, or ``None`` when it needs the Column backend — for
    callers that hold the node anyway (``search_df`` parses once for
    segment pruning; re-parsing the text just to render would be a
    wasted pass, r15 directive 4)."""
    try:
        return SqlQueryRenderer(config, available_columns).render(node)
    except _Unrenderable:
        return None


_fallback_log = logging.getLogger(__name__)


def compile_query_fast(
    query: str, config: IndexConfig,
    available_columns: Optional[set] = None,
):
    """The DEFAULT single-query compile path (VERDICT r15 directive
    4): render the whole query to ONE SQL string and parse it with a
    single ``F.expr`` call — one py4j round trip instead of one per
    operator node (~1 ms each; a 20-node query costs ~20 ms to BUILD
    on the Column backend, and multi-query panels / msearch / the
    delete mask multiply that by N). Falls back to
    :func:`~toshokan_spark.query.compile_query` — the semantics of
    record, equivalence-pinned row-for-row by
    ``tests/test_query_sql.py`` — when the renderer declines
    (en_stem / ip without shadow columns), logging the fallback.
    Syntax errors raise ParseError from the shared parse; genuinely
    bad queries fall through to the Column backend's user-facing
    CompileError."""
    from pyspark.sql import functions as F

    from toshokan_spark.query import compile_query

    sql = render_query_sql(query, config, available_columns)
    if sql is None:
        _fallback_log.debug(
            "query_sql: Column-backend fallback for %r", query)
        return compile_query(query, config, available_columns)
    return F.expr(sql)
