"""SQL-text query backend (query_sql.py): bit-equivalence against
the Column backend (the semantics of record), shape coverage, and
the fallback contract.

Why the duplication is safe to ship: every rendered query is checked
VALUE-FOR-VALUE against ``compile_query`` on live data — both
backends evaluate side by side in one projection and every row must
agree, nulls included (the PQ expressions' bit-pinning discipline,
VERDICT r14 directive 5)."""

import json
import os
import sys

import pytest
from pyspark.sql import functions as F

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from toshokan_spark.config import FieldConfig, IndexConfig  # noqa: E402
from toshokan_spark.plans.ast import ParseError  # noqa: E402
from toshokan_spark.query import compile_query  # noqa: E402
from toshokan_spark.query_sql import render_query_sql  # noqa: E402


def _mixed_config() -> IndexConfig:
    return IndexConfig(
        name="mixed",
        path="",
        fields=[
            FieldConfig(name="id", type="number", number_type="i64"),
            FieldConfig(name="body", type="text", tokenizer="default"),
            FieldConfig(name="sev", type="text", tokenizer="raw"),
            FieldConfig(name="ws", type="text", tokenizer="whitespace"),
            FieldConfig(name="tags", type="text", tokenizer="raw",
                        array=True),
            FieldConfig(name="toks", type="text", tokenizer="default",
                        array=True),
            FieldConfig(name="u", type="number", number_type="u64"),
            FieldConfig(name="f", type="number", number_type="f64"),
            FieldConfig(name="ok", type="boolean"),
            FieldConfig(name="ts", type="datetime"),
            FieldConfig(
                name="obj", type="static_object",
                fields=[FieldConfig(name="cls", type="text")],
            ),
            FieldConfig(name="res", type="dynamic_object"),
            FieldConfig(name="nums", type="number", number_type="i64",
                        array=True),
            FieldConfig(name="ghost", type="number", number_type="i64"),
        ],
    )


@pytest.fixture(scope="module")
def mixed_df(spark):
    """Rows exercising nulls, arrays, dynamic keys, structs — built
    WITHOUT the ingest shadow columns, so the renderer takes the
    inline-tokenize paths (the percolator's situation: arriving docs
    have no index shadows). `ghost` is declared but absent."""
    from datetime import datetime
    from decimal import Decimal

    rows = [
        (1, "Spark Table scan", "INFO", "A b", ["x", "y"],
         ["Big Data", "spark"], Decimal(5), 1.5, True,
         datetime(2024, 1, 2, 3, 4, 5), ("K",),
         {"service": "auth", "j": '{"lvl": "hot"}'}, [1, 5]),
        (2, "slow query path", "DEBUG", "c D", [], ["other text"],
         Decimal(18446744073709551615), -2.0, False,
         datetime(2024, 6, 1, 0, 0, 0), ("L",),
         {"service": "billing"}, [9]),
        (3, None, None, None, None, None, None, None, None,
         None, (None,), None, None),
        (4, "table TABLE spark", "INFO", "A  b", ["y"], [],
         Decimal(7), 0.0, True, datetime(2024, 1, 2, 3, 4, 5, 123456),
         ("K",), {"num": "42"}, [2, 3]),
    ]
    schema = (
        "id long, body string, sev string, ws string, "
        "tags array<string>, toks array<string>, u decimal(20,0), "
        "f double, ok boolean, ts timestamp, "
        "obj struct<cls:string>, res map<string,string>, "
        "nums array<long>"
    )
    df = spark.createDataFrame(rows, schema)
    # the engine's dynamic remainder map
    return df.withColumn(
        "_dynamic",
        F.when(F.col("id") == 1, F.create_map(
            F.lit("extra"), F.lit('"Hello World"'),
            F.lit("n"), F.lit("7"))).otherwise(
            F.when(F.col("id") == 2, F.create_map(
                F.lit("extra"), F.lit('"hello"')))),
    )


RENDERED_QUERIES = [
    "*",
    "id:1",
    "id:[2 TO 4]",
    "id:>1 AND id:<=3",
    "sev:INFO",
    "sev:*",
    "body:spark",
    "body:table",
    'body:"spark table"',      # multi-token term -> adjacency regex
    "ws:b",
    "tags:x",
    "toks:spark",
    "toks:data",
    "u:5",
    "u:18446744073709551615",
    "u:[6 TO 99999999999999999999]",
    "f:1.5",
    "f:>=0",
    "f:<0",
    "ok:true",
    "ok:false",
    "ok:maybe",                # uncoercible -> matches nothing
    "ts:1704164645",
    "ts:[2024-01-01T00:00:00Z TO 2024-03-01T00:00:00Z]",
    "ts:>2024-05-01T00:00:00Z",
    "obj.cls:K",
    "res.service:auth",
    "res.j.lvl:hot",
    "extra:hello",             # undeclared -> _dynamic routing
    "extra:world",
    "n:7",
    "n:[5 TO 9]",              # dynamic numeric range (try_cast)
    "nums:5",
    "nums:[2 TO 3]",
    "nums:>8",
    "nums:[abc TO 5]",         # uncoercible array bound -> false
    "nums:[1 TO abc]",
    "nums:>abc",
    "ghost:1",                 # declared but absent -> typed null
    "ghost:[1 TO 2]",
    "sev:INFO AND body:spark",
    "sev:INFO OR sev:DEBUG",
    "+body:spark -body:slow",
    "NOT sev:DEBUG",
    "(sev:INFO OR sev:DEBUG) AND id:<3",
    "body:spar*",              # prefix
    "sev:INF*",
    "tags:x*",
    "body:spork~1",            # fuzzy
    "sev:INFp~1",
    "body:qu*",
    "body:/sp.rk/",            # regexp: full-match on a token
    "sev:/INF./",
    "body:t?ble",              # wildcard -> anchored token regex
    "id:/4./",                 # non-text regex: string rendering
    "tags:/[xy]/",
    "nums:/[0-9]/",
    "spark",                   # unqualified -> default-fields OR
    "hello",                   # unqualified hit only via _dynamic
    "5",                       # unqualified numeric literal
    "true",                    # unqualified boolean literal
    'body:"spark table"~1',    # slop phrase -> positional fold
    'body:"spark scan"~1',     # slop 1 bridges the middle word
    'body:"spark scan"~0',     # ...slop 0 does not
    'body:"table spark"~3',    # order matters even with slop
    'toks:"big data"',         # phrase on a text ARRAY (per element)
    'ws:"A b"',                # whitespace tokenizer phrase
    'body:"spark tab"*',       # phrase prefix (boundary regex)
    'body:"spark t"*',
    'sev:"IN"*',               # raw: whole-value startswith
    'toks:"big da"*',          # array: positional prefix chain
    'extra:"hello wo"*',       # dynamic phrase prefix
    '"spark table"~2',         # UNQUALIFIED slop phrase fan-out
    '"slow query"',            # unqualified exact phrase
    "spar*",                   # unqualified prefix (text + dynamic)
    "hell*",                   # unqualified prefix via _dynamic only
    "spork~1",                 # unqualified fuzzy
    "sp?rk",                   # unqualified wildcard
    "hel*o",                   # unqualified wildcard via _dynamic
]

#: shapes the renderer intentionally leaves to the Column backend
#: today: NONE at the node level — only environment-driven gaps
#: remain (en_stem / ip without shadow columns), asserted below
FALLBACK_QUERIES: list = []


def test_rendered_queries_match_column_backend(spark, mixed_df):
    """Every claimed-renderable shape: render to SQL, evaluate BOTH
    backends in one projection, require row-for-row agreement
    (null-safe)."""
    config = _mixed_config()
    cols = set(mixed_df.columns)
    checks = []
    for i, q in enumerate(RENDERED_QUERIES):
        sql = render_query_sql(q, config, cols)
        assert sql is not None, f"expected renderable: {q!r}"
        checks.append(
            F.expr(sql).eqNullSafe(
                compile_query(q, config, cols)).alias(f"c{i}")
        )
    rows = mixed_df.select(*checks).collect()
    for i, q in enumerate(RENDERED_QUERIES):
        vals = [r[f"c{i}"] for r in rows]
        assert all(vals), f"backends disagree on {q!r}: {vals}"


def test_unrenderable_queries_fall_back(spark, mixed_df):
    """Shapes outside the renderer's coverage return None — and the
    Column backend still compiles them (the fallback is never a
    correctness hole)."""
    config = _mixed_config()
    cols = set(mixed_df.columns)
    for q in FALLBACK_QUERIES:
        assert render_query_sql(q, config, cols) is None, q
        mixed_df.filter(compile_query(q, config, cols)).count()
    # en_stem without a shadow tokens column is unrenderable too
    stem_cfg = IndexConfig(
        name="s", path="",
        fields=[FieldConfig(name="t", type="text", tokenizer="en_stem")])
    assert render_query_sql("t:running", stem_cfg, {"t"}) is None
    # ...but WITH the shadow column it renders (the index-scan case)
    from toshokan_spark.ingest import tokens_col

    assert render_query_sql(
        "t:running", stem_cfg, {"t", tokens_col("t")}) is not None


def test_render_respects_shadow_columns(spark):
    """When the ingest shadow token array is available the renderer
    must read it (matching QueryCompiler) — equivalence on a frame
    that HAS shadows, where the en_stem field is only queryable
    through them."""
    from toshokan_spark.functions.tokenizers import tokenize
    from toshokan_spark.ingest import tokens_col

    cfg = IndexConfig(
        name="sh", path="",
        fields=[
            FieldConfig(name="id", type="number", number_type="i64"),
            FieldConfig(name="t", type="text", tokenizer="en_stem"),
        ])
    df = spark.createDataFrame(
        [(1, "connections terminating"), (2, "a running total"),
         (3, None)],
        "id long, t string",
    ).withColumn(tokens_col("t"), tokenize(F.col("t"), "en_stem"))
    cols = set(df.columns)
    for q in ("t:connection", "t:run", "t:nothing"):
        sql = render_query_sql(q, cfg, cols)
        assert sql is not None
        bad = df.select(
            F.expr(sql).eqNullSafe(
                compile_query(q, cfg, cols)).alias("eq")
        ).filter(~F.col("eq")).count()
        assert bad == 0, q


def test_render_raises_on_syntax_error():
    config = _mixed_config()
    with pytest.raises(ParseError):
        render_query_sql('sev:"unterminated', config, {"sev"})


def test_phrase_on_raw_array_field_matches_elements(spark, mixed_df):
    """Regression (r15): a phrase on a raw text ARRAY field — or an
    unqualified phrase fanning out over one — must match on some
    element, not die at analysis with eqNullSafe(array, string)."""
    config = _mixed_config()
    cols = set(mixed_df.columns)
    c = compile_query('tags:"x"', config, cols)
    assert [r.id for r in mixed_df.filter(c).select("id").collect()] \
        == [1]
    # the unqualified slop phrase that exposed it compiles and runs
    c2 = compile_query('"spark table"~2', config, cols)
    ids = sorted(r.id for r in mixed_df.filter(c2).select("id").collect())
    assert 1 in ids


def test_unqualified_queries_skip_absent_columns(spark, mixed_df):
    """Regression (r15): an unqualified term / prefix / fuzzy /
    wildcard over a config with a DECLARED-BUT-ABSENT column (ghost,
    the post-alter pre-ingest state) or a frame WITHOUT _dynamic must
    compile and run — the absent field contributes no clause — in
    BOTH backends, with equal results."""
    config = _mixed_config()
    cols = set(mixed_df.columns)
    nodyn = mixed_df.drop("_dynamic")
    ncols = set(nodyn.columns)
    for q in ("spark", "5", "spa*", "spork~1", "sp?rk"):
        col = compile_query(q, config, cols)
        assert mixed_df.filter(col).count() >= 0  # compiles + runs
        col2 = compile_query(q, config, ncols)
        n2 = nodyn.filter(col2).count()
        sql2 = render_query_sql(q, config, ncols)
        if sql2 is not None:
            assert nodyn.filter(F.expr(sql2)).count() == n2, q
