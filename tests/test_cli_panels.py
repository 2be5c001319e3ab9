"""CLI bucket pipeline stages (--bucket-script/-selector/-sort) and
the unqualified -> _dynamic panel-field routing (the same §2.4 rule
the query compiler applies)."""

import json

import pytest


@pytest.fixture(scope="module")
def panel_index(spark, tmp_path_factory):
    from toshokan_spark import cli

    tmp = tmp_path_factory.mktemp("cli_panels")
    rows = [
        {"timestamp": 1460530013 + i, "tenant_id": i % 3,
         "severity_text": ("INFO" if i % 2 else "DEBUG")}
        for i in range(8)
    ]
    jsonl = tmp / "docs.jsonl"
    jsonl.write_text("\n".join(json.dumps(r) for r in rows) + "\n")
    cfg = {
        "name": "panels",
        "path": str(tmp / "data"),
        "time_field": "timestamp",
        "schema": {"fields": [
            {"name": "timestamp", "type": "datetime",
             "formats": ["timestamp"], "fast": True},
            {"name": "tenant_id", "type": "number", "number_type": "u64"},
        ]},
    }
    cfg_path = tmp / "cfg.json"
    cfg_path.write_text(json.dumps(cfg))
    cat = str(tmp / "cat")
    assert cli.main(["--catalog", cat, "create", str(cfg_path)]) == 0
    assert cli.main(["--catalog", cat, "index", "panels", str(jsonl)]) == 0
    return cat


def _run(capsys, argv):
    from toshokan_spark import cli

    capsys.readouterr()
    assert cli.main(argv) == 0
    return [json.loads(l) for l in
            capsys.readouterr().out.strip().splitlines() if l]


def test_dynamic_field_facet_routes_and_decodes(panel_index, capsys):
    """severity_text is undeclared -> lives in _dynamic; the facet
    must route there and decode the JSON-rendered value."""
    rows = _run(capsys, ["--catalog", panel_index, "search", "panels", "*",
                         "--facet-by", "severity_text"])
    got = {r["severity_text"]: r["n_hits"] for r in rows}
    assert got == {"INFO": 4, "DEBUG": 4}


def test_bucket_script_selector_sort_chain(panel_index, capsys):
    """script adds the computed metric, selector filters on it, sort
    orders by it — ES stage chaining through the CLI."""
    rows = _run(capsys, [
        "--catalog", panel_index, "search", "panels", "*",
        "--facet-by", "tenant_id",
        "--bucket-script", "triple=n_hits * 3",
        "--bucket-selector", "triple >= 9",
        "--bucket-sort", "triple:desc,tenant_id:asc",
    ])
    # tenants 0,1 have 3 hits (triple=9), tenant 2 has 2 (triple=6)
    assert [(r["tenant_id"], r["triple"]) for r in rows] == [
        ("0", 9), ("1", 9)]


def test_bucket_sort_paging(panel_index, capsys):
    rows = _run(capsys, [
        "--catalog", panel_index, "search", "panels", "*",
        "--facet-by", "tenant_id",
        "--bucket-sort", "n_hits:desc,tenant_id:asc",
        "--bucket-from", "1", "--bucket-size", "1",
    ])
    assert len(rows) == 1 and rows[0]["tenant_id"] == "1"


def test_collapse_by_one_per_group(panel_index, capsys):
    """--collapse-by: one best hit per tenant (by timestamp desc,
    ties by the first schema field), annotated with the group's
    inner-hit count, list ordered by the winning sort values."""
    rows = _run(capsys, [
        "--catalog", panel_index, "search", "panels", "*",
        "--collapse-by", "tenant_id", "--order-by", "timestamp",
        "--limit", "10",
    ])
    # 8 docs, tenant = i % 3: group sizes 3 (t0: i=0,3,6), 3 (t1), 2 (t2)
    assert [(r["tenant_id"], r["n_in_group"]) for r in rows] == [
        ("1", 3), ("0", 3), ("2", 2)]
    # winners are each tenant's latest timestamp: i=7 (t1), 6 (t0),
    # 5 (t2) — the emitter renders datetimes as UTC strings
    assert [r["timestamp"] for r in rows] == [
        "2016-04-13 06:47:00", "2016-04-13 06:46:59",
        "2016-04-13 06:46:58"]


def test_suggest_spell_sibling_flags(panel_index, capsys):
    """--suggest-field/-prefix, --spell-field/-term and
    --sibling-interval/-value panels through the CLI, fields routed
    through _dynamic where undeclared."""
    rows = _run(capsys, [
        "--catalog", panel_index, "search", "panels", "*",
        "--suggest-field", "severity_text", "--suggest-prefix", "d",
    ])
    assert rows == [{"term": "debug", "df": 4}]
    rows = _run(capsys, [
        "--catalog", panel_index, "search", "panels", "*",
        "--spell-field", "severity_text", "--spell-term", "indo",
    ])
    assert rows == [{"term": "info", "dist": 1, "df": 4}]
    rows = _run(capsys, [
        "--catalog", panel_index, "search", "panels", "*",
        "--sibling-interval", "2", "--sibling-value", "tenant_id",
    ])
    # timestamps 1460530013..20 at 1 s spacing, 2 s buckets ->
    # ...012(1 doc), 014(2), 016(2), 018(2), 020(1)
    assert len(rows) == 1 and rows[0]["n_buckets"] == 5


def test_boxplot_string_stats_t_test_diversify_flags(panel_index, capsys):
    """--boxplot-field, --string-stats-field, --t-test and
    --diversify-by panels through the CLI; string/t-test fields route
    through _dynamic where undeclared."""
    import math

    # tenant_id values sorted: [0,0,0,1,1,1,2,2] -> q1=0 q2=1 q3=1,
    # fences [-1.5, 2.5] keep everything
    rows = _run(capsys, [
        "--catalog", panel_index, "search", "panels", "*",
        "--boxplot-field", "tenant_id",
    ])
    assert rows == [{
        "n_values": 8, "min_v": 0.0, "max_v": 2.0,
        "q1": 0.0, "q2": 1.0, "q3": 1.0, "iqr": 1.0,
        "lower": 0.0, "upper": 2.0,
    }]

    # DEBUG x4 + INFO x4 = 36 chars; the nine distinct letters
    # (B D E F G I N O U) each appear exactly 4 times -> the
    # distribution is uniform and the entropy is log2(9)
    rows = _run(capsys, [
        "--catalog", panel_index, "search", "panels", "*",
        "--string-stats-field", "severity_text",
    ])
    p = 4.0 / 36.0
    ent = 0.0
    for _ in range(9):  # ordered fold over the sorted chars
        ent = ent - p * math.log2(p)
    assert rows == [{
        "n_values": 8, "min_length": 4, "max_length": 5,
        "avg_length": 4.5, "entropy": round(ent, 6),
    }]
    assert rows[0]["entropy"] == pytest.approx(math.log2(9), abs=1e-6)

    # Welch's t between the DEBUG tenant values [0,2,1,0] and the
    # INFO tenant values [1,0,2,1]
    rows = _run(capsys, [
        "--catalog", panel_index, "search", "panels", "*",
        "--t-test", "tenant_id;severity_text:debug;severity_text:info",
    ])
    a, b = [0.0, 2.0, 1.0, 0.0], [1.0, 0.0, 2.0, 1.0]
    ma, mb = sum(a) / 4, sum(b) / 4
    va = (sum(x * x for x in a) - sum(a) ** 2 / 4) / 3
    vb = (sum(x * x for x in b) - sum(b) ** 2 / 4) / 3
    t = (ma - mb) / math.sqrt(va / 4 + vb / 4)
    assert rows == [{
        "n_a": 4, "n_b": 4, "mean_a": round(ma, 6),
        "mean_b": round(mb, 6), "t_stat": round(t, 6),
    }]

    # diversified sample: best timestamp per tenant, top 2 overall
    rows = _run(capsys, [
        "--catalog", panel_index, "search", "panels", "*",
        "--diversify-by", "tenant_id", "--order-by", "timestamp",
        "--diversify-max", "1", "--sample-size", "2",
    ])
    # u64 fields are decimal-typed and JSON-render via default=str
    assert [int(r["tenant_id"]) for r in rows] == [1, 0]


def test_cumulative_cardinality_and_ks_flags(panel_index, capsys):
    """--cumulative-cardinality (first-seen decomposition) and
    --ks-test through the CLI."""
    # 8 docs, 1 s apart, tenants 0,1,2 cycling; epoch-aligned 2 s
    # buckets: ...012 holds only i=0 (tenant 0), ...014 holds i=1,2
    # (tenants 1 and 2) — so new_keys = [1, 2, 0, ...]
    rows = _run(capsys, [
        "--catalog", panel_index, "search", "panels", "*",
        "--cumulative-cardinality", "tenant_id", "--cum-interval", "2",
    ])
    assert [r["new_keys"] for r in rows][:2] == [1, 2]
    assert rows[-1]["cumulative_cardinality"] == 3
    assert sum(r["n_hits"] for r in rows) == 8
    # identical populations -> D = 0
    rows = _run(capsys, [
        "--catalog", panel_index, "search", "panels", "*",
        "--ks-test",
        "tenant_id;severity_text:debug;severity_text:debug;1",
    ])
    assert rows == [{"n_a": 4, "n_b": 4, "ks_d": 0.0}]
    # disjoint distributions -> D climbs toward 1 (tenant 0 vs 2)
    rows = _run(capsys, [
        "--catalog", panel_index, "search", "panels", "*",
        "--ks-test", "tenant_id;tenant_id:0;tenant_id:2;1",
    ])
    assert rows[0]["ks_d"] == 1.0


def test_runtime_fields_feed_every_panel(panel_index, capsys):
    """--runtime-field defines a computed column usable by any panel
    flag (ES runtime mappings): facet and stats over an expression
    that never exists in the index."""
    rows = _run(capsys, [
        "--catalog", panel_index, "search", "panels", "*",
        "--runtime-field", "is_even=CAST(tenant_id % 2 = 0 AS STRING)",
        "--facet-by", "is_even",
    ])
    # tenants [0,1,2,0,1,2,0,1]: even (0,2) x5, odd (1) x3
    assert {r["is_even"]: r["n_hits"] for r in rows} == {
        "true": 5, "false": 3}
    rows = _run(capsys, [
        "--catalog", panel_index, "search", "panels", "*",
        "--runtime-field", "double_tenant=tenant_id * 2",
        "--stats-field", "double_tenant",
    ])
    assert rows[0]["n_values"] == 8 and rows[0]["max_v"] == 4.0
    # malformed spec fails fast
    from toshokan_spark import cli

    with pytest.raises(SystemExit):
        cli.main(["--catalog", panel_index, "search", "panels", "*",
                  "--runtime-field", "nonsense",
                  "--facet-by", "nonsense"])


def test_phrase_suggest_flag_prefers_probable_sequence(panel_index, capsys):
    """--phrase-suggest: the bigram LM ranks whole corrected phrases.
    severity values are DEBUG/INFO; the typo 'indo' corrects to
    'info' and the result phrase must be a real corpus sequence."""
    rows = _run(capsys, [
        "--catalog", panel_index, "search", "panels", "*",
        "--phrase-suggest-field", "severity_text",
        "--phrase-suggest-text", "indo indo",
    ])
    assert rows and rows[0]["phrase"] == "info info"
    assert all(isinstance(r["score"], float) for r in rows)


def test_span_near_flag(spark, tmp_path_factory, capsys):
    """--span-near F:A,B,SLOP[,ordered]: proximity filtering over the
    hit set through the CLI, reusing the span_near operator (VERDICT
    r13 directive 7 — the query-string surface stops at ordered
    phrase slop; this exposes the unordered case). Output is one
    line per hit with the minimum intervening gap."""
    from toshokan_spark import cli

    tmp = tmp_path_factory.mktemp("span_cli")
    rows = [
        {"id": 1, "body": "slow painful query"},
        {"id": 2, "body": "query was slow"},
        {"id": 3, "body": "slow parser but a very fast query engine"},
        {"id": 4, "body": "nothing here"},
    ]
    (tmp / "d.jsonl").write_text(
        "\n".join(json.dumps(r) for r in rows) + "\n")
    cfg = {"name": "spans", "path": str(tmp / "data"),
           "schema": {"fields": [
               {"name": "id", "type": "number"},
               {"name": "body", "type": "text"}]}}
    (tmp / "c.json").write_text(json.dumps(cfg))
    cat = str(tmp / "cat")
    assert cli.main(["--catalog", cat, "create", str(tmp / "c.json")]) == 0
    assert cli.main(["--catalog", cat, "index", "spans",
                     str(tmp / "d.jsonl")]) == 0

    out = _run(capsys, ["--catalog", cat, "search", "spans", "*",
                        "--span-near", "body:slow,query,2", "--limit", "10"])
    got = {o["doc"]["id"]: o["span_gap"] for o in out}
    # doc 1: gap 1 ordered; doc 2: reversed gap 1 (unordered accepts);
    # doc 3: gap 5 exceeds slop; doc 4: no terms
    assert got == {1: 1, 2: 1}

    out = _run(capsys, ["--catalog", cat, "search", "spans", "*",
                        "--span-near", "body:slow,query,2,ordered",
                        "--limit", "10"])
    assert {o["doc"]["id"] for o in out} == {1}

    # the hit-set query composes: restrict to id>=2 first
    out = _run(capsys, ["--catalog", cat, "search", "spans", "id:>=2",
                        "--span-near", "body:slow,query,6", "--limit", "10"])
    assert {o["doc"]["id"] for o in out} == {2, 3}

    # malformed specs error cleanly
    capsys.readouterr()
    assert cli.main(["--catalog", cat, "search", "spans", "*",
                     "--span-near", "body:slow,query"]) == 2
    assert "wants F:A,B,SLOP" in capsys.readouterr().err
    # an undeclared field routes to _dynamic (same rule as panels):
    # no such key -> no matches, not an error
    out = _run(capsys, ["--catalog", cat, "search", "spans", "*",
                        "--span-near", "nope:slow,query,2",
                        "--limit", "10"])
    assert out == []


def test_span_near_flag_routes_dynamic_fields(panel_index, capsys):
    """--span-near on a field the schema never declared routes to the
    _dynamic remainder map (the same SURVEY §2.4 rule the query
    compiler and panels apply) instead of failing."""
    rows = _run(capsys, ["--catalog", panel_index, "search", "panels", "*",
                         "--span-near", "severity_text:info,info,0",
                         "--limit", "10"])
    # severity_text is a single token; same-term span needs two
    # occurrences, so nothing matches — but the routing resolves
    assert rows == []


def test_more_like_this_flag(spark, tmp_path_factory, capsys):
    """--more-like-this SEED: index-path MLT through the CLI — the
    seed's characteristic terms rank the rest of the index, seed
    excluded, stats from the commit-time parquets, deletes honored."""
    from toshokan_spark import cli

    tmp = tmp_path_factory.mktemp("mlt_cli")
    rows = [
        {"id": 1, "body": "spark spark table join join scan"},
        {"id": 2, "body": "spark table join scan filter merge"},
        {"id": 3, "body": "window sort order group batch stream"},
        {"id": 4, "body": "spark join table scan scan scan"},
        {"id": 5, "body": "totally unrelated words here now"},
        {"id": 6, "body": "spark join spark join spark join"},
        {"id": 7, "body": "table scan table scan filter"},
        {"id": 8, "body": "join table spark merge filter scan"},
    ]
    (tmp / "d.jsonl").write_text(
        "\n".join(json.dumps(r) for r in rows) + "\n")
    cfg = {"name": "mlt", "path": str(tmp / "data"),
           "schema": {"fields": [
               {"name": "id", "type": "number"},
               {"name": "body", "type": "text"}]}}
    (tmp / "c.json").write_text(json.dumps(cfg))
    cat = str(tmp / "cat")
    assert cli.main(["--catalog", cat, "create", str(tmp / "c.json")]) == 0
    assert cli.main(["--catalog", cat, "index", "mlt",
                     str(tmp / "d.jsonl")]) == 0

    out = _run(capsys, ["--catalog", cat, "search", "mlt", "*",
                        "--more-like-this", "1", "--limit", "3"])
    ids = {o["doc"]["id"] for o in out}
    assert 1 not in ids                # seed excluded
    assert ids and ids <= {2, 4, 6, 7, 8}  # similar docs, never doc 3/5
    assert all(o["score"] > 0 for o in out)

    # a non-numeric seed against a numeric id errors cleanly
    capsys.readouterr()
    assert cli.main(["--catalog", cat, "search", "mlt", "*",
                     "--more-like-this", "abc"]) == 2
    capsys.readouterr()


def test_percolator_register_and_percolate(spark, tmp_path_factory, capsys):
    """ES percolator through the CLI: register standing queries
    (validated at registration), list them, percolate a JSONL batch
    (one (doc, query_id) line per match — overlaps allowed, non-
    matches emit nothing), drop a monitor, and die with the index."""
    from toshokan_spark import cli
    from toshokan_spark.catalog import FsCatalog

    tmp = tmp_path_factory.mktemp("perc_cli")
    cfg = {"name": "mon", "path": str(tmp / "data"),
           "schema": {"fields": [
               {"name": "id", "type": "number"},
               {"name": "sev", "type": "text", "tokenizer": "raw"},
               {"name": "msg", "type": "text"}]}}
    (tmp / "c.json").write_text(json.dumps(cfg))
    cat = str(tmp / "cat")
    assert cli.main(["--catalog", cat, "create", str(tmp / "c.json")]) == 0
    assert cli.main(["--catalog", cat, "percolator", "mon",
                     "errors", "sev:ERROR"]) == 0
    assert cli.main(["--catalog", cat, "percolator", "mon",
                     "disk_full", "msg:disk AND msg:full"]) == 0
    # a syntactically broken monitor is rejected AT registration
    assert cli.main(["--catalog", cat, "percolator", "mon",
                     "broken", "sev:(unclosed"]) == 2
    capsys.readouterr()
    rows = _run(capsys, ["--catalog", cat, "percolator", "mon", "--list"])
    assert {r["query_id"] for r in rows} == {"errors", "disk_full"}

    docs = [
        {"id": 1, "sev": "ERROR", "msg": "disk almost full on node"},
        {"id": 2, "sev": "INFO", "msg": "all good"},
        {"id": 3, "sev": "ERROR", "msg": "timeout"},
    ]
    (tmp / "batch.jsonl").write_text(
        "\n".join(json.dumps(d) for d in docs) + "\n")
    rows = _run(capsys, ["--catalog", cat, "percolate", "mon",
                         str(tmp / "batch.jsonl")])
    got = {(r["id"], r["query_id"]) for r in rows}
    assert got == {(1, "errors"), (1, "disk_full"), (3, "errors")}

    assert cli.main(["--catalog", cat, "percolator", "mon",
                     "--drop", "disk_full"]) == 0
    capsys.readouterr()
    rows = _run(capsys, ["--catalog", cat, "percolator", "mon", "--list"])
    assert {r["query_id"] for r in rows} == {"errors"}
    # monitors die with the index
    assert cli.main(["--catalog", cat, "drop", "mon"]) == 0
    capsys.readouterr()
    assert FsCatalog(cat).percolators.__self__ is not None
    c2 = FsCatalog(cat)
    import pytest as _pytest
    from toshokan_spark.catalog import CatalogError
    with _pytest.raises(CatalogError):
        c2.register_percolator("mon", "x", "sev:A")


def test_search_template_params(panel_index, capsys):
    """ES _search/template: {{NAME}} placeholders substitute before
    parsing; unresolved placeholders error instead of silently
    matching everything."""
    from toshokan_spark import cli

    rows = _run(capsys, ["--catalog", panel_index, "search", "panels",
                         "tenant_id:>={{lo}} AND severity_text:{{sev}}",
                         "--param", "lo=1", "--param", "sev=INFO",
                         "--limit", "10"])
    assert rows and all(r["tenant_id"] >= 1 for r in rows)
    capsys.readouterr()
    assert cli.main(["--catalog", panel_index, "search", "panels",
                     "tenant_id:{{missing}}", "--param", "x=1"]) == 2
    assert "unresolved template params" in capsys.readouterr().err
    assert cli.main(["--catalog", panel_index, "search", "panels",
                     "x", "--param", "noequals"]) == 2
    capsys.readouterr()


@pytest.fixture(scope="module")
def relevance_index(spark, tmp_path_factory):
    """An index with a numeric id, a text body, and a numeric feature
    — the surface the r15 relevance-family flags score against."""
    from toshokan_spark import cli

    tmp = tmp_path_factory.mktemp("rel_cli")
    rows = [
        {"id": 1, "body": "spark table scan", "stars": 10,
         "ts": 1716822728},
        {"id": 2, "body": "spark spark table", "stars": 0,
         "ts": 1716822728 + 3600},
        {"id": 3, "body": "slow spark table", "stars": 50,
         "ts": 1716822728 + 7200},
        {"id": 4, "body": "nothing relevant", "stars": 99,
         "ts": 1716822728 + 10800},
    ]
    (tmp / "d.jsonl").write_text(
        "\n".join(json.dumps(r) for r in rows) + "\n")
    cfg = {"name": "rel", "path": str(tmp / "data"),
           "time_field": "ts",
           "schema": {"fields": [
               {"name": "id", "type": "number"},
               {"name": "body", "type": "text"},
               {"name": "stars", "type": "number"},
               {"name": "ts", "type": "datetime",
                "formats": ["timestamp"], "fast": True}]}}
    (tmp / "c.json").write_text(json.dumps(cfg))
    cat = str(tmp / "cat")
    assert cli.main(["--catalog", cat, "create", str(tmp / "c.json")]) == 0
    assert cli.main(["--catalog", cat, "index", "rel",
                     str(tmp / "d.jsonl")]) == 0
    return cat


def test_boosting_flag_demotes_not_excludes(relevance_index, capsys):
    """--boosting NEG[:FACTOR]: hits matching the negative terms are
    DEMOTED by the factor, never dropped (the point over a must_not);
    colon-less specs default the factor to 0.5."""
    from toshokan_spark import cli

    out = _run(capsys, ["--catalog", relevance_index, "search", "rel",
                        "spark table", "--boosting", "slow:0.1",
                        "--limit", "10"])
    byid = {o["id"]: o for o in out}
    assert byid[3]["demoted"] == 1 and byid[1]["demoted"] == 0
    # doc 3 matches the organic query but ranks LAST among matches
    ranked = [o["id"] for o in out]
    assert 3 in ranked and ranked[-1] == 3
    # default factor applies without an explicit :FACTOR
    out2 = _run(capsys, ["--catalog", relevance_index, "search", "rel",
                         "spark table", "--boosting", "slow",
                         "--limit", "10"])
    d3 = next(o for o in out2 if o["id"] == 3)
    assert d3["score"] > byid[3]["score"] > 0
    # out-of-range factor errors
    capsys.readouterr()
    assert cli.main(["--catalog", relevance_index, "search", "rel",
                     "spark table", "--boosting", "slow:7"]) == 2
    assert "must be in [0,1]" in capsys.readouterr().err


def test_pinned_flag_promotes_in_list_order(relevance_index, capsys):
    """--pinned IDS: listed ids lead in LIST order — including a doc
    that never matches the organic query (score 0) — then organic
    matches minus the pinned set."""
    from toshokan_spark import cli

    out = _run(capsys, ["--catalog", relevance_index, "search", "rel",
                        "spark table", "--pinned", "4,2", "--limit", "10"])
    ids = [o["id"] for o in out]
    assert ids[:2] == [4, 2]
    assert out[0]["pinned"] is True and out[0]["score"] == 0.0
    assert all(not o["pinned"] for o in out[2:])
    # non-numeric ids for a numeric id field error cleanly
    capsys.readouterr()
    assert cli.main(["--catalog", relevance_index, "search", "rel",
                     "spark table", "--pinned", "x,y"]) == 2
    assert "numeric ids" in capsys.readouterr().err
    # the family's flags are mutually exclusive
    assert cli.main(["--catalog", relevance_index, "search", "rel",
                     "spark table", "--pinned", "4",
                     "--boosting", "slow"]) == 2
    assert "exclusive" in capsys.readouterr().err


def test_rank_and_distance_feature_flags(relevance_index, capsys):
    """--rank-feature F[:FN[:PIVOT]] and --distance-feature
    F:PIVOT[:ORIGIN]: BM25 plus the feature boost, reusing the
    operators; undeclared fields error, malformed numbers exit 2."""
    from toshokan_spark import cli

    out = _run(capsys, ["--catalog", relevance_index, "search", "rel",
                        "spark table", "--rank-feature",
                        "stars:saturation:10", "--limit", "10"])
    assert [set(o) for o in out] == [{"id", "score"}] * len(out)
    # doc 3 (stars 50) outranks doc 1 (stars 10) under a strong boost
    byid = {o["id"]: o["score"] for o in out}
    assert byid[3] > 0 and byid[1] > 0
    # distance_feature: origin at doc 2's ts epoch on the stars axis
    out2 = _run(capsys, ["--catalog", relevance_index, "search", "rel",
                         "spark table", "--distance-feature",
                         "stars:25:0", "--limit", "10"])
    b2 = {o["id"]: o["score"] for o in out2}
    # stars=0 sits AT the origin: doc 2 gets the full distance boost
    assert b2[2] > b2[1]
    capsys.readouterr()
    assert cli.main(["--catalog", relevance_index, "search", "rel",
                     "spark table", "--rank-feature", "stars:log:zzz"]) == 2
    assert "PIVOT" in capsys.readouterr().err
    assert cli.main(["--catalog", relevance_index, "search", "rel",
                     "spark table", "--distance-feature", "stars"]) == 2
    assert "F:PIVOT" in capsys.readouterr().err
    # unknown rank_feature function surfaces the operator's error
    assert cli.main(["--catalog", relevance_index, "search", "rel",
                     "spark table", "--rank-feature", "stars:cube"]) == 2
    assert "unknown rank_feature" in capsys.readouterr().err


def test_matrix_stats_top_metrics_rate_flags(relevance_index, capsys):
    """The r14 aggregations through the CLI: --matrix-stats pairwise
    moments, --top-metrics latest-by-sort values (bucketed and
    whole-set), --rate calendar-normalized rates on the time_field."""
    from toshokan_spark import cli

    out = _run(capsys, ["--catalog", relevance_index, "search", "rel",
                        "*", "--matrix-stats", "id,stars"])
    pairs = {(o["field"], o["other"]): o for o in out}
    assert pairs[("id", "id")]["n_values"] == 4
    assert pairs[("id", "id")]["mean"] == 2.5
    assert pairs[("id", "stars")]["covariance"] == \
        pairs[("stars", "id")]["covariance"]
    capsys.readouterr()
    assert cli.main(["--catalog", relevance_index, "search", "rel", "*",
                     "--matrix-stats", "id"]) == 2
    assert "2+ numeric fields" in capsys.readouterr().err

    # whole-hit-set top_metrics: the latest row by ts carries stars 99
    out = _run(capsys, ["--catalog", relevance_index, "search", "rel",
                        "*", "--top-metrics", "ts:stars"])
    assert len(out) == 1 and out[0]["stars"] == 99 and out[0]["id"] == 4
    # ascending + bucketed by a dynamic-routed... stars is declared;
    # bucket by id parity via runtime field
    out = _run(capsys, ["--catalog", relevance_index, "search", "rel",
                        "*", "--runtime-field", "par=id % 2",
                        "--top-metrics", "ts:stars:asc",
                        "--top-metrics-by", "par"])
    got = {o["par"]: o["stars"] for o in out}
    assert got == {0: 0, 1: 10}  # earliest per parity bucket
    capsys.readouterr()
    assert cli.main(["--catalog", relevance_index, "search", "rel", "*",
                     "--top-metrics", "ts"]) == 2
    assert "SORT:M1" in capsys.readouterr().err

    # rate: 4 docs in one hour-bucket each, value=stars, per-hour unit
    out = _run(capsys, ["--catalog", relevance_index, "search", "rel",
                        "*", "--rate", "hour", "--rate-field", "stars",
                        "--rate-unit", "3600"])
    assert [o["rate"] for o in out] == [10.0, 0.0, 50.0, 99.0]
    assert all(o["n_hits"] == 1 for o in out)
    capsys.readouterr()
    assert cli.main(["--catalog", relevance_index, "search", "rel", "*",
                     "--rate", "week"]) == 2
    assert "unsupported rate bucket" in capsys.readouterr().err


def test_relevance_flags_route_dynamic_fields(panel_index, capsys):
    """The r15 flags apply the same undeclared-field -> _dynamic
    routing as panels: a --score-field / feature / matrix field the
    schema never declared reads from the remainder map."""
    from toshokan_spark import cli

    # severity_text is undeclared; boosting scores it and demotes
    # the 'debug' rows (the organic query matches both tokens)
    out = _run(capsys, ["--catalog", panel_index, "search", "panels",
                        "info debug", "--score-field", "severity_text",
                        "--boosting", "debug:0.1", "--limit", "10"])
    assert len(out) == 8
    demoted = [o for o in out if o["demoted"] == 1]
    assert len(demoted) == 4
    assert all(o["score"] < min(x["score"] for x in out
                                if not x["demoted"]) for o in demoted)
    # matrix-stats over one declared + one runtime-staged numeric
    out = _run(capsys, ["--catalog", panel_index, "search", "panels",
                        "*", "--runtime-field", "t2=tenant_id * 2",
                        "--matrix-stats", "tenant_id,t2"])
    pairs = {(o["field"], o["other"]): o for o in out}
    assert pairs[("tenant_id", "t2")]["correlation"] == 1.0


def test_change_point_and_frequent_item_sets_flags(relevance_index,
                                                   capsys):
    """--change-point and --frequent-item-sets through the CLI: the
    4-doc fixture's stars series spikes at 99, per-id transactions of
    one body token each pair within the hit set; malformed specs and
    a missing time_field exit 2."""
    from toshokan_spark import cli

    out = _run(capsys, ["--catalog", relevance_index, "search", "rel",
                        "*", "--change-point", "hour",
                        "--change-point-field", "stars"])
    assert len(out) == 1
    # series 10, 0, 50, 99 over 4 hourly buckets: best exact split is
    # after bucket 2 (means 5 vs 74.5) -> step_change at bucket 3
    assert out[0]["type"] == "step_change"
    assert out[0]["n_buckets"] == 4
    out = _run(capsys, ["--catalog", relevance_index, "search", "rel",
                        "*", "--frequent-item-sets", "id:body"])
    # every body is a distinct full string per id: 4 transactions,
    # each 1 item -> all supports 0.25, above the default 0.1
    assert len(out) == 4
    assert all(o["set_size"] == 1 and o["support"] == 0.25
               for o in out)
    capsys.readouterr()
    assert cli.main(["--catalog", relevance_index, "search", "rel",
                     "*", "--change-point", "week"]) == 2
    assert "month|day|hour" in capsys.readouterr().err
    assert cli.main(["--catalog", relevance_index, "search", "rel",
                     "*", "--frequent-item-sets", "only_group"]) == 2
    assert "GROUP:ITEM" in capsys.readouterr().err


def test_moving_fn_and_normalize_flags(relevance_index, capsys):
    """--moving-fn and --normalize over an hourly pipeline histogram:
    the stars series (10, 0, 50, 99) yields exact window stats (the
    ES shift-0 window EXCLUDES the current bucket — null gaps at the
    head) and exact global rescalings; both flags exit 2 without
    --pipeline-interval."""
    import math

    from toshokan_spark import cli

    out = _run(capsys, ["--catalog", relevance_index, "search", "rel",
                        "*", "--pipeline-interval", "3600",
                        "--moving-fn", "stars"])
    assert len(out) == 4
    assert out[0]["mov_sum"] is None          # empty head window
    assert out[0]["mov_stddev"] is None       # NOT 0.0 (null gap)
    assert out[1]["mov_avg"] == 10.0
    assert out[2]["mov_sum"] == 10.0 and out[2]["mov_min"] == 0.0
    assert out[2]["mov_lwa"] == 3.333333      # (10*1 + 0*2) / 3
    assert out[3]["mov_avg"] == 20.0
    assert out[3]["mov_stddev"] == round(math.sqrt(2600.0 / 3 - 400), 6)
    assert out[3]["mov_lwa"] == 26.666667     # (10 + 0 + 150) / 6

    out = _run(capsys, ["--catalog", relevance_index, "search", "rel",
                        "*", "--pipeline-interval", "3600",
                        "--normalize", "stars"])
    assert len(out) == 4
    assert out[0]["percent_of_sum"] == round(1000.0 / 159, 6)
    assert out[0]["rescale_0_1"] == round(10.0 / 99, 6)
    assert out[3]["rescale_0_100"] == 100.0
    assert out[3]["norm_mean"] == round(59.25 / 99, 6)
    # stars are integers: the decimal-exact sums make the variance a
    # dyadic rational, so sqrt is the same IEEE double both sides
    sd = math.sqrt(12401.0 / 4 - 39.75 * 39.75)
    assert out[1]["zscore"] == round(-39.75 / sd, 6)
    capsys.readouterr()
    assert cli.main(["--catalog", relevance_index, "search", "rel",
                     "*", "--moving-fn", "stars"]) == 2
    assert "--pipeline-interval" in capsys.readouterr().err
    assert cli.main(["--catalog", relevance_index, "search", "rel",
                     "*", "--normalize", "stars"]) == 2
    assert "--pipeline-interval" in capsys.readouterr().err
