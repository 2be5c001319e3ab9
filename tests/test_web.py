"""URL/domain curation operators (operators/web.py) — handcrafted
canonicalization cases covering every rule, dedup keeper semantics,
and block/allow domain filtering."""

import pytest
from pyspark.sql import functions as F

from toshokan_spark.operators import web

CASES = [
    # (raw, canonical)
    (
        "HTTPS://WWW.Example.COM:443/a/b/?utm_source=x&z=1&a=2#frag",
        "https://example.com/a/b?a=2&z=1",
    ),
    ("http://example.com:8080/", "http://example.com:8080"),
    ("http://Example.com:80/x", "http://example.com/x"),
    ("https://news.example.com?fbclid=1", "https://news.example.com"),
    ("https://example.com/path///", "https://example.com/path"),
    ("http://example.com/a?b=2&a=1", "http://example.com/a?a=1&b=2"),
    (
        "https://example.com/?gclid=g&msclkid=m&mc_eid=e&ref=r&keep=1",
        "https://example.com?keep=1",
    ),
    ("https://example.com/a#x?notquery=1", "https://example.com/a"),
    ("HTTP://a.b.c.d.com/Z", "http://a.b.c.d.com/Z"),  # path case kept
    ("https://www.example.com", "https://example.com"),
]


def test_canonical_url_cases(spark):
    df = spark.createDataFrame([(r,) for r, _ in CASES], "url string")
    got = [
        r["c"]
        for r in df.select(web.canonical_url(F.col("url")).alias("c")).collect()
    ]
    assert got == [c for _, c in CASES]


def test_registered_domain(spark):
    rows = [
        ("https://WWW.News.Site3.COM:8443/x", "site3.com"),
        ("http://example.org/", "example.org"),
        ("https://localhost/x", ""),  # single-label: no registered domain
    ]
    df = spark.createDataFrame([(u,) for u, _ in rows], "url string")
    got = [
        r["d"]
        for r in df.select(
            web.registered_domain(F.col("url"), is_url=True).alias("d")
        ).collect()
    ]
    assert got == [d for _, d in rows]


def test_url_dedup_keeper_and_counts(spark):
    df = spark.createDataFrame(
        [
            (1, "https://WWW.Example.com/a?utm_source=x"),
            (2, "https://example.com/a"),
            (3, "https://example.com/a/"),
            (4, "https://example.com/b"),
        ],
        "doc_id long, url string",
    )
    got = {
        r["canonical_url"]: (r["keeper_id"], r["n_docs"])
        for r in web.url_dedup(df).collect()
    }
    assert got == {
        "https://example.com/a": (1, 3),
        "https://example.com/b": (4, 1),
    }


def test_domain_filter_block_and_allow(spark):
    df = spark.createDataFrame(
        [
            (1, "https://www.bad.com/x"),
            (2, "https://sub.bad.com/y"),
            (3, "https://good.org/z"),
        ],
        "doc_id long, url string",
    )
    block = spark.createDataFrame([("bad.com",)], "domain string")
    kept = web.domain_filter(df, block, mode="block")
    assert [r["doc_id"] for r in kept.orderBy("doc_id").collect()] == [3]
    assert kept.columns == ["doc_id", "url"]  # helper column dropped
    allowed = web.domain_filter(df, block, mode="allow")
    assert [r["doc_id"] for r in allowed.orderBy("doc_id").collect()] == [1, 2]
    with pytest.raises(ValueError):
        web.domain_filter(df, block, mode="nope")


def test_domain_filter_case_insensitive_list(spark):
    """A blocklist entry with uppercase (CLI --block-domains
    Example.COM) must still match — registered_domain output is
    always lowercased, so the list side is lowercased at the join
    (ADVICE r12: it previously never matched and blocked sites
    passed through)."""
    df = spark.createDataFrame(
        [(1, "https://www.bad.com/x"), (2, "https://good.org/z")],
        "doc_id long, url string",
    )
    block = spark.createDataFrame([("BAD.Com",)], "domain string")
    kept = web.domain_filter(df, block, mode="block")
    assert [r["doc_id"] for r in kept.collect()] == [2]
    allowed = web.domain_filter(df, block, mode="allow")
    assert [r["doc_id"] for r in allowed.collect()] == [1]


def test_url_store_lifecycle_and_incremental(spark, tmp_path):
    from pyspark.sql import functions as F

    corpus = spark.createDataFrame(
        [
            (1, "https://www.a.com/x?utm_source=s"),
            (2, "https://a.com/x"),          # same canonical as 1
            (3, "https://b.org/y"),
        ],
        "doc_id long, url string",
    )
    name, path = "url_store_t", str(tmp_path / "url_store")
    web.write_url_store(corpus, name, path)
    store = spark.table(name)
    got = {r["canonical_url"]: r["o_id"] for r in store.collect()}
    assert got == {"https://a.com/x": 1, "https://b.org/y": 3}

    batch = spark.createDataFrame(
        [
            (10, "https://A.com/x/"),         # owned by corpus doc 1
            (11, "https://new.net/z?b=2&a=1"),
            (12, "https://new.net/z?a=1&b=2"),  # batch-internal dup of 11
        ],
        "doc_id long, url string",
    )
    out = {
        r["doc_id"]: (r["owner_id"], r["keep"])
        for r in web.incremental_url_dedup(batch, store).collect()
    }
    assert out == {10: (1, False), 11: (None, True), 12: (None, False)}

    # first-writer-wins growth, idempotent under replay
    web.append_url_store(batch, name)
    n1 = spark.table(name).count()
    web.append_url_store(batch, name)  # replay: nothing new
    assert spark.table(name).count() == n1 == 3
    owners = {r["canonical_url"]: r["o_id"]
              for r in spark.table(name).collect()}
    assert owners["https://a.com/x"] == 1  # owner never re-assigned
    assert owners["https://new.net/z?a=1&b=2"] == 11
    spark.sql(f"DROP TABLE IF EXISTS {name}")


def test_pagerank_exact_integer_arithmetic(spark):
    """Spark pagerank reproduces a driver-side python model of the
    SAME int64 fixed-point recurrence bit-for-bit (the property the
    DuckDB oracle relies on), including dangling-mass redistribution;
    total mass stays within N truncations of the scale."""
    edges = spark.createDataFrame(
        [(0, 1), (0, 2), (1, 2), (2, 0), (3, 2), (2, 4)],
        "src long, dst long",
    )
    got = {r.node: r.rank_e12
           for r in web.pagerank(edges, iterations=3).collect()}

    SCALE, dn, dd = 10**12, 85, 100
    nodes = [0, 1, 2, 3, 4]
    out_ = {0: [1, 2], 1: [2], 2: [0, 4], 3: [2], 4: []}
    n = len(nodes)
    r = {x: SCALE // n for x in nodes}
    tele = ((dd - dn) * SCALE) // (dd * n)
    for _ in range(3):
        dang = sum(r[x] for x in nodes if not out_[x])
        ds = (dn * dang) // (dd * n)
        inflow = {x: 0 for x in nodes}
        for s in nodes:
            if out_[s]:
                c = (r[s] * dn) // (dd * len(out_[s]))
                for dsty in out_[s]:
                    inflow[dsty] += c
        r = {x: tele + ds + inflow[x] for x in nodes}
    assert got == r
    # mass conservation modulo truncation: each of the N nodes loses
    # < 1 unit per division, 3 iterations, a handful of divisions
    assert 0 <= 10**12 - sum(got.values()) < 100 * len(nodes)


def test_pagerank_authority_ordering(spark):
    """A hub every spoke links to (and that links back to every
    spoke) outranks each spoke at every iteration — the hub collects
    the four spokes' pooled mass while each spoke receives a quarter
    of the hub's; symmetric spokes rank identically."""
    edges = spark.createDataFrame(
        [(i, 0) for i in range(1, 5)] + [(0, i) for i in range(1, 5)],
        "src long, dst long",
    )
    got = {r.node: r.rank_e12
           for r in web.pagerank(edges, iterations=10).collect()}
    assert got[0] == max(got.values())
    assert got[1] == got[2] == got[3] == got[4]
    assert got[1] < got[0]


def test_pagerank_local_matches_distributed(spark):
    """The driver-local fast path (edge list under local_threshold)
    must be bit-equal to the distributed iteration loop — same int64
    truncating-division recurrence, including dangling-mass
    redistribution (node 4 has no out-edges) and nodes with no
    inflow. local_threshold=0 forces the distributed path on the
    same input."""
    pairs = [(0, 1), (0, 2), (1, 2), (2, 0), (3, 2), (2, 4),
             (5, 0), (5, 1), (6, 5)]
    edges = spark.createDataFrame(pairs, "src long, dst long")
    local = {r.node: r.rank_e12
             for r in web.pagerank(edges, iterations=4).collect()}
    dist = {r.node: r.rank_e12
            for r in web.pagerank(
                edges, iterations=4, local_threshold=0).collect()}
    assert local == dist and len(local) == 7
