"""search_after keyset paging, empty-bucket fill, and highlighting —
operator-level properties (the entries value-check one page; these
prove the paging INVARIANTS: chaining pages reconstructs the full
sorted stream exactly once)."""

from pyspark.sql import functions as F

from toshokan_spark.search import (
    bucket_script,
    bucket_selector,
    bucket_sort,
    date_histogram,
    highlight,
    keyset_page,
)


def _events(spark, n=97):
    # deliberately collide sort values (value = i % 7) so the
    # tiebreak does real work
    return spark.createDataFrame(
        [(i, float(i % 7)) for i in range(n)], "event_id long, value double"
    )


def test_keyset_page_chain_reconstructs_full_order(spark):
    df = _events(spark)
    want = [
        (r["value"], r["event_id"])
        for r in df.orderBy(F.desc("value"), F.asc("event_id")).collect()
    ]
    got, after = [], None
    for _ in range(100):  # bounded walk
        page = keyset_page(
            df, "value", "event_id", after=after, limit=10, descending=True
        ).collect()
        if not page:
            break
        got.extend((r["value"], r["event_id"]) for r in page)
        after = (page[-1]["value"], page[-1]["event_id"])
    assert got == want  # every row exactly once, in order


def test_keyset_page_ascending_and_page1(spark):
    df = _events(spark, n=25)
    p1 = keyset_page(df, "value", "event_id", limit=5).collect()
    assert [(r["value"], r["event_id"]) for r in p1] == [
        (0.0, 0), (0.0, 7), (0.0, 14), (0.0, 21), (1.0, 1)]
    p2 = keyset_page(
        df, "value", "event_id", after=(1.0, 1), limit=3
    ).collect()
    assert [(r["value"], r["event_id"]) for r in p2] == [
        (1.0, 8), (1.0, 15), (1.0, 22)]


def test_keyset_page_null_sort_values_not_lost(spark):
    """NULL sort values order LAST and survive the cursor walk
    (ADVICE r12: the naive cursor predicate is SQL-NULL for null sort
    values, so every null row vanished after page 1; with nulls
    sorting first in ascending order, a null cohort larger than page
    1 was partly unreachable). The chained walk must visit every row
    exactly once in BOTH directions, crossing into the null tail."""
    rows = [(i, float(i % 3)) for i in range(8)] + [
        (i, None) for i in range(8, 14)  # 6 nulls > page size
    ]
    df = spark.createDataFrame(rows, "event_id long, value double")

    for desc in (False, True):
        got, after = [], None
        for _ in range(20):  # bounded walk
            page = keyset_page(
                df, "value", "event_id",
                after=after, limit=4, descending=desc,
            ).collect()
            if not page:
                break
            got.extend((r["value"], r["event_id"]) for r in page)
            after = (page[-1]["value"], page[-1]["event_id"])
        nonnull = sorted(
            ((v, i) for i, v in rows if v is not None),
            key=lambda p: (-p[0] if desc else p[0], p[1]),
        )
        # nulls last either way, tiebreak ascending within the tail
        want = nonnull + [(None, i) for i in range(8, 14)]
        assert got == want, f"descending={desc}"


def test_date_histogram_fill_empty_contiguous(spark):
    rows = [(0,), (7200,), (21600,)]  # 2h buckets 0, 2, 6 -> gaps 1,3,4,5
    df = spark.createDataFrame(rows, "sec long").select(
        F.timestamp_seconds(F.col("sec")).alias("ts"), F.lit(1.0).alias("v")
    )
    out = date_histogram(df, "ts", 3600, value_col="v", fill_empty=True)
    got = {r["bucket_epoch"]: (r["n_hits"], r["total_value"])
           for r in out.collect()}
    assert sorted(got) == [0, 3600, 7200, 10800, 14400, 18000, 21600]
    assert got[0] == (1, 1.0) and got[3600] == (0, 0.0)
    assert got[21600] == (1, 1.0)


def test_bucket_stage_chaining_on_plain_frames(spark):
    buckets = spark.createDataFrame(
        [(1, 10), (2, 30), (3, 20)], "b long, n long"
    )
    out = bucket_sort(
        bucket_selector(
            bucket_script(buckets, {"double_n": "n * 2"}), "double_n >= 40"
        ),
        "double_n:desc",
        size=1,
    ).collect()
    assert [(r["b"], r["double_n"]) for r in out] == [(2, 60)]


def test_highlight_marks_prefix_and_skips_negated(spark):
    df = spark.createDataFrame(
        [(1, "Sparkly spark sparks NOSPARK dull")], "doc_id long, text string"
    )
    out = highlight(
        df, "text:spark* AND NOT text:dull", "text"
    ).collect()[0]["snippet"]
    # prefix marks tokens STARTING with spark (NOSPARK stays bare);
    # the negated term is never marked
    assert out == ("<em>Sparkly</em> <em>spark</em> <em>sparks</em> "
                   "NOSPARK dull")


def test_sliced_scroll_partitions_exactly(spark, tmp_path, capsys):
    """--slice I:M: the M slices are disjoint, their union is the
    full hit set, and re-running a slice is stable (hash-determined,
    no randomness)."""
    import json as _json

    from toshokan_spark import cli

    cfg = {"name": "sl", "path": str(tmp_path / "d"),
           "schema": {"fields": [
               {"name": "id", "type": "number"},
               {"name": "sev", "type": "text", "tokenizer": "raw"}]}}
    (tmp_path / "c.json").write_text(_json.dumps(cfg))
    rows = [{"id": i, "sev": "INFO" if i % 2 else "DEBUG"}
            for i in range(40)]
    (tmp_path / "r.jsonl").write_text(
        "\n".join(_json.dumps(r) for r in rows) + "\n")
    cat = str(tmp_path / "cat")
    assert cli.main(["--catalog", cat, "create",
                     str(tmp_path / "c.json")]) == 0
    assert cli.main(["--catalog", cat, "index", "sl",
                     str(tmp_path / "r.jsonl")]) == 0
    capsys.readouterr()

    def ids(slice_spec):
        assert cli.main(["--catalog", cat, "search", "sl", "sev:INFO",
                         "--slice", slice_spec, "--limit", "100"]) == 0
        return sorted(
            _json.loads(l)["id"]
            for l in capsys.readouterr().out.strip().splitlines() if l)

    s0, s1, s2 = ids("0:3"), ids("1:3"), ids("2:3")
    allids = sorted(s0 + s1 + s2)
    assert allids == [i for i in range(40) if i % 2]  # the INFO half
    assert not (set(s0) & set(s1)) and not (set(s1) & set(s2))
    assert ids("0:3") == s0  # stable
    # bad specs fail fast
    assert cli.main(["--catalog", cat, "search", "sl", "*",
                     "--slice", "3:3"]) == 2
    assert cli.main(["--catalog", cat, "search", "sl", "*",
                     "--slice", "x:y"]) == 2
