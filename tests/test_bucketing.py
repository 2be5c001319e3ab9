"""Bucketed signature store: the 100 TB lever for incremental dedup —
the corpus side of id-keyed joins must come off disk pre-partitioned
(no Exchange on the stored side), so each arriving batch shuffles
only itself. These tests pin the seam: bucket metadata survives the
write, the join plan carries no exchange on the bucketed side, and
the results are identical to the unbucketed path.
"""

import pytest
from pyspark.sql import Row
from pyspark.sql import functions as F

from toshokan_spark.operators import dedup


@pytest.fixture()
def corpus(spark):
    return spark.createDataFrame(
        [
            Row(doc_id=10, text="alpha beta gamma delta epsilon zeta"),
            Row(doc_id=11, text="alpha beta gamma delta epsilon eta"),
            Row(doc_id=12, text="totally different corpus content here"),
        ]
    )


def test_bucketed_signature_join_has_no_exchange_on_stored_side(
    spark, corpus, tmp_path
):
    sigs = dedup.corpus_minhash_signatures(corpus)
    dedup.write_bucketed_signatures(
        sigs, "bucketed_sigs_t1", str(tmp_path / "sigs"), buckets=4
    )
    try:
        stored = spark.table("bucketed_sigs_t1")
        # id-keyed join against the store: the probe side is tiny and
        # explicitly repartitioned INTO the store's bucketing, so the
        # stored side needs no Exchange — only the probe side moves
        probe = spark.createDataFrame([Row(id=10), Row(id=12), Row(id=99)])
        joined = stored.join(probe.repartition(4, "id").hint("merge"), "id")
        plan = joined._jdf.queryExecution().executedPlan().toString()
        # the bucketed scan reads pre-partitioned (Bucketed: true,
        # SelectedBucketsCount printed) and the plan's ONLY exchange
        # belongs to the probe side — the stored side never shuffles
        assert "Bucketed: true" in plan, plan
        assert "SelectedBucketsCount" in plan, plan
        assert plan.count("Exchange") == 1, plan
        assert sorted(r.id for r in joined.collect()) == [10, 12]
    finally:
        spark.sql("DROP TABLE IF EXISTS bucketed_sigs_t1")


def test_incremental_minhash_against_bucketed_store_matches_inline(
    spark, corpus, tmp_path
):
    new = spark.createDataFrame(
        [
            Row(doc_id=100, text="alpha beta gamma delta epsilon zeta theta"),
            Row(doc_id=101, text="unrelated fresh novel document text"),
        ]
    )
    inline = {
        r.new_id: (r.corpus_id, r.jaccard)
        for r in dedup.incremental_minhash_matches(
            new, dedup.corpus_minhash_signatures(corpus), threshold=0.3
        ).collect()
    }
    dedup.write_bucketed_signatures(
        dedup.corpus_minhash_signatures(corpus),
        "bucketed_sigs_t2",
        str(tmp_path / "sigs2"),
        buckets=4,
    )
    try:
        stored = spark.table("bucketed_sigs_t2")
        via_store = {
            r.new_id: (r.corpus_id, r.jaccard)
            for r in dedup.incremental_minhash_matches(
                new, stored, threshold=0.3
            ).collect()
        }
        assert via_store == inline and set(inline) == {100}
    finally:
        spark.sql("DROP TABLE IF EXISTS bucketed_sigs_t2")


def test_incremental_minhash_rejects_mismatched_store(spark, corpus):
    """A store built with a different num_hashes must raise, not
    silently pass every duplicate through (ADVICE r5: mismatched sig
    width makes band keys that never match)."""
    sigs64 = dedup.corpus_minhash_signatures(corpus, num_hashes=64)
    new = spark.createDataFrame([Row(doc_id=100, text="alpha beta gamma delta")])
    with pytest.raises(ValueError, match="num_hashes=64"):
        dedup.incremental_minhash_matches(new, sigs64, num_hashes=128, bands=32)


def test_incremental_minhash_rejects_mismatched_hot_bands(spark, corpus):
    """A hot-band table with the wrong geometry/family would silently
    disable the fan-out cap — both cheap invariants must raise."""
    sigs = dedup.corpus_minhash_signatures(corpus)
    new = spark.createDataFrame([Row(doc_id=100, text="alpha beta gamma delta")])
    # wrong hash family: poly keys are strings, caller expects bigint
    hot_poly = spark.createDataFrame([Row(band=0, key="1,2,3,4")])
    with pytest.raises(ValueError, match="key type"):
        dedup.incremental_minhash_matches(
            new, sigs, corpus_hot_bands=hot_poly
        )
    # wrong band count: band id out of range for bands=32
    hot_wide = spark.createDataFrame([Row(band=40, key=123)]).select(
        "band", F.col("key").cast("bigint").alias("key")
    )
    with pytest.raises(ValueError, match="band 40"):
        dedup.incremental_minhash_matches(
            new, sigs, corpus_hot_bands=hot_wide, bands=32
        )


def test_append_grows_store_without_exchange_and_matches_rebuild(
    spark, corpus, tmp_path
):
    """The ingest-once growth loop: append a batch's signatures to the
    bucketed store; subsequent incremental matching must (a) see the
    appended docs, (b) equal a store rebuilt from scratch, and (c)
    still plan the verify join without an Exchange on the stored
    side."""
    batch1 = spark.createDataFrame(
        [Row(doc_id=100, text="brand new unique first batch text")]
    )
    dedup.write_bucketed_signatures(
        dedup.corpus_minhash_signatures(corpus),
        "bucketed_sigs_t3",
        str(tmp_path / "sigs3"),
        buckets=4,
    )
    try:
        dedup.append_bucketed_signatures(
            dedup.corpus_minhash_signatures(batch1), "bucketed_sigs_t3", buckets=4
        )
        stored = spark.table("bucketed_sigs_t3")
        assert sorted(r.id for r in stored.select("id").collect()) == [10, 11, 12, 100]

        # batch 2 near-duplicates the APPENDED doc 100 — only the grown
        # store can catch it
        batch2 = spark.createDataFrame(
            [Row(doc_id=200, text="brand new unique first batch text extended")]
        )
        got = {
            r.new_id: r.corpus_id
            for r in dedup.incremental_minhash_matches(
                batch2, stored, threshold=0.3
            ).collect()
        }
        rebuilt = dedup.corpus_minhash_signatures(
            corpus.unionByName(batch1)
        )
        want = {
            r.new_id: r.corpus_id
            for r in dedup.incremental_minhash_matches(
                batch2, rebuilt, threshold=0.3
            ).collect()
        }
        assert got == want and got == {200: 100}

        # the stored side still reads pre-partitioned after the append
        probe = spark.createDataFrame([Row(id=100)])
        joined = stored.join(probe.repartition(4, "id").hint("merge"), "id")
        plan = joined._jdf.queryExecution().executedPlan().toString()
        assert "Bucketed: true" in plan, plan
        assert plan.count("Exchange") == 1, plan
    finally:
        spark.sql("DROP TABLE IF EXISTS bucketed_sigs_t3")


def test_refresh_hot_band_buckets_picks_up_new_hot_buckets(spark, tmp_path):
    """A bucket that crosses max_band_freq only after appends is
    invisible to the stale hot-band table (stale-but-safe) and
    appears after the maintenance refresh."""
    boiler = [
        Row(doc_id=i, text="the same boilerplate sentence repeated verbatim")
        for i in range(4)
    ]
    dedup.write_bucketed_signatures(
        dedup.corpus_minhash_signatures(spark.createDataFrame(boiler[:2])),
        "bucketed_sigs_t4",
        str(tmp_path / "sigs4"),
        buckets=2,
    )
    try:
        dedup.write_hot_band_buckets(
            spark.table("bucketed_sigs_t4"),
            "hot_bands_t4",
            str(tmp_path / "hot4"),
            bands=32,
            max_band_freq=3,
        )
        assert spark.table("hot_bands_t4").count() == 0  # 2 copies < cap
        dedup.append_bucketed_signatures(
            dedup.corpus_minhash_signatures(spark.createDataFrame(boiler[2:])),
            "bucketed_sigs_t4",
            buckets=2,
        )
        # stale table unchanged; refresh sees 4 copies > cap in every band
        assert spark.table("hot_bands_t4").count() == 0
        dedup.refresh_hot_band_buckets(
            spark, "bucketed_sigs_t4", "hot_bands_t4", str(tmp_path / "hot4"),
            bands=32, max_band_freq=3,
        )
        assert spark.table("hot_bands_t4").count() == 32
    finally:
        spark.sql("DROP TABLE IF EXISTS bucketed_sigs_t4")
        spark.sql("DROP TABLE IF EXISTS hot_bands_t4")


def test_gram_store_probe_is_exchange_free_and_append_idempotent(
    spark, tmp_path
):
    """The substring gram store: (a) the per-batch probe join plans
    WITHOUT an Exchange on the stored side (bucketed by g), (b)
    append_gram_store is naturally idempotent — a replayed append
    finds every gram present and writes zero rows — and (c) the
    incremental report flags corpus-known and within-batch spans."""
    from pyspark.sql import Row

    from toshokan_spark.operators.dedup import (
        append_gram_store,
        incremental_substring_spans,
        write_gram_store,
    )

    corpus = spark.createDataFrame(
        [Row(doc_id=1, text="a b c d e f g h")]
    )
    table = "gram_store_t1"
    write_gram_store(
        corpus, table, str(tmp_path / "grams"), k=3, buckets=2
    )
    n0 = spark.table(table).count()
    assert n0 == 6  # 8 tokens -> 6 positional 3-grams, all distinct

    # batch: doc 10 copies corpus tokens a..e (3 corpus-known grams,
    # positions 0..2 -> covered [0,5)); doc 11 is fresh but repeats
    # its own opening 3-gram at position 3 (within-batch dup)
    batch = spark.createDataFrame(
        [
            Row(doc_id=10, text="a b c d e z y x"),
            Row(doc_id=11, text="p q r p q r w v"),
        ]
    )
    rep = incremental_substring_spans(batch, table, k=3)
    plan = rep._jdf.queryExecution().executedPlan().toString()
    got = {r.doc_id: (r.n_dup_spans, r.covered_tokens) for r in rep.collect()}
    assert got[10] == (3, 5)
    assert got[11] == (1, 3)
    # store side pre-bucketed: the probe join must not re-shuffle it
    # (the batch side may exchange; the scan over the bucketed table
    # must not sit under one)
    assert "bucketed: true" in plan.lower() or "SelectedBucketsCount" in plan, plan

    # grow, then replay the SAME batch: second append adds nothing
    append_gram_store(batch, table, k=3)
    n1 = spark.table(table).count()
    assert n1 > n0
    append_gram_store(batch, table, k=3)
    assert spark.table(table).count() == n1
    # and after growth the batch's own grams are corpus-known: its
    # copies of doc 11's text would now be fully flagged
    batch2 = spark.createDataFrame([Row(doc_id=20, text="p q r p q r w v")])
    rep2 = {r.doc_id: r.covered_tokens
            for r in incremental_substring_spans(batch2, table, k=3).collect()}
    assert rep2[20] == 8  # every position corpus-known -> full coverage
    spark.sql(f"DROP TABLE IF EXISTS {table}")
