

def test_langid_classifier_discriminates_eight_languages(spark):
    """The hashed-lexicon linear model must predict the right language
    on function-word-rich sentences for all 8 supported languages, and
    fall back to 'und' with uniform confidence on zero-information
    text."""
    from toshokan_spark.operators.text import langid_classifier

    sents = [
        (0, "der hund ist nicht mit das auto und die tür für uns", "de"),
        (1, "the cat and the dog of the house is in that room for it", "en"),
        (2, "el perro que y los gatos en un jardín por la casa con", "es"),
        (3, "le chat et les chiens dans une maison pour des amis est", "fr"),
        (4, "il gatto che di e per con non una cosa un giorno", "it"),
        (5, "ik heb het een boek van dat niet met voor jou en", "nl"),
        (6, "o cão que do da em um para e a rua", "pt"),
        (7, "och att det som på är av för med en dag", "sv"),
        (8, "zzz qqq xxx www", None),  # zero-information
    ]
    df = spark.createDataFrame(
        [(i, t) for i, t, _ in sents], "doc_id long, text string"
    )
    out = {
        r["doc_id"]: (r["lang_pred"], r["confidence"], r["n_feats"])
        for r in langid_classifier(df).collect()
    }
    for i, _, want in sents[:-1]:
        assert out[i][0] == want, (i, out[i])
        assert out[i][1] > 0.3, ("confidence too flat", i, out[i])
    assert out[8][0] == "und" and out[8][1] == 0.125
    assert out[8][2] == 7  # 4 unigrams + 3 bigrams still counted


def test_train_hashed_classifier_learns_separable_classes(spark):
    """3 GD rounds on a cleanly word-separable corpus must rank every
    positive above every negative through the standard apply path
    (hashed_linear_score on the trained weights)."""
    from toshokan_spark.operators.text import (
        hashed_linear_score,
        train_hashed_classifier,
    )

    rows = []
    for i in range(20):
        good = "signal quality prime excellent useful " * 4
        bad = "noise junk spam garbage filler " * 4
        rows.append((i, good if i % 2 == 0 else bad, float(i % 2 == 0)))
    df = spark.createDataFrame(rows, "doc_id long, text string, y double")
    w = train_hashed_classifier(df, label_col="y", iters=3)
    scored = {
        r["doc_id"]: r["prob"]
        for r in hashed_linear_score(df, w).collect()
    }
    pos = [scored[i] for i in range(20) if i % 2 == 0]
    neg = [scored[i] for i in range(20) if i % 2 == 1]
    assert min(pos) > max(neg), (min(pos), max(neg))
    # and the trained model is deterministic: retrain == same weights
    w2 = train_hashed_classifier(df, label_col="y", iters=3)
    assert sorted(map(tuple, w.collect())) == sorted(map(tuple, w2.collect()))


def test_char_entropy_profile(spark):
    """Run-length char entropy: uniform text scores ln(alphabet),
    single-char padding scores 0 (and lands in the 'low' band), and
    the value matches an independent Counter-based computation."""
    import math
    from collections import Counter

    import pytest

    from toshokan_spark.operators.text import char_entropy_profile

    rows = [
        (1, "hello world"),
        (2, "aaaaaaaaaa"),
        (3, "abcd"),
        (4, ""),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {r.doc_id: r for r in char_entropy_profile(df).collect()}

    def ref(t):
        n = len(t)
        if not n:
            return 0.0
        c = Counter(t)
        return round(-sum((v / n) * math.log(v / n) for v in c.values()), 6)

    assert got[1].entropy == pytest.approx(ref("hello world"), abs=1e-6)
    assert got[2].entropy == 0.0 and got[2].entropy_band == "low"
    assert got[3].entropy == pytest.approx(math.log(4), abs=1e-6)
    assert got[4].entropy == 0.0 and got[4].n_chars_text == 0
    # repr stability: never -0.0 (the driver hash stringifies floats)
    assert repr(got[2].entropy) == "0.0"


def test_hashed_features_staged_matches_exploded_spec(spark):
    """The r16 staged formulation of _hashed_features (feature array
    -> transform-hash -> explode, with optional passthrough columns
    and per-doc count) must emit exactly the rows of the original
    explode-then-hash-per-occurrence formulation — the executable
    spec the DuckDB oracles mirror. Covers empty text, whitespace
    runs, BMP unicode, mixed case, long docs (bigrams included by
    construction), both hash families, and the with_n count."""
    from pyspark.sql import Row
    from pyspark.sql import functions as F

    from toshokan_spark.operators.text import (
        _feature_idx,
        _hashed_features,
        _lower_words,
    )

    texts = [
        "", "one", "a b c d e", "  spaced   out  text here ",
        "h\u00e9llo w\u00f6rld \u00fcn\u00efcode tokens again", "x " * 200,
        "Mixed CASE Text tokens", "a b c " * 50,
    ]
    df = spark.createDataFrame(
        [Row(doc_id=i, text=t) for i, t in enumerate(texts)]
    )
    words = _lower_words("text")
    bigrams = F.when(
        F.size(words) >= 2,
        F.transform(
            F.sequence(F.lit(0), F.size(words) - 2),
            lambda i: F.concat_ws(" ", F.slice(words, i + 1, 2)),
        ),
    ).otherwise(F.array())
    for family in ("poly", "xxhash"):
        got = sorted(
            (r["id"], r["idx"])
            for r in _hashed_features(
                df, "doc_id", "text", 4096, family
            ).collect()
        )
        spec = sorted(
            (r["id"], r["idx"])
            for r in df.select(
                F.col("doc_id").alias("id"),
                F.explode(F.concat(words, bigrams)).alias("f"),
            )
            .select("id", _feature_idx(F.col("f"), 4096, family).alias("idx"))
            .collect()
        )
        assert got == spec and len(got) > 300, family
    # extra_cols passthrough rides the explode unchanged
    rows = _hashed_features(
        df, "doc_id", "text", 4096, "poly",
        extra_cols=[F.length("text").alias("tl")],
    ).collect()
    tl = {i: len(s) for i, s in enumerate(texts)}
    assert rows and all(r["tl"] == tl[r["id"]] for r in rows)
