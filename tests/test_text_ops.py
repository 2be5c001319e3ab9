

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
