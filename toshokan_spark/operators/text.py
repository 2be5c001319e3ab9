"""Text-analysis operators: token stats, quality scoring, language
identification, document fingerprinting.

Everything is built-in-function Column algebra (no UDFs, no shuffle —
one narrow projection whatever the corpus size), and every formula is
deliberately expressible in ANSI-ish SQL so the DuckDB oracle can
verify values bit-for-bit.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from toshokan_spark.operators.dedup import words_col

# small marker-word lists per language for the n-gram/stopword
# heuristic (shared verbatim with the SQL oracle)
LANG_MARKERS: dict[str, tuple[str, ...]] = {
    "de": ("der", "die", "und", "das", "ist", "nicht"),
    "en": ("the", "and", "of", "to", "is", "in"),
    "es": ("el", "la", "de", "que", "y", "los"),
    "fr": ("le", "la", "et", "les", "des", "est"),
}

EN_STOPWORDS = (
    "the", "and", "of", "to", "a", "in", "is", "it", "that", "for",
    "on", "as", "with", "was", "at", "by", "an", "be", "this", "are",
)

FINGERPRINT_MOD = 1_000_000_007
FINGERPRINT_BASE = 31


def token_stats(df: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """Per-document token counts: whitespace tokens, distinct tokens,
    char/byte lengths, a BPE-ish subword estimate (ceil(bytes/4) — the
    common ~4-bytes-per-token rule of thumb)."""
    w = words_col(F.col(text_col))
    return df.select(
        F.col(id_col),
        F.size(w).alias("n_tokens"),
        F.size(F.array_distinct(w)).alias("n_distinct_tokens"),
        F.length(F.col(text_col)).alias("n_chars"),
        F.octet_length(F.col(text_col)).alias("n_bytes"),
        F.ceil(F.octet_length(F.col(text_col)) / F.lit(4.0)).cast("long").alias("n_bpe_est"),
    )


def quality_score(df: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """Heuristic quality in [0,1]: length signal × lexical diversity ×
    stopword plausibility (the Gopher/C4-style cheap filters, reduced
    to SQL-expressible arithmetic):

        len_score  = least(n_tokens/32, 1)
        diversity  = n_distinct/n_tokens
        stop_ratio = |tokens ∩ EN_STOPWORDS| / n_tokens
        stop_score = least(stop_ratio*4, 1)
        quality    = round(0.4*len + 0.3*div + 0.3*stop, 6)
    """
    w = words_col(F.lower(F.col(text_col)))
    n = F.size(w)
    ndist = F.size(F.array_distinct(w))
    nstop = F.size(F.filter(w, lambda t: t.isin(*EN_STOPWORDS)))
    len_score = F.least(n / F.lit(32.0), F.lit(1.0))
    diversity = ndist / n
    stop_score = F.least(nstop / n * 4.0, F.lit(1.0))
    q = F.round(0.4 * len_score + 0.3 * diversity + 0.3 * stop_score, 6)
    return df.select(
        F.col(id_col),
        n.alias("n_tokens"),
        F.round(diversity, 6).alias("diversity"),
        F.round(nstop / n, 6).alias("stopword_ratio"),
        q.alias("quality"),
    )


def lang_id(df: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """Marker-word language ID: count hits per language list, argmax
    with ties broken by language code; zero hits -> 'und'.

    (On real corpora swap the lists for char-n-gram profiles — the
    operator shape, a per-row argmax over K score columns, is the
    same and stays a narrow projection.)
    """
    w = words_col(F.lower(F.col(text_col)))

    def marker_hits(ws: tuple[str, ...]):
        # closure, not a lambda default arg (a 2-param lambda becomes
        # filter's (value, index) form and shadows the capture)
        return F.size(F.filter(w, lambda t: t.isin(*ws)))

    scores = [
        marker_hits(ws).alias(f"score_{lang}") for lang, ws in sorted(LANG_MARKERS.items())
    ]
    scored = df.select(F.col(id_col), *scores)
    # argmax via array_max over (score, inverted-lang) structs: max on
    # score first, then the LOWEST language code wins ties
    langs = sorted(LANG_MARKERS)
    pairs = F.array(
        *[
            F.struct(
                F.col(f"score_{lang}").alias("s"),
                F.lit(-i).alias("nl"),
                F.lit(lang).alias("lang"),
            )
            for i, lang in enumerate(langs)
        ]
    )
    best = F.array_max(pairs)
    return scored.withColumn(
        "lang_pred",
        F.when(best.getField("s") > 0, best.getField("lang")).otherwise(F.lit("und")),
    ).select(id_col, *[f"score_{lang}" for lang in langs], "lang_pred")


def fingerprint(df: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """Deterministic polynomial rolling hash of the normalized text
    (lowercase, runs of whitespace collapsed to one space):

        fp = fold(codepoints, 0, (acc, c) -> (acc*31 + c) mod 1e9+7)

    Engine-independent arithmetic (everything < 2^63), so the DuckDB
    oracle reproduces it exactly — unlike xxhash/sha, it's also a
    locality-free *content* id usable for cross-system diffing.
    """
    norm = F.regexp_replace(F.lower(F.trim(F.col(text_col))), r"\s+", " ")
    chars = F.filter(F.split(norm, ""), lambda c: F.length(c) > 0)
    fp = F.aggregate(
        chars,
        F.lit(0).cast("long"),
        lambda acc, c: (acc * FINGERPRINT_BASE + F.ascii(c)) % FINGERPRINT_MOD,
    )
    return df.select(F.col(id_col), fp.alias("fingerprint"))


# -- PII scrubbing -----------------------------------------------------------

#: regex patterns chosen to behave identically under Java regex
#: (Spark) and RE2 (DuckDB): no lookaround, no backrefs
PII_PATTERNS: tuple[tuple[str, str, str], ...] = (
    ("email", r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}", "<EMAIL>"),
    ("ipv4", r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b", "<IP>"),
    ("phone", r"\b\d{3}[- ]\d{3}[- ]\d{4}\b", "<PHONE>"),
)


def pii_scrub(df: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """Redact common PII shapes (emails, IPv4 addresses, simple phone
    numbers) and count what was removed — the scrubbing pass of a
    training-data pipeline.

    One narrow projection; patterns applied in declared order (email
    first so an address containing digits.dots is never half-eaten by
    the IP rule), each replacement global. The same patterns in the
    same order run in the DuckDB oracle, so clean text and counts are
    value-checked.
    """
    counts = {
        f"n_{name}": F.size(F.regexp_extract_all(F.col(text_col), F.lit(pat), F.lit(0)))
        for name, pat, _ in PII_PATTERNS
    }
    clean = F.col(text_col)
    for _, pat, repl in PII_PATTERNS:
        clean = F.regexp_replace(clean, pat, repl)
    return df.select(
        F.col(id_col),
        clean.alias("clean_text"),
        *[c.alias(n) for n, c in counts.items()],
    )
