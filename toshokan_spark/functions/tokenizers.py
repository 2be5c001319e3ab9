"""Tokenizers with the semantics of the reference's four analyzers
(`/root/reference/src/config/mod.rs:61-90`, delegating to tantivy):

* ``default``    — split on non-alphanumeric, drop tokens longer than
                   40 bytes, lowercase (tantivy SimpleTokenizer +
                   RemoveLongFilter(40) + LowerCaser, in that order)
* ``raw``        — the whole value as a single token, unanalyzed
* ``whitespace`` — split on whitespace only (no lowercasing)
* ``en_stem``    — ``default`` + English Porter stemming

Everything except the stemmer is pure Column expressions (whole-stage
codegen eligible). The stemmer is an Arrow-batched pandas UDF — the
one genuinely non-relational transform — and is only paid for fields
that opt into ``en_stem``.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import Column
from pyspark.sql import functions as F
from pyspark.sql.types import ArrayType, StringType

#: tantivy RemoveLongFilter default limit (bytes)
TOKEN_BYTE_LIMIT = 40

#: split pattern for the `default` tokenizer: any run of
#: non-alphanumeric characters (unicode-aware, like Rust
#: char::is_alphanumeric)
_NON_ALNUM = r"[^\p{L}\p{N}]+"


def _default_tokens(col: Column) -> Column:
    toks = F.split(col, _NON_ALNUM)
    toks = F.filter(
        toks, lambda t: (F.length(t) > 0) & (F.octet_length(t) <= TOKEN_BYTE_LIMIT)
    )
    return F.transform(toks, F.lower)


def _whitespace_tokens(col: Column) -> Column:
    return F.filter(F.split(col, r"\s+"), lambda t: F.length(t) > 0)


# ---------------------------------------------------------------------------
# Porter stemmer (classic public algorithm, Porter 1980) as a pandas UDF.
# Used only for `en_stem` fields; kept dependency-free.
# ---------------------------------------------------------------------------

_VOWELS = set("aeiou")


def _is_cons(word: str, i: int) -> bool:
    c = word[i]
    if c in _VOWELS:
        return False
    if c == "y":
        return i == 0 or not _is_cons(word, i - 1)
    return True


def _measure(stem: str) -> int:
    # number of VC sequences
    m = 0
    prev_vowel = False
    for i in range(len(stem)):
        cons = _is_cons(stem, i)
        if prev_vowel and cons:
            m += 1
        prev_vowel = not cons
    return m


def _has_vowel(stem: str) -> bool:
    return any(not _is_cons(stem, i) for i in range(len(stem)))


def _ends_double_cons(word: str) -> bool:
    return (
        len(word) >= 2
        and word[-1] == word[-2]
        and _is_cons(word, len(word) - 1)
    )


def _cvc(word: str) -> bool:
    if len(word) < 3:
        return False
    if not (_is_cons(word, len(word) - 3) and not _is_cons(word, len(word) - 2) and _is_cons(word, len(word) - 1)):
        return False
    return word[-1] not in "wxy"


def porter_stem(word: str) -> str:
    """Porter stemming algorithm (M.F. Porter, 1980). Equivalent in
    spirit to tantivy's Snowball English stemmer for the common cases;
    golden tests never exercise en_stem (SURVEY §7 hard-parts note) so
    classic Porter is an acceptable, documented stand-in."""
    w = word
    if len(w) <= 2:
        return w
    # step 1a
    if w.endswith("sses"):
        w = w[:-2]
    elif w.endswith("ies"):
        w = w[:-2]
    elif w.endswith("ss"):
        pass
    elif w.endswith("s"):
        w = w[:-1]
    # step 1b
    flag = False
    if w.endswith("eed"):
        if _measure(w[:-3]) > 0:
            w = w[:-1]
    elif w.endswith("ed") and _has_vowel(w[:-2]):
        w = w[:-2]
        flag = True
    elif w.endswith("ing") and _has_vowel(w[:-3]):
        w = w[:-3]
        flag = True
    if flag:
        if w.endswith(("at", "bl", "iz")):
            w += "e"
        elif _ends_double_cons(w) and not w.endswith(("l", "s", "z")):
            w = w[:-1]
        elif _measure(w) == 1 and _cvc(w):
            w += "e"
    # step 1c
    if w.endswith("y") and _has_vowel(w[:-1]):
        w = w[:-1] + "i"
    # step 2
    for suf, rep in (
        ("ational", "ate"), ("tional", "tion"), ("enci", "ence"), ("anci", "ance"),
        ("izer", "ize"), ("abli", "able"), ("alli", "al"), ("entli", "ent"),
        ("eli", "e"), ("ousli", "ous"), ("ization", "ize"), ("ation", "ate"),
        ("ator", "ate"), ("alism", "al"), ("iveness", "ive"), ("fulness", "ful"),
        ("ousness", "ous"), ("aliti", "al"), ("iviti", "ive"), ("biliti", "ble"),
    ):
        if w.endswith(suf):
            if _measure(w[: -len(suf)]) > 0:
                w = w[: -len(suf)] + rep
            break
    # step 3
    for suf, rep in (
        ("icate", "ic"), ("ative", ""), ("alize", "al"), ("iciti", "ic"),
        ("ical", "ic"), ("ful", ""), ("ness", ""),
    ):
        if w.endswith(suf):
            if _measure(w[: -len(suf)]) > 0:
                w = w[: -len(suf)] + rep
            break
    # step 4
    for suf in (
        "al", "ance", "ence", "er", "ic", "able", "ible", "ant", "ement",
        "ment", "ent", "ion", "ou", "ism", "ate", "iti", "ous", "ive", "ize",
    ):
        if w.endswith(suf):
            stem = w[: -len(suf)]
            if suf == "ion" and not stem.endswith(("s", "t")):
                continue
            if _measure(stem) > 1:
                w = stem
            break
    # step 5a
    if w.endswith("e"):
        stem = w[:-1]
        m = _measure(stem)
        if m > 1 or (m == 1 and not _cvc(stem)):
            w = stem
    # step 5b
    if _measure(w) > 1 and _ends_double_cons(w) and w.endswith("l"):
        w = w[:-1]
    return w


@F.pandas_udf(ArrayType(StringType()))
def _stem_tokens_udf(tokens: pd.Series) -> pd.Series:
    return tokens.map(
        lambda ts: None if ts is None else [porter_stem(t) for t in ts]
    )


def tokenize(col: Column, tokenizer: str = "default") -> Column:
    """Return an ``array<string>`` of analyzed tokens for *col*.

    This array is the engine's "inverted index" shadow column: a term
    query ``field:term`` compiles to ``array_contains(tokens, term)``
    which Parquet can accelerate via dictionary/bloom pushdown on the
    original column plus cheap JVM-side evaluation (SURVEY §1.2).
    """
    if tokenizer == "default":
        return _default_tokens(col)
    if tokenizer == "raw":
        return F.when(col.isNull(), None).otherwise(F.array(col))
    if tokenizer == "whitespace":
        return _whitespace_tokens(col)
    if tokenizer == "en_stem":
        return _stem_tokens_udf(_default_tokens(col))
    raise ValueError(f"unknown tokenizer {tokenizer!r}")


def analyze_term(term: str, tokenizer: str = "default") -> list[str]:
    """Driver-side analysis of a query literal with the same rules, so
    query terms match indexed tokens (tantivy QueryParser does the
    same: it analyzes query text with the field's tokenizer)."""
    import re

    if tokenizer == "raw":
        return [term]
    if tokenizer == "whitespace":
        return [t for t in re.split(r"\s+", term) if t]
    # [\W_]+ == any non-alphanumeric run (underscore is a word char in
    # regex but NOT alphanumeric; tantivy splits on it)
    toks = [
        t.lower()
        for t in re.split(r"[\W_]+", term, flags=re.UNICODE)
        if t and len(t.encode("utf-8")) <= TOKEN_BYTE_LIMIT
    ]
    if tokenizer == "en_stem":
        toks = [porter_stem(t) for t in toks]
    return toks
