"""Query-language AST + recursive-descent parser.

The reference delegates query parsing to tantivy's ``QueryParser``
(`/root/reference/src/commands/search.rs:186-187`). This module is a
from-scratch parser for the query surface the reference demonstrably
exposes (SURVEY §2.4):

* term match              ``severity_text:INFO``, ``body:Receiving``
* unqualified terms       ``Receiving`` (routed to all indexed fields
                          + ``_dynamic``)
* boolean operators       ``AND``, ``OR``, ``NOT``, ``+must``, ``-not``
* grouping                ``( ... )``
* inclusive/exclusive
  ranges                  ``tenant_id:[60 TO 65}`` (``[``/``]``
                          inclusive, ``{``/``}`` exclusive; ``*`` for
                          open end)
* one-sided comparisons   ``tenant_id:>50``, ``negative:<0``,
                          ``x:>=1``, ``x:<=2``
* match-all               ``*``
* phrases                 ``body:"a b c"``
* dotted field paths      ``resource.service:...`` (with ``\\.``
                          escaping, `src/config/mod.rs:147-162`)

Semantics follow tantivy's defaults: space-separated clauses combine
as *should* (disjunction), explicit ``AND``/``OR`` are left-assoc with
``AND`` binding tighter, ``+``/``-`` mark must / must-not, and in a
mixed boolean query must+must_not clauses decide matching while bare
should clauses only matter when no must exists.
"""

from __future__ import annotations

from dataclasses import dataclass, field as dc_field
from typing import Optional


class ParseError(ValueError):
    pass


@dataclass(frozen=True)
class Node:
    pass


@dataclass(frozen=True)
class All(Node):
    """``*`` — match every document (`tests/config.rs:55`)."""


@dataclass(frozen=True)
class Term(Node):
    field: Optional[tuple[str, ...]]  # None == unqualified (default fields)
    text: str


@dataclass(frozen=True)
class Phrase(Node):
    field: Optional[tuple[str, ...]]
    text: str  # raw phrase text (analyzed at compile time)
    #: ``"a b"~N`` proximity (tantivy QueryParser slop syntax):
    #: up to N extra token positions distributed between the words,
    #: in order. 0 == exact adjacency.
    slop: int = 0


@dataclass(frozen=True)
class PhrasePrefix(Node):
    """``field:"a b"*`` — match-phrase-prefix (ES autocomplete
    staple; extension like :class:`Prefix`): the phrase words in
    order, the LAST one matched as a prefix."""

    field: Optional[tuple[str, ...]]
    text: str  # raw phrase text, '*' stripped


@dataclass(frozen=True)
class Prefix(Node):
    """``field:valu*`` — prefix match against the analyzed token
    stream (quickwit/ES trailing-wildcard syntax; tantivy's PARSER
    does not expose this, so it is a documented extension — SURVEY
    §2.8 — not reference parity)."""

    field: Optional[tuple[str, ...]]
    text: str  # the prefix, '*' stripped


@dataclass(frozen=True)
class Fuzzy(Node):
    """``field:value~N`` — Lucene/ES fuzzy term: any analyzed token
    within Damerau-free Levenshtein distance N (extension, same
    caveat as :class:`Prefix`)."""

    field: Optional[tuple[str, ...]]
    text: str
    distance: int = 1


@dataclass(frozen=True)
class Regex(Node):
    """``field:/pattern/`` — Lucene/ES regexp query: some analyzed
    token (the whole raw value under the raw tokenizer) FULL-matches
    the pattern, i.e. the pattern is implicitly anchored at both ends
    exactly as Lucene's regexp automaton is (extension, same caveat
    as :class:`Prefix` — tantivy's parser does not expose it)."""

    field: tuple[str, ...]
    pattern: str


@dataclass(frozen=True)
class Wildcard(Node):
    """``field:w?ldc*rd`` — Lucene/ES wildcard query: some analyzed
    token (the whole raw value under the raw tokenizer) matches the
    glob, where ``*`` spans any run and ``?`` exactly one character,
    anchored at both ends like Lucene's wildcard automaton
    (extension, same caveat as :class:`Prefix` — tantivy's parser
    does not expose it). A pure TRAILING star still parses as
    :class:`Prefix` (`startswith` beats a regex in codegen)."""

    field: Optional[tuple[str, ...]]
    pattern: str

    def to_regex(self) -> str:
        """The glob as an (unanchored) JVM regex — every regex
        metachar except our two wildcards is escaped literally."""
        out: list[str] = []
        for ch in self.pattern:
            if ch == "*":
                out.append(".*")
            elif ch == "?":
                out.append(".")
            elif ch in r"\.[]{}()<>+-=!^$|":
                out.append("\\" + ch)
            else:
                out.append(ch)
        return "".join(out)


@dataclass(frozen=True)
class RangeQ(Node):
    field: tuple[str, ...]
    lo: Optional[str]  # None == open (*)
    hi: Optional[str]
    lo_inc: bool
    hi_inc: bool


@dataclass(frozen=True)
class Cmp(Node):
    field: tuple[str, ...]
    op: str  # > >= < <=
    value: str


@dataclass(frozen=True)
class BoolQuery(Node):
    must: tuple[Node, ...] = ()
    should: tuple[Node, ...] = ()
    must_not: tuple[Node, ...] = ()


_SPECIAL = set('()[]{}"')


def _value_node(fieldp: Optional[tuple[str, ...]], word: str) -> Node:
    """Classify a bare value word: ``pre*`` -> Prefix, ``term~N`` ->
    Fuzzy, any other ``*``/``?`` placement -> Wildcard (Lucene
    wildcard-query semantics), else Term. A single TRAILING star
    stays the cheaper Prefix form."""
    # ASCII digits only: str.isdigit() accepts unicode digit-LIKE
    # characters ('²', '³') that int() rejects (hypothesis-found);
    # Lucene's fuzzy distance is plain 0-9 anyway
    if (
        len(word) >= 3
        and word[-1] in "0123456789"
        and "~" in word[:-1]
    ):
        base, _, digits = word.rpartition("~")
        if base and all(c in "0123456789" for c in digits):
            return Fuzzy(fieldp, base, int(digits))
    if word.endswith("*") and len(word) > 1 and "*" not in word[:-1] and "?" not in word:
        return Prefix(fieldp, word[:-1])
    if "*" in word or "?" in word:
        return Wildcard(fieldp, word)
    return Term(fieldp, word)


class _Scanner:
    def __init__(self, s: str):
        self.s = s
        self.i = 0

    def eof(self) -> bool:
        return self.i >= len(self.s)

    def peek(self) -> str:
        return self.s[self.i] if self.i < len(self.s) else ""

    def skip_ws(self) -> None:
        while not self.eof() and self.s[self.i].isspace():
            self.i += 1

    def read_field_path(self) -> Optional[tuple[str, ...]]:
        """Try to read ``name(.name)*:`` — returns None (and rewinds)
        if what follows is not a field-qualified value."""
        start = self.i
        segs: list[str] = []
        cur: list[str] = []
        while not self.eof():
            c = self.s[self.i]
            if c == "\\" and self.i + 1 < len(self.s) and self.s[self.i + 1] == ".":
                cur.append(".")
                self.i += 2
                continue
            if c == ".":
                if not cur:
                    break
                segs.append("".join(cur))
                cur = []
                self.i += 1
                continue
            if c == ":":
                if not cur:
                    break
                segs.append("".join(cur))
                self.i += 1  # consume ':'
                return tuple(segs)
            if c.isspace() or c in _SPECIAL or c in "+-" and not cur:
                break
            if c in "<>":
                break
            cur.append(c)
            self.i += 1
        self.i = start
        return None

    def read_value_word(self) -> str:
        """Read a bare value: until whitespace or a structural char.
        Colons/dots/dashes inside are literal (IPv6, dates, numbers)."""
        out: list[str] = []
        while not self.eof():
            c = self.s[self.i]
            if c.isspace() or c in _SPECIAL:
                break
            out.append(c)
            self.i += 1
        if not out:
            raise ParseError(f"expected a value at position {self.i} in {self.s!r}")
        return "".join(out)

    def read_quoted(self) -> str:
        assert self.peek() == '"'
        self.i += 1
        out: list[str] = []
        while not self.eof() and self.s[self.i] != '"':
            if self.s[self.i] == "\\" and self.i + 1 < len(self.s):
                self.i += 1
            out.append(self.s[self.i])
            self.i += 1
        if self.eof():
            raise ParseError("unterminated phrase quote")
        self.i += 1
        return "".join(out)

    def read_range_bound(self) -> Optional[str]:
        self.skip_ws()
        out: list[str] = []
        while not self.eof():
            c = self.s[self.i]
            if c.isspace() or c in "]}":
                break
            out.append(c)
            self.i += 1
        word = "".join(out)
        if not word:
            raise ParseError("empty range bound")
        return None if word == "*" else word


def _keyword_at(sc: _Scanner, kw: str) -> bool:
    """True if the next token is exactly the (upper-case) keyword."""
    j = sc.i
    if not sc.s.startswith(kw, j):
        return False
    end = j + len(kw)
    return end >= len(sc.s) or sc.s[end].isspace() or sc.s[end] in _SPECIAL


def parse_query(q: str) -> Node:
    sc = _Scanner(q)
    node = _parse_or(sc)
    sc.skip_ws()
    if not sc.eof():
        raise ParseError(f"unexpected trailing input at {sc.i}: {q[sc.i:]!r}")
    return node


def _parse_or(sc: _Scanner) -> Node:
    left = _parse_and(sc)
    while True:
        sc.skip_ws()
        if _keyword_at(sc, "OR"):
            sc.i += 2
            right = _parse_and(sc)
            left = BoolQuery(should=(left, right))
        else:
            return left


def _parse_and(sc: _Scanner) -> Node:
    left = _parse_implicit(sc)
    while True:
        sc.skip_ws()
        if _keyword_at(sc, "AND"):
            sc.i += 3
            sc.skip_ws()
            if _keyword_at(sc, "NOT"):
                # `a AND NOT b` == (+a -b), not a pure-negation clause
                sc.i += 3
                right = _parse_clause(sc)
                left = BoolQuery(must=(left,), must_not=(right,))
            else:
                right = _parse_implicit(sc)
                left = BoolQuery(must=(left, right))
        else:
            return left


def _parse_implicit(sc: _Scanner) -> Node:
    """Space-separated clauses (no explicit operator): tantivy default
    = disjunction, with +/- promoting to must/must_not."""
    must: list[Node] = []
    should: list[Node] = []
    must_not: list[Node] = []
    while True:
        sc.skip_ws()
        if sc.eof() or sc.peek() in ")]}" or _keyword_at(sc, "AND") or _keyword_at(sc, "OR"):
            break
        occur = "should"
        if sc.peek() == "+":
            sc.i += 1
            occur = "must"
        elif sc.peek() == "-":
            # only a prefix when followed by a clause, not a bare number
            nxt = sc.s[sc.i + 1] if sc.i + 1 < len(sc.s) else ""
            if nxt and not nxt.isspace():
                sc.i += 1
                occur = "must_not"
        if _keyword_at(sc, "NOT"):
            sc.i += 3
            sub = _parse_clause(sc)
            must_not.append(sub)
            continue
        sub = _parse_clause(sc)
        {"must": must, "should": should, "must_not": must_not}[occur].append(sub)
    clauses = must + should + must_not
    if not clauses:
        raise ParseError("empty query")
    if len(clauses) == 1 and not must_not:
        return clauses[0]
    if len(must) == 0 and len(must_not) == 0 and len(should) == 1:
        return should[0]
    return BoolQuery(must=tuple(must), should=tuple(should), must_not=tuple(must_not))


def _read_slop(sc: _Scanner) -> int:
    """``~N`` immediately after a closing phrase quote (tantivy
    QueryParser proximity syntax)."""
    if sc.peek() != "~":
        return 0
    j = sc.i + 1
    digits = ""
    while j < len(sc.s) and sc.s[j].isdigit():
        digits += sc.s[j]
        j += 1
    if not digits:
        return 0
    sc.i = j
    return int(digits)


def _parse_clause(sc: _Scanner) -> Node:
    sc.skip_ws()
    if sc.eof():
        raise ParseError("expected a clause")
    c = sc.peek()
    if c == "(":
        sc.i += 1
        inner = _parse_or(sc)
        sc.skip_ws()
        if sc.peek() != ")":
            raise ParseError("expected ')'")
        sc.i += 1
        return inner
    if c == "*":
        # match-all only when the star stands alone
        nxt = sc.s[sc.i + 1] if sc.i + 1 < len(sc.s) else ""
        if not nxt or nxt.isspace() or nxt in ")":
            sc.i += 1
            return All()
    if c == '"':
        text = sc.read_quoted()
        if sc.peek() == "*":
            sc.i += 1
            return PhrasePrefix(None, text)
        return Phrase(None, text, _read_slop(sc))

    fieldp = sc.read_field_path()
    if fieldp is None:
        return _value_node(None, sc.read_value_word())

    sc.skip_ws()
    c = sc.peek()
    if c in "[{":
        lo_inc = c == "["
        sc.i += 1
        lo = sc.read_range_bound()
        sc.skip_ws()
        if not _keyword_at(sc, "TO"):
            raise ParseError("expected TO in range")
        sc.i += 2
        hi = sc.read_range_bound()
        sc.skip_ws()
        c = sc.peek()
        if c not in "]}":
            raise ParseError("expected ] or } to close range")
        hi_inc = c == "]"
        sc.i += 1
        return RangeQ(fieldp, lo, hi, lo_inc, hi_inc)
    if c in "<>":
        op = c
        sc.i += 1
        if sc.peek() == "=":
            op += "="
            sc.i += 1
        return Cmp(fieldp, op, sc.read_value_word())
    if c == '"':
        text = sc.read_quoted()
        if sc.peek() == "*":
            sc.i += 1
            return PhrasePrefix(fieldp, text)
        return Phrase(fieldp, text, _read_slop(sc))
    if c == "/":
        sc.i += 1
        out: list[str] = []
        while not sc.eof() and sc.s[sc.i] != "/":
            if sc.s[sc.i] == "\\" and sc.i + 1 < len(sc.s):
                # keep the escape for the regex engine; only \/ is
                # OUR delimiter escape and unwraps here
                if sc.s[sc.i + 1] == "/":
                    sc.i += 1
                else:
                    out.append(sc.s[sc.i])
                    sc.i += 1
            out.append(sc.s[sc.i])
            sc.i += 1
        if sc.eof():
            raise ParseError("unterminated regex literal")
        sc.i += 1
        if not out:
            raise ParseError("empty regex literal")
        return Regex(fieldp, "".join(out))
    if c == "*":
        nxt = sc.s[sc.i + 1] if sc.i + 1 < len(sc.s) else ""
        if not nxt or nxt.isspace() or nxt in ")":
            sc.i += 1
            return RangeQ(fieldp, None, None, False, False)  # field exists/any
    return _value_node(fieldp, sc.read_value_word())
