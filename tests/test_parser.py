"""Query-language parser unit tests (grammar per SURVEY §2.4)."""

import pytest

from toshokan_spark.plans import (
    All,
    BoolQuery,
    Cmp,
    ParseError,
    Phrase,
    RangeQ,
    Term,
    parse_query,
)


def test_simple_term():
    assert parse_query("severity_text:INFO") == Term(("severity_text",), "INFO")


def test_unqualified_term():
    assert parse_query("Receiving") == Term(None, "Receiving")


def test_match_all():
    assert parse_query("*") == All()


def test_and():
    q = parse_query("tenant_id:>50 AND severity_text:INFO")
    assert q == BoolQuery(
        must=(Cmp(("tenant_id",), ">", "50"), Term(("severity_text",), "INFO"))
    )


def test_or():
    q = parse_query("a:1 OR b:2")
    assert q == BoolQuery(should=(Term(("a",), "1"), Term(("b",), "2")))


def test_and_binds_tighter_than_or():
    q = parse_query("a:1 AND b:2 OR c:3")
    assert q == BoolQuery(
        should=(
            BoolQuery(must=(Term(("a",), "1"), Term(("b",), "2"))),
            Term(("c",), "3"),
        )
    )


def test_range_inclusive_exclusive():
    # README.md:34 of the reference
    q = parse_query("tenant_id:[60 TO 65}")
    assert q == RangeQ(("tenant_id",), "60", "65", True, False)


def test_range_open_bound():
    q = parse_query("ts:[* TO 2020-01-01T00:00:00Z]")
    assert q == RangeQ(("ts",), None, "2020-01-01T00:00:00Z", True, True)


def test_one_sided():
    assert parse_query("negative:<0") == Cmp(("negative",), "<", "0")
    assert parse_query("tenant_id:>50") == Cmp(("tenant_id",), ">", "50")
    assert parse_query("x:>=5") == Cmp(("x",), ">=", "5")


def test_ip_range():
    # `tests/config.rs:90`
    q = parse_query("something:[190.0.0.1 TO 195.200.10.1]")
    assert q == RangeQ(("something",), "190.0.0.1", "195.200.10.1", True, True)


def test_value_with_colons_ipv6():
    q = parse_query("something:2001:db8::ff00:42:8329")
    assert q == Term(("something",), "2001:db8::ff00:42:8329")


def test_dotted_path():
    assert parse_query("resource.service:datanode") == Term(
        ("resource", "service"), "datanode"
    )


def test_escaped_dot_in_field_name():
    assert parse_query(r"a\.b:x") == Term(("a.b",), "x")


def test_phrase():
    assert parse_query('body:"a b"') == Phrase(("body",), "a b")


def test_negative_number_value():
    assert parse_query("negative:-100") == Term(("negative",), "-100")


def test_not():
    q = parse_query("NOT a:1")
    assert q == BoolQuery(must_not=(Term(("a",), "1"),))


def test_plus_minus_prefix():
    q = parse_query("+a:1 -b:2 c:3")
    assert q == BoolQuery(
        must=(Term(("a",), "1"),),
        should=(Term(("c",), "3"),),
        must_not=(Term(("b",), "2"),),
    )


def test_parens():
    q = parse_query("(a:1 OR b:2) AND c:3")
    assert q == BoolQuery(
        must=(
            BoolQuery(should=(Term(("a",), "1"), Term(("b",), "2"))),
            Term(("c",), "3"),
        )
    )


def test_implicit_disjunction():
    q = parse_query("a:1 b:2")
    assert q == BoolQuery(should=(Term(("a",), "1"), Term(("b",), "2")))


def test_field_star_exists():
    q = parse_query("a:*")
    assert q == RangeQ(("a",), None, None, False, False)


def test_errors():
    with pytest.raises(ParseError):
        parse_query("")
    with pytest.raises(ParseError):
        parse_query("a:[1 TO")
    with pytest.raises(ParseError):
        parse_query('body:"unterminated')


def test_phrase_slop():
    assert parse_query('body:"a b"~2') == Phrase(("body",), "a b", 2)
    assert parse_query('"x y"~3') == Phrase(None, "x y", 3)
    assert parse_query('body:"a b"~12') == Phrase(("body",), "a b", 12)
    # no slop marker -> 0
    assert parse_query('body:"a b"') == Phrase(("body",), "a b", 0)
    # slop composes inside boolean structure
    q = parse_query('body:"a b"~1 AND x:1')
    assert q == BoolQuery(must=(Phrase(("body",), "a b", 1), Term(("x",), "1")))


def test_prefix_and_fuzzy_extension_syntax():
    from toshokan_spark.plans.ast import Fuzzy, Prefix

    assert parse_query("text:spar*") == Prefix(("text",), "spar")
    assert parse_query("spar*") == Prefix(None, "spar")
    assert parse_query("text:clck~1") == Fuzzy(("text",), "clck", 1)
    assert parse_query("clck~2") == Fuzzy(None, "clck", 2)
    # bare star stays match-all; inner stars become wildcard queries
    from toshokan_spark.plans.ast import Wildcard

    assert parse_query("*") == All()
    assert parse_query("x:a*b") == Wildcard(("x",), "a*b")
    assert parse_query("x:a?b") == Wildcard(("x",), "a?b")
    assert parse_query("s?gnup") == Wildcard(None, "s?gnup")
    # trailing-star-with-? still wildcard, pure trailing star is Prefix
    assert parse_query("x:a?c*") == Wildcard(("x",), "a?c*")
    # glob -> regex lowering escapes every other metachar
    assert Wildcard(None, "a*b?c.d").to_regex() == "a.*b.c\\.d"
    # tilde without digits stays a literal term (file~name)
    assert parse_query("x:a~b") == Term(("x",), "a~b")
    # field:* stays the exists-range form, not a prefix
    from toshokan_spark.plans.ast import RangeQ
    assert parse_query("x:*") == RangeQ(("x",), None, None, False, False)
    # composes in boolean structure
    q = parse_query("text:spar* AND lang:en")
    assert q == BoolQuery(must=(Prefix(("text",), "spar"), Term(("lang",), "en")))


def test_phrase_prefix_syntax():
    from toshokan_spark.plans.ast import PhrasePrefix

    assert parse_query('text:"key ord"*') == PhrasePrefix(("text",), "key ord")
    assert parse_query('"quick bro"*') == PhrasePrefix(None, "quick bro")
    # slop and prefix are distinct suffixes; no star -> plain phrase
    assert parse_query('text:"a b"~2') == Phrase(("text",), "a b", 2)
    assert parse_query('text:"a b"') == Phrase(("text",), "a b", 0)


def test_regex_query_syntax():
    from toshokan_spark.plans.ast import ParseError, Regex

    assert parse_query("event_type:/c.*k/") == Regex(("event_type",), "c.*k")
    # \/ is OUR delimiter escape and unwraps; regex escapes survive
    assert parse_query(r"path:/a\/b/") == Regex(("path",), "a/b")
    assert parse_query(r"text:/\d+/") == Regex(("text",), r"\d+")
    # composes in boolean structure
    q = parse_query("lang:/e[ns]/ AND source:web")
    assert q == BoolQuery(
        must=(Regex(("lang",), "e[ns]"), Term(("source",), "web")))
    # unterminated / empty literals are parse errors
    import pytest
    with pytest.raises(ParseError):
        parse_query("x:/abc")
    with pytest.raises(ParseError):
        parse_query("x://")
