import datetime as dt

import pytest

from newsleak_spark.query.spec import QuerySpec, parse_query_string, parse_time_range


def test_parse_terms_and_phrase():
    terms, phrases, _ = parse_query_string('deploy failure "exact phrase here"')
    assert terms == ("deploy", "failure")
    assert phrases == (("exact", "phrase", "here"),)


def test_unbalanced_quote_autoclosed():
    # ESRequestUtils.scala:299-302
    terms, phrases, _ = parse_query_string('alpha "beta gamma')
    assert terms == ("alpha",)
    assert phrases == (("beta", "gamma"),)


def test_quoted_single_token_is_term():
    terms, phrases, _ = parse_query_string('"solo" other')
    assert terms == ("solo", "other")
    assert phrases == ()


def test_not_terms_parsed():
    terms, phrases, not_terms = parse_query_string('merge -join "fast table" -window')
    assert terms == ("merge",)
    assert phrases == (("fast", "table"),)
    assert not_terms == ("join", "window")


def test_not_prefix_only_outside_quotes():
    terms, _, not_terms = parse_query_string('"a -b" c')
    # inside quotes '-' is analyzer noise, not negation
    assert not_terms == ()
    assert "c" in terms


def test_negated_quoted_phrase_fails_closed():
    # -"foo bar" is out of scope; silently keeping the phrase would
    # INVERT intent (the bare '-' is analyzer noise, so the phrase
    # became a positive MUST pre-fix). Must raise, not flip polarity.
    import pytest as _pytest

    from newsleak_spark.analysis import analyze

    with _pytest.raises(ValueError, match="negated quoted"):
        parse_query_string('alpha -"foo bar"')
    # a lone trailing '-' NOT followed by a quote is still just noise
    terms, _, not_terms = parse_query_string("alpha -", analyzer=analyze)
    assert terms == ("alpha",) and not_terms == ()
    # and '- "foo"' (space before the quote) is not a negation either
    terms, phrases, not_terms = parse_query_string('alpha - "foo bar"', analyzer=analyze)
    assert phrases == (("foo", "bar"),) and not_terms == ()


def test_hyphenated_word_is_not_negation():
    from newsleak_spark.analysis import analyze

    terms, _, not_terms = parse_query_string("state-of-the-art", analyzer=analyze)
    assert not_terms == ()
    assert terms == ("state", "of", "the", "art")


def test_duplicate_terms_dedup():
    terms, _, _ = parse_query_string("x y x")
    assert terms == ("x", "y")


def test_analyzer_applied_to_query():
    from newsleak_spark.analysis import analyze_english

    terms, _, _ = parse_query_string("The Manager's reports", analyzer=analyze_english)
    assert terms == ("manag", "report")


@pytest.mark.parametrize(
    "s,lo,hi",
    [
        ("2014", dt.date(2014, 1, 1), dt.date(2014, 12, 31)),
        ("2014-2016", dt.date(2014, 1, 1), dt.date(2016, 12, 31)),
        ("2014-02", dt.date(2014, 2, 1), dt.date(2014, 2, 28)),
        ("2016-02", dt.date(2016, 2, 1), dt.date(2016, 2, 29)),
        ("2014-1-1", dt.date(2014, 1, 1), dt.date(2014, 1, 1)),
    ],
)
def test_time_range_grammar(s, lo, hi):
    assert parse_time_range(s) == (lo, hi)


def test_time_range_invalid():
    with pytest.raises(ValueError):
        parse_time_range("not-a-date")


def test_match_all_and_cache_key():
    assert QuerySpec().is_match_all()
    assert not QuerySpec(terms=("x",)).is_match_all()
    a, b = QuerySpec(terms=("x",)), QuerySpec(terms=("x",))
    assert a.cache_key() == b.cache_key()
    assert a.cache_key() != QuerySpec(terms=("y",)).cache_key()


def test_all_scored_terms_covers_phrases():
    s = QuerySpec(terms=("a",), phrases=(("b", "c"), ("a", "d")))
    assert s.all_scored_terms() == ("a", "b", "c", "d")


# Property: for ANY ascii input incl. unbalanced quotes (auto-closed
# per ESRequestUtils.scala:299-302) the query-string grammar either
# yields analyzed (lowercase [a-z0-9]+) terms, or fails CLOSED with
# the documented negated-quoted-phrase ValueError — never any other
# crash, never polarity-flipped output.
import re as _re

from hypothesis import given, settings
from hypothesis import strategies as st

from newsleak_spark.analysis import analyze

_TOKEN_RE = _re.compile(r"^[a-z0-9]+$")
_ASCII_Q = st.text(
    alphabet=st.characters(min_codepoint=0x20, max_codepoint=0x7E), max_size=120
)


@settings(max_examples=300, deadline=None)
@given(_ASCII_Q)
def test_parse_query_string_total_and_analyzed(q):
    try:
        terms, phrases, not_terms = parse_query_string(q, analyzer=analyze)
    except ValueError as e:
        # only the documented fail-closed case may raise, and only on
        # inputs that really have a bare '-' abutting a quoted span
        assert "negated quoted" in str(e), (q, e)
        assert _re.search(r'(^|\s)-"', q), q
        return
    for t in terms:
        assert _TOKEN_RE.match(t), (q, t)
    for t in not_terms:
        assert _TOKEN_RE.match(t), (q, t)
    for p in phrases:
        assert p, (q, phrases)  # no empty phrase tuples
        for t in p:
            assert _TOKEN_RE.match(t), (q, p)
