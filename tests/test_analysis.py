"""Analyzer contract tests (FIXTURES.md §6 golden cases)."""

from newsleak_spark.analysis import (
    LUCENE_EN_STOPWORDS,
    analyze_english,
    analyze_standard,
    clean_tokens,
    is_not_fulltext,
    normalize_text,
    porter_stem,
    tokenize_unicode,
)

# canonical Porter examples from the published algorithm description
PORTER_GOLDEN = {
    "caresses": "caress",
    "ponies": "poni",
    "ties": "ti",
    "caress": "caress",
    "cats": "cat",
    "feed": "feed",
    "agreed": "agre",
    "plastered": "plaster",
    "bled": "bled",
    "motoring": "motor",
    "sing": "sing",
    "conflated": "conflat",
    "troubled": "troubl",
    "sized": "size",
    "hopping": "hop",
    "tanned": "tan",
    "falling": "fall",
    "hissing": "hiss",
    "fizzed": "fizz",
    "failing": "fail",
    "filing": "file",
    "happy": "happi",
    "sky": "sky",
    "relational": "relat",
    "conditional": "condit",
    "rational": "ration",
    "valenci": "valenc",
    "digitizer": "digit",
    "operator": "oper",
    "feudalism": "feudal",
    "decisiveness": "decis",
    "hopefulness": "hope",
    "callousness": "callous",
    "formaliti": "formal",
    "sensitiviti": "sensit",
    "sensibiliti": "sensibl",
    "triplicate": "triplic",
    "formative": "form",
    "formalize": "formal",
    "electriciti": "electr",
    "electrical": "electr",
    "hopeful": "hope",
    "goodness": "good",
    "revival": "reviv",
    "allowance": "allow",
    "inference": "infer",
    "airliner": "airlin",
    "gyroscopic": "gyroscop",
    "adjustable": "adjust",
    "defensible": "defens",
    "irritant": "irrit",
    "replacement": "replac",
    "adjustment": "adjust",
    "dependent": "depend",
    "adoption": "adopt",
    "homologou": "homolog",
    "communism": "commun",
    "activate": "activ",
    "angulariti": "angular",
    "homologous": "homolog",
    "effective": "effect",
    "bowdlerize": "bowdler",
    "probate": "probat",
    "rate": "rate",
    "cease": "ceas",
    "controll": "control",
    "roll": "roll",
}


def test_porter_golden():
    bad = {w: (porter_stem(w), want) for w, want in PORTER_GOLDEN.items() if porter_stem(w) != want}
    assert not bad, bad


def test_normalize_crlf_and_html():
    assert normalize_text("a\r\nb") == "a\nb"
    assert normalize_text("x<br>y<br/>z") == "x\ny\nz"
    assert normalize_text("<p>para</p>more") == " para\nmore"
    assert "<" not in normalize_text("<div class='x'>hi</div>")


def test_dehyphenation_guards():
    # plain continuation joins
    assert "wonderful" in normalize_text("wonder-\nful")
    # conjunction / uppercase / digit continuations keep the break
    assert "Nordund" not in normalize_text("Nord-\nund Ostsee")
    assert "fooBar" not in normalize_text("foo-\nBar")
    assert "foo1bar" not in normalize_text("foo-\n1bar")


def test_token_cleanup():
    assert clean_tokens(["ok", "x" * 71, "fine"]) == ["ok", "fine"]
    assert clean_tokens(["a", "a", "a", "b"]) == ["a", "b"]
    assert clean_tokens(["aa", "aa"]) == ["aa", "aa"]  # only 1-char runs collapse


def test_possessive_and_stopwords():
    toks = analyze_english("The manager's report")
    assert toks == ["manag", "report"]
    assert all(t not in LUCENE_EN_STOPWORDS for t in toks)


def test_unicode_tokenize():
    assert tokenize_unicode("naïve café-crème") == ["naïve", "café", "crème"]


def test_standard_mode_matches_duckdb_regex():
    import duckdb

    s = "Hello, World! x9 <br> foo_bar"
    got = analyze_standard(s)
    want = duckdb.sql(
        "SELECT regexp_extract_all(lower($1), '[a-z0-9]+')", params=[s]
    ).fetchone()[0]
    assert got == want


def test_not_fulltext_flag():
    boiler = "tok " * 200
    assert is_not_fulltext(boiler)
    assert not is_not_fulltext("short normal sentence with words")


# ---------------------------------------------------------------------------
# Property: the standard analyzer (the oracle-parity mode) must agree
# with DuckDB's regexp_extract_all(lower(s), '[a-z0-9]+') — the exact
# expression every shared-SQL oracle uses — over the ASCII domain the
# fixtures live in. (Full-unicode lowercasing legitimately differs
# between Python and non-ICU DuckDB, e.g. dotted capital I; the oracle
# contract is scoped to the testdata's ASCII token space.)
# ---------------------------------------------------------------------------

import duckdb as _duckdb
from hypothesis import given, settings
from hypothesis import strategies as st

_ASCII = st.text(
    alphabet=st.characters(min_codepoint=0x20, max_codepoint=0x7E), max_size=200
)
_con = _duckdb.connect()


@settings(max_examples=300, deadline=None)
@given(_ASCII)
def test_standard_analyzer_matches_duckdb(s):
    want = _con.execute(
        "SELECT regexp_extract_all(lower($s), '[a-z0-9]+')", {"s": s}
    ).fetchone()[0]
    assert analyze_standard(s) == want


# ---------------------------------------------------------------------------
# A4 paragraph split (curation.split_paragraphs) — the fixture text has
# no newlines, so the multi-paragraph behavior is pinned here.
# ---------------------------------------------------------------------------

def test_split_paragraphs_newline_runs(spark):
    from newsleak_spark.curation import split_paragraphs

    df = spark.createDataFrame(
        [(1, "first para\nsecond para\n\n\nthird"), (2, "single")],
        "doc_id long, text string",
    )
    rows = split_paragraphs(df).orderBy("doc_id", "par_idx").collect()
    got = [(r["doc_id"], r["par_idx"], r["par"]) for r in rows]
    assert got == [
        (1, 0, "first para"),
        (1, 1, "second para"),
        (1, 2, "third"),
        (2, 0, "single"),
    ]
