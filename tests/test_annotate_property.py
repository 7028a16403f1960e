"""A11 tagger vs an INDEPENDENT pure-Python model.

The DuckDB oracle shares the tagger's dialect template (parity by
construction), so these tests check the template itself against a
from-scratch Python implementation of the intended semantics:
normalize → calendar/window plausibility → finer-granularity
suppression — including the deliberate behaviors (a bare (19|20)xx
year inside any mention is its own candidate; 'd Month yyyy' also
surfaces its 'Month yyyy' submatch; both then fall to suppression).
"""

import datetime as dt
import itertools

from hypothesis import given, settings
from hypothesis import strategies as st

from newsleak_spark.annotate import _MONTHS, tag_timex


# ---------------------------------------------------------------------------
# mention model: (kind, year, month, day) → surface text + expected tags
# ---------------------------------------------------------------------------


def _surface(kind, y, m, d, case):
    name = _MONTHS[m - 1]
    abbr = name[:3] + ("." if kind == "mdy_abbr" else "")
    name, abbr = (
        {0: s, 1: s.capitalize(), 2: s.upper()}[case] for s in (name, abbr)
    )
    if kind == "iso":
        return f"{y:04d}-{m:02d}-{d:02d}"
    if kind == "slash":
        return f"{y:04d}/{m:02d}/{d:02d}"
    if kind == "mdy":
        return f"{name} {d}, {y}"
    if kind == "mdy_abbr":
        return f"{abbr} {d}, {y}"
    if kind == "dmy":
        return f"{d} {name} {y}"
    if kind == "dmy_abbr":
        return f"{d} {abbr} {y}"
    if kind == "my":
        return f"{name} {y}"
    if kind == "my_abbr":
        return f"{abbr} {y}"
    return str(y)


def _expected(mentions):
    days, months, years = set(), set(), set()

    def plausible_day(y, m, d):
        try:
            dt.date(y, m, d)
        except ValueError:
            return False
        return 1900 <= y <= 2099

    for kind, y, m, d, _ in mentions:
        if kind in (
            "iso", "slash", "mdy", "mdy_abbr", "dmy", "dmy_abbr"
        ) and plausible_day(y, m, d):
            days.add(f"{y:04d}-{m:02d}-{d:02d}")
        if kind in ("my", "my_abbr", "dmy", "dmy_abbr") and 1900 <= y <= 2099:
            months.add(f"{y:04d}-{m:02d}")
        if 1900 <= y <= 2099:  # bare (19|20)xx substring of ANY mention
            years.add(f"{y:04d}")
    months = {m for m in months if not any(x[:7] == m for x in days)}
    years = {
        y
        for y in years
        if not any(x[:4] == y for x in days) and not any(x[:4] == y for x in months)
    }
    return sorted(days | months | years)


def _run_tagger(spark, texts):
    df = spark.createDataFrame(
        list(enumerate(texts)), "doc_id long, text string"
    )
    rows = tag_timex(df).collect()
    out = {i: [] for i in range(len(texts))}
    for r in rows:
        out[r.doc_id].append(r.timex)
    return [sorted(v) for _, v in sorted(out.items())]


def test_exhaustive_day_edges(spark):
    """All 12 months × edge days × window-edge years, all formats —
    one Spark job."""
    cases = []
    for m, d, (kind, y) in itertools.product(
        range(1, 13),
        [1, 28, 29, 30, 31],
        [
            ("iso", 1899), ("iso", 1900), ("mdy", 2020), ("dmy", 2021),
            ("iso", 2100), ("slash", 2022), ("mdy_abbr", 2023), ("dmy_abbr", 2024),
        ],
    ):
        cases.append([(kind, y, m, d, (m + d) % 3)])
    texts = ["on " + _surface(*c[0]) + " it happened" for c in cases]
    got = _run_tagger(spark, texts)
    for c, g in zip(cases, got):
        assert g == _expected(c), (c, g)


_mention = st.tuples(
    st.sampled_from(
        ["iso", "slash", "mdy", "mdy_abbr", "dmy", "dmy_abbr", "my", "my_abbr", "year"]
    ),
    st.integers(min_value=1890, max_value=2110),
    st.integers(min_value=1, max_value=12),
    st.integers(min_value=1, max_value=31),
    st.integers(min_value=0, max_value=2),
)


@settings(max_examples=25, deadline=None)
@given(st.lists(_mention, min_size=1, max_size=8))
def test_random_mention_lists(spark, mentions):
    text = "ctx " + " ; ".join(_surface(*m) for m in mentions) + " end"
    got = _run_tagger(spark, [text])[0]
    assert got == _expected(mentions), (mentions, text, got)
