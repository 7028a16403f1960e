"""A11/A12 rule-annotator semantics pinned on constructed texts
(normalization, plausibility, granularity suppression, entity cleanup).
Reference behaviors: NewsleakTimeFormatter.java:63-160 (normalize +
plausible-date filter), NerMicroservice.java:148-189 (entity cleanup).
"""

from pyspark.sql import functions as F

from newsleak_spark.annotate import entity_frequencies, extract_entities, tag_timex


def _timex(spark, text):
    df = spark.createDataFrame([(1, text)], "doc_id long, text string")
    return sorted(r.timex for r in tag_timex(df).collect())


def test_timex_formats_normalize(spark):
    got = _timex(
        spark,
        "on 2019-07-14 then March 5, 2021 and 28 February 2020 maybe April 1999",
    )
    assert got == ["1999-04", "2019-07-14", "2020-02-28", "2021-03-05"]


def test_timex_implausible_dropped(spark):
    # Feb 30 fails the calendar cast; 1850 fails the year window;
    # Feb 29 passes only in leap years
    assert _timex(spark, "February 30, 2019 and 1850-01-01") == ["2019"]
    assert _timex(spark, "February 29, 2020") == ["2020-02-29"]
    assert _timex(spark, "February 29, 2021") == ["2021"]


def test_timex_granularity_suppression(spark):
    # month/year mentions covered by a day-level tag are suppressed
    assert _timex(spark, "5 September 2019") == ["2019-09-05"]
    assert _timex(spark, "September 2019") == ["2019-09"]
    assert _timex(spark, "in 2019 and also 2018-03-02") == ["2018-03-02", "2019"]
    assert _timex(spark, "September 2019 or October 2019") == ["2019-09", "2019-10"]


def test_timex_case_insensitive_dedup(spark):
    assert _timex(spark, "MARCH 5, 2021 and march 5, 2021") == ["2021-03-05"]


def test_timex_abbreviated_months_and_slash_dates(spark):
    # abbreviations with/without period, incl. the sept variant, and
    # yyyy/MM/dd — all normalize into the same value space (round-3
    # rule-subset widening)
    got = _timex(
        spark,
        "Sep. 5, 2019 then 28 Feb 2020, SEPT. 2021, Jun 2022 and 2023/03/04",
    )
    assert got == ["2019-09-05", "2020-02-28", "2021-09", "2022-06", "2023-03-04"]
    # abbreviated day tag suppresses its own month, same as full names
    assert _timex(spark, "5 Mar 2019") == ["2019-03-05"]
    # full name still wins over its abbreviation prefix
    assert _timex(spark, "March 5, 2019") == ["2019-03-05"]
    # implausible slash date falls back to the bare-year tag
    assert _timex(spark, "2019/13/40") == ["2019"]


def _ents(spark, text):
    df = spark.createDataFrame([(1, text)], "doc_id long, text string")
    return sorted(
        (r.ent_type, r.entity) for r in extract_entities(df).collect()
    )


def test_ner_types_and_cleanup(spark):
    got = _ents(
        spark,
        "Dr. Alice Johnson of Acme Corp met Ms. Mei  Tanaka in Berlin; "
        "Mr. Al from X9 Corp stayed home.",
    )
    # "Mr. Al" (<3 chars) and digit-bearing "X9 Corp" are cleaned out;
    # the double space inside "Mei  Tanaka" collapses
    assert got == [
        ("LOC", "Berlin"),
        ("ORG", "Acme Corp"),
        ("PER", "Alice Johnson"),
        ("PER", "Mei Tanaka"),
    ]


def test_ner_frequency_agg(spark):
    df = spark.createDataFrame(
        [(1, "Berlin and Tokyo"), (2, "Berlin again")],
        "doc_id long, text string",
    )
    rows = [(r.ent_type, r.entity, r.frequency) for r in entity_frequencies(df).collect()]
    assert rows == [("LOC", "Berlin", 2), ("LOC", "Tokyo", 1)]


def test_annotators_are_shuffle_free_scans(spark):
    """Scale audit: tagging/extraction stay row-local — the only
    exchange in the frequency plan is the final (partial-agg'd) hash
    aggregation; the tag plan has none at all."""
    df = spark.createDataFrame([(1, "x")], "doc_id long, text string")
    tag_plan = tag_timex(df)._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in tag_plan
    freq_plan = entity_frequencies(df)._jdf.queryExecution().executedPlan().toString()
    assert freq_plan.count("Exchange hashpartitioning") <= 2  # agg + union branches share
    assert "partial_count" in freq_plan or "HashAggregate" in freq_plan
