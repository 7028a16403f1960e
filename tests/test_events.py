"""Constructed edge cases for the event-time operators whose gate
entries only see fixture data: the as-of join's strict-before and
tie-break semantics."""

import pytest
from pyspark.sql import functions as F


def _asof(spark, rows):
    """Run ev_asof_join against an in-memory events table by writing a
    tiny parquet dir (the op loads events from sf_dir)."""
    import tempfile

    from newsleak_spark import events

    df = spark.createDataFrame(
        rows,
        "event_id long, ts timestamp, user_id long, event_type string, "
        "value double, props string",
    )
    d = tempfile.mkdtemp(prefix="asof_events_")
    df.write.mode("overwrite").parquet(f"{d}/events.parquet")
    out = events.ev_asof_join(spark, d).collect()
    return {r["purchase_id"]: (r["click_id"], r["gap_sec"]) for r in out}


def test_asof_strict_before_and_ties(spark):
    import datetime as dt

    t = lambda s: dt.datetime.fromisoformat(s)
    rows = [
        # user 1: click 10s before purchase → matched, gap 10
        (1, t("2020-01-01 00:00:00"), 1, "click", 0.0, "{}"),
        (2, t("2020-01-01 00:00:10"), 1, "purchase", 0.0, "{}"),
        # user 2: click at the SAME instant as the purchase → strict
        # semantics exclude it; the earlier click wins instead
        (3, t("2020-01-01 00:00:00"), 2, "click", 0.0, "{}"),
        (4, t("2020-01-01 00:00:30"), 2, "click", 0.0, "{}"),
        (5, t("2020-01-01 00:00:30"), 2, "purchase", 0.0, "{}"),
        # user 3: two clicks at the SAME prior instant → highest
        # event_id wins (pinned tie-break)
        (6, t("2020-01-01 00:00:00"), 3, "click", 0.0, "{}"),
        (7, t("2020-01-01 00:00:00"), 3, "click", 0.0, "{}"),
        (8, t("2020-01-01 00:01:00"), 3, "purchase", 0.0, "{}"),
        # user 4: purchase with NO prior click → null match
        (9, t("2020-01-01 00:00:00"), 4, "purchase", 0.0, "{}"),
        (10, t("2020-01-01 00:00:05"), 4, "click", 0.0, "{}"),
    ]
    got = _asof(spark, rows)
    assert got[2] == (1, 10)
    assert got[5] == (3, 30)   # equal-instant click 4 excluded (strict)
    assert got[8] == (7, 60)   # tie → higher event_id
    assert got[9] == (None, None)
