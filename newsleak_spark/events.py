"""Event-stream operators over the ``events`` table.

The reference is batch-only (SURVEY §2.10), but the graft's engine
serves a continuously-growing corpus, so the event-time idioms a
stream pipeline needs are implemented (batch-computable, DuckDB-
oracled; the ingest side of streaming lives in streaming.py):

  ev_window_agg   tumbling event-time windows (F.window — the exact
                  operator Structured Streaming reuses for windowed
                  aggregation; G6's date_histogram generalized below
                  day granularity)
  ev_sessionize   gap-based sessionization (30-min inactivity): lag +
                  running sum over a user-keyed window — the batch twin
                  of applyInPandasWithState session windows
  ev_asof_join    AS-OF join (purchase → latest strictly-prior click
                  per user) as union + running last over ONE user-keyed
                  window — the range-join-free rewrite
  ev_json_props   dynamic JSON props extraction (newsleak's dynamic
                  metadata fields analog, Postgres2ElasticsearchIndexer
                  .java:402-424, as a semi-structured column)

Scale notes: window agg is one hash-agg (partial+final) keyed by
(window, type); sessionize shuffles once on user_id and the running
sum is a single in-partition scan; timestamps compare in integer
microseconds (unix_micros/epoch_us) so both engines agree exactly.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import Window as W
from pyspark.sql import functions as F

SESSION_GAP_US = 30 * 60 * 1_000_000  # 30 min inactivity ends a session


def load_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/events.parquet")


def ev_window_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tumbling 1-hour event-time windows per event_type: count +
    sum(value). Uses F.window — the same operator a readStream
    pipeline would use with a watermark."""
    e = load_events(spark, sf_dir)
    return (
        e.groupBy(F.window("ts", "1 hour").alias("w"), "event_type")
        .agg(
            F.count("*").alias("n_events"),
            # quantize per ROW, then sum integers: float partial-agg
            # order differs between Spark and DuckDB, so a double sum
            # within an ulp of a .5 boundary can round differently —
            # an integer sum is associative and exact in both engines
            F.sum(F.round(F.col("value") * 100).cast("long")).alias("value_e2"),
        )
        .select(
            F.date_format("w.start", "yyyy-MM-dd HH").alias("hour"),
            "event_type",
            "n_events",
            "value_e2",
        )
        .orderBy("hour", "event_type")
    )


def ev_sessionize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gap-based sessions: a >30-min silence starts a new session.
    lag → boundary flag → running sum = session ordinal; one shuffle
    (user_id), session stats per (user, session)."""
    e = load_events(spark, sf_dir).select(
        "user_id",
        "event_id",
        # parquet stores TIMESTAMP_NTZ; session TZ is UTC so the cast
        # is wall-clock identity, matching DuckDB's naive epoch_us
        F.unix_micros(F.col("ts").cast("timestamp")).alias("us"),
    )
    w = W.partitionBy("user_id").orderBy("us", "event_id")
    flagged = e.withColumn(
        "new_sess",
        F.when(
            F.col("us") - F.lag("us").over(w) > SESSION_GAP_US, 1
        ).otherwise(0),
    ).withColumn(
        "first_in_part", F.when(F.lag("us").over(w).isNull(), 1).otherwise(0)
    )
    sess = flagged.withColumn(
        "session_id",
        F.sum(F.col("new_sess") + F.col("first_in_part")).over(
            w.rowsBetween(W.unboundedPreceding, 0)
        ),
    )
    return (
        sess.groupBy("user_id", "session_id")
        .agg(
            F.count("*").alias("n_events"),
            # floor, not cast: double->int casts round in DuckDB but
            # truncate in Spark — floor agrees everywhere
            F.floor((F.max("us") - F.min("us")) / 1_000_000).cast("long").alias("duration_sec"),
        )
        .orderBy("user_id", "session_id")
    )


def ev_json_props(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dynamic JSON metadata: extract props.k, bucket stats per
    event_type (the dynamic-metadata-field read path as JSON)."""
    e = load_events(spark, sf_dir)
    k = F.get_json_object("props", "$.k").cast("long")
    return (
        e.select("event_type", k.alias("k"))
        .groupBy("event_type")
        .agg(
            F.count("k").alias("n_with_k"),
            F.min("k").alias("min_k"),
            F.max("k").alias("max_k"),
            F.sum("k").alias("sum_k"),
        )
        .orderBy("event_type")
    )


def ev_asof_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """AS-OF join (Spark has no native one): each ``purchase`` event
    matched to the user's most recent STRICTLY-prior ``click``.

    Rewrite as a composition of built-ins: tag both sides, union, one
    user-keyed window ordered (us, kind, event_id) with a running
    ``last(click, ignorenulls)`` — a single shuffle on user_id and one
    in-partition scan, instead of a range join that would fan out to
    |purchases|·|clicks| per user before filtering. Equal-timestamp
    clicks sort AFTER the purchase (kind 1 > 0), making the strict
    semantics exact; ties among equal-us clicks resolve to the highest
    event_id (the last in window order) in both engines."""
    e = load_events(spark, sf_dir).select(
        "user_id",
        "event_id",
        "event_type",
        F.unix_micros(F.col("ts").cast("timestamp")).alias("us"),
    )
    purchases = e.filter(F.col("event_type") == "purchase").select(
        "user_id", "us", F.lit(0).alias("kind"),
        F.col("event_id"), F.lit(None).cast("long").alias("click_id"),
        F.lit(None).cast("long").alias("click_us"),
    )
    clicks = e.filter(F.col("event_type") == "click").select(
        "user_id", "us", F.lit(1).alias("kind"),
        F.col("event_id"), F.col("event_id").alias("click_id"),
        F.col("us").alias("click_us"),
    )
    w = (
        W.partitionBy("user_id")
        .orderBy("us", "kind", "event_id")
        .rowsBetween(W.unboundedPreceding, 0)
    )
    u = purchases.unionByName(clicks).select(
        "*",
        F.last("click_id", ignorenulls=True).over(w).alias("last_click_id"),
        F.last("click_us", ignorenulls=True).over(w).alias("last_click_us"),
    )
    return (
        u.filter(F.col("kind") == 0)
        .select(
            F.col("event_id").alias("purchase_id"),
            "user_id",
            F.col("last_click_id").alias("click_id"),
            F.floor((F.col("us") - F.col("last_click_us")) / 1_000_000).cast("long").alias("gap_sec"),
        )
        .orderBy("purchase_id")
    )


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {
        "ev_window_agg": ev_window_agg,
        "ev_sessionize": ev_sessionize,
        "ev_json_props": ev_json_props,
        "ev_asof_join": ev_asof_join,
    }


def oracle_sql() -> dict[str, str]:
    return {
        "ev_window_agg": """
SELECT strftime(date_trunc('hour', ts), '%Y-%m-%d %H') AS hour,
       event_type,
       COUNT(*) AS n_events,
       CAST(SUM(CAST(ROUND(value * 100) AS BIGINT)) AS BIGINT) AS value_e2
FROM events GROUP BY 1, 2 ORDER BY hour, event_type""",
        "ev_sessionize": f"""
WITH e AS (
  SELECT user_id, event_id, epoch_us(ts) AS us FROM events
),
flagged AS (
  SELECT user_id, event_id, us,
         CASE WHEN us - LAG(us) OVER w > {SESSION_GAP_US} THEN 1 ELSE 0 END AS new_sess,
         CASE WHEN LAG(us) OVER w IS NULL THEN 1 ELSE 0 END AS first_in_part
  FROM e WINDOW w AS (PARTITION BY user_id ORDER BY us, event_id)
),
sess AS (
  SELECT user_id, us,
         CAST(SUM(new_sess + first_in_part) OVER (
           PARTITION BY user_id ORDER BY us, event_id
           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
         ) AS BIGINT) AS session_id
  FROM flagged
)
SELECT user_id, session_id, COUNT(*) AS n_events,
       CAST(FLOOR((MAX(us) - MIN(us)) / 1000000.0) AS BIGINT) AS duration_sec
FROM sess GROUP BY user_id, session_id ORDER BY user_id, session_id""",
        # mirror of the Spark union+running-last construction (not
        # DuckDB's native ASOF JOIN, whose equal-timestamp tie rules
        # are not parameterizable): strictly-prior click, ties among
        # equal-us clicks to the highest event_id
        "ev_asof_join": """
WITH e AS (
  SELECT user_id, event_id, event_type, epoch_us(ts) AS us FROM events
),
p AS (SELECT user_id, event_id, us FROM e WHERE event_type = 'purchase'),
c AS (SELECT user_id, event_id, us FROM e WHERE event_type = 'click')
SELECT p.event_id AS purchase_id, p.user_id,
       (SELECT c.event_id FROM c
        WHERE c.user_id = p.user_id AND c.us < p.us
        ORDER BY c.us DESC, c.event_id DESC LIMIT 1) AS click_id,
       (SELECT CAST(FLOOR((p.us - c.us) / 1000000.0) AS BIGINT) FROM c
        WHERE c.user_id = p.user_id AND c.us < p.us
        ORDER BY c.us DESC, c.event_id DESC LIMIT 1) AS gap_sec
FROM p ORDER BY purchase_id""",
        "ev_json_props": """
SELECT event_type,
       COUNT(k) AS n_with_k,
       MIN(k) AS min_k, MAX(k) AS max_k,
       CAST(SUM(k) AS BIGINT) AS sum_k
FROM (
  SELECT event_type, CAST(json_extract_string(props, '$.k') AS BIGINT) AS k
  FROM events
) GROUP BY event_type ORDER BY event_type""",
    }
