"""Watermarked streaming windowed aggregation (streaming twin of
events.ev_window_agg): late-data allowance, append-mode finalized
windows, exactly-once across restarts of the same checkpoint.

Append-mode emission semantics under test: a window row is emitted in
the first micro-batch AFTER the watermark (event-time max - allowance)
passes its end — so with availableNow drains, drop N's finalized
windows appear during the run that processes drop N+1. That lag is the
price of exactly-once FINAL rows in the sink.
"""

import datetime as dt

import pytest
from pyspark.sql import functions as F
from pyspark.sql import types as T

from newsleak_spark.streaming import windowed_counts_stream

SCHEMA = T.StructType(
    [
        T.StructField("event_id", T.LongType()),
        T.StructField("ts", T.TimestampType()),
        T.StructField("event_type", T.StringType()),
    ]
)

OUT_SCHEMA = T.StructType(
    [
        T.StructField("window_start", T.TimestampType()),
        T.StructField("window_end", T.TimestampType()),
        T.StructField("event_type", T.StringType()),
        T.StructField("n_events", T.LongType()),
    ]
)

T0 = dt.datetime(2024, 1, 1, 0, 0, 0)


def _mk_events(spark, ids_hours):
    rows = [
        (i, T0 + dt.timedelta(hours=h, minutes=(i * 7) % 60), f"type_{i % 3}")
        for i, h in ids_hours
    ]
    return spark.createDataFrame(rows, SCHEMA)


def _run(spark, in_dir, out_dir, ckpt):
    q = windowed_counts_stream(
        spark, in_dir, out_dir, ckpt, SCHEMA, window="1 hour", watermark="2 hours"
    )
    q.awaitTermination()


def _read_out(spark, out_dir):
    return spark.read.schema(OUT_SCHEMA).parquet(out_dir)


DROP1 = [(i, i % 6) for i in range(60)]            # hours 0..5
DROP2 = [(1000 + i, 5 + i % 6) for i in range(60)]  # hours 5..10 (+ late 5s)


def test_windowed_stream_watermark_and_exactly_once(spark, tmp_path):
    in_dir, out_dir, ckpt = str(tmp_path / "in"), str(tmp_path / "out"), str(tmp_path / "ckpt")

    _mk_events(spark, DROP1).write.mode("append").parquet(in_dir)
    _run(spark, in_dir, out_dir, ckpt)
    got1 = _read_out(spark, out_dir)
    # drop 1 spans hours 0..5h59; watermark 3h59 → only windows ending
    # <= 3h59 finalized (0-1, 1-2, 2-3); 4h+ still open in state
    assert 0 < got1.count()
    max1 = got1.agg(F.max("window_end")).collect()[0][0]
    assert max1 <= T0 + dt.timedelta(hours=4), "unfinalized window emitted in run 1"

    # drop 2 (hours 5..10h59, incl. LATE hour-5 rows inside the 2h
    # allowance) → watermark 8h59; the hour-5 window finalizes with
    # contributions from BOTH drops
    _mk_events(spark, DROP2).write.mode("append").parquet(in_dir)
    _run(spark, in_dir, out_dir, ckpt)
    got = _read_out(spark, out_dir)
    max_end = got.agg(F.max("window_end")).collect()[0][0]
    assert max_end <= T0 + dt.timedelta(hours=9), "window past the watermark emitted"
    h5 = got.filter(F.col("window_start") == T0 + dt.timedelta(hours=5)).collect()
    assert h5, "hour-5 window not finalized after watermark passed it"
    assert sum(r["n_events"] for r in h5) == 20  # 10 late + 10 on-time

    # exactly-once: no (window, type) appears twice across restarts
    dup = got.groupBy("window_start", "event_type").count().filter("count > 1")
    assert dup.count() == 0

    # every emitted row equals the batch aggregation over ALL data
    batch = (
        _mk_events(spark, DROP1 + DROP2)
        .groupBy(F.window("ts", "1 hour").alias("w"), "event_type")
        .agg(F.count("*").alias("n"))
        .select(F.col("w.start").alias("window_start"), "event_type", "n")
    )
    j = got.join(batch, ["window_start", "event_type"])
    assert j.count() == got.count()
    assert j.filter(F.col("n_events") != F.col("n")).count() == 0

    # a far-future drop advances the watermark past everything: all
    # windows drain exactly-once and match the full batch aggregation
    _mk_events(spark, [(5000, 20)]).write.mode("append").parquet(in_dir)
    _run(spark, in_dir, out_dir, ckpt)
    got = _read_out(spark, out_dir)
    dup = got.groupBy("window_start", "event_type").count().filter("count > 1")
    assert dup.count() == 0
    drained = got.join(batch, ["window_start", "event_type"])
    assert drained.count() == batch.count(), "not every window drained"
    assert drained.filter(F.col("n_events") != F.col("n")).count() == 0
