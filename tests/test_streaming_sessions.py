"""Custom stateful streaming operator (applyInPandasWithState):
gap sessionization with event-time timeouts — closed sessions emit
with the batch that splits them, the trailing open session emits when
the watermark passes last_event + gap, and results equal the batch
sessionization over the union of all drops."""

import datetime as dt

from pyspark.sql import functions as F
from pyspark.sql import types as T

from newsleak_spark.streaming import SESSION_GAP_US, sessionize_stream

SCHEMA = T.StructType(
    [
        T.StructField("event_id", T.LongType()),
        T.StructField("ts", T.TimestampType()),
        T.StructField("user_id", T.LongType()),
    ]
)

OUT_SCHEMA = T.StructType(
    [
        T.StructField("user_id", T.LongType()),
        T.StructField("session_start_us", T.LongType()),
        T.StructField("session_end_us", T.LongType()),
        T.StructField("n_events", T.LongType()),
    ]
)

T0 = dt.datetime(2024, 1, 1)


def _mk(spark, rows):
    return spark.createDataFrame(
        [(i, T0 + dt.timedelta(minutes=m), u) for i, (m, u) in enumerate(rows)], SCHEMA
    )


def _run(spark, in_dir, out_dir, ckpt):
    q = sessionize_stream(spark, in_dir, out_dir, ckpt, SCHEMA, watermark="10 minutes")
    q.awaitTermination()


def _batch_sessions(all_rows):
    """Independent python oracle: gap sessions per user."""
    from collections import defaultdict

    by_user = defaultdict(list)
    for m, u in all_rows:
        by_user[u].append(int((T0 + dt.timedelta(minutes=m)).timestamp() * 1_000_000))
    out = set()
    for u, ts in by_user.items():
        ts.sort()
        start = last = ts[0]
        n = 1
        for t in ts[1:]:
            if t - last > SESSION_GAP_US:
                out.add((u, start, last, n))
                start, last, n = t, t, 1
            else:
                last, n = t, n + 1
        out.add((u, start, last, n))
    return out


def test_stateful_sessionization(spark, tmp_path):
    in_dir, out_dir, ckpt = str(tmp_path / "in"), str(tmp_path / "out"), str(tmp_path / "ckpt")
    # user 1: two sessions split by a 40-min gap; user 2: one session
    drop1 = [(0, 1), (10, 1), (20, 1), (60, 1), (65, 1), (5, 2), (15, 2)]
    _mk(spark, drop1).write.mode("append").parquet(in_dir)
    _run(spark, in_dir, out_dir, ckpt)

    # drop 2: extends nothing (gap > 30min for both) → new sessions;
    # also pushes the watermark far enough to time out drop-1 tails
    drop2 = [(600, 1), (605, 1), (610, 2)]
    _mk(spark, drop2).write.mode("append").parquet(in_dir)
    _run(spark, in_dir, out_dir, ckpt)

    # far-future sentinel (user 99) advances the GLOBAL watermark past
    # everyone's gap horizon → event-time timeouts flush open sessions
    drop3 = [(10_000, 99)]
    _mk(spark, drop3).write.mode("append").parquet(in_dir)
    _run(spark, in_dir, out_dir, ckpt)

    got = spark.read.schema(OUT_SCHEMA).parquet(out_dir)
    rows = {
        (r["user_id"], r["session_start_us"], r["session_end_us"], r["n_events"])
        for r in got.collect()
    }
    # exactly-once (set size == row count)
    assert len(rows) == got.count()
    want = _batch_sessions(drop1 + drop2)  # sentinel's own session still open
    assert rows == want, (sorted(rows), sorted(want))


def test_stateful_sessionization_late_event_bridges(spark, tmp_path):
    """A LATE event (inside the watermark allowance) arriving a batch
    after its neighbors must land in — and here BRIDGE — the correct
    sessions: [0,10] and [50,60] plus a late 30 are ONE session. The
    interval-merge state machine is order-independent; an open-session
    scalar state would move its boundary backwards and split wrongly."""
    in_dir, out_dir, ckpt = str(tmp_path / "in"), str(tmp_path / "out"), str(tmp_path / "ckpt")

    def run():
        q = sessionize_stream(
            spark, in_dir, out_dir, ckpt, SCHEMA, watermark="40 minutes"
        )
        q.awaitTermination()

    _mk(spark, [(0, 1), (10, 1), (50, 1), (60, 1)]).write.mode("append").parquet(in_dir)
    run()
    _mk(spark, [(30, 1)]).write.mode("append").parquet(in_dir)  # late, >= watermark (20)
    run()
    _mk(spark, [(10_000, 99)]).write.mode("append").parquet(in_dir)  # flush
    run()
    got = spark.read.schema(OUT_SCHEMA).parquet(out_dir)
    rows = {
        (r["user_id"], r["session_start_us"], r["session_end_us"], r["n_events"])
        for r in got.collect()
    }
    assert len(rows) == got.count()
    want = _batch_sessions([(0, 1), (10, 1), (50, 1), (60, 1), (30, 1)])
    assert rows == want, (sorted(rows), sorted(want))
    assert len(want) == 1  # the bridge collapsed everything into one session


def test_stateful_sessionization_resume_idempotent(spark, tmp_path):
    """Re-running the drained stream with the same checkpoint emits
    nothing new (no reprocessing, state intact)."""
    in_dir, out_dir, ckpt = str(tmp_path / "in"), str(tmp_path / "out"), str(tmp_path / "ckpt")
    _mk(spark, [(0, 1), (5, 1), (600, 9)]).write.mode("append").parquet(in_dir)
    _run(spark, in_dir, out_dir, ckpt)
    n1 = spark.read.schema(OUT_SCHEMA).parquet(out_dir).count()
    _run(spark, in_dir, out_dir, ckpt)  # no new files
    n2 = spark.read.schema(OUT_SCHEMA).parquet(out_dir).count()
    assert n1 == n2
