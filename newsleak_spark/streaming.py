"""Structured Streaming ingest → incremental index deltas.

The reference is batch-only (SURVEY §2.10); a 10^12-turn transcript
table, however, grows continuously, so the Spark-native ingest path is
``readStream`` over the landing directory with ``foreachBatch`` calling
the SAME resumable delta-append machinery used for batch increments
(indexing.append_index): every micro-batch becomes one registered
delta, queryable immediately with exact combined-stats BM25
(tests/test_incremental.py proves rank identity vs a full rebuild).

Exactly-once across restarts comes from two cooperating mechanisms:
  - Spark's streaming checkpoint replays an unfinished micro-batch;
  - the batch-id ledger (``stream_batches.json``) makes the replayed
    ``foreachBatch`` a no-op if its delta was already registered, and
    append_index itself resumes a half-built delta stage-by-stage.

``trigger(availableNow=True)`` drains the backlog and stops — the
batch-job-with-streaming-semantics mode used in tests and cron-style
ingest; omit it for a long-running continuous ingester.
"""

from __future__ import annotations

import json
import os

from pyspark.sql import DataFrame, SparkSession

from newsleak_spark.indexing import IndexConfig, append_index, build_index
from newsleak_spark.transcripts import TRANSCRIPT_SCHEMA

BATCH_LEDGER = "stream_batches.json"


def _ledger_path(index_dir: str) -> str:
    return os.path.join(index_dir, BATCH_LEDGER)


def _seen_batches(index_dir: str) -> dict[str, str]:
    try:
        with open(_ledger_path(index_dir)) as f:
            return json.load(f)
    except OSError:
        return {}


def _record_batch(index_dir: str, batch_id: int, delta: str) -> None:
    seen = _seen_batches(index_dir)
    seen[str(batch_id)] = delta
    tmp = _ledger_path(index_dir) + ".tmp"
    with open(tmp, "w") as f:
        json.dump(seen, f)
    os.replace(tmp, _ledger_path(index_dir))


def ingest_stream(
    spark: SparkSession,
    input_dir: str,
    index_dir: str,
    checkpoint_dir: str,
    cfg: IndexConfig | None = None,
    available_now: bool = True,
    max_files_per_trigger: int | None = None,
):
    """File-source streaming ingest: new parquet drops under
    ``input_dir`` become index deltas. Returns the StreamingQuery
    (already started); with ``available_now`` the caller should
    ``awaitTermination()`` to drain the backlog."""
    cfg = cfg or IndexConfig()

    reader = (
        spark.readStream.schema(TRANSCRIPT_SCHEMA)
        .format("parquet")
    )
    if max_files_per_trigger:
        reader = reader.option("maxFilesPerTrigger", str(max_files_per_trigger))
    stream = reader.load(input_dir)

    def sink(batch_df: DataFrame, batch_id: int) -> None:
        if str(batch_id) in _seen_batches(index_dir):
            return  # replay after restart: batch fully committed
        from newsleak_spark.indexing.manifest import Manifest

        # base is "done" only when its LAST stage committed — a crash
        # mid-base-build leaves manifest.json behind, and routing that
        # replay to append_index would orphan the base forever
        base_done = "segments" in Manifest(index_dir).data.get("stages", {})
        if base_done:
            # batch-id-keyed delta name: if the delta registered but the
            # ledger write below was lost to a crash, the replay finds
            # the name already registered and does NOT re-index the rows
            append_index(
                spark, batch_df, index_dir, cfg, resume=True,
                delta_name=f"delta_b{batch_id:08d}",
            )
            delta = f"delta_b{batch_id:08d}"
        else:
            build_index(spark, batch_df, index_dir, cfg, resume=True)
            delta = "base"
        _record_batch(index_dir, batch_id, delta)

    writer = (
        stream.writeStream.foreachBatch(sink)
        .option("checkpointLocation", checkpoint_dir)
        .outputMode("append")
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


SESSION_GAP_US = 30 * 60 * 1_000_000

_SESSION_OUT_SCHEMA = (
    "user_id long, session_start_us long, session_end_us long, n_events long"
)
_SESSION_STATE_SCHEMA = "start_us long, last_us long, n long"


def _session_fn(key, pdfs, state):
    """Custom stateful operator (applyInPandasWithState): gap-based
    sessionization. State = the user's OPEN session (start, last, n);
    a batch's events extend/split it, closed sessions are emitted
    immediately, and the open session is finalized by an EVENT-TIME
    TIMEOUT once the watermark passes last_event + gap — the streaming
    twin of events.ev_sessionize. Per-invocation work is one user's
    micro-batch slice (small by construction); the cross-batch state
    machine is what the batch lag/cumsum plan cannot express."""
    import pandas as pd

    (user_id,) = key
    empty = pd.DataFrame(
        {
            "user_id": pd.Series(dtype="int64"),
            "session_start_us": pd.Series(dtype="int64"),
            "session_end_us": pd.Series(dtype="int64"),
            "n_events": pd.Series(dtype="int64"),
        }
    )

    if state.hasTimedOut:
        start, last, n = state.get
        state.remove()
        yield pd.DataFrame(
            {
                "user_id": [user_id],
                "session_start_us": [start],
                "session_end_us": [last],
                "n_events": [n],
            }
        )
        return

    import numpy as np

    chunks = [
        # datetime64[us] view is robust to pandas ns/us unit choice
        pdf["ts"].to_numpy(dtype="datetime64[us]").astype("int64")
        for pdf in pdfs
        if len(pdf)
    ]
    us = np.sort(np.concatenate(chunks)) if chunks else np.empty(0, dtype="int64")
    start = last = None
    n = 0
    if state.exists:
        start, last, n = state.get
    closed = []
    for t in us:
        t = int(t)
        if start is None:
            start, last, n = t, t, 1
        elif t - last > SESSION_GAP_US:
            closed.append((user_id, start, last, n))
            start, last, n = t, t, 1
        else:
            last, n = t, n + 1
    if start is not None:
        state.update((start, last, n))
        # fire once the (event-time) watermark passes the gap horizon
        state.setTimeoutTimestamp((last + SESSION_GAP_US) // 1000)
    if closed:
        yield pd.DataFrame(
            closed, columns=["user_id", "session_start_us", "session_end_us", "n_events"]
        )
    else:
        yield empty


def sessionize_stream(
    spark: SparkSession,
    input_dir: str,
    output_dir: str,
    checkpoint_dir: str,
    schema,
    watermark: str = "2 hours",
    available_now: bool = True,
):
    """Streaming gap sessionization: readStream → withWatermark →
    groupBy(user).applyInPandasWithState(EventTimeTimeout) → append
    parquet sink. Sessions are exactly-once: closed-by-gap sessions
    emit with the batch that splits them; the trailing open session
    emits via event-time timeout when the watermark passes
    last_event + gap."""
    from pyspark.sql import functions as F
    from pyspark.sql.streaming.state import GroupStateTimeout

    stream = (
        spark.readStream.schema(schema)
        .format("parquet")
        .load(input_dir)
        .withColumn("ts", F.col("ts").cast("timestamp"))
        .withWatermark("ts", watermark)
    )
    sessions = stream.groupBy("user_id").applyInPandasWithState(
        _session_fn,
        outputStructType=_SESSION_OUT_SCHEMA,
        stateStructType=_SESSION_STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.EventTimeTimeout,
    )
    writer = (
        sessions.writeStream.format("parquet")
        .option("path", output_dir)
        .option("checkpointLocation", checkpoint_dir)
        .outputMode("append")
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def windowed_counts_stream(
    spark: SparkSession,
    input_dir: str,
    output_dir: str,
    checkpoint_dir: str,
    schema,
    ts_col: str = "ts",
    key_col: str = "event_type",
    window: str = "1 hour",
    watermark: str = "2 hours",
    available_now: bool = True,
):
    """Event-time windowed aggregation as a STREAM: readStream →
    withWatermark → window groupBy → append-mode parquet sink.

    The streaming twin of events.ev_window_agg — same F.window
    operator, now stateful: the watermark bounds state (a window is
    emitted/pruned once event time passes window_end + watermark, so
    late rows inside the allowance still count and state never grows
    unboundedly). Append output mode means exactly-once FINAL window
    rows in the sink, the contract a downstream index/delta consumer
    wants. Returns the started StreamingQuery.
    """
    from pyspark.sql import functions as F

    stream = spark.readStream.schema(schema).format("parquet").load(input_dir)
    agg = (
        stream.withColumn("_ts", F.col(ts_col).cast("timestamp"))
        .withWatermark("_ts", watermark)
        .groupBy(F.window("_ts", window).alias("w"), key_col)
        .agg(F.count("*").alias("n_events"))
        .select(
            F.col("w.start").alias("window_start"),
            F.col("w.end").alias("window_end"),
            key_col,
            "n_events",
        )
    )
    writer = (
        agg.writeStream.format("parquet")
        .option("path", output_dir)
        .option("checkpointLocation", checkpoint_dir)
        .outputMode("append")
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()
