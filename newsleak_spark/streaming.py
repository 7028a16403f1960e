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
_SESSION_STATE_SCHEMA = "starts array<long>, lasts array<long>, ns array<long>"


def _session_fn(key, pdfs, state):
    """Custom stateful operator (applyInPandasWithState): gap-based
    sessionization, late-data-correct. State = ALL of the user's
    unfinalized sessions as (start, last, n) intervals; each batch's
    events enter as (t, t, 1) intervals and the sorted chain is merged
    by the gap rule — an order-independent reduction, so a late event
    inside the watermark allowance lands in (or bridges) the right
    session regardless of arrival order. A session is emitted ONLY
    when the watermark passes last + gap: no future event (all ≥
    watermark) can merge into it, so emission is final — the streaming
    twin of events.ev_sessionize, with the cross-batch state machine a
    batch lag/cumsum plan cannot express."""
    import numpy as np
    import pandas as pd

    (user_id,) = key
    sessions: list[tuple[int, int, int]] = []
    if state.exists:
        starts, lasts, ns = state.get
        sessions = [(int(s), int(l), int(n)) for s, l, n in zip(starts, lasts, ns)]

    chunks = [
        # datetime64[us] view is robust to pandas ns/us unit choice
        pdf["ts"].to_numpy(dtype="datetime64[us]").astype("int64")
        for pdf in pdfs
        if len(pdf)
    ]
    if chunks:
        for t in np.concatenate(chunks):
            sessions.append((int(t), int(t), 1))

    sessions.sort()
    merged: list[tuple[int, int, int]] = []
    for s, l, n in sessions:
        if merged and s - merged[-1][1] <= SESSION_GAP_US:
            ps, pl, pn = merged[-1]
            merged[-1] = (ps, max(pl, l), pn + n)
        else:
            merged.append((s, l, n))

    wm_us = state.getCurrentWatermarkMs() * 1000
    done = [m for m in merged if m[1] + SESSION_GAP_US < wm_us]
    keep = [m for m in merged if m[1] + SESSION_GAP_US >= wm_us]

    if keep:
        state.update(
            ([m[0] for m in keep], [m[1] for m in keep], [m[2] for m in keep])
        )
        horizon_ms = (min(m[1] for m in keep) + SESSION_GAP_US) // 1000
        state.setTimeoutTimestamp(max(horizon_ms + 1, state.getCurrentWatermarkMs() + 1))
    elif state.exists:
        state.remove()

    done.sort()
    yield pd.DataFrame(
        {
            "user_id": pd.Series([user_id] * len(done), dtype="int64"),
            "session_start_us": pd.Series([m[0] for m in done], dtype="int64"),
            "session_end_us": pd.Series([m[1] for m in done], dtype="int64"),
            "n_events": pd.Series([m[2] for m in done], dtype="int64"),
        }
    )


def sessionize_stream(
    spark: SparkSession,
    input_dir: str,
    output_dir: str,
    checkpoint_dir: str,
    schema,
    ts_col: str = "ts",
    user_col: str = "user_id",
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
        .withColumn("ts", F.col(ts_col).cast("timestamp"))
        .withColumn("user_id", F.col(user_col).cast("long"))
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


def dedup_stream(
    spark: SparkSession,
    input_dir: str,
    output_dir: str,
    checkpoint_dir: str,
    schema=None,
    watermark: str = "2 hours",
    available_now: bool = True,
):
    """Streaming exact dedup: first-seen turn per content fingerprint
    is emitted, later duplicates are dropped by keyed state — the
    stream twin of textops.dedup_exact for a continuously-landing
    corpus (dedup BEFORE indexing/training is the standard pipeline
    position).

    readStream → md5 fingerprint of the analyzed-token join (the SAME
    canonical form the batch dedup ops use, so batch and stream agree
    on what "duplicate" means) → withWatermark →
    dropDuplicatesWithinWatermark on the fingerprint → append-mode
    parquet sink. The watermark bounds the dedup state: a fingerprint
    older than the horizon is pruned, so state is O(recent window), not
    O(all history) — at 10^12-turn scale an unbounded exact-dedup state
    is impossible, and horizon-bounded streaming dedup composes with
    the batch dedup_exact pass that runs at compaction/training time.
    Returns the started StreamingQuery.
    """
    from pyspark.sql import functions as F

    from newsleak_spark.analysis import tokens_col

    stream = (
        spark.readStream.schema(schema or TRANSCRIPT_SCHEMA)
        .format("parquet")
        .load(input_dir)
    )
    deduped = (
        stream.withColumn("_ts", F.col("ts").cast("timestamp"))
        .withColumn("fp", F.md5(F.array_join(tokens_col(F.col("text")), " ")))
        .withWatermark("_ts", watermark)
        .dropDuplicatesWithinWatermark(["fp"])
        .drop("_ts")
    )
    writer = (
        deduped.writeStream.format("parquet")
        .option("path", output_dir)
        .option("checkpointLocation", checkpoint_dir)
        .outputMode("append")
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()
