"""Structured Streaming ingest: parquet drops → index deltas, with
exactly-once across re-runs and query parity vs a full batch build."""

import shutil

import pytest
from pyspark.sql import functions as F

from newsleak_spark import streaming
from newsleak_spark.indexing import IndexConfig, build_index, list_deltas
from newsleak_spark.query import QuerySpec
from newsleak_spark.query.engine import search

CFG = IndexConfig(n_shards=2, n_term_buckets=4, block_size=16)
SPEC = QuerySpec(terms=("merge", "window"), k=15)


@pytest.fixture(scope="module")
def dirs(spark, transcripts, tmp_path_factory):
    root = tmp_path_factory.mktemp("stream")
    land = str(root / "landing")
    idx = str(root / "idx")
    ckpt = str(root / "ckpt")
    full = str(root / "full")
    build_index(spark, transcripts, full, CFG, resume=False)
    yield land, idx, ckpt, full, root
    shutil.rmtree(root, ignore_errors=True)


def _drain(spark, land, idx, ckpt):
    q = streaming.ingest_stream(spark, land, idx, ckpt, CFG, available_now=True)
    q.awaitTermination(120)


def test_stream_ingest_two_drops_then_parity(spark, transcripts, dirs):
    land, idx, ckpt, full, _ = dirs
    # drop 1 → base index
    transcripts.filter(F.col("doc_id") % 2 == 0).coalesce(1).write.mode("append").parquet(land)
    _drain(spark, land, idx, ckpt)
    assert list_deltas(idx) == []
    n1 = [(r["doc_id"], r["score_e6"]) for r in search(spark, idx, SPEC).collect()]
    assert n1  # base alone answers queries

    # drop 2 → delta append
    transcripts.filter(F.col("doc_id") % 2 == 1).coalesce(1).write.mode("append").parquet(land)
    _drain(spark, land, idx, ckpt)
    assert list_deltas(idx) == ["delta_b00000001"]

    want = [(r["doc_id"], r["score_e6"]) for r in search(spark, full, SPEC).collect()]
    got = [(r["doc_id"], r["score_e6"]) for r in search(spark, idx, SPEC).collect()]
    assert got == want


def test_stream_rerun_is_noop(spark, dirs):
    land, idx, ckpt, _full, _ = dirs
    before = list_deltas(idx)
    _drain(spark, land, idx, ckpt)  # no new files → no new deltas
    assert list_deltas(idx) == before
    assert len(streaming._seen_batches(idx)) == 2


def test_stream_compact_then_repoint(spark, transcripts, dirs, tmp_path_factory):
    """Operational maintenance loop: compact the streamed base+delta
    tree, repoint the stream at the compacted dir (same source
    checkpoint), drop more files — the carried batch ledger prevents
    duplicate re-indexing, the new drop appends as a delta, and
    queries stay rank-identical to a from-scratch build of everything."""
    from newsleak_spark.indexing import compact_index

    land, idx, ckpt, _full, root = dirs
    comp = str(root / "idx_compacted")
    compact_index(spark, idx, comp)
    assert list_deltas(comp) == []

    # third drop: disjoint doc ids
    extra = transcripts.filter(F.col("doc_id") < 20).withColumn(
        "doc_id", F.col("doc_id") + 1_000_000
    )
    extra.coalesce(1).write.mode("append").parquet(land)
    q = streaming.ingest_stream(spark, land, comp, ckpt, CFG, available_now=True)
    q.awaitTermination(120)
    # only the NEW batch landed (ledger carried batches 0-1)
    assert list_deltas(comp) == ["delta_b00000002"]

    grown = str(tmp_path_factory.mktemp("grown") / "full")
    build_index(spark, transcripts.unionByName(extra), grown, CFG, resume=False)
    want = [(r["doc_id"], r["score_e6"]) for r in search(spark, grown, SPEC).collect()]
    got = [(r["doc_id"], r["score_e6"]) for r in search(spark, comp, SPEC).collect()]
    assert got == want


def test_dedup_stream_first_seen_wins(spark, transcripts, tmp_path_factory):
    """Streaming exact dedup: duplicates arriving in later drops are
    dropped by keyed state; the sink holds one row per content
    fingerprint (first-seen), matching the batch dedup_exact notion of
    duplicate (same analyzed-token join)."""
    root = tmp_path_factory.mktemp("streamdedup")
    land, out, ckpt = str(root / "land"), str(root / "out"), str(root / "ckpt")

    base = transcripts.filter(F.col("doc_id") < 40)
    base.coalesce(1).write.mode("append").parquet(land)
    q = streaming.dedup_stream(spark, land, out, ckpt)
    q.awaitTermination(120)

    # second drop: 10 exact duplicates (same text, new doc ids) + 5 new
    dups = base.filter(F.col("doc_id") < 10).withColumn(
        "doc_id", F.col("doc_id") + 1_000_000
    )
    new = transcripts.filter((F.col("doc_id") >= 40) & (F.col("doc_id") < 45))
    dups.unionByName(new).coalesce(1).write.mode("append").parquet(land)
    q = streaming.dedup_stream(spark, land, out, ckpt)
    q.awaitTermination(120)

    got = spark.read.parquet(out)
    # every surviving row is a distinct fingerprint
    assert got.count() == got.select("fp").distinct().count()
    # the 10 re-texted duplicates were dropped: no doc_id >= 1_000_000
    assert got.filter(F.col("doc_id") >= 1_000_000).count() == 0
    # the 5 genuinely new docs landed
    assert got.filter((F.col("doc_id") >= 40) & (F.col("doc_id") < 45)).count() > 0
