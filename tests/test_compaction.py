"""Delta compaction: base + deltas folded into ONE index (no
re-tokenization — the per-part postings checkpoints are merged and the
build pipeline resumes from the dictionary stage) must equal a
from-scratch build of the full collection: same manifest stats, same
rank/score results on every query class, and further appends onto the
compacted dir keep working."""

import os
import shutil

import pytest
from pyspark.sql import functions as F

from newsleak_spark.indexing import (
    IndexConfig,
    append_index,
    build_index,
    compact_index,
    list_deltas,
)
from newsleak_spark.indexing.manifest import Manifest
from newsleak_spark.query import QuerySpec
from newsleak_spark.query.engine import IndexReader, search

CFG = IndexConfig(n_shards=4, n_term_buckets=4, block_size=16, hot_df_ratio=0.3, n_salts=4)

SPECS = [
    QuerySpec(terms=("spark",), k=15),
    QuerySpec(terms=("merge", "window"), k=15),
    QuerySpec(phrases=(("fast", "table"),), k=15),
    QuerySpec(terms=(), boost_terms=("merge", "window"), k=15),  # BMW union path
    QuerySpec(terms=("table",), role_filter=("user",), k=15),
]


def _results(spark, d, spec):
    return [(r["doc_id"], r["score_e6"]) for r in search(spark, d, spec).collect()]


@pytest.fixture(scope="module")
def dirs(spark, transcripts, tmp_path_factory):
    root = tmp_path_factory.mktemp("compact")
    full_dir = str(root / "full")
    inc_dir = str(root / "inc")
    part_a = transcripts.filter(F.col("doc_id") % 3 == 1)
    part_b = transcripts.filter(F.col("doc_id") % 3 == 2)
    part_c = transcripts.filter(F.col("doc_id") % 3 == 0)
    build_index(spark, transcripts, full_dir, CFG, resume=False)
    build_index(spark, part_a, inc_dir, CFG, resume=False)
    append_index(spark, part_b, inc_dir, CFG)
    append_index(spark, part_c, inc_dir, CFG)
    comp_dir = str(root / "inc_compacted")
    compact_index(spark, inc_dir, comp_dir)
    yield full_dir, inc_dir, comp_dir
    shutil.rmtree(root, ignore_errors=True)


def test_compacted_is_single_part(spark, dirs):
    _, _, comp_dir = dirs
    assert list_deltas(comp_dir) == []
    rd = IndexReader(spark, comp_dir)
    assert not rd.multi


def test_compacted_stats_equal_full(spark, dirs):
    full_dir, _, comp_dir = dirs
    fs, cs = Manifest(full_dir).stats, Manifest(comp_dir).stats
    for key in ("n_docs", "sum_dl", "n_postings", "n_terms"):
        assert cs[key] == fs[key], key


def test_compacted_results_equal_full(spark, dirs):
    full_dir, _, comp_dir = dirs
    for spec in SPECS:
        assert _results(spark, comp_dir, spec) == _results(spark, full_dir, spec), spec


def test_compaction_never_reads_text(spark, dirs):
    """No tokenized checkpoint exists in the compacted dir — proof the
    analyze stage was skipped, the whole point of postings-level merge."""
    _, _, comp_dir = dirs
    assert not os.path.exists(os.path.join(comp_dir, "tokenized"))
    assert Manifest(comp_dir).stages["tokenized"]["extra"].get("compacted") is True


def test_compaction_idempotent(spark, dirs):
    """Re-running compaction over the same parts is a manifest-gated
    no-op (all stages committed)."""
    _, inc_dir, comp_dir = dirs
    before = Manifest(comp_dir).stats
    compact_index(spark, inc_dir)
    assert Manifest(comp_dir).stats == before


def test_compaction_resumes_from_docmeta_only_crash_state(
    spark, dirs, tmp_path_factory
):
    """Crash-window resume: a target whose manifest holds ONLY the
    docmeta stage (the state a crash between stage commits could leave
    — incl. indexes written by the old docmeta-before-tokenized commit
    order) must resume cleanly: the satisfied-by-compaction tokenized
    record is re-committed and the remaining stages run, instead of
    build re-entering stage 1 with transcripts=None and failing."""
    import json

    full_dir, inc_dir, comp_dir = dirs
    crash = str(tmp_path_factory.mktemp("crash") / "idx")
    compact_index(spark, inc_dir, crash)
    # strip the manifest back to the crash state: config+stats+docmeta
    # committed, everything later (incl. 'tokenized') absent, and the
    # later stages' output dirs gone
    man_path = os.path.join(crash, "manifest.json")
    with open(man_path) as f:
        data = json.load(f)
    data["stages"] = {"docmeta": data["stages"]["docmeta"]}
    with open(man_path, "w") as f:
        json.dump(data, f)
    for sub in ("postings", "dictionary", "segments"):
        shutil.rmtree(os.path.join(crash, sub), ignore_errors=True)

    compact_index(spark, inc_dir, crash)  # resume, not crash
    assert Manifest(crash).stage_done(
        "tokenized", Manifest(crash).config["_hash"]
    )
    for spec in SPECS:
        assert _results(spark, crash, spec) == _results(spark, full_dir, spec), spec


def test_append_after_compaction(spark, transcripts, dirs, tmp_path_factory):
    """The compacted dir is a normal base: a further delta appends and
    queries stay rank-identical to a from-scratch build of the grown
    collection."""
    _, _, comp_dir = dirs
    extra = transcripts.filter(F.col("doc_id") < 30).withColumn(
        "doc_id", F.col("doc_id") + 1_000_000
    )
    append_index(spark, extra, comp_dir, CFG)
    assert len(list_deltas(comp_dir)) == 1

    grown_dir = str(tmp_path_factory.mktemp("grown") / "full")
    build_index(spark, transcripts.unionByName(extra), grown_dir, CFG, resume=False)
    for spec in SPECS:
        assert _results(spark, comp_dir, spec) == _results(spark, grown_dir, spec), spec


def test_second_generation_compaction(spark, transcripts, dirs, tmp_path_factory):
    """Compaction composes: a compacted dir that has since accepted a
    delta compacts again (its own postings checkpoint + the delta's),
    still matching a from-scratch build — the steady-state maintenance
    loop (ingest deltas → compact → ingest → compact ...)."""
    _, _, comp_dir = dirs
    # dirs' last test appended a shifted delta onto comp_dir
    extra = transcripts.filter(F.col("doc_id") < 30).withColumn(
        "doc_id", F.col("doc_id") + 1_000_000
    )
    if not list_deltas(comp_dir):
        append_index(spark, extra, comp_dir, CFG)
    gen2 = str(tmp_path_factory.mktemp("gen2") / "idx")
    compact_index(spark, comp_dir, gen2)
    assert list_deltas(gen2) == []

    grown = str(tmp_path_factory.mktemp("grown2") / "full")
    build_index(spark, transcripts.unionByName(extra), grown, CFG, resume=False)
    for spec in SPECS:
        assert _results(spark, gen2, spec) == _results(spark, grown, spec), spec
