"""Resumability: kill between stages → resume reuses committed stages
and produces identical query results (SURVEY §5.2.5, north_rule)."""

import json
import os
import shutil

import pytest

from newsleak_spark.indexing import IndexConfig, build_index
from newsleak_spark.query import QuerySpec
from newsleak_spark.query.engine import search

CFG = IndexConfig(n_shards=2, n_term_buckets=2, block_size=32)
SPEC = QuerySpec(terms=("merge", "window"), k=10)


def _mtimes(d):
    out = {}
    for root, _, files in os.walk(d):
        for f in files:
            p = os.path.join(root, f)
            out[p] = os.path.getmtime(p)
    return out


@pytest.fixture()
def idx(spark, transcripts, tmp_path):
    d = str(tmp_path / "idx")
    build_index(spark, transcripts, d, CFG)
    yield d
    shutil.rmtree(d, ignore_errors=True)


def test_full_resume_is_noop(spark, transcripts, idx):
    before = _mtimes(os.path.join(idx, "segments"))
    build_index(spark, transcripts, idx, CFG, resume=True)
    assert _mtimes(os.path.join(idx, "segments")) == before


def test_partial_resume_rebuilds_only_missing_stage(spark, transcripts, idx):
    baseline = [(r.doc_id, r.score_e6) for r in search(spark, idx, SPEC).collect()]

    # simulate a crash after the dictionary stage: segments uncommitted
    man_path = os.path.join(idx, "manifest.json")
    with open(man_path) as f:
        man = json.load(f)
    del man["stages"]["segments"]
    with open(man_path, "w") as f:
        json.dump(man, f)
    shutil.rmtree(os.path.join(idx, "segments"))

    tok_before = _mtimes(os.path.join(idx, "tokenized"))
    build_index(spark, transcripts, idx, CFG, resume=True)
    # earlier stages untouched, segments rebuilt
    assert _mtimes(os.path.join(idx, "tokenized")) == tok_before
    assert os.path.isdir(os.path.join(idx, "segments"))

    after = [(r.doc_id, r.score_e6) for r in search(spark, idx, SPEC).collect()]
    assert after == baseline


def test_config_change_guard(spark, transcripts, idx):
    other = IndexConfig(n_shards=4, n_term_buckets=2, block_size=32)
    with pytest.raises(ValueError, match="different config"):
        build_index(spark, transcripts, idx, other, resume=True)


def test_rebuild_with_resume_false(spark, transcripts, idx):
    other = IndexConfig(n_shards=4, n_term_buckets=4, block_size=8)
    build_index(spark, transcripts, idx, other, resume=False)
    got = [(r.doc_id, r.score_e6) for r in search(spark, idx, SPEC).collect()]
    assert len(got) > 0
