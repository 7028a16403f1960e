"""Multimodal plumbing: binary column schema, Arrow batch decode path,
frame sampling arithmetic. The decode is a deterministic stub (no codec
libs in this env) — the test pins the stub against a pure-Python oracle
so the mapInPandas plumbing (batching, column transport, schema) is
what's actually under test."""

import hashlib

import pytest
from pyspark.sql import types as T

from newsleak_spark import multimodal
from tests.conftest import SF_SMOKE


def test_media_schema_and_determinism(spark):
    m = multimodal.media_table(spark, SF_SMOKE)
    sch = {f.name: f.dataType for f in m.schema.fields}
    assert isinstance(sch["blob"], T.BinaryType)
    assert isinstance(sch["media_type"], T.StringType)
    rows = {r["doc_id"]: r for r in m.filter("doc_id < 6").collect()}
    docs = {
        r["doc_id"]: r["text"]
        for r in spark.read.parquet(f"{SF_SMOKE}/documents.parquet").filter("doc_id < 6").collect()
    }
    for did, r in rows.items():
        assert r["blob"] == hashlib.md5(docs[did].encode()).digest()
        assert r["media_type"] == ["image", "audio", "video"][did % 3]


def test_decode_features_matches_python_oracle(spark):
    out = {
        r["doc_id"]: r
        for r in multimodal.mm_decode_features(spark, SF_SMOKE).filter("doc_id < 20").collect()
    }
    docs = spark.read.parquet(f"{SF_SMOKE}/documents.parquet").filter("doc_id < 20").collect()
    assert len(out) == len(docs)
    for d in docs:
        blob = hashlib.md5(d["text"].encode()).digest()
        x = 0
        for b in blob:
            x ^= b
        r = out[d["doc_id"]]
        assert (r["n_bytes"], r["feat0"], r["feat1"]) == (16, blob[0], x)


def test_decode_stub_rejects_unknown_type():
    with pytest.raises(NotImplementedError):
        multimodal._decode_stub(b"\x00", "hologram")


def test_frame_sample_stride(spark):
    rows = multimodal.mm_frame_sample(spark, SF_SMOKE).collect()
    by_doc: dict[int, list[int]] = {}
    for r in rows:
        by_doc.setdefault(r["doc_id"], []).append(r["frame_idx"])
    assert by_doc  # sf0.001 has video rows (doc_id % 3 == 2)
    for did, idxs in by_doc.items():
        n_frames = did % 100 + 1
        assert idxs == list(range(0, n_frames, multimodal.FRAME_STRIDE))
