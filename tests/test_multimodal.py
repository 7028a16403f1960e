"""Multimodal media path: REAL uncompressed containers (WAV PCM16 /
PPM P6 / YUV4MPEG2 C444) built per Arrow batch and REALLY parsed back
by decode_features. Independent validation: the WAV blobs are read by
the stdlib ``wave`` module (a parser we didn't write), the PPM/Y4M
headers are checked against the format specs by hand, and the decoded
features are compared to expectations derived directly from the
md5-tiling construction — so encoder and decoder cannot share a bug
invisibly."""

import hashlib
import io
import struct
import wave

import numpy as np
import pytest
from pyspark.sql import types as T

from newsleak_spark import multimodal
from tests.conftest import SF_SMOKE


def _docs(spark, n=12):
    return {
        r["doc_id"]: r["text"]
        for r in spark.read.parquet(f"{SF_SMOKE}/documents.parquet")
        .filter(f"doc_id < {n}")
        .collect()
    }


def _blobs(spark, n=12):
    return {
        r["doc_id"]: (r["media_type"], bytes(r["blob"]), r["n_frames"])
        for r in multimodal.media_table(spark, SF_SMOKE)
        .filter(f"doc_id < {n}")
        .collect()
    }


def test_media_schema_and_container_validity(spark):
    m = multimodal.media_table(spark, SF_SMOKE)
    sch = {f.name: f.dataType for f in m.schema.fields}
    assert isinstance(sch["blob"], T.BinaryType)
    assert isinstance(sch["media_type"], T.StringType)
    docs = _docs(spark)
    for did, (mt, blob, nf) in _blobs(spark).items():
        md5b = hashlib.md5(docs[did].encode()).digest()
        assert mt == ["image", "audio", "video"][did % 3]
        if mt == "audio":
            # independent parser: stdlib wave must accept our RIFF
            with wave.open(io.BytesIO(blob)) as w:
                n_samp = 8 + (did % 5) * 4
                assert w.getnchannels() == 1
                assert w.getsampwidth() == 2
                assert w.getframerate() == multimodal.WAV_RATE
                assert w.getnframes() == n_samp
                data = w.readframes(n_samp)
            assert data == (md5b * (2 * n_samp // 16 + 1))[: 2 * n_samp]
        elif mt == "image":
            w_, h_ = 2 + did % 8, 2 + did % 7
            header = f"P6\n{w_} {h_}\n255\n".encode()
            assert blob.startswith(header)
            assert len(blob) == len(header) + 3 * w_ * h_
            assert blob[len(header):] == (md5b * (3 * w_ * h_ // 16 + 1))[: 3 * w_ * h_]
        else:
            assert blob.startswith(b"YUV4MPEG2 W2 H2 F25:1 C444\n")
            assert len(blob) == 27 + 18 * nf
            assert blob[27:33] == b"FRAME\n"


def test_decode_features_matches_construction(spark):
    """Features must equal what the md5-tiling construction predicts —
    computed here independently of both encoder and decoder."""
    docs = _docs(spark, 20)
    out = {
        r["doc_id"]: r
        for r in multimodal.mm_decode_features(spark, SF_SMOKE)
        .filter("doc_id < 20")
        .collect()
    }
    assert len(out) == len(docs)
    for did, text in docs.items():
        md5b = hashlib.md5(text.encode()).digest()
        r = out[did]
        mt = ["image", "audio", "video"][did % 3]
        assert r["media_type"] == mt
        if mt == "audio":
            n_samp = 8 + (did % 5) * 4
            payload = (md5b * (2 * n_samp // 16 + 1))[: 2 * n_samp]
            samples = np.frombuffer(payload, dtype="<i2").astype(np.int64)
            assert (r["n_bytes"], r["n_units"]) == (44 + 2 * n_samp, n_samp)
            assert (r["feat_sum"], r["feat_max"]) == (samples.sum(), samples.max())
        elif mt == "image":
            w_, h_ = 2 + did % 8, 2 + did % 7
            payload = (md5b * (3 * w_ * h_ // 16 + 1))[: 3 * w_ * h_]
            assert (r["n_bytes"], r["n_units"]) == (11 + 3 * w_ * h_, w_ * h_)
            assert (r["feat_sum"], r["feat_max"]) == (sum(payload), max(payload))
        else:
            nf = did % 100 + 1
            payload = (md5b * (12 * nf // 16 + 1))[: 12 * nf]
            assert (r["n_bytes"], r["n_units"]) == (27 + 18 * nf, nf)
            assert (r["feat_sum"], r["feat_max"]) == (sum(payload), max(payload))


def test_decoders_reject_corrupt_containers():
    wavb = multimodal._encode_wav(b"\x01\x02" * 8)
    ppmb = multimodal._encode_ppm(2, 2, bytes(range(12)))
    y4mb = multimodal._encode_y4m(2, 2, [bytes(range(12))])
    # flipping the magic must fail parsing, not mis-decode
    with pytest.raises(ValueError):
        multimodal.decode_wav(b"RIFX" + wavb[4:])
    with pytest.raises(ValueError):
        multimodal.decode_wav(wavb[:-2])  # truncated data chunk
    with pytest.raises(ValueError):
        multimodal.decode_ppm(b"P5" + ppmb[2:])
    with pytest.raises(ValueError):
        multimodal.decode_ppm(ppmb + b"\x00")  # raster size mismatch
    with pytest.raises(ValueError):
        multimodal.decode_y4m(y4mb.replace(b"FRAME", b"FRAMX"))
    with pytest.raises(ValueError):
        multimodal.decode_y4m(y4mb.replace(b"C444", b"C420"))


def test_decode_round_trips_each_encoder():
    samples = np.arange(-5, 11, dtype="<i2")
    got = multimodal.decode_wav(multimodal._encode_wav(samples.tobytes()))
    assert list(got) == list(range(-5, 11))
    w, h, pix = multimodal.decode_ppm(multimodal._encode_ppm(3, 2, bytes(range(18))))
    assert (w, h) == (3, 2) and list(pix) == list(range(18))
    fw, fh, frames = multimodal.decode_y4m(
        multimodal._encode_y4m(2, 2, [bytes(range(12)), bytes(range(12, 24))])
    )
    assert (fw, fh) == (2, 2) and len(frames) == 2
    assert list(frames[1]) == list(range(12, 24))


def test_codec_round_trip_property():
    """Property sweep (no Spark): arbitrary payloads round-trip every
    codec — encoder and decoder agree on all sizes/dims the media
    table can produce, and WAV survives an independent stdlib parse."""
    from hypothesis import given, settings
    from hypothesis import strategies as st

    @settings(max_examples=40, deadline=None)
    @given(st.binary(min_size=2, max_size=96).filter(lambda b: len(b) % 2 == 0))
    def wav_rt(data):
        blob = multimodal._encode_wav(data)
        assert multimodal.decode_wav(blob).tobytes() == np.frombuffer(
            data, dtype="<i2"
        ).astype(np.int64).tobytes()
        with wave.open(io.BytesIO(blob)) as w:
            assert w.readframes(w.getnframes()) == data

    @settings(max_examples=40, deadline=None)
    @given(st.integers(1, 9), st.integers(1, 9), st.data())
    def ppm_rt(w, h, data):
        pix = data.draw(st.binary(min_size=3 * w * h, max_size=3 * w * h))
        got_w, got_h, got = multimodal.decode_ppm(multimodal._encode_ppm(w, h, pix))
        assert (got_w, got_h) == (w, h) and bytes(got.astype(np.uint8)) == pix

    @settings(max_examples=20, deadline=None)
    @given(st.integers(1, 8), st.data())
    def y4m_rt(nf, data):
        frames = [
            data.draw(st.binary(min_size=12, max_size=12)) for _ in range(nf)
        ]
        got_w, got_h, got = multimodal.decode_y4m(
            multimodal._encode_y4m(2, 2, frames)
        )
        assert (got_w, got_h) == (2, 2)
        assert [bytes(f.astype(np.uint8)) for f in got] == frames

    wav_rt()
    ppm_rt()
    y4m_rt()


def test_decode_rejects_unknown_type():
    with pytest.raises(NotImplementedError):
        multimodal._decode(b"\x00", "hologram")


def test_frame_sample_stride(spark):
    rows = multimodal.mm_frame_sample(spark, SF_SMOKE).collect()
    by_doc: dict[int, list[int]] = {}
    for r in rows:
        by_doc.setdefault(r["doc_id"], []).append(r["frame_idx"])
    assert by_doc  # sf0.001 has video rows (doc_id % 3 == 2)
    for did, idxs in by_doc.items():
        n_frames = did % 100 + 1
        assert idxs == list(range(0, n_frames, multimodal.FRAME_STRIDE))
