"""Index-format round-trip + property tests (SURVEY §5.2 item 4)."""

import numpy as np
from hypothesis import given, settings
from hypothesis import strategies as st

from newsleak_spark.codec import (
    decode_positions,
    delta_decode,
    delta_encode,
    encode_positions,
    varint_decode,
    varint_encode,
)


def test_varint_empty():
    assert varint_encode(np.array([], dtype=np.uint64)) == b""
    assert varint_decode(b"").size == 0


def test_varint_known_values():
    # 0 -> 00; 127 -> 7f; 128 -> 80 01; 300 -> ac 02
    assert varint_encode(np.array([0], dtype=np.uint64)) == b"\x00"
    assert varint_encode(np.array([127], dtype=np.uint64)) == b"\x7f"
    assert varint_encode(np.array([128], dtype=np.uint64)) == b"\x80\x01"
    assert varint_encode(np.array([300], dtype=np.uint64)) == b"\xac\x02"


@settings(max_examples=200, deadline=None)
@given(st.lists(st.integers(min_value=0, max_value=2**63 - 1), max_size=500))
def test_varint_roundtrip(vals):
    a = np.array(vals, dtype=np.uint64)
    assert np.array_equal(varint_decode(varint_encode(a)), a)


@settings(max_examples=100, deadline=None)
@given(st.sets(st.integers(min_value=0, max_value=2**62), max_size=400))
def test_delta_roundtrip(ids):
    a = np.array(sorted(ids), dtype=np.uint64)
    assert np.array_equal(delta_decode(delta_encode(a)), a)


def test_delta_compresses_dense_ids():
    dense = np.arange(10_000, dtype=np.uint64) + 5_000_000
    raw = dense.nbytes
    enc = len(delta_encode(dense))
    assert enc < raw / 5  # gaps of 1 → 1 byte each (plus the base)


def test_positions_roundtrip():
    lists = [
        np.array([0, 3, 9], dtype=np.uint64),
        np.array([], dtype=np.uint64),
        np.array([7], dtype=np.uint64),
        np.array([1, 2, 3, 100], dtype=np.uint64),
    ]
    c, f = encode_positions(lists)
    out = decode_positions(c, f)
    assert len(out) == len(lists)
    for a, b in zip(lists, out):
        assert np.array_equal(a, b)


def test_positions_all_empty():
    c, f = encode_positions([np.array([], dtype=np.uint64)] * 3)
    out = decode_positions(c, f)
    assert len(out) == 3 and all(p.size == 0 for p in out)
