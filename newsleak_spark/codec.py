"""Posting-list block codec: delta + varint, vectorized in numpy.

The role Lucene's FOR/PForDelta codecs play (SURVEY §4.2 "Compression")
— sorted doc_ids are delta-encoded then LEB128-varint packed; tf / dl /
position payloads are varint packed raw. Both encode and decode are
O(bytes) numpy array programs (no per-value Python loops; the encode
loop is over the ≤10 byte positions of a varint, not over values), so
they run at Arrow-batch speed inside mapInPandas/applyInPandas.

Format invariants (tested by round-trip + property tests):
  - varint: little-endian 7-bit groups, MSB=1 ⇒ continuation
  - delta stream: first value absolute, then strictly-positive gaps
    (doc_ids within a block are unique and sorted)
"""

from __future__ import annotations

import numpy as np

U64 = np.uint64
_SEVEN = U64(7)
_MASK = U64(0x7F)


def varint_encode_with_offsets(values: np.ndarray) -> tuple[bytes, np.ndarray]:
    """Encode and also return the byte offset of each value (length
    n+1), so callers can slice contiguous value ranges out of the
    encoded stream without re-encoding (vectorized block layout)."""
    v = np.ascontiguousarray(values, dtype=np.uint64)
    if v.size == 0:
        return b"", np.zeros(1, dtype=np.int64)
    # bytes per value = number of 7-bit groups
    nb = np.ones(v.shape, dtype=np.int64)
    tmp = v >> _SEVEN
    while tmp.any():
        nb += tmp > 0
        tmp >>= _SEVEN
    offsets = np.concatenate(([0], np.cumsum(nb)))
    buf = np.zeros(offsets[-1], dtype=np.uint8)
    rem = v.copy()
    for j in range(int(nb.max())):
        mask = nb > j
        idx = offsets[:-1][mask] + j
        byte = (rem[mask] & _MASK).astype(np.uint8)
        cont = ((nb[mask] > j + 1).astype(np.uint8)) << 7
        buf[idx] = byte | cont
        rem >>= _SEVEN
    return buf.tobytes(), offsets


def varint_encode(values: np.ndarray) -> bytes:
    return varint_encode_with_offsets(values)[0]


def varint_decode(buf: bytes) -> np.ndarray:
    # The decode is memory-bandwidth-bound (it touches every posting
    # byte), so temporaries are kept narrow: the within-group byte
    # position fits int32 (a blob is < 2 GiB) and the shift amount fits
    # uint8 (≤ 63), which cuts temp traffic ~3x vs doing the same index
    # math in int64 — measured 2-2.6x faster end-to-end, and the smaller
    # footprint is what lets concurrent executors on one host share the
    # memory bus (tools/query_scaling.py's membw ceiling).
    b = np.frombuffer(buf, dtype=np.uint8)
    if b.size == 0:
        return np.empty(0, dtype=np.uint64)
    ends = np.flatnonzero((b & 0x80) == 0)
    starts = np.concatenate(([0], ends[:-1] + 1))
    lengths = (ends - starts + 1).astype(np.int32)
    shift = (
        np.arange(b.size, dtype=np.int32) - np.repeat(starts.astype(np.int32), lengths)
    ).astype(np.uint8)
    shift *= 7
    contrib = (b & 0x7F).astype(np.uint64)
    contrib <<= shift
    return np.add.reduceat(contrib, starts)


def delta_encode(sorted_ids: np.ndarray) -> bytes:
    """Sorted unique uint64 ids → absolute first value + gaps, varint."""
    a = np.ascontiguousarray(sorted_ids, dtype=np.uint64)
    if a.size == 0:
        return b""
    deltas = np.empty_like(a)
    deltas[0] = a[0]
    np.subtract(a[1:], a[:-1], out=deltas[1:])
    return varint_encode(deltas)


def delta_decode(buf: bytes) -> np.ndarray:
    deltas = varint_decode(buf)
    if deltas.size == 0:
        return deltas
    return np.cumsum(deltas, dtype=np.uint64)


def encode_positions(pos_lists: list[np.ndarray]) -> tuple[bytes, bytes]:
    """Per-posting position arrays → (varint counts, varint delta-
    within-posting flat stream). Kept in SEPARATE columns so term-only
    queries never read them (SURVEY §7.5.5)."""
    counts = np.fromiter((len(p) for p in pos_lists), dtype=np.uint64, count=len(pos_lists))
    if counts.sum() == 0:
        return varint_encode(counts), b""
    flat = []
    for p in pos_lists:
        a = np.asarray(p, dtype=np.uint64)
        if a.size:
            d = np.empty_like(a)
            d[0] = a[0]
            np.subtract(a[1:], a[:-1], out=d[1:])
            flat.append(d)
    return varint_encode(counts), varint_encode(np.concatenate(flat))


def decode_positions_flat(counts_buf: bytes, flat_buf: bytes) -> tuple[np.ndarray, np.ndarray]:
    """Vectorized decode to ragged form: (counts per posting, flat
    ABSOLUTE positions). Per-posting delta streams are reconstructed
    with one cumsum + a per-group base subtraction — no per-posting
    Python loop (the query-path representation; ``decode_positions``
    below materializes lists for tests/round-trips)."""
    # .view, not .astype: decoded values are < 2^63 so the reinterpret
    # is exact, and it skips a full-array copy in a bandwidth-bound path
    counts = varint_decode(counts_buf).view(np.int64)
    flat = varint_decode(flat_buf).view(np.int64)
    if flat.size == 0:
        return counts, flat
    starts = np.concatenate(([0], np.cumsum(counts)))[:-1]
    nz = counts > 0
    c = np.cumsum(flat)
    base = np.zeros(counts.shape, dtype=np.int64)
    base[nz] = c[starts[nz]] - flat[starts[nz]]
    return counts, c - np.repeat(base, counts)


def gather_ragged(
    counts: np.ndarray, flat: np.ndarray, idx: np.ndarray
) -> tuple[np.ndarray, np.ndarray]:
    """Select postings ``idx`` (any order) from a ragged (counts, flat)
    pair — a vectorized fancy-index for ragged arrays."""
    starts = np.concatenate(([0], np.cumsum(counts)))[:-1]
    sel_counts = counts[idx]
    total = int(sel_counts.sum())
    if total == 0:
        return sel_counts, np.empty(0, dtype=flat.dtype)
    new_starts = np.concatenate(([0], np.cumsum(sel_counts)))[:-1]
    gather = np.repeat(starts[idx], sel_counts) + (
        np.arange(total, dtype=np.int64) - np.repeat(new_starts, sel_counts)
    )
    return sel_counts, flat[gather]


def decode_positions(counts_buf: bytes, flat_buf: bytes) -> list[np.ndarray]:
    counts = varint_decode(counts_buf).astype(np.int64)
    flat = varint_decode(flat_buf)
    out: list[np.ndarray] = []
    off = 0
    for c in counts:
        if c == 0:
            out.append(np.empty(0, dtype=np.uint64))
        else:
            seg = flat[off : off + c]
            out.append(np.cumsum(seg, dtype=np.uint64))
            off += c
    return out
