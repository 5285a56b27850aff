"""Vectorized variable-length bitfield concatenation.

Entropy encoders emit per-sample (value, bit-length) pairs; packing
them serially in Python is ~100 µs/sample. This builds the whole
bitstream with O(max_len) vectorized passes instead.
"""

from __future__ import annotations

import numpy as np


def concat_bitfields(values: np.ndarray, lengths: np.ndarray) -> bytes:
    """MSB-first concatenation of variable-width fields.

    values: (N,) unsigned ints (only the low `lengths[i]` bits used).
    lengths: (N,) ints >= 0.
    Returns the packed bytes (zero-padded to a byte boundary).
    """
    values = np.asarray(values, dtype=np.uint64)
    lengths = np.asarray(lengths, dtype=np.int64)
    total = int(lengths.sum())
    if total == 0:
        return b""
    out = np.zeros(total, np.uint8)
    ends = np.cumsum(lengths)
    starts = ends - lengths
    for b in range(int(lengths.max())):
        sel = lengths > b
        pos = starts[sel] + b
        shift = (lengths[sel] - 1 - b).astype(np.uint64)
        out[pos] = ((values[sel] >> shift) & 1).astype(np.uint8)
    return np.packbits(out).tobytes()


def interleave_code_and_raw(codes, code_lens, raws, raw_lens) -> bytes:
    """Per sample emit (huffman code, then raw bits): the universal
    entropy-coding layout. All arrays (N,)."""
    n = len(codes)
    values = np.empty(2 * n, np.uint64)
    lengths = np.empty(2 * n, np.int64)
    values[0::2] = np.asarray(codes, np.uint64)
    values[1::2] = np.asarray(raws, np.uint64)
    lengths[0::2] = np.asarray(code_lens, np.int64)
    lengths[1::2] = np.asarray(raw_lens, np.int64)
    return concat_bitfields(values, lengths)


def category_of(diffs: np.ndarray) -> np.ndarray:
    """JPEG difference category: bit length of |diff| (exact for
    |diff| < 2^53 via frexp)."""
    mag = np.abs(diffs.astype(np.int64))
    return np.frexp(mag.astype(np.float64))[1].astype(np.int64)


def raw_bits_of(diffs: np.ndarray, cats: np.ndarray) -> np.ndarray:
    """The category-coded magnitude: d >= 0 → d, else d + 2^cat - 1."""
    d = diffs.astype(np.int64)
    return np.where(d >= 0, d, d + (np.int64(1) << cats) - 1).astype(
        np.uint64
    )
