"""SmallFloat int<->byte4 length-norm encoding, bit-identical to the reference.

Behavioral reference: solr-8.4.0/lucene/core/src/java/org/apache/lucene/util/
SmallFloat.java:113-181 (longToInt4 / int4ToLong / intToByte4 / byte4ToInt).
Re-implemented from scratch in numpy; verified by round-trip property tests
against the documented semantics (values < NUM_FREE_VALUES exact, 4-bit
mantissa bucketing above, ordering preserved).

BM25's per-document length statistic ("norm") is ``intToByte4(numTerms)``
(BM25Similarity.java:128-139); rank-identity with the reference requires this
exact encoding, so this module is the single source of truth for it.
"""

from __future__ import annotations

import numpy as np

__all__ = [
    "long_to_int4",
    "int4_to_long",
    "int_to_byte4",
    "byte4_to_int",
    "NUM_FREE_VALUES",
    "BYTE4_DECODE_TABLE",
]


def _long_to_int4_scalar(i: int) -> int:
    if i < 0:
        raise ValueError(f"only supports positive values, got {i}")
    num_bits = i.bit_length()
    if num_bits < 4:
        return i
    shift = num_bits - 4
    encoded = (i >> shift) & 0x07  # drop the implicit leading 1 bit
    return encoded | ((shift + 1) << 3)


def _int4_to_long_scalar(i: int) -> int:
    bits = i & 0x07
    shift = (i >> 3) - 1
    if shift == -1:
        return bits
    return (bits | 0x08) << shift


_MAX_INT4 = _long_to_int4_scalar(2**31 - 1)  # == 231
NUM_FREE_VALUES = 255 - _MAX_INT4  # == 24: lengths 0..23 encode exactly


def _int_to_byte4_scalar(i: int) -> int:
    if i < 0:
        raise ValueError(f"only supports positive values, got {i}")
    if i < NUM_FREE_VALUES:
        return i
    return NUM_FREE_VALUES + _long_to_int4_scalar(i - NUM_FREE_VALUES)


def _byte4_to_int_scalar(b: int) -> int:
    i = b & 0xFF
    if i < NUM_FREE_VALUES:
        return i
    return NUM_FREE_VALUES + _int4_to_long_scalar(i - NUM_FREE_VALUES)


# 256-entry decode table: the reference precomputes the same table as
# BM25Similarity.LENGTH_TABLE (BM25Similarity.java:119-126).
BYTE4_DECODE_TABLE = np.array(
    [_byte4_to_int_scalar(i) for i in range(256)], dtype=np.int64
)


def long_to_int4(v):
    """Vectorized longToInt4 over a non-negative integer array (or scalar)."""
    arr = np.asarray(v, dtype=np.int64)
    if arr.size and arr.min() < 0:
        raise ValueError("only supports positive values")
    # bit_length via log2 is exact for values < 2^53 (doc lengths are < 2^31)
    num_bits = np.zeros(arr.shape, dtype=np.int64)
    nz = arr > 0
    num_bits[nz] = np.floor(np.log2(arr[nz].astype(np.float64))).astype(np.int64) + 1
    shift = np.maximum(num_bits - 4, 0)
    encoded = (arr >> shift) & 0x07 | ((shift + 1) << 3)
    return np.where(num_bits < 4, arr, encoded)


def int_to_byte4(v):
    """Vectorized intToByte4: int lengths -> uint8 norm bytes."""
    arr = np.asarray(v, dtype=np.int64)
    small = arr < NUM_FREE_VALUES
    out = np.where(small, arr, NUM_FREE_VALUES + long_to_int4(np.maximum(arr - NUM_FREE_VALUES, 0)))
    return out.astype(np.uint8)


def byte4_to_int(b):
    """Vectorized byte4ToInt: uint8 norm bytes -> decoded lengths (int64)."""
    arr = np.asarray(b, dtype=np.uint8)
    return BYTE4_DECODE_TABLE[arr]


def int4_to_long(v):
    arr = np.asarray(v, dtype=np.int64)
    bits = arr & 0x07
    shift = (arr >> 3) - 1
    return np.where(shift == -1, bits, (bits | 0x08) << np.maximum(shift, 0))
