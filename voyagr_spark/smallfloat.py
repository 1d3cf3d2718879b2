"""Lossy float -> byte norm encoding, bit-identical to the reference.

Reimplements SmallFloat.floatToByte315 / byte315ToFloat
(`/root/reference/lucene/core/src/java/org/apache/lucene/util/SmallFloat.java:78-98`)
with numpy bit twiddling: 3 mantissa bits, zero exponent 15; smallest non-zero
5.820766e-10, largest 7.5161928e9, epsilon 0.125.  The 256-entry NORM_TABLE
matches BM25Similarity.java:134-140 (`NORM_TABLE[i] = 1/f^2`, f=decode(i)),
which for the encode input `1/sqrt(fieldLength)` decodes back to the
(quantized) field length.
"""

from __future__ import annotations

import numpy as np

_EXP_OFFSET = (63 - 15) << 3  # 384


def float_to_byte315(f: np.ndarray | float) -> np.ndarray:
    """Vectorized port of SmallFloat.floatToByte315 (SmallFloat.java:78-88)."""
    f32 = np.atleast_1d(np.asarray(f, dtype=np.float32))
    bits = f32.view(np.int32)
    smallfloat = bits >> (24 - 3)
    out = (smallfloat - _EXP_OFFSET).astype(np.int32)
    # underflow: <= (63-15)<<3  ->  0 for (bits<=0) else 1
    under = smallfloat <= _EXP_OFFSET
    out = np.where(under, np.where(bits <= 0, 0, 1), out)
    # overflow: >= offset + 0x100  ->  -1 (byte) == 255 unsigned
    out = np.where(smallfloat >= _EXP_OFFSET + 0x100, 255, out)
    return (out & 0xFF).astype(np.uint8)


def byte315_to_float(b: np.ndarray | int) -> np.ndarray:
    """Vectorized port of SmallFloat.byte315ToFloat (SmallFloat.java:90-98)."""
    ub = np.atleast_1d(np.asarray(b)).astype(np.uint8)
    bits = (ub.astype(np.int32) << (24 - 3)) + ((63 - 15) << 24)
    out = bits.view(np.float32).copy()
    out[ub == 0] = 0.0
    return out


def build_norm_table() -> np.ndarray:
    """BM25Similarity NORM_TABLE: decoded_len[i] = 1/f^2 (float32).

    BM25Similarity.java:134-140.  Entry 0 is 1/0 = +inf, matching Java.
    """
    f = byte315_to_float(np.arange(256, dtype=np.uint8))
    with np.errstate(divide="ignore"):
        return (np.float32(1.0) / (f * f)).astype(np.float32)


NORM_TABLE = build_norm_table()


def encode_norm(field_lengths: np.ndarray) -> np.ndarray:
    """norm_byte = floatToByte315(boost/sqrt(fieldLength)), boost=1.

    BM25Similarity.encodeNormValue (BM25Similarity.java:97-99); cast
    discipline matches Java: sqrt in double, divide as float.
    """
    lens = np.asarray(field_lengths, dtype=np.float64)
    with np.errstate(divide="ignore"):
        val = (np.float32(1.0) / np.sqrt(lens).astype(np.float32)).astype(np.float32)
    return float_to_byte315(val)
