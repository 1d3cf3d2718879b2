"""SmallFloat + BM25 float32 parity tests.

Expected values hand-derived from the cited Java sources
(SmallFloat.java:78-98, BM25Similarity.java:66-69,84-91,207-238)."""

import math
import struct

import numpy as np

from voyagr_spark import bm25
from voyagr_spark.smallfloat import (
    NORM_TABLE,
    byte315_to_float,
    encode_norm,
    float_to_byte315,
)


def java_float_to_byte315(f: float) -> int:
    """Scalar straight-line port of the Java code, used as the test oracle."""
    bits = struct.unpack(">i", struct.pack(">f", f))[0]
    smallfloat = bits >> (24 - 3)
    if smallfloat <= ((63 - 15) << 3):
        return 0 if bits <= 0 else 1
    if smallfloat >= ((63 - 15) << 3) + 0x100:
        return 255
    return (smallfloat - ((63 - 15) << 3)) & 0xFF


def java_byte315_to_float(b: int) -> float:
    if b == 0:
        return 0.0
    bits = ((b & 0xFF) << (24 - 3)) + ((63 - 15) << 24)
    return struct.unpack(">f", struct.pack(">i", bits))[0]


def test_byte315_roundtrip_all_256():
    for b in range(256):
        expect = java_byte315_to_float(b)
        got = float(byte315_to_float(b)[0])
        assert got == expect, (b, got, expect)
        # re-encode is identity for decodable bytes
        assert int(float_to_byte315(expect)[0]) == (b if expect != 0.0 else 0)


def test_float_to_byte315_spot_values():
    # documented constants: smallest non-zero 5.820766E-10, largest 7.5161928E9
    for f in [0.0, -1.0, 1.0, 0.5, 5.820766e-10, 7.5161928e9, 1e20, 1e-20, 0.125]:
        assert int(float_to_byte315(f)[0]) == java_float_to_byte315(f)
    # vectorized == scalar across a dense sweep
    fs = np.float32(np.logspace(-12, 11, 20000)).astype(np.float32)
    vec = float_to_byte315(fs)
    for f, v in zip(fs[::397], vec[::397]):
        assert int(v) == java_float_to_byte315(float(f))


def test_norm_table_is_inverse_square():
    for i in range(1, 256):
        f = java_byte315_to_float(i)
        expect = np.float32(1.0) / (np.float32(f) * np.float32(f))
        assert NORM_TABLE[i] == expect
    assert np.isinf(NORM_TABLE[0])


def test_encode_norm_known_lengths():
    # norm = floatToByte315(1/sqrt(len))
    for length in [1, 2, 3, 10, 100, 255, 1000, 65536]:
        expect = java_float_to_byte315(
            np.float32(1.0) / np.float32(math.sqrt(length))
        )
        assert int(encode_norm(np.array([length]))[0]) == expect


def test_idf_matches_java_formula():
    # idf = (float) log(1 + (N - df + 0.5)/(df + 0.5))
    for df, n in [(1, 1), (1, 100), (5, 100), (50, 100), (99, 100), (1234, 10**6)]:
        expect = np.float32(math.log(1 + (n - df + 0.5) / (df + 0.5)))
        assert bm25.idf(df, n) == expect


def test_score_float32_discipline():
    # hand-computed: N=3 docs, df=2, sumTTF=10 -> avgdl float32(10/3)
    avgdl = bm25.avg_field_length(10, 3)
    assert avgdl == np.float32(10 / 3.0)
    cache = bm25.norm_cache(avgdl)
    w = bm25.weight_value(bm25.idf(2, 3))
    # doc with length 4 -> norm byte
    nb = encode_norm(np.array([4]))
    got = bm25.score(np.array([2]), nb, cache, w)
    # replicate with straight-line float32 ops
    decoded = NORM_TABLE[int(nb[0])]
    c = np.float32(1.2) * (
        (np.float32(1) - np.float32(0.75)) + np.float32(0.75) * decoded / avgdl
    )
    idf = np.float32(math.log(1 + (3 - 2 + 0.5) / (2 + 0.5)))
    wv = np.float32(idf * np.float32(1.0)) * (np.float32(1.2) + np.float32(1.0))
    expect = np.float32(wv * np.float32(2.0) / (np.float32(2.0) + c))
    assert got.dtype == np.float32
    assert got[0] == expect
