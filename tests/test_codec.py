"""Posting codec round-trip tests, incl. randomized universes in the style of
BasePostingsFormatTestCase (RandomPostingsTester) — FIXTURES.md §5."""

import numpy as np
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from voyagr_spark.codec import (
    BLOCK_SIZE,
    decode_positions,
    decode_positions_flat,
    decode_postings,
    delta_decode,
    delta_encode,
    encode_positions,
    encode_postings,
    varint_decode,
    varint_encode,
)


@given(st.lists(st.integers(min_value=0, max_value=2**40), max_size=500))
@settings(max_examples=200, deadline=None)
def test_varint_roundtrip(vals):
    arr = np.array(vals, dtype=np.uint64)
    assert list(varint_decode(varint_encode(arr))) == vals


def test_varint_edges():
    for v in [0, 1, 127, 128, 16383, 16384, 2**31 - 1, 2**40]:
        assert int(varint_decode(varint_encode(np.array([v])))[0]) == v
    assert varint_encode(np.array([], dtype=np.uint64)) == b""
    assert varint_decode(b"").size == 0


@pytest.mark.parametrize("n", [1, 2, 127, 128, 129, 255, 256, 4096])
def test_postings_roundtrip_random_universe(n):
    rng = np.random.default_rng(42 + n)
    doc_ids = np.sort(rng.choice(2**31 - 1, size=n, replace=False)).astype(np.int64)
    tfs = rng.integers(1, 256, size=n).astype(np.int64)
    docs_blob, tfs_blob, bmax_doc, bmax_tf, dboff, tboff = encode_postings(
        doc_ids, tfs
    )
    d2, t2 = decode_postings(docs_blob, tfs_blob)
    assert np.array_equal(d2, doc_ids)
    assert np.array_equal(t2, tfs)
    nblocks = (n + BLOCK_SIZE - 1) // BLOCK_SIZE
    assert bmax_doc.size == nblocks == bmax_tf.size
    assert dboff.size == nblocks + 1 and tboff.size == nblocks + 1
    assert dboff[-1] == len(docs_blob) and tboff[-1] == len(tfs_blob)
    # per-block random decode reproduces the full list (FOR block format:
    # header + packed/varint payload, decodable from the byte slice alone)
    from voyagr_spark.codec import decode_block

    got = []
    for b in range(nblocks):
        base = 0 if b == 0 else int(bmax_doc[b - 1])
        cnt = min(n - b * BLOCK_SIZE, BLOCK_SIZE)
        deltas = decode_block(docs_blob[int(dboff[b]): int(dboff[b + 1])], cnt)
        got.append(base + np.cumsum(deltas.astype(np.int64)))
    assert np.array_equal(np.concatenate(got), doc_ids)
    # block maxima are true maxima
    for b in range(nblocks):
        lo, hi = b * BLOCK_SIZE, min((b + 1) * BLOCK_SIZE, n)
        assert bmax_doc[b] == doc_ids[lo:hi].max()
        assert bmax_tf[b] == tfs[lo:hi].max()
    # doc blob is delta+varint: re-derive
    assert np.array_equal(delta_decode(delta_encode(doc_ids)), doc_ids)


def test_positions_roundtrip():
    rng = np.random.default_rng(7)
    tfs = rng.integers(1, 9, size=50).astype(np.int64)
    plists = [
        np.sort(rng.choice(1000, size=int(tf), replace=False)).astype(np.int64)
        for tf in tfs
    ]
    blob = encode_positions(plists)
    back = decode_positions(blob, tfs)
    for a, b in zip(plists, back):
        assert np.array_equal(a, b)
    flat, doc_idx = decode_positions_flat(blob, tfs)
    assert np.array_equal(flat, np.concatenate(plists))
    assert np.array_equal(doc_idx, np.repeat(np.arange(50), tfs))


def test_positions_empty():
    assert encode_positions([]) == b""
    flat, idx = decode_positions_flat(b"", np.array([], dtype=np.int64))
    assert flat.size == 0 and idx.size == 0


# ---------------------------------------------------------------------------
# FOR bit-packed block scheme (B6: ForUtil.java parity)
# ---------------------------------------------------------------------------


@given(
    st.lists(st.integers(min_value=0, max_value=2**45), min_size=1, max_size=700)
)
@settings(max_examples=100, deadline=None)
def test_for_stream_roundtrip_hypothesis(vals):
    from voyagr_spark.codec import decode_stream, encode_stream

    deltas = np.array(vals, dtype=np.uint64)
    n = deltas.size
    nblocks = -(-n // BLOCK_SIZE)
    starts = np.arange(nblocks, dtype=np.int64) * BLOCK_SIZE
    counts = np.minimum(n - starts, BLOCK_SIZE)
    blob, offs = encode_stream(deltas, starts, counts)
    assert offs.size == nblocks + 1 and offs[-1] == len(blob)
    assert np.array_equal(decode_stream(blob, offs, n), deltas)


def test_for_all_equal_block_collapses():
    from voyagr_spark.codec import decode_stream, encode_stream

    deltas = np.full(BLOCK_SIZE, 42, dtype=np.uint64)
    blob, offs = encode_stream(
        deltas, np.array([0], dtype=np.int64),
        np.array([BLOCK_SIZE], dtype=np.int64),
    )
    assert blob[0] == 0 and len(blob) == 2  # header + 1 varint byte
    assert np.array_equal(decode_stream(blob, offs, BLOCK_SIZE), deltas)


def test_for_full_block_is_bitpacked():
    from voyagr_spark.codec import encode_stream

    rng = np.random.default_rng(1)
    deltas = rng.integers(0, 1 << 10, BLOCK_SIZE).astype(np.uint64)
    blob, offs = encode_stream(
        deltas, np.array([0], dtype=np.int64),
        np.array([BLOCK_SIZE], dtype=np.int64),
    )
    w = blob[0]
    assert 1 <= w <= 10  # header = bit width of the block max
    assert len(blob) == 1 + 16 * w  # 128 * w bits, exactly
