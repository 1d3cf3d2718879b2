"""backward-codecs analog: the current reader decodes for128-1 indexes.

The legacy encoder below is vendored from this repo's OWN round-2 codec
(commit b84cabe, `encode_stream` before the 0xFE raw-block form existed):
per block, all-equal collapses to header 0x00 + varint(value), full
blocks FOR bit-pack at the block max width, the partial tail is header
0xFF + varints.  The format claim under test: every legacy stream
decodes byte-for-byte through the CURRENT decode paths.
"""

import json
import shutil
import sys
from pathlib import Path

import numpy as np
import pytest

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

from voyagr_spark.backward_codecs import READABLE_VERSIONS, check_readable
from voyagr_spark.codec import (
    BLOCK_SIZE,
    CODEC_VERSION,
    decode_blocks,
    decode_stream,
    pack_blocks,
    varint_encode,
)


def legacy_encode_stream(deltas: np.ndarray) -> tuple[bytes, np.ndarray]:
    """The for128-1 wire form (r2 encode_stream semantics, simplified to
    a per-block loop — byte-compatibility, not speed, is what's vendored):
    full blocks -> all-equal 0x00 or FOR at max bit width; tail -> 0xFF."""
    deltas = np.asarray(deltas, dtype=np.uint64)
    chunks, offsets, pos = [], [0], 0
    for s in range(0, len(deltas), BLOCK_SIZE):
        vals = deltas[s: s + BLOCK_SIZE]
        if len(vals) == BLOCK_SIZE:
            if (vals == vals[0]).all():
                payload = bytes([0]) + varint_encode(vals[:1])
            else:
                w = max(1, int(vals.max()).bit_length())
                packed = pack_blocks(vals.reshape(1, BLOCK_SIZE), w)
                payload = bytes([w]) + packed.tobytes()
        else:
            payload = bytes([0xFF]) + varint_encode(vals)
        chunks.append(payload)
        pos += len(payload)
        offsets.append(pos)
    return b"".join(chunks), np.asarray(offsets, dtype=np.int64)


def _streams():
    rng = np.random.default_rng(31)
    yield np.ones(300, dtype=np.uint64)                       # all-equal
    yield rng.integers(0, 2, 128, dtype=np.uint64)            # 1-bit block
    yield rng.integers(0, 1 << 20, 1000, dtype=np.uint64)     # wide blocks
    yield rng.integers(0, 250, 517, dtype=np.uint64)          # mixed + tail
    yield rng.integers(0, 9, 60, dtype=np.uint64)             # tail only
    mixed = np.concatenate([
        np.full(128, 7, dtype=np.uint64),
        rng.integers(0, 1 << 13, 128, dtype=np.uint64),
        rng.integers(0, 3, 128, dtype=np.uint64),
        rng.integers(0, 1 << 30, 77, dtype=np.uint64),
    ])
    yield mixed


def test_legacy_streams_decode_whole():
    for vals in _streams():
        blob, offsets = legacy_encode_stream(vals)
        got = decode_stream(blob, offsets, len(vals))
        assert (got == vals).all(), len(vals)


def test_legacy_streams_decode_block_subsets():
    for vals in _streams():
        blob, offsets = legacy_encode_stream(vals)
        nblocks = len(offsets) - 1
        counts_full = [
            min(BLOCK_SIZE, len(vals) - i * BLOCK_SIZE)
            for i in range(nblocks)
        ]
        idx = np.array([i for i in range(nblocks) if i % 2 == 0])
        counts = np.array([counts_full[i] for i in idx])
        got, starts = decode_blocks(blob, offsets, idx, counts)
        for j, bi in enumerate(idx):
            want = vals[bi * BLOCK_SIZE: bi * BLOCK_SIZE + counts[j]]
            assert (got[starts[j]: starts[j + 1]] == want).all()


def test_version_registry():
    assert CODEC_VERSION in READABLE_VERSIONS
    assert "for128-1" in READABLE_VERSIONS
    check_readable(CODEC_VERSION, "d")
    check_readable("for128-1", "d")
    with pytest.raises(ValueError, match="legacy readable"):
        check_readable("varint-0", "d")
    with pytest.raises(ValueError, match="codec"):
        check_readable(None, "d")


def test_upgrade_index(spark, built_index, tmp_path):
    """IndexUpgrader: a legacy-stamped index force-merges through the
    current codec and comes out stamped CODEC_VERSION with identical
    results; an already-current index is a no-op."""
    from voyagr_spark.indexer import Index
    from voyagr_spark.merge import upgrade_index
    from voyagr_spark.search import search

    before = [(r.doc_id, r.score) for r in search(built_index, "open OR file",
                                                  k=10).collect()]
    d = tmp_path / "legacy_up"
    shutil.copytree(built_index.dir, d)
    meta = json.loads((d / "meta.json").read_text())
    meta["codec"] = "for128-1"
    (d / "meta.json").write_text(json.dumps(meta))
    idx = Index(spark, str(d))
    new_seg = upgrade_index(idx)
    assert new_seg is not None
    assert idx.meta["codec"] == CODEC_VERSION          # stamp bumped on write
    assert idx.meta["live_segments"] == [new_seg]      # forceMerge(1)
    reopened = Index(spark, str(d))
    after = [(r.doc_id, r.score) for r in search(reopened, "open OR file",
                                                 k=10).collect()]
    assert after == before
    assert upgrade_index(reopened) is None             # current -> no-op


def test_write_bumps_legacy_stamp(spark, built_index, corpus_pdf, tmp_path):
    """Appending to a legacy-stamped index republishes meta with the
    current codec stamp (new blobs use the current encoder)."""
    from voyagr_spark.indexer import Index
    from voyagr_spark.streaming import append_batch

    d = tmp_path / "legacy_app"
    shutil.copytree(built_index.dir, d)
    meta = json.loads((d / "meta.json").read_text())
    meta["codec"] = "for128-1"
    (d / "meta.json").write_text(json.dumps(meta))
    idx = Index(spark, str(d))
    from pyspark.sql import functions as F

    batch = spark.createDataFrame(corpus_pdf.head(5)).withColumn(
        "path", F.concat_ws("/", F.lit("new"), "path")
    )
    append_batch(idx, batch)
    assert json.loads((d / "meta.json").read_text())["codec"] == CODEC_VERSION


def test_reader_opens_legacy_stamp(spark, built_index, tmp_path):
    """An index stamped for128-1 opens and serves identical results; an
    unregistered stamp is still refused (test_resume's guard)."""
    from voyagr_spark.indexer import Index
    from voyagr_spark.search import search

    before = [(r.doc_id, r.score) for r in search(built_index, "open OR file",
                                                  k=10).collect()]
    d = tmp_path / "legacy"
    shutil.copytree(built_index.dir, d)
    meta = json.loads((d / "meta.json").read_text())
    meta["codec"] = "for128-1"
    (d / "meta.json").write_text(json.dumps(meta))
    idx = Index(spark, str(d))  # must open: registered legacy version
    after = [(r.doc_id, r.score) for r in search(idx, "open OR file",
                                                 k=10).collect()]
    assert after == before
