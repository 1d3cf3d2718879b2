"""Pinned-cache economics: a storage-constrained pin still answers
bit-identically (VERDICT r3 next #8 — spill, never wrong answers).

The serving cache is MEMORY_AND_DISK by design; Spark's unified memory
manager evicts cached batches to executor-local disk under pressure.
Eviction changes WHERE a batch lives, not what it contains — pinning
DISK_ONLY forces the worst case (every cached batch read back from
disk on every query) deterministically, which is strictly harsher than
any partial-eviction state the memory manager can produce.
"""

import numpy as np
from pyspark import StorageLevel

from voyagr_spark.search import search

QUERIES = ("file", "file AND handle", "file OR handle OR parse",
           '"file handle"', "+file handle -node")


def _rows(df):
    return [(int(r["doc_id"]), np.float32(r["score"]).tobytes())
            for r in df.collect()]


def test_disk_only_pin_bit_parity(built_index):
    idx = built_index
    idx.unpin()
    cold = {q: _rows(search(idx, q, k=10)) for q in QUERIES}
    assert any(cold.values())
    idx.pin(storage=StorageLevel.DISK_ONLY)
    try:
        assert idx._pinned_df.storageLevel == StorageLevel.DISK_ONLY
        assert idx._decoded_df.storageLevel == StorageLevel.DISK_ONLY
        for q in QUERIES:
            assert _rows(search(idx, q, k=10)) == cold[q], q
    finally:
        idx.unpin()


def test_default_pin_is_spill_safe_level(built_index):
    """The default serving level must allow disk fallback (useDisk) so
    memory pressure degrades to spill, never to recompute-storms or OOM."""
    idx = built_index
    idx.unpin()
    idx.pin()
    try:
        for df in (idx._pinned_df, idx._decoded_df):
            lvl = df.storageLevel
            assert lvl.useMemory and lvl.useDisk
    finally:
        idx.unpin()
