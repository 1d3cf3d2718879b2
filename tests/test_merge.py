"""Merge invariants: merge(A,B,...) answers queries identically (SURVEY §5)."""

import shutil

import pytest

from voyagr_spark.merge import (
    FLOOR_SEGMENT_BYTES,
    MAX_MERGE_AT_ONCE,
    plan_merges,
    run_tiered_merge,
    merge_segments,
)

QUERIES = [
    "file",
    "file AND ident0099",
    "open OR merge OR segment",
    '"parse query tree"',
    '"call the function"',
]


@pytest.fixture()
def merged_index(spark, built_index, tmp_path):
    """A copy of the built index with all segments merged into one (two
    posting-block rows per term via seg_buckets=2 — skew-split path)."""
    from voyagr_spark.indexer import Index

    d = tmp_path / "merged"
    shutil.copytree(built_index.dir, d)
    idx = Index(spark, str(d))
    segs = [r["seg"] for r in idx.postings().select("seg").distinct().collect()]
    merge_segments(idx, segs, new_seg=max(segs) + 1, seg_buckets=2)
    return idx


def test_merge_preserves_results(built_index, merged_index, oracle_index):
    from voyagr_spark.search import search

    for q in QUERIES:
        want = oracle_index.search(q, 10)
        got = [
            (r["doc_id"], r["score"])
            for r in search(merged_index, q, k=10).collect()
        ]
        assert got == [(d, s) for d, s in want], q


def test_merge_swaps_live_segments(merged_index, built_index):
    live = merged_index.live_segments
    assert live is not None and len(live) == 1
    segs = {r["seg"] for r in merged_index.postings().select("seg").distinct().collect()}
    assert segs == set(live)
    # tombstoned originals still on disk (lineage), filtered from queries
    all_segs = {
        r["seg"]
        for r in merged_index.spark.read.parquet(
            str(merged_index.dir / "segments" / "kind=posting")
        ).select("seg").distinct().collect()
    }
    assert all_segs > segs


def test_plan_merges_tiering():
    # 25 small segments -> merges of up to MAX_MERGE_AT_ONCE smallest
    sizes = {i: 100_000 * (i + 1) for i in range(25)}
    merges = plan_merges(sizes)
    assert merges, "should plan at least one merge"
    assert all(2 <= len(g) <= MAX_MERGE_AT_ONCE for g in merges)
    flat = [s for g in merges for s in g]
    assert len(flat) == len(set(flat))
    # 5 segments: under segsPerTier, no merge
    assert plan_merges({i: FLOOR_SEGMENT_BYTES for i in range(5)}) == []


def test_run_tiered_merge_noop_when_few_segments(spark, built_index, tmp_path):
    from voyagr_spark.indexer import Index

    d = tmp_path / "copy"
    shutil.copytree(built_index.dir, d)
    idx = Index(spark, str(d))
    assert run_tiered_merge(idx) == 0  # only 4 segments, under the tier size
