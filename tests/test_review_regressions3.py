"""Regressions from the round-4 deep review of the lifecycle modules."""

import shutil

import numpy as np
import pytest

from voyagr_spark.merge import add_indexes, merge_segments, run_tiered_merge
from voyagr_spark.search import search

QUERIES = ["file", "file AND handle", "open OR merge OR segment",
           '"parse query tree"']


def _rows(idx, q, k=10):
    return [(int(r["doc_id"]), np.float32(r["score"]).tobytes())
            for r in search(idx, q, k=k).collect()]


def test_remerge_interleaved_ranges(spark, built_index, tmp_path,
                                    oracle_index):
    """A MERGED segment spans non-contiguous doc ranges; merging it with a
    segment from INSIDE its span must re-sort the concatenated doc stream
    (the old code asserted 'ranges disjoint' and every task died)."""
    from voyagr_spark.indexer import Index

    d = tmp_path / "remerge"
    shutil.copytree(built_index.dir, d)
    idx = Index(spark, str(d))
    segs = sorted(
        r["seg"] for r in idx.postings().select("seg").distinct().collect())
    assert len(segs) >= 3
    # merge first and LAST -> M spans a gap containing the middle segs
    m1 = max(segs) + 1
    merge_segments(idx, [segs[0], segs[-1]], new_seg=m1)
    # now merge M with a segment from inside its span
    m2 = m1 + 1
    merge_segments(idx, [m1, segs[1]], new_seg=m2)
    for q in QUERIES:
        got = _rows(idx, q)
        want = _rows(built_index, q)
        assert got == want, q


def test_add_indexes_keeps_merged_source_doc_rows(spark, tmp_path):
    """addIndexes from a source whose segments were merged away: doc rows
    still carry the ORIGINAL seg ids (merge never rewrites them) and must
    all copy — hydrate/docmap for the appended ids must work."""
    from voyagr_spark.corpus import generate_corpus
    from voyagr_spark.indexer import Index, build_index

    src_pdf = generate_corpus(80, seed=21)
    dest_pdf = generate_corpus(60, seed=22)
    src = build_index(spark, spark.createDataFrame(src_pdf),
                      str(tmp_path / "src"), num_segments=3)
    dest = build_index(spark, spark.createDataFrame(dest_pdf),
                       str(tmp_path / "dest"), num_segments=2)
    # merge ALL source segments so live_segments != doc-row segs
    segs = sorted(
        r["seg"] for r in src.postings().select("seg").distinct().collect())
    merge_segments(src, segs, new_seg=max(segs) + 1)
    assert src.live_segments is not None
    base = dest.max_doc
    add_indexes(dest, src, num_partitions=2)
    # every appended doc row must exist in the docmap
    n_appended = dest.docmap().filter(f"doc_id >= {base}").count()
    assert n_appended == src.max_doc == 80
    assert dest.docmap().count() == dest.max_doc == base + 80


def test_mutations_refresh_pinned_searcher(spark, tmp_path):
    """A pinned serving index must see appends and merges immediately —
    the mutation re-warms the pin over the new lineage."""
    from voyagr_spark.corpus import generate_corpus
    from voyagr_spark.indexer import build_index
    from voyagr_spark.streaming import append_batch

    pdf = generate_corpus(120, seed=23)
    idx = build_index(spark, spark.createDataFrame(pdf.iloc[:80]),
                      str(tmp_path / "pin_idx"), num_segments=2)
    idx.pin()
    try:
        before = search(idx, "file", k=100).count()
        append_batch(idx, spark.createDataFrame(pdf.iloc[80:]),
                     num_partitions=2)
        after = search(idx, "file", k=1000).count()
        assert after > before  # appended docs visible while pinned
        n_merged = run_tiered_merge(idx)
        got = search(idx, "file", k=1000).count()
        assert got == after  # merge preserves results, pinned or not
    finally:
        idx.unpin()


def test_append_segment_ids_match_flushes(spark, tmp_path):
    """Predicted seg ids == real flushed segments even when Arrow batches
    overshoot the flush threshold (exact-dps flushing): no phantom ids in
    live_segments, every listed segment has rows."""
    from pyspark.sql import functions as F

    from voyagr_spark.corpus import generate_corpus
    from voyagr_spark.indexer import build_index
    from voyagr_spark.streaming import append_batch

    pdf = generate_corpus(130, seed=24)
    idx = build_index(spark, spark.createDataFrame(pdf.iloc[:40]),
                      str(tmp_path / "seg_idx"), num_segments=1)
    # 90 docs with dps=25 -> 4 flushes in one partition; Arrow batches are
    # whole-partition here, i.e. maximal overshoot
    new_segs = append_batch(idx, spark.createDataFrame(pdf.iloc[40:]),
                            num_partitions=1, docs_per_segment=25)
    idx.reload_meta()
    real = {
        int(r["seg"]) for r in
        idx.postings().select("seg").distinct().collect()
    }
    assert set(new_segs) <= real  # every predicted segment exists
    doc_counts = (
        idx.docstats().filter(F.col("seg").isin(list(new_segs)))
        .groupBy("seg").count().collect()
    )
    assert sorted(int(r["count"]) for r in doc_counts) == [15, 25, 25, 25]


def test_resume_without_num_segments(spark, tmp_path):
    """resume=True with the default num_segments must complete pass 3 from
    the checkpointed offsets (used to TypeError on num_segments // 8)."""
    import json
    from pathlib import Path

    from voyagr_spark.corpus import generate_corpus
    from voyagr_spark.indexer import build_index

    pdf = generate_corpus(60, seed=25)
    d = tmp_path / "resume_idx"
    idx = build_index(spark, spark.createDataFrame(pdf), str(d),
                      num_segments=2)
    # simulate a crash after pass 1+2: segments + offsets exist, stats do
    # not
    shutil.rmtree(d / "term_stats", ignore_errors=True)
    (d / "meta.json").unlink()
    assert (d / "segments" / "_SUCCESS").exists()
    idx2 = build_index(spark, spark.createDataFrame(pdf), str(d),
                       resume=True)  # num_segments defaulted
    assert idx2.max_doc == 60
    assert _rows(idx2, "file")  # queries run end to end
