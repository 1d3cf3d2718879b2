"""Index sorting (IndexWriterConfig.setIndexSort analog,
lucene/core/src/java/org/apache/lucene/index/IndexWriterConfig.java:480-505,
Sorter.java) + the early-terminating sort-by-field collector
(EarlyTerminatingSortingCollector / TopFieldCollector.canEarlyTerminate).

Spark-first divergence (stronger than the reference): the sort is GLOBAL —
doc ids are assigned in (key, DOC_KEY) order via repartitionByRange — so
merges preserve the invariant with no Sorter.DocMap renumbering (global doc
ids never change at merge time).  Appends clear the flag (the reference
keeps per-segment sort; we trade that for the global invariant).
"""

import shutil

import pytest
from pyspark.sql import functions as F


@pytest.fixture(scope="module")
def sorted_index(spark, corpus_pdf, tmp_path_factory):
    from voyagr_spark.indexer import build_index

    d = tmp_path_factory.mktemp("index_sorted")
    docs = spark.createDataFrame(corpus_pdf).repartition(6)
    idx = build_index(spark, docs, str(d), num_segments=4,
                      index_sort=("nchars", True))
    yield idx
    shutil.rmtree(d, ignore_errors=True)


def test_doc_ids_follow_sort_key(sorted_index):
    rows = (
        sorted_index.docmap()
        .orderBy("doc_id")
        .select("nchars", "repo", "path", "commit")
        .collect()
    )
    keys = [(r["nchars"], r["repo"], r["path"], r["commit"]) for r in rows]
    assert keys == sorted(keys)  # global (key, DOC_KEY) order


def test_meta_records_index_sort(sorted_index, spark):
    from voyagr_spark.indexer import Index

    assert sorted_index.index_sort == {"field": "nchars", "asc": True}
    reopened = Index(spark, str(sorted_index.dir))
    assert reopened.index_sort == {"field": "nchars", "asc": True}


def test_bm25_results_unchanged_by_sort(sorted_index, built_index):
    """Scores depend on (df, tf, doclen) only — never on doc-id layout: the
    sorted index must rank the same documents with bit-identical scores."""
    from voyagr_spark.search import search

    for q in ("open", "file AND handle", '"open file"', "parse OR tree"):
        a = {
            (r["repo"], r["path"], r["commit"]): r["score"]
            for r in search(built_index, q, k=10)
            .join(built_index.docmap(), "doc_id")
            .collect()
        }
        b = {
            (r["repo"], r["path"], r["commit"]): r["score"]
            for r in search(sorted_index, q, k=10)
            .join(sorted_index.docmap(), "doc_id")
            .collect()
        }
        assert a == b, q


def _select(idx, **kw):
    from voyagr_spark.solr_api import solr_select

    return [tuple(r) for r in solr_select(idx, **kw).collect()]


def test_fast_path_matches_generic(sorted_index):
    kw = dict(q="open AND file", fl="doc_id,nchars,repo",
              sort="nchars asc", rows=7)
    fast = _select(sorted_index, **kw)
    saved = sorted_index.meta.pop("index_sort")
    try:
        generic = _select(sorted_index, **kw)
    finally:
        sorted_index.meta["index_sort"] = saved
    assert fast == generic
    assert len(fast) == 7
    assert [t[1] for t in fast] == sorted(t[1] for t in fast)


def test_fast_path_paging_matches_generic(sorted_index):
    kw = dict(q="open", fl="doc_id,nchars", sort="nchars asc",
              rows=5, start=4)
    fast = _select(sorted_index, **kw)
    saved = sorted_index.meta.pop("index_sort")
    try:
        generic = _select(sorted_index, **kw)
    finally:
        sorted_index.meta["index_sort"] = saved
    assert fast == generic


def test_direction_mismatch_falls_back(sorted_index):
    """A desc query on an asc-sorted index cannot early-terminate
    (canEarlyTerminate requires same field AND direction) — it must go
    through the generic collector and still be correct."""
    got = _select(sorted_index, q="open", fl="doc_id,nchars",
                  sort="nchars desc", rows=5)
    assert [t[1] for t in got] == sorted((t[1] for t in got), reverse=True)


def test_score_in_fl_falls_back(sorted_index):
    """trackScores=true disables early termination: score values must be
    the real BM25 scores, not nulls."""
    got = _select(sorted_index, q="open", fl="doc_id,score",
                  sort="nchars asc", rows=5)
    assert all(s is not None and s > 0 for _, s in got)


def test_fast_path_plan_shape(sorted_index):
    """The cut happens before any docmap access: the collector plan reads
    only kind=posting, ends in TakeOrderedAndProject, computes no scores."""
    from voyagr_spark.search import matches_first_by_docid

    plan = matches_first_by_docid(sorted_index, "open AND file", 5)
    s = plan._sc._jvm.PythonSQLUtils.explainString(
        plan._jdf.queryExecution(), "formatted"
    )
    assert "kind=posting" in s
    assert "kind=doc" not in s
    assert "TakeOrderedAndProject" in s


def test_descending_index_sort(spark, corpus_pdf, tmp_path_factory):
    from voyagr_spark.indexer import build_index

    d = tmp_path_factory.mktemp("index_sorted_desc")
    docs = spark.createDataFrame(corpus_pdf).repartition(6)
    idx = build_index(spark, docs, str(d), num_segments=4,
                      index_sort=("nchars", False))
    try:
        keys = [
            r["nchars"]
            for r in idx.docmap().orderBy("doc_id").select("nchars").collect()
        ]
        assert keys == sorted(keys, reverse=True)
        kw = dict(q="open", fl="doc_id,nchars", sort="nchars desc", rows=6)
        fast = _select(idx, **kw)
        saved = idx.meta.pop("index_sort")
        try:
            generic = _select(idx, **kw)
        finally:
            idx.meta["index_sort"] = saved
        assert fast == generic
    finally:
        shutil.rmtree(d, ignore_errors=True)


def test_merge_preserves_sorted_invariant(spark, corpus_pdf, tmp_path_factory):
    """Global ids never change at merge, so the sorted invariant (and the
    early-termination path) survives merging every live segment."""
    from voyagr_spark.indexer import build_index
    from voyagr_spark.merge import merge_segments

    d = tmp_path_factory.mktemp("index_sorted_merge")
    docs = spark.createDataFrame(corpus_pdf).repartition(6)
    idx = build_index(spark, docs, str(d), num_segments=4,
                      index_sort=("nchars", True))
    try:
        kw = dict(q="open AND file", fl="doc_id,nchars",
                  sort="nchars asc", rows=7)
        before = _select(idx, **kw)
        segs = [
            r["seg"]
            for r in idx.postings().select("seg").distinct().collect()
        ]
        merge_segments(idx, segs, new_seg=max(segs) + 1)
        assert idx.index_sort is not None  # flag survives the meta swap
        assert _select(idx, **kw) == before
    finally:
        shutil.rmtree(d, ignore_errors=True)


def test_append_clears_index_sort(spark, corpus_pdf, tmp_path_factory):
    from voyagr_spark.indexer import build_index
    from voyagr_spark.streaming import append_batch

    d = tmp_path_factory.mktemp("index_sorted_append")
    docs = spark.createDataFrame(corpus_pdf.iloc[:250]).repartition(4)
    idx = build_index(spark, docs, str(d), num_segments=3,
                      index_sort=("nchars", True))
    try:
        batch = spark.createDataFrame(corpus_pdf.iloc[250:])
        append_batch(idx, batch, num_partitions=2)
        assert idx.index_sort is None  # global invariant broken -> flag off
        # sort-by-field falls back to the generic collector and stays right
        got = _select(idx, q="open", fl="doc_id,nchars",
                      sort="nchars asc", rows=8)
        assert [t[1] for t in got] == sorted(t[1] for t in got)
        assert len(got) == 8
    finally:
        shutil.rmtree(d, ignore_errors=True)


def test_tombstones_respected_on_fast_path(spark, corpus_pdf,
                                           tmp_path_factory):
    from voyagr_spark.indexer import build_index

    d = tmp_path_factory.mktemp("index_sorted_del")
    docs = spark.createDataFrame(corpus_pdf).repartition(6)
    idx = build_index(spark, docs, str(d), num_segments=4,
                      index_sort=("nchars", True))
    try:
        before = _select(idx, q="open", fl="doc_id,nchars",
                         sort="nchars asc", rows=5)
        idx.delete_docs([before[0][0], before[2][0]])
        after = _select(idx, q="open", fl="doc_id,nchars",
                        sort="nchars asc", rows=5)
        got_ids = {t[0] for t in after}
        assert before[0][0] not in got_ids
        assert before[2][0] not in got_ids
        assert after[0] == before[1]
    finally:
        shutil.rmtree(d, ignore_errors=True)
