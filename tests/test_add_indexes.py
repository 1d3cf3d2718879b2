"""IndexWriter.addIndexes analog: doc-id re-base without re-analysis
(merge.add_indexes)."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from voyagr_spark.indexer import build_index
from voyagr_spark.merge import add_indexes
from voyagr_spark.search import scores, search


@pytest.fixture(scope="module")
def split_pair(spark, corpus_pdf, tmp_path_factory):
    """(combined single-build index, dest-with-src-added index): the corpus
    split at its DOC_KEY midpoint, so re-based ids line up EXACTLY with the
    single build's global (DOC_KEY-ordered) assignment."""
    d = tmp_path_factory.mktemp("addidx")
    pdf = corpus_pdf.sort_values(["repo", "path", "commit"]).reset_index(
        drop=True)
    n1 = len(pdf) // 2
    both = build_index(spark, spark.createDataFrame(pdf).repartition(4),
                       str(d / "both"), num_segments=4)
    a = build_index(spark, spark.createDataFrame(pdf.iloc[:n1]).repartition(2),
                    str(d / "a"), num_segments=2)
    b = build_index(spark, spark.createDataFrame(pdf.iloc[n1:]).repartition(2),
                    str(d / "b"), num_segments=2)
    add_indexes(a, b)
    return both, a


def test_add_indexes_stats_match(split_pair):
    both, merged = split_pair
    assert merged.max_doc == both.max_doc
    assert merged.sum_total_term_freq == both.sum_total_term_freq
    agg = [F.sum("df").alias("df"), F.sum("ttf").alias("ttf")]
    sm = {r["term"]: (r["df"], r["ttf"])
          for r in merged.term_stats().groupBy("term").agg(*agg).collect()}
    sb = {r["term"]: (r["df"], r["ttf"])
          for r in both.term_stats().groupBy("term").agg(*agg).collect()}
    assert sm == sb


def test_add_indexes_search_bit_exact(split_pair):
    both, merged = split_pair
    for q in ["file", "file AND handle", "file OR merge", '"parse query"']:
        want = [(r["doc_id"], np.float32(r["score"]))
                for r in search(both, q, k=10**6).collect()]
        got = [(r["doc_id"], np.float32(r["score"]))
               for r in search(merged, q, k=10**6).collect()]
        assert got == want, q


def test_add_indexes_docmap_complete(split_pair):
    both, merged = split_pair
    dm_b = {(r["doc_id"], r["content_sha256"])
            for r in both.docmap().select("doc_id",
                                          "content_sha256").collect()}
    dm_m = {(r["doc_id"], r["content_sha256"])
            for r in merged.docmap().select("doc_id",
                                            "content_sha256").collect()}
    assert dm_m == dm_b  # sha256 row invariant survives the re-base


def test_add_indexes_refuses_mismatch(spark, corpus_pdf, tmp_path):
    from voyagr_spark.analysis import Analyzer

    pdf = corpus_pdf.iloc[:40]
    dest = build_index(spark, spark.createDataFrame(pdf),
                       str(tmp_path / "d"), num_segments=1)
    src = build_index(spark, spark.createDataFrame(pdf),
                      str(tmp_path / "s"), num_segments=1,
                      analyzer=Analyzer(lowercase=False))
    with pytest.raises(ValueError, match="analyzer differs"):
        add_indexes(dest, src)
    src2 = build_index(spark, spark.createDataFrame(pdf),
                       str(tmp_path / "s2"), num_segments=1)
    src2.delete_docs([0])
    with pytest.raises(ValueError, match="deletions"):
        add_indexes(dest, src2)


def test_add_indexes_then_append_still_works(spark, corpus_pdf, tmp_path):
    """Seg-id ranges stay disjoint when appends follow an addIndexes."""
    from voyagr_spark.streaming import append_batch

    pdf = corpus_pdf.sort_values(["repo", "path", "commit"]).reset_index(
        drop=True)
    dest = build_index(spark, spark.createDataFrame(pdf.iloc[:60]),
                       str(tmp_path / "d"), num_segments=2)
    src = build_index(spark, spark.createDataFrame(pdf.iloc[60:120]),
                      str(tmp_path / "s"), num_segments=2)
    new1 = add_indexes(dest, src)
    new2 = append_batch(dest, spark.createDataFrame(
        pdf.iloc[120:150]).selectExpr(
            "repo", "path", "commit", "lang", "content"))
    assert not (set(new1) & set(new2))
    assert dest.max_doc == 150
    n = scores(dest, "file").count()
    assert n > 0


def test_add_indexes_from_crash_recovered_source(spark, corpus_pdf,
                                                 tmp_path):
    """A crash-recovered source carries meta['dead_segs']: its orphaned
    posting/doc rows (whose doc_ids were re-issued by the tlog replay)
    must NOT copy into dest — else dest gets duplicate doc_ids and a doc
    count exceeding its max_doc (ADVICE r4)."""
    from voyagr_spark import tlog
    from voyagr_spark.streaming import append_batch

    pdf = corpus_pdf.sort_values(["repo", "path", "commit"]).reset_index(
        drop=True)
    src = build_index(spark, spark.createDataFrame(pdf.iloc[:80]),
                      str(tmp_path / "crash_src"), num_segments=2)
    # crashed append: segment files landed, meta swap lost
    saved = (src.dir / "meta.json").read_bytes()
    batch = spark.createDataFrame(pdf.iloc[80:100])
    v = tlog.log_batch(src, batch, num_partitions=2)
    append_batch(src, batch, num_partitions=2, tlog_version=v)
    (src.dir / "meta.json").write_bytes(saved)
    from voyagr_spark.indexer import Index

    src = Index(spark, str(src.dir))
    assert tlog.recover(src) == [v]
    assert len(src.meta["dead_segs"]) == 1
    assert src.max_doc == 100

    dest = build_index(spark, spark.createDataFrame(pdf.iloc[100:140]),
                       str(tmp_path / "crash_dest"), num_segments=2)
    add_indexes(dest, src, num_partitions=2)
    dm = dest.docmap()
    assert dm.count() == dest.max_doc == 140
    assert dm.select("doc_id").distinct().count() == 140
    # postings carry no doc_id above max_doc and no duplicates either
    from voyagr_spark.checkindex import check_index

    assert check_index(dest) == {}


def test_add_indexes_from_empty_shard(spark, corpus_pdf, tmp_path):
    """A fileless empty shard (valid output of split_index) as source:
    reads as a typed empty frame instead of UNABLE_TO_INFER_SCHEMA, and
    dest is unchanged apart from the epoch bump."""
    from voyagr_spark.shards import split_index

    pdf = corpus_pdf.sort_values(["repo", "path", "commit"]).reset_index(
        drop=True)
    tiny = build_index(spark, spark.createDataFrame(pdf.iloc[:1]),
                       str(tmp_path / "tiny"), num_segments=1)
    shards = split_index(tiny, [str(tmp_path / "sh0"),
                                str(tmp_path / "sh1")])
    empty = next(s for s in shards if s.max_doc == 0)
    dest = build_index(spark, spark.createDataFrame(pdf.iloc[1:41]),
                       str(tmp_path / "esh_dest"), num_segments=2)
    before = dest.max_doc
    add_indexes(dest, empty, num_partitions=2)
    assert dest.max_doc == before
    assert dest.docmap().count() == before
    assert scores(dest, "file").count() > 0


def test_add_indexes_live_segments_only_posting_segs(spark, corpus_pdf,
                                                     tmp_path):
    """After addIndexes from a merged-away source, dest live_segments
    must contain only seg ids that actually carry posting rows — no
    phantom doc-only ids (ADVICE r4 low)."""
    from voyagr_spark.merge import merge_segments

    pdf = corpus_pdf.sort_values(["repo", "path", "commit"]).reset_index(
        drop=True)
    src = build_index(spark, spark.createDataFrame(pdf.iloc[:60]),
                      str(tmp_path / "ls_src"), num_segments=3)
    segs = sorted(r["seg"] for r in
                  src.postings().select("seg").distinct().collect())
    merge_segments(src, segs, new_seg=max(segs) + 1)
    dest = build_index(spark, spark.createDataFrame(pdf.iloc[60:100]),
                       str(tmp_path / "ls_dest"), num_segments=2)
    # force dest to track live_segments (merge its own segs first)
    dsegs = sorted(r["seg"] for r in
                   dest.postings().select("seg").distinct().collect())
    merge_segments(dest, dsegs, new_seg=max(dsegs) + 1)
    assert dest.live_segments is not None
    add_indexes(dest, src, num_partitions=2)
    actual_post_segs = {
        r["seg"] for r in spark.read.parquet(
            str(dest.dir / "segments" / "kind=posting")
        ).select("seg").distinct().collect()}
    assert set(dest.live_segments) <= actual_post_segs
    # all 100 docs present and searchable
    assert dest.docmap().count() == dest.max_doc == 100
    assert scores(dest, "file").count() > 0
