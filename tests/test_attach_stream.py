"""attach_stream (S7 — NRT streaming ingest via foreachBatch).

Covers the exactly-once watermark's SCOPING (ADVICE r4): batch ids are
0-based per streaming query, so the applied-watermark must be keyed by
the query (checkpoint/stream name).  A global int watermark would make a
NEW query's batches (ids restarting at 0) silently skip until the OLD
query's high-water mark was exceeded — data loss, not replay protection.
"""

import shutil

import pytest

from voyagr_spark.indexer import Index, build_index
from voyagr_spark.search import search
from voyagr_spark.streaming import attach_stream


def _build(spark, corpus_pdf, tmp_path, name):
    docs = spark.createDataFrame(corpus_pdf.iloc[:100]).repartition(4)
    return build_index(spark, docs, str(tmp_path / name), num_segments=2)


def _run_stream(spark, idx, corpus_pdf, tmp_path, tag, lo, hi,
                stream_name=None):
    src = str(tmp_path / f"src_{tag}")
    pdf = corpus_pdf.iloc[lo:hi].copy()
    pdf["content"] = pdf["content"] + f" streamed{tag}"
    spark.createDataFrame(pdf).coalesce(1).write.mode("append").parquet(src)
    stream = spark.readStream.schema(
        spark.read.parquet(src).schema).parquet(src)
    q = attach_stream(idx, stream, str(tmp_path / f"ckpt_{tag}"),
                      num_partitions=2, stream_name=stream_name).start()
    q.awaitTermination()


def test_new_query_after_old_watermark_is_not_skipped(spark, corpus_pdf,
                                                      tmp_path):
    """The ADVICE regression: a prior query left a high watermark; a NEW
    query (fresh checkpoint, batch ids restart at 0) must still apply."""
    idx = _build(spark, corpus_pdf, tmp_path, "as_idx")
    try:
        # stream 1 applies and records its watermark under its own key
        _run_stream(spark, idx, corpus_pdf, tmp_path, "one", 100, 120)
        assert idx.max_doc == 120
        marks = idx.meta["stream_batches_applied"]
        assert list(marks.values()) == [0]
        # stream 2: fresh checkpoint, batch ids restart at 0 — with a
        # global watermark this batch would be silently dropped
        _run_stream(spark, idx, corpus_pdf, tmp_path, "two", 120, 140)
        assert idx.max_doc == 140
        assert search(idx, "streamedtwo", k=5).count() > 0
        assert len(idx.meta["stream_batches_applied"]) == 2
        # a LEGACY global watermark (pre-upgrade index) is a global
        # floor: new streams under it are skipped (pre-upgrade
        # behavior), and reset_stream_watermark lifts it
        from voyagr_spark.streaming import reset_stream_watermark

        idx.meta["stream_batch_applied"] = 99
        idx._swap_meta()
        _run_stream(spark, idx, corpus_pdf, tmp_path, "three", 140, 160)
        assert idx.max_doc == 140  # floored by the legacy watermark
        # a plain reset leaves the GLOBAL legacy floor (other pre-upgrade
        # checkpoints still rely on it); include_legacy=True opts in
        reset_stream_watermark(idx, stream_name="any")
        assert idx.meta["stream_batch_applied"] == 99
        reset_stream_watermark(idx, stream_name="any", include_legacy=True)
        assert "stream_batch_applied" not in idx.meta
        _run_stream(spark, idx, corpus_pdf, tmp_path, "four", 140, 160)
        assert idx.max_doc == 160
    finally:
        shutil.rmtree(idx.dir, ignore_errors=True)


def test_replayed_batch_of_same_query_is_skipped(spark, corpus_pdf,
                                                 tmp_path):
    """Replay protection within ONE query still holds: if the watermark
    for THIS stream's key already covers batch 0, the re-delivered batch
    is skipped instead of indexed twice."""
    idx = _build(spark, corpus_pdf, tmp_path, "as_idx2")
    try:
        idx.meta["stream_batches_applied"] = {"myquery": 0}
        idx._swap_meta()
        # same stream_name => same key; its only batch has id 0 => skipped
        _run_stream(spark, idx, corpus_pdf, tmp_path, "rep", 100, 120,
                    stream_name="myquery")
        assert idx.max_doc == 100  # nothing applied (replay)
        # a later batch id under the same query DOES apply
        _run_stream(spark, idx, corpus_pdf, tmp_path, "rep2", 120, 140,
                    stream_name="other")
        assert idx.max_doc == 120
    finally:
        shutil.rmtree(idx.dir, ignore_errors=True)


def test_legacy_global_watermark_migrates(spark, corpus_pdf, tmp_path):
    """A pre-upgrade index carries one global int watermark
    (stream_batch_applied).  Resuming ANY pre-upgrade checkpoint keeps
    exactly-once — the legacy value floors every stream regardless of
    attach order; batches above it apply and earn per-stream map
    entries.  The legacy key stays until reset_stream_watermark."""
    idx = _build(spark, corpus_pdf, tmp_path, "as_legacy")
    try:
        idx.meta["stream_batch_applied"] = 0  # legacy: batch 0 applied
        idx.meta.pop("stream_batches_applied", None)
        idx._swap_meta()
        # replayed batch 0 of the resumed legacy stream: skipped
        _run_stream(spark, idx, corpus_pdf, tmp_path, "leg0", 100, 120)
        assert idx.max_doc == 100
        # batch 1 (a second file through the SAME checkpoint): applied,
        # and the legacy key is migrated away
        src = str(tmp_path / "src_leg0")
        pdf = corpus_pdf.iloc[120:140].copy()
        spark.createDataFrame(pdf).coalesce(1).write.mode("append").parquet(src)
        stream = spark.readStream.schema(
            spark.read.parquet(src).schema).parquet(src)
        from voyagr_spark.streaming import attach_stream

        q = attach_stream(idx, stream, str(tmp_path / "ckpt_leg0"),
                          num_partitions=2).start()
        q.awaitTermination()
        assert idx.max_doc == 120
        # legacy floor STAYS (a second pre-upgrade stream attaching later
        # must keep its floor too); per-stream map has the new watermark
        assert idx.meta["stream_batch_applied"] == 0
        assert list(idx.meta["stream_batches_applied"].values()) == [1]
    finally:
        shutil.rmtree(idx.dir, ignore_errors=True)


def test_reset_stream_watermark(spark, corpus_pdf, tmp_path):
    """Reprocessing a source at a REUSED checkpoint path: without a reset
    the path-keyed watermark skips every replayed batch; after
    reset_stream_watermark the batches apply."""
    from voyagr_spark.streaming import reset_stream_watermark

    idx = _build(spark, corpus_pdf, tmp_path, "as_reset")
    try:
        ckpt = str(tmp_path / "ckpt_rst")
        idx.meta["stream_batches_applied"] = {}
        _run_stream_at(spark, idx, corpus_pdf, tmp_path, "rst", 100, 120,
                       ckpt)
        assert idx.max_doc == 120
        # wipe the checkpoint (restart-from-scratch) and replay: skipped
        shutil.rmtree(ckpt, ignore_errors=True)
        _run_stream_at(spark, idx, corpus_pdf, tmp_path, "rst2", 120, 140,
                       ckpt, src_tag="rst")  # same source dir re-read
        assert idx.max_doc == 120  # watermark still blocks batch 0
        reset_stream_watermark(idx, checkpoint=ckpt)
        shutil.rmtree(ckpt, ignore_errors=True)
        _run_stream_at(spark, idx, corpus_pdf, tmp_path, "rst3", 140, 160,
                       ckpt, src_tag="rst")
        assert idx.max_doc > 120  # batches apply again after the reset
    finally:
        shutil.rmtree(idx.dir, ignore_errors=True)


def _run_stream_at(spark, idx, corpus_pdf, tmp_path, tag, lo, hi, ckpt,
                   src_tag=None):
    from voyagr_spark.streaming import attach_stream

    src = str(tmp_path / f"src_{src_tag or tag}")
    pdf = corpus_pdf.iloc[lo:hi].copy()
    pdf["content"] = pdf["content"] + f" streamed{tag}"
    spark.createDataFrame(pdf).coalesce(1).write.mode("append").parquet(src)
    stream = spark.readStream.schema(
        spark.read.parquet(src).schema).parquet(src)
    q = attach_stream(idx, stream, ckpt, num_partitions=2).start()
    q.awaitTermination()
