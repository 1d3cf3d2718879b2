"""Checkpoint-resumable build (S5): a build interrupted between stages picks
up from the completed stage instead of redoing the heavy pass."""

import json
import shutil
from pathlib import Path

import numpy as np
import pytest


def test_resume_skips_completed_invert(spark, corpus_pdf, tmp_path):
    from voyagr_spark.indexer import build_index
    from voyagr_spark.search import search

    d = tmp_path / "idx"
    docs = spark.createDataFrame(corpus_pdf).repartition(4)
    idx = build_index(spark, docs, str(d), num_segments=4)
    want = [(r["doc_id"], np.float32(r["score"]))
            for r in search(idx, "file AND handle", k=10).collect()]

    # simulate a crash AFTER the invert stage committed but BEFORE stats:
    # remove the stats dir + meta, keep segments/_SUCCESS + offsets
    shutil.rmtree(d / "term_stats")
    (d / "meta.json").unlink()
    seg_mtimes = {p.name: p.stat().st_mtime for p in (d / "segments").rglob("*.parquet")}

    idx2 = build_index(spark, docs, str(d), num_segments=4, resume=True)
    got = [(r["doc_id"], np.float32(r["score"]))
           for r in search(idx2, "file AND handle", k=10).collect()]
    assert got == want
    # the heavy invert output was NOT rewritten
    after = {p.name: p.stat().st_mtime for p in (d / "segments").rglob("*.parquet")}
    assert after == seg_mtimes


def test_resume_noop_on_complete_index(spark, corpus_pdf, tmp_path):
    from voyagr_spark.indexer import build_index

    d = tmp_path / "idx2"
    docs = spark.createDataFrame(corpus_pdf).repartition(4)
    idx = build_index(spark, docs, str(d), num_segments=4)
    built_unix = idx.meta["built_unix"]
    max_doc = idx.max_doc
    idx2 = build_index(spark, docs, str(d), num_segments=4, resume=True)
    assert idx2.max_doc == max_doc
    assert idx2.meta["built_unix"] == built_unix  # nothing recomputed


def test_reader_refuses_mismatched_codec(spark, built_index, tmp_path):
    # the SegmentInfos-version analog: an index stamped with a different
    # codec must be refused, not silently mis-decoded
    import json
    import shutil

    from voyagr_spark.indexer import Index

    d = tmp_path / "stale"
    shutil.copytree(built_index.dir, d)
    meta = json.loads((d / "meta.json").read_text())
    meta["codec"] = "varint-0"
    (d / "meta.json").write_text(json.dumps(meta))
    with pytest.raises(ValueError, match="codec"):
        Index(spark, str(d))
