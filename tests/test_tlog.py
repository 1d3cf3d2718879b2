"""Transaction log (UpdateLog analog — solr/core/src/java/org/apache/solr/
update/UpdateLog.java): durable log-then-apply, versioned entries, replay
of committed-but-unapplied tails, orphan-segment dead-listing, purge.
"""

import json
import shutil

import pytest
from pyspark.sql import functions as F

from voyagr_spark import tlog
from voyagr_spark.indexer import Index, build_index
from voyagr_spark.search import search
from voyagr_spark.streaming import append_batch


def _build(spark, corpus_pdf, tmp_path_factory, name):
    d = tmp_path_factory.mktemp(name)
    docs = spark.createDataFrame(corpus_pdf.iloc[:250]).repartition(4)
    return build_index(spark, docs, str(d), num_segments=3)


def _batch(spark, corpus_pdf):
    return spark.createDataFrame(corpus_pdf.iloc[250:280])


def _results(idx, q="open AND file", k=10):
    return sorted(
        (r["repo"], r["path"], r["commit"], r["score"])
        for r in search(idx, q, k=k).join(idx.docmap(), "doc_id").collect()
    )


@pytest.fixture(scope="module")
def twin(spark, corpus_pdf, tmp_path_factory):
    """Reference: the same base + batch through the plain append path."""
    idx = _build(spark, corpus_pdf, tmp_path_factory, "tlog_twin")
    append_batch(idx, _batch(spark, corpus_pdf), num_partitions=2)
    yield idx
    shutil.rmtree(idx.dir, ignore_errors=True)


def test_durable_append_applies_and_marks(spark, corpus_pdf,
                                          tmp_path_factory, twin):
    idx = _build(spark, corpus_pdf, tmp_path_factory, "tlog_da")
    try:
        tlog.durable_append(idx, _batch(spark, corpus_pdf),
                            num_partitions=2)
        assert idx.meta["tlog_applied"] == 1
        assert tlog.pending(idx) == []
        assert _results(idx) == _results(twin)
    finally:
        shutil.rmtree(idx.dir, ignore_errors=True)


def test_recover_replays_logged_but_unapplied(spark, corpus_pdf,
                                              tmp_path_factory, twin):
    """Crash between the tlog write and the apply: the entry is durable,
    nothing was indexed — recovery replays it."""
    idx = _build(spark, corpus_pdf, tmp_path_factory, "tlog_crash1")
    try:
        v = tlog.log_batch(idx, _batch(spark, corpus_pdf),
                           num_partitions=2)
        assert [e["version"] for e in tlog.pending(idx)] == [v]
        assert idx.max_doc == 250  # nothing applied yet
        reopened = Index(spark, str(idx.dir))  # the restart
        assert tlog.recover(reopened) == [v]
        assert tlog.pending(reopened) == []
        assert reopened.meta.get("dead_segs") is None  # no orphans existed
        assert _results(reopened) == _results(twin)
    finally:
        shutil.rmtree(idx.dir, ignore_errors=True)


def test_recover_dead_lists_orphan_segments(spark, corpus_pdf,
                                            tmp_path_factory, twin):
    """Crash AFTER the segment files landed but BEFORE the meta swap: the
    orphan seg range is dead-listed (no parquet rewrite), the epoch bumps,
    and the replay lands in a fresh range — no duplicate doc ids, results
    identical to the clean twin, CheckIndex clean."""
    idx = _build(spark, corpus_pdf, tmp_path_factory, "tlog_crash2")
    try:
        saved = (idx.dir / "meta.json").read_bytes()
        v = tlog.log_batch(idx, _batch(spark, corpus_pdf),
                           num_partitions=2)
        append_batch(idx, _batch(spark, corpus_pdf), num_partitions=2,
                     tlog_version=v)  # full apply...
        (idx.dir / "meta.json").write_bytes(saved)  # ...whose swap "lost"
        reopened = Index(spark, str(idx.dir))
        assert [e["version"] for e in tlog.pending(reopened)] == [v]
        assert tlog.recover(reopened) == [v]
        assert len(reopened.meta["dead_segs"]) == 1
        # no duplicate ids among visible doc rows
        dm = reopened.docmap()
        assert dm.count() == dm.select("doc_id").distinct().count() == 280
        assert _results(reopened) == _results(twin)
        # stats lineage agrees with a full recompute (CheckIndex S5 pass)
        from voyagr_spark.checkindex import check_index

        assert check_index(reopened) == {}  # empty report = clean
    finally:
        shutil.rmtree(idx.dir, ignore_errors=True)


def test_durable_upsert_crash_dead_lists_orphans(spark, corpus_pdf,
                                                 tmp_path_factory):
    """Crash inside durable_upsert AFTER the append's segment files landed
    but BEFORE its meta swap (the exact window durable_upsert exists to
    close): replay must dead-list the orphan seg range first — otherwise
    append_batch re-lands in the SAME deterministic range (parquet
    mode=append) and every posting/doc row of the batch is doubled."""
    from voyagr_spark.streaming import upsert_batch

    def _mutated(spark):
        pdf = corpus_pdf.iloc[40:60].copy()
        pdf["content"] = pdf["content"] + " upserted sentinel"
        return spark.createDataFrame(pdf)

    twin = _build(spark, corpus_pdf, tmp_path_factory, "tlog_ups_twin")
    idx = _build(spark, corpus_pdf, tmp_path_factory, "tlog_ups_crash")
    try:
        upsert_batch(twin, _mutated(spark), num_partitions=2)
        batch = _mutated(spark)
        # durable_upsert's steps, crashing after the final append's
        # parquet writes but before its meta swap:
        v = tlog.log_batch(idx, batch, op="upsert", num_partitions=2)
        idx.delete_by_keys(batch)
        saved = (idx.dir / "meta.json").read_bytes()  # post-delete meta
        append_batch(idx, batch, num_partitions=2, tlog_version=v)
        (idx.dir / "meta.json").write_bytes(saved)  # ...swap "lost"
        reopened = Index(spark, str(idx.dir))
        assert [e["version"] for e in tlog.pending(reopened)] == [v]
        assert tlog.recover(reopened) == [v]
        assert len(reopened.meta["dead_segs"]) == 1
        dm = reopened.docmap()
        assert dm.count() == dm.select("doc_id").distinct().count() == 270
        assert _results(reopened, "upserted AND sentinel") == \
            _results(twin, "upserted AND sentinel")
        assert _results(reopened) == _results(twin)
        from voyagr_spark.checkindex import check_index

        assert check_index(reopened) == {}
        assert tlog.recover(reopened) == []  # idempotent
    finally:
        shutil.rmtree(idx.dir, ignore_errors=True)
        shutil.rmtree(twin.dir, ignore_errors=True)


def test_durable_delete_and_replay(spark, corpus_pdf, tmp_path_factory):
    idx = _build(spark, corpus_pdf, tmp_path_factory, "tlog_del")
    try:
        victim = idx.docmap().orderBy("doc_id").limit(1).collect()[0]
        keys = idx.spark.createDataFrame(
            [(victim["repo"], victim["path"], victim["commit"])],
            "repo string, path string, commit string",
        )
        # crash before apply: log only, then recover
        v = tlog.log_batch(idx, keys, op="delete_keys")
        reopened = Index(spark, str(idx.dir))
        assert tlog.recover(reopened) == [v]
        assert reopened.meta["tlog_applied"] == v
        import numpy as np

        deleted = reopened.deleted_doc_ids()
        assert deleted is not None and victim["doc_id"] in deleted
        # applied entries do not replay twice
        assert tlog.recover(reopened) == []
    finally:
        shutil.rmtree(idx.dir, ignore_errors=True)


def test_torn_entry_is_invisible(spark, corpus_pdf, tmp_path_factory):
    """A payload dir without entry.json (crash mid-log) is ignored, and
    the next version does not reuse its slot... it can, safely: the torn
    dir has no entry.json, so log_batch overwrites the payload."""
    idx = _build(spark, corpus_pdf, tmp_path_factory, "tlog_torn")
    try:
        entry = idx.dir / "tlog" / "v000000000001"
        _batch(spark, corpus_pdf).limit(2).select(
            "repo", "path", "commit", "lang", "content"
        ).write.mode("overwrite").parquet(str(entry / "payload"))
        assert tlog.pending(idx) == []
        assert tlog.recover(idx) == []
        v = tlog.log_batch(idx, _batch(spark, corpus_pdf))
        assert v == 1  # slot reused; entry.json now commits it
        assert [e["version"] for e in tlog.pending(idx)] == [1]
    finally:
        shutil.rmtree(idx.dir, ignore_errors=True)


def test_purge_applied_keeps_tail(spark, corpus_pdf, tmp_path_factory):
    idx = _build(spark, corpus_pdf, tmp_path_factory, "tlog_purge")
    try:
        for lo in (250, 260, 270):
            tlog.durable_append(
                idx, spark.createDataFrame(corpus_pdf.iloc[lo:lo + 10]),
                num_partitions=2,
            )
        assert idx.meta["tlog_applied"] == 3
        removed = tlog.purge_applied(idx, keep=2)
        assert removed == 1
        left = [json.loads((p / "entry.json").read_text())["version"]
                for _, p in tlog._entry_dirs(idx)]
        assert left == [2, 3]
        assert tlog.next_version(idx) == 4  # monotone past purged entries
        assert tlog.pending(idx) == []
    finally:
        shutil.rmtree(idx.dir, ignore_errors=True)


def test_realtime_get_pending_add(spark, corpus_pdf, tmp_path_factory):
    """RTG sees a logged-but-unapplied doc (invisible to search), and the
    index path takes over after recovery."""
    idx = _build(spark, corpus_pdf, tmp_path_factory, "tlog_rtg")
    try:
        key = {"repo": "rtg-repo", "path": "pending", "commit": "c9"}
        batch = spark.createDataFrame(
            [(key["repo"], key["path"], key["commit"], "en",
              "uncommitted rtg content")],
            "repo string, path string, commit string, lang string, content string",
        )
        tlog.log_batch(idx, batch, num_partitions=1)  # durable, not applied
        got = tlog.realtime_get(idx, batch, key)
        assert got["content"] == "uncommitted rtg content"
        assert search(idx, "uncommitted", k=5).count() == 0  # not searchable
        tlog.recover(idx)
        assert search(idx, "uncommitted", k=5).count() == 1
        got2 = tlog.realtime_get(idx, batch, key)  # now the index path
        assert got2["content"] == "uncommitted rtg content"
        assert got2["doc_id"] == 250
    finally:
        shutil.rmtree(idx.dir, ignore_errors=True)


def test_realtime_get_pending_delete_and_lww(spark, corpus_pdf,
                                             tmp_path_factory):
    """A pending delete hides the doc from RTG while it is still
    searchable; a newer pending add for the same key wins (last write)."""
    idx = _build(spark, corpus_pdf, tmp_path_factory, "tlog_rtg2")
    try:
        victim = idx.docmap().orderBy("doc_id").limit(1).collect()[0]
        key = {k: victim[k] for k in ("repo", "path", "commit")}
        keys_df = spark.createDataFrame([tuple(key.values())],
                                        "repo string, path string, commit string")
        tlog.log_batch(idx, keys_df, op="delete_keys")
        assert tlog.realtime_get(idx, None, key) is None  # uncommitted delete
        re_add = spark.createDataFrame(
            [(key["repo"], key["path"], key["commit"], "en", "resurrected")],
            "repo string, path string, commit string, lang string, content string",
        )
        tlog.log_batch(idx, re_add, num_partitions=1)
        got = tlog.realtime_get(idx, None, key)
        assert got["content"] == "resurrected"  # newest entry wins
    finally:
        shutil.rmtree(idx.dir, ignore_errors=True)


def test_realtime_get_applied_tombstone_and_missing(spark, corpus_pdf,
                                                    tmp_path_factory):
    idx = _build(spark, corpus_pdf, tmp_path_factory, "tlog_rtg3")
    try:
        victim = idx.docmap().orderBy("doc_id").limit(1).collect()[0]
        key = {k: victim[k] for k in ("repo", "path", "commit")}
        idx.delete_docs([victim["doc_id"]])
        assert tlog.realtime_get(idx, None, key) is None  # tombstoned
        assert tlog.realtime_get(
            idx, None, {"repo": "no", "path": "such", "commit": "doc"}
        ) is None
    finally:
        shutil.rmtree(idx.dir, ignore_errors=True)


def test_realtime_get_upserted_key_newest_copy(spark, corpus_pdf,
                                               tmp_path_factory):
    from voyagr_spark.streaming import upsert_batch

    idx = _build(spark, corpus_pdf, tmp_path_factory, "tlog_rtg4")
    try:
        victim = idx.docmap().orderBy("doc_id").limit(1).collect()[0]
        key = {k: victim[k] for k in ("repo", "path", "commit")}
        batch = spark.createDataFrame(
            [(key["repo"], key["path"], key["commit"], "en", "updated body")],
            "repo string, path string, commit string, lang string, content string",
        )
        upsert_batch(idx, batch, num_partitions=1)
        got = tlog.realtime_get(idx, batch, key)
        assert got["content"] == "updated body"
        assert got["doc_id"] == 250  # the re-added copy, not the tombstoned
    finally:
        shutil.rmtree(idx.dir, ignore_errors=True)


def test_recover_probe_uses_pid_hwm_clamp(spark, corpus_pdf,
                                          tmp_path_factory):
    """Review regression (r5): the orphan probe must compute the crashed
    attempt's seg range with the SAME max(epoch-formula, pid_hwm) clamp
    append_batch uses.  Here a wide append (nparts=8) raises pid_hwm far
    past the epoch formula; a narrow durable add (nparts=2) then crashes
    after its files landed.  Probing the bare epoch formula would
    dead-list LIVE segments of the wide append (data loss) and miss the
    real orphans (batch doubled on replay)."""
    idx = _build(spark, corpus_pdf, tmp_path_factory, "tlog_hwm")
    twin = _build(spark, corpus_pdf, tmp_path_factory, "tlog_hwm_twin")
    try:
        wide = spark.createDataFrame(corpus_pdf.iloc[250:280])
        append_batch(idx, wide, num_partitions=8)
        append_batch(twin, wide, num_partitions=8)
        saved = (idx.dir / "meta.json").read_bytes()
        narrow = spark.createDataFrame(corpus_pdf.iloc[280:300])
        v = tlog.log_batch(idx, narrow, num_partitions=2)
        append_batch(idx, narrow, num_partitions=2, tlog_version=v)
        (idx.dir / "meta.json").write_bytes(saved)  # crash: swap lost
        append_batch(twin, narrow, num_partitions=2)
        reopened = Index(spark, str(idx.dir))
        assert tlog.recover(reopened) == [v]
        assert len(reopened.meta["dead_segs"]) == 1
        dm = reopened.docmap()
        assert dm.count() == dm.select("doc_id").distinct().count() == 300
        assert _results(reopened) == _results(twin)
        from voyagr_spark.checkindex import check_index

        assert check_index(reopened) == {}
    finally:
        shutil.rmtree(idx.dir, ignore_errors=True)
        shutil.rmtree(twin.dir, ignore_errors=True)
