"""Replicator (lucene/replicator analog): file-level revision sync with an
atomic commit-last publish; replicas are bit-identical and incremental."""

import shutil
import sys
from pathlib import Path

import pytest

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

from voyagr_spark.corpus import generate_corpus
from voyagr_spark.indexer import Index, build_index
from voyagr_spark.replicator import LocalReplicator, snapshot, sync
from voyagr_spark.streaming import append_batch

QUERIES = ["file", "open OR merge", '"parse query tree"']


@pytest.fixture(scope="module")
def primary(spark, tmp_path_factory):
    pdf = generate_corpus(200, seed=11)
    d = tmp_path_factory.mktemp("repl_primary")
    idx = build_index(
        spark, spark.createDataFrame(pdf.iloc[:150]), str(d), num_segments=2
    )
    yield idx, pdf
    shutil.rmtree(d, ignore_errors=True)


def _results(spark, index_dir, q):
    from voyagr_spark.search import search

    idx = Index(spark, index_dir)
    return [(r["doc_id"], r["score"]) for r in search(idx, q, k=10).collect()]


def test_replica_is_bit_identical(spark, primary, tmp_path):
    idx, _ = primary
    dst = str(tmp_path / "replica")
    stats = sync(str(idx.dir), dst)
    assert stats["files_copied"] > 0 and stats["files_skipped"] == 0
    for q in QUERIES:
        assert _results(spark, dst, q) == _results(spark, str(idx.dir), q), q


def test_sync_is_idempotent(spark, primary, tmp_path):
    idx, _ = primary
    dst = str(tmp_path / "replica")
    first = sync(str(idx.dir), dst)
    second = sync(str(idx.dir), dst)
    assert second["files_copied"] == 0
    assert second["files_skipped"] == first["files_copied"]
    assert second["revision"] == first["revision"]


def test_incremental_sync_copies_only_new_files(spark, primary, tmp_path):
    idx, pdf = primary
    dst = str(tmp_path / "replica")
    first = sync(str(idx.dir), dst)

    append_batch(idx, spark.createDataFrame(pdf.iloc[150:]), num_partitions=2)
    idx.reload_meta()
    second = sync(str(idx.dir), dst)
    # write-once storage: nothing already replicated is re-copied
    assert second["files_skipped"] >= first["files_copied"]
    assert 0 < second["files_copied"]
    assert second["revision"] != first["revision"]
    for q in QUERIES:
        assert _results(spark, dst, q) == _results(spark, str(idx.dir), q), q

    # tombstones replicate too (bucketed parquet is just more files)
    live = _results(spark, dst, "file")
    if live:
        victim = live[0][0]
        idx.delete_docs([victim])
        sync(str(idx.dir), dst)
        assert victim not in [d for d, _ in _results(spark, dst, "file")]


def test_check_for_update_semantics(primary):
    idx, _ = primary
    rep = LocalReplicator(str(idx.dir))
    rev = rep.current_revision()
    assert rep.check_for_update(rev.version) is None
    assert rep.check_for_update(None).version == rev.version
    assert rep.check_for_update("0" * 16).version == rev.version


def test_snapshot_never_includes_commit_pointer(primary):
    idx, _ = primary
    rev = snapshot(str(idx.dir))
    assert "meta.json" not in rev.files
    assert all(not f.endswith(".tmp") for f in rev.files)
    assert rev.size_bytes == sum(rev.files.values()) > 0
