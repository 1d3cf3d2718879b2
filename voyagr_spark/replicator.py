"""Index replication, Spark-first (reference module `lucene/replicator`).

Reference semantics re-expressed:

* `replicator/Replicator.java:29-63` — a *publisher* exposes immutable
  **revisions**; clients check for a newer revision and obtain only the
  files they lack.
* `replicator/IndexRevision.java:38-80` — a revision is the file set of
  one commit point; index files are **write-once**, so a file name (+
  size, `RevisionFile.java:24-40`) identifies its content.
* `replicator/ReplicationClient.java:260-320` (`doUpdate`) — copy the
  missing files to the replica side first, then hand off to the handler.
* `replicator/IndexReplicationHandler.java:180-240` — the commit metadata
  (segments file; here `meta.json`) is published **last and atomically**,
  so a reader of the replica always sees a consistent index.
* `replicator/LocalReplicator.java:86-150` — in-process publisher;
  obtaining a session pins the revision so its files outlive a concurrent
  publish (our storage layer already guarantees this: nothing under an
  index dir is ever rewritten or deleted eagerly — segments / stats
  deltas / tombstones are append-only dirs and stale stats dirs are only
  GC'd on a later open, see `indexer.Index._gc_stale_stats`).

Spark-native mapping: an index "commit" is the `meta.json` pointer; all
data files (segment parquet, stats lineage dirs, tombstone buckets,
manifest) are write-once.  Replication is therefore a pure *file-level*
rsync driven by the snapshot meta: read the meta bytes FIRST (the
SessionToken), copy every data file the replica lacks, then publish the
snapshot meta via write-to-temp + atomic rename.  No Spark job runs at
all — on a cluster this is a driver-side object-store copy (or a
distributed `binaryFile` copy for huge indexes), and the replica is
queryable the instant the meta lands.
"""

from __future__ import annotations

import hashlib
import json
import os
import shutil
from pathlib import Path

#: never replicated: the commit pointer is published last, temp files never
_SKIP_NAMES = {"meta.json", "meta.json.tmp"}


class Revision:
    """Immutable snapshot of a published index state (IndexRevision analog).

    `version` orders revisions (Revision.java:33-42 compareTo): the source
    meta's stream/delete epochs + max_doc make it monotone across appends,
    deletes, and merges; `files` maps relpath -> size (RevisionFile)."""

    def __init__(self, meta_bytes: bytes, files: dict[str, int]):
        self.meta_bytes = meta_bytes
        self.meta = json.loads(meta_bytes)
        self.files = files
        self.version = hashlib.sha256(meta_bytes).hexdigest()[:16]

    @property
    def size_bytes(self) -> int:
        return sum(self.files.values())


def snapshot(index_dir: str | os.PathLike) -> Revision:
    """Take a consistent revision of a live index dir.

    Order matters: the meta bytes are read BEFORE the file walk, so every
    file the snapshot meta references is guaranteed to appear in the walk
    (files are write-once and created before the meta that references
    them); files published after the meta read may also be swept up —
    harmless, they are unreferenced until a later meta."""
    root = Path(index_dir)
    meta_bytes = (root / "meta.json").read_bytes()
    files: dict[str, int] = {}
    for p in sorted(root.rglob("*")):
        if not p.is_file():
            continue
        rel = p.relative_to(root).as_posix()
        if p.name in _SKIP_NAMES or p.suffix == ".tmp":
            continue
        files[rel] = p.stat().st_size
    return Revision(meta_bytes, files)


def sync(src_dir: str | os.PathLike, dst_dir: str | os.PathLike) -> dict:
    """One replication round (ReplicationClient.doUpdate analog).

    Copies only files the replica lacks (name+size identity — write-once
    storage makes this exact), then atomically publishes the snapshot
    meta.  Idempotent: a second sync with no new revision copies nothing.
    Returns {files_copied, bytes_copied, files_skipped, revision}.
    """
    rev = snapshot(src_dir)
    src, dst = Path(src_dir), Path(dst_dir)
    dst.mkdir(parents=True, exist_ok=True)
    copied = skipped = nbytes = 0
    for rel, size in rev.files.items():
        target = dst / rel
        if target.exists() and target.stat().st_size == size:
            skipped += 1
            continue
        target.parent.mkdir(parents=True, exist_ok=True)
        tmp = target.with_name(target.name + ".rep.tmp")
        shutil.copyfile(src / rel, tmp)
        os.replace(tmp, target)  # per-file atomic: readers never see partials
        copied += 1
        nbytes += size
    # publish the SNAPSHOT meta (not a re-read — a concurrent publish on the
    # source could reference files this round did not copy), temp + rename:
    # the IndexReplicationHandler commit-last contract
    tmp = dst / "meta.json.tmp"
    tmp.write_bytes(rev.meta_bytes)
    os.replace(tmp, dst / "meta.json")
    return {
        "files_copied": copied,
        "bytes_copied": nbytes,
        "files_skipped": skipped,
        "revision": rev.version,
    }


class LocalReplicator:
    """In-process publisher over a source index dir (LocalReplicator.java).

    `check_for_update(last_version)` mirrors checkForUpdate: None when the
    replica already has the newest revision."""

    def __init__(self, src_dir: str | os.PathLike):
        self.src_dir = str(src_dir)

    def current_revision(self) -> Revision:
        return snapshot(self.src_dir)

    def check_for_update(self, last_version: str | None) -> Revision | None:
        rev = self.current_revision()
        if last_version is not None and rev.version == last_version:
            return None
        return rev

    def sync_to(self, dst_dir: str | os.PathLike) -> dict:
        return sync(self.src_dir, dst_dir)
