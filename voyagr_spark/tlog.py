"""Transaction log — the UpdateLog analog (solr/core/src/java/org/apache/
solr/update/UpdateLog.java; SURVEY §2.8 streaming checklist: "NRT segment
publishing + transaction log for durability/replay").

Solr's UpdateLog makes every update durable BEFORE it is applied to the
in-memory index, assigns each a monotonically increasing version
(UpdateLog.java `add`/`deleteByQuery` + VersionInfo), and replays
unapplied tail entries on startup (`UpdateLog.recoverFromLog`,
LogReplayer).  The Spark-first re-expression over the write-once index
layout:

* a tlog *entry* is a directory `tlog/v{version:012d}/` holding the raw
  operation payload as parquet plus an `entry.json` record; the entry
  becomes durable when `entry.json` lands via tmp+rename (the fsync'd
  tlog-record analog) — a half-written payload with no entry.json is
  invisible to recovery;
* *applied* is recorded as `meta["tlog_applied"] = version` by the SAME
  atomic meta swap that publishes the indexed segments
  (`streaming.append_batch(tlog_version=...)` /
  `Index.delete_by_keys(tlog_version=...)`) — the entry is applied
  exactly-once no matter where a crash lands;
* `recover(index)` replays committed-but-unapplied entries in version
  order through the normal append/delete paths.  A crashed `add` attempt
  may have written orphan segment files under the epoch's deterministic
  seg-id range; instead of rewriting parquet, recovery *dead-lists* that
  range in meta (`dead_segs`) and bumps the stream epoch so the replay
  lands in a fresh range — readers push the dead-range predicates into
  every scan, where parquet footer min/max prunes the orphan files whole
  (`Index._drop_dead_segs`).  Recovery therefore does zero data rewrites.

Single-writer discipline (one appender per index, as with Solr's one
leader per shard) is assumed for version assignment; readers and
recovery are safe against crashes at any point of the writer.
"""

from __future__ import annotations

import json
import os
from pathlib import Path

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .indexer import Index

#: payload column set for "add" entries (the input_hint corpus shape)
_ADD_COLS = ("repo", "path", "commit", "lang", "content")
_KEY_COLS = ("repo", "path", "commit")


def _tlog_dir(index: Index) -> Path:
    return index.dir / "tlog"


def _entry_dirs(index: Index) -> list[tuple[int, Path]]:
    root = _tlog_dir(index)
    if not root.exists():
        return []
    out = []
    for p in sorted(root.iterdir()):
        if p.name.startswith("v") and (p / "entry.json").exists():
            out.append((int(p.name[1:]), p))
    return sorted(out)


def next_version(index: Index) -> int:
    """Monotone version assignment (VersionInfo analog): one past the
    highest version ever logged or applied."""
    logged = max((v for v, _ in _entry_dirs(index)), default=0)
    return max(logged, int(index.meta.get("tlog_applied", 0))) + 1


def log_batch(index: Index, payload: DataFrame, op: str = "add",
              num_partitions: int = 4) -> int:
    """Write one durable tlog entry; returns its version.

    The payload parquet lands first; `entry.json` (tmp+rename) commits the
    entry — recovery ignores payload dirs without it, exactly as a torn
    tlog record past the last fsync is ignored."""
    if op in ("add", "upsert"):
        payload = payload.select(*_ADD_COLS)
    elif op == "delete_keys":
        payload = payload.select(*_KEY_COLS)
    else:
        raise ValueError(f"unknown tlog op: {op}")
    v = next_version(index)
    entry = _tlog_dir(index) / f"v{v:012d}"
    payload.write.mode("overwrite").parquet(str(entry / "payload"))
    rec = {"op": op, "version": v, "num_partitions": int(num_partitions)}
    tmp = entry / "entry.json.tmp"
    tmp.write_text(json.dumps(rec))
    os.replace(tmp, entry / "entry.json")  # durability point
    return v


def durable_append(index: Index, docs: DataFrame,
                   num_partitions: int = 4) -> list[int]:
    """Log-then-apply add (UpdateLog.add before DirectUpdateHandler2
    applies): the batch is durable before indexing starts; the apply marks
    the entry via the same meta swap that publishes the segments."""
    from .streaming import append_batch

    v = log_batch(index, docs, op="add", num_partitions=num_partitions)
    return append_batch(index, docs, num_partitions=num_partitions,
                        tlog_version=v)


def durable_delete(index: Index, keys: DataFrame,
                   num_partitions: int = 4) -> int:
    """Log-then-apply delete-by-key (UpdateLog.delete analog)."""
    v = log_batch(index, keys, op="delete_keys",
                  num_partitions=num_partitions)
    return index.delete_by_keys(keys, tlog_version=v)


def durable_upsert(index: Index, docs: DataFrame,
                   num_partitions: int = 4) -> list[int]:
    """Log-then-apply updateDocument (delete-by-key + add) under ONE
    version.  `upsert_batch` alone takes two independent meta swaps, so a
    crash between them loses the new copies; logging first closes that
    window: only the FINAL append's swap marks the version applied (the
    tombstone swap is unversioned), so replay after any crash point
    re-runs the idempotent delete and lands the add."""
    v = log_batch(index, docs, op="upsert", num_partitions=num_partitions)
    index.delete_by_keys(docs)
    from .streaming import append_batch

    return append_batch(index, docs, num_partitions=num_partitions,
                        tlog_version=v)


def pending(index: Index) -> list[dict]:
    """Committed-but-unapplied entries in version order (the replay tail —
    UpdateLog.recoverFromLog's getLogList + lastAddedVersion cut)."""
    applied = int(index.meta.get("tlog_applied", 0))
    out = []
    for v, p in _entry_dirs(index):
        if v > applied:
            rec = json.loads((p / "entry.json").read_text())
            rec["path"] = str(p / "payload")
            out.append(rec)
    return out


def _dead_list_orphans(index: Index, nparts: int) -> bool:
    """Dead-list the seg-id range a crashed apply attempt would have
    written, then advance the id allocator so the replay lands in a fresh
    range.  One footer-pruned existence probe; records the range only
    when orphan rows exist.  Returns True if a range was dead-listed.

    The probed range MUST be computed with the same
    max(epoch-formula, pid_hwm) clamp `append_batch` uses to pick its
    pid_base — probing the bare epoch formula when pid_hwm dominates
    would both miss the real orphans (the replay then re-appends into
    the identical seg ids, doubling the batch) and dead-list seg ids a
    PREVIOUS successful append legitimately owns (data loss).  For the
    same reason the swap bumps pid_hwm past the dead range, not just the
    epoch: when pid_hwm was the binding term, an epoch bump alone would
    re-issue the dead-listed ids to the replay itself."""
    from .streaming import STREAM_PARTITION_BASE

    spark = index.spark
    epoch = int(index.meta.get("stream_epoch", 0))
    pid_base = max(
        STREAM_PARTITION_BASE + epoch * max(nparts, 1) * 2,
        int(index.meta.get("pid_hwm", 0)),
    )
    lo = pid_base << 20
    hi = (pid_base + 2 * max(nparts, 1)) << 20
    orphans = (
        spark.read.parquet(str(index.dir / "segments"))
        .filter((F.col("seg") >= lo) & (F.col("seg") < hi))
        .limit(1)
        .count()
    )
    if not orphans:
        return False
    dead = list(index.meta.get("dead_segs", []))
    dead.append([lo, hi])
    index.meta["dead_segs"] = dead
    # epoch + pid_hwm bump together guarantee the replay's pid_base lands
    # past the dead range; the swap is atomic, so a crash here just
    # re-runs this probe
    index.meta["stream_epoch"] = epoch + 1
    index.meta["pid_hwm"] = pid_base + 2 * max(nparts, 1)
    index._swap_meta()
    index._postings_df = None
    index._df_cache = None
    return True


def recover(index: Index) -> list[int]:
    """Replay unapplied tlog entries (LogReplayer analog); returns the
    versions replayed.  Safe to call any time; a clean index is a no-op.

    For an `add` entry whose crashed attempt may have left orphan segment
    files, the attempt's deterministic seg-id range is dead-listed and the
    epoch bumped BEFORE replaying — the replay lands in a fresh range and
    the orphans become invisible (and file-pruned) everywhere.  The dead
    range is only recorded when orphan rows actually exist (one
    footer-pruned existence probe)."""
    from .streaming import append_batch

    spark = index.spark
    replayed = []
    for rec in pending(index):
        v = int(rec["version"])
        nparts = int(rec.get("num_partitions", 4))
        payload = spark.read.parquet(rec["path"])
        if rec["op"] == "add":
            _dead_list_orphans(index, nparts)
            append_batch(index, payload, num_partitions=nparts,
                         tlog_version=v)
        elif rec["op"] == "upsert":
            # the crashed attempt's append_batch may have landed orphan
            # segment files exactly as a crashed add's can (the delete
            # half is idempotent meta-only) — dead-list that range first,
            # or the replay doubles every posting/doc row of the batch
            _dead_list_orphans(index, nparts)
            # delete is idempotent and unversioned; the append's swap
            # marks v applied (see durable_upsert)
            index.delete_by_keys(payload)
            append_batch(index, payload, num_partitions=nparts,
                         tlog_version=v)
        elif rec["op"] == "delete_keys":
            index.delete_by_keys(payload, tlog_version=v)
        replayed.append(v)
    return replayed


def realtime_get(index: Index, source: DataFrame | None,
                 key: dict) -> dict | None:
    """RealTimeGet (solr/core/src/java/org/apache/solr/handler/component/
    RealTimeGetComponent.java:80-160): the LATEST copy of a doc by
    uniqueKey, visible before any commit/reopen — the reference consults
    the update log's in-memory maps first and only then the newest
    searcher.  Here: pending (committed-but-unapplied) tlog entries are
    scanned newest-first — an `add` carrying the key returns its logged
    payload, a `delete_keys` hit returns None — then the published index
    answers (newest live docmap row for the key, tombstone-checked,
    hydrated from `source`).

    Scale shape: each probe is a key-predicate lookup pushed into a
    parquet scan (tlog payloads are micro-batch-sized; the docmap lookup
    prunes via footer min/max); the tombstone check reads one doc-id
    bucket.  Never a full scan, nothing driver-side but the one row."""
    from .indexer import load_tombstones

    spark = index.spark
    pred = None
    for f_ in _KEY_COLS:
        if f_ not in key:
            raise ValueError(f"realtime_get key must carry {f_!r}")
        p = F.col(f_) == key[f_]
        pred = p if pred is None else (pred & p)
    for rec in reversed(pending(index)):  # newest first (last-write-wins)
        rows = spark.read.parquet(rec["path"]).filter(pred).collect()
        if rows:
            if rec["op"] == "delete_keys":
                return None
            return rows[-1].asDict()
    # published index: newest live row for the key (an upserted key keeps
    # its tombstoned old ids in the docmap — take the max live doc_id)
    cand = sorted(
        index.docmap().filter(pred).select(
            "doc_id", "repo", "path", "commit", "lang").collect(),
        key=lambda r: -r["doc_id"],
    )
    ref = index.tombstone_ref()
    live = None
    for r in cand:
        if ref is not None:
            dead = load_tombstones(ref[0], ref[1], int(r["doc_id"]),
                                   int(r["doc_id"]))
            if dead.size and int(r["doc_id"]) in dead:
                continue
        live = r
        break
    if live is None:
        return None
    out = live.asDict()
    if source is not None:
        hyd = source.filter(pred).collect()
        if hyd:
            full = hyd[-1].asDict()
            full["doc_id"] = out["doc_id"]
            return full
    return out


def purge_applied(index: Index, keep: int = 2) -> int:
    """Drop applied tlog entries beyond the newest `keep` (UpdateLog keeps
    a bounded number of closed tlog files for peersync; old ones are
    deleted).  Returns the number of entries removed."""
    import shutil

    applied = int(index.meta.get("tlog_applied", 0))
    done = [(v, p) for v, p in _entry_dirs(index) if v <= applied]
    removed = 0
    for v, p in done[:-keep] if keep else done:
        shutil.rmtree(p, ignore_errors=True)
        removed += 1
    return removed
