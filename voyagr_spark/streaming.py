"""Incremental index appends — the NRT/streaming story (SURVEY §2.1 S7).

The reference has no event-time/watermark semantics: its streaming story is
near-real-time segment publishing (DirectoryReader.openIfChanged,
DirectoryReader.java:122; ControlledRealTimeReopenThread.java:43,157) plus a
transaction log.  The Spark analog:

* `append_batch(index, docs)` — index a new micro-batch as fresh segments:
  doc ids continue from the current max (arrival order, exactly Lucene's
  docID assignment), segments append to the same parquet dataset, global
  stats recompute, and the meta swap publishes atomically (the
  `openIfChanged` reopen point).
* `attach_stream(index, stream_df)` — Structured Streaming `foreachBatch`
  wrapper over append_batch; late/duplicate rows are the caller's MERGE
  concern (the corpus key is (repo, path, commit)).
"""

from __future__ import annotations

import json
import os

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .indexer import DOC_KEY, Index, SEGMENT_SCHEMA, _append_manifest, make_invert_fn

STREAM_PARTITION_BASE = 1 << 30  # keep streamed seg ids clear of build ids
STATS_COMPACT_AFTER = 4  # max stats delta dirs before compaction to one base


def append_batch(index: Index, docs: DataFrame, num_partitions: int = 4,
                 docs_per_segment: int = 100_000,
                 tlog_version: int | None = None,
                 stream_batch_id: int | None = None,
                 stream_key: str | None = None,
                 allow_blocks: bool = False) -> list[int]:
    """Index a micro-batch into new segments; returns the new segment ids.

    Per-append cost is O(batch), never O(index) (VERDICT r1 #3):

    * new segment ids derive deterministically from the per-partition counts
      already collected for doc-id offsets — no directory scan;
    * global stats update incrementally: aggregate ONLY the new segments'
      posting rows (the seg-range filter file-prunes via parquet footer
      min/max — new files carry only new seg ids) and merge with the current
      stats table (df/ttf are associative sums, max_tf/min_len are max/min),
      written as a new versioned dir + atomic meta-pointer swap;
    * added token count comes from the same new-rows aggregate (sum of ttf
      == sum of surviving doclens), not a rescan of kind=doc.
    """
    if index.meta.get("shard_split"):
        # split shards are read-only serving shards: their doc-id spaces
        # interleave (doc_id % n routing), so max_doc-based id assignment
        # would collide with ids owned by sibling shards
        raise ValueError(
            "index is a split shard (read-only); append to the source "
            "index and re-split, or build the shard corpora directly")
    if index.meta.get("has_blocks") and not allow_blocks:
        # raw appends would create docs outside every block — silently
        # invisible to block-join queries; route through the block writer
        raise ValueError(
            "index has parent/child blocks; append via "
            "blockjoin.append_blocks so the blockmap extends too")
    spark = index.spark
    base = index.max_doc
    epoch = int(index.meta.get("stream_epoch", 0))

    # one planned shuffle for both counting and inverting (see indexer.py)
    ranged = (
        docs.withColumn("content_sha256", F.sha2(F.col("content"), 256))
        .repartitionByRange(num_partitions, *DOC_KEY)
        .sortWithinPartitions(*DOC_KEY)
        .persist()
    )
    counts = (
        ranged.select(F.spark_partition_id().alias("pid"))
        .groupBy("pid")
        .count()
        .collect()
    )
    by_pid = sorted((r["pid"], r["count"]) for r in counts)
    offsets, acc = {}, base
    for pid, cnt in by_pid:
        offsets[pid] = acc
        acc += cnt

    # segment ids: (epoch-salted partition) << 20 | flush — disjoint per
    # batch; the pid high-water mark keeps ranges disjoint even when batch
    # partition counts vary or add_indexes interleaves with appends
    pid_base = max(
        STREAM_PARTITION_BASE + epoch * max(num_partitions, 1) * 2,
        int(index.meta.get("pid_hwm", 0)),
    )
    fn = make_invert_fn(offsets, docs_per_segment, pid_offset=pid_base,
                        analyzer=index.analyzer,
                        want_offsets=bool(index.meta.get("offsets")))
    seg_dir = index.dir / "segments"
    ranged.mapInArrow(fn, SEGMENT_SCHEMA).write.mode("append").partitionBy(
        "kind"
    ).option("parquet.block.size", str(4 * 1024 * 1024)).parquet(str(seg_dir))
    ranged.unpersist()
    index._postings_df = None  # new files under segments/ — drop cached listing
    index._stats_df = None
    index._df_cache = None
    # NOTE: the full invalidate_reader() (pin re-warm) runs after the meta
    # swap below — the new segments only become VISIBLE at the swap

    # seg ids are a pure function of (pid_base, counts, flush size): no scan
    new_segs = [
        ((pid_base + pid) << 20) | flush_no
        for pid, cnt in by_pid
        if cnt > 0
        for flush_no in range(-(-int(cnt) // docs_per_segment))
    ]

    # LSM-shaped incremental stats (VERDICT r2 #4): write ONLY the new
    # segments' aggregate as a delta dir — O(batch) bytes, not O(vocabulary)
    # — and let readers union the lineage; compact once the delta chain gets
    # long.  Old dirs are never deleted here (ADVICE r2, medium): a reader
    # holding the previous meta keeps valid files; the next open GCs them.
    lo = pid_base << 20
    hi = (pid_base + 2 * max(num_partitions, 1)) << 20
    new_postings = new_segment_postings(index, lo, hi)
    new_agg = new_postings.groupBy("term").agg(
        F.sum("df").alias("df"),
        F.sum("ttf").alias("ttf"),
        F.max("max_tf").alias("max_tf"),
        F.min("min_len").alias("min_len"),
    ).persist()
    added_len = int(new_agg.agg(F.sum("ttf")).collect()[0][0] or 0)
    delta_rel = f"term_stats_d{epoch + 1}"
    (
        new_agg.repartition(1, "term")
        .sortWithinPartitions("term")
        .write.mode("overwrite")
        .parquet(str(index.dir / delta_rel))
    )
    new_agg.unpersist()
    stats_dirs = index.stats_dirs() + [delta_rel]
    if len(stats_dirs) > STATS_COMPACT_AFTER:
        # compaction: one merged base (term-sorted for row-group pruning),
        # the delta chain resets — the tiered-merge analog for stats
        merged = (
            index.term_stats()
            .unionByName(index.spark.read.parquet(str(index.dir / delta_rel)))
            .groupBy("term")
            .agg(
                F.sum("df").alias("df"),
                F.sum("ttf").alias("ttf"),
                F.max("max_tf").alias("max_tf"),
                F.min("min_len").alias("min_len"),
            )
        )
        compact_rel = f"term_stats_v{epoch + 1}"
        (
            merged.repartition(max(1, num_partitions // 2), "term")
            .sortWithinPartitions("term")
            .write.mode("overwrite")
            .parquet(str(index.dir / compact_rel))
        )
        stats_dirs = [compact_rel]

    added = acc - base
    live = index.live_segments
    keep = sorted(set(live) | set(new_segs)) if live is not None else None

    index.meta["max_doc"] = base + added
    index.meta["sum_total_term_freq"] = index.sum_total_term_freq + added_len
    index.meta["stream_epoch"] = epoch + 1
    index.meta["pid_hwm"] = pid_base + 2 * max(num_partitions, 1)
    # appended ids continue from max_doc, so the GLOBAL (key, DOC_KEY)
    # doc-id order a sorted build guarantees no longer holds — drop the
    # flag; sort-by-field queries fall back to the generic collector
    # (documented divergence from Lucene's per-segment index sort, see
    # build_index docstring)
    index.meta.pop("index_sort", None)
    if tlog_version is not None:
        # the same atomic swap that publishes the segments marks the tlog
        # entry applied — exactly-once no matter where a crash lands
        index.meta["tlog_applied"] = max(
            int(index.meta.get("tlog_applied", 0)), int(tlog_version)
        )
    if stream_batch_id is not None:
        # the streaming analog (foreachBatch batch_id watermark) — a
        # SEPARATE key: tlog versions are their own monotone counter and
        # must not collide with Structured Streaming's 0-based batch ids.
        # Batch ids are only monotone WITHIN one streaming query
        # (checkpoint), so the watermark is scoped per stream_key — a
        # global int watermark would silently drop every batch of a NEW
        # query whose 0-based ids restart below the old high-water mark
        if stream_key is None:
            index.meta["stream_batch_applied"] = max(
                int(index.meta.get("stream_batch_applied", -1)),
                int(stream_batch_id),
            )
        else:
            marks = dict(index.meta.get("stream_batches_applied", {}))
            new_mark = max(int(marks.get(stream_key, -1)),
                           int(stream_batch_id))
            # re-insert at the END so the JSON round-trip's insertion
            # order tracks RECENCY — the bound below must evict the
            # longest-idle stream's key, never the one just written
            marks.pop(stream_key, None)
            marks[stream_key] = new_mark
            # bound the map (32 concurrent named streams is far past any
            # real attach fan-in)
            while len(marks) > 32:
                del marks[next(iter(marks))]
            index.meta["stream_batches_applied"] = marks
    index.meta.pop("stats_dir", None)  # legacy single-pointer form
    index.meta["stats_dirs"] = stats_dirs
    if keep is not None:
        index.meta["live_segments"] = keep
    # appended blobs use the CURRENT encoder — stamp on write, like
    # SegmentInfos bumping the index version (backward_codecs policy)
    from .codec import CODEC_VERSION

    index.meta["codec"] = CODEC_VERSION
    tmp = index.dir / "meta.json.tmp"
    tmp.write_text(json.dumps(index.meta))
    os.replace(tmp, index.dir / "meta.json")  # atomic publish (reopen point)
    index.invalidate_reader()  # meta pointer moved; a pinned searcher
    # re-warms over the new lineage so the batch is immediately visible
    _append_manifest(
        index.spark, index.dir / "manifest", f"append_epoch_{epoch}",
        [(s, -1, 0) for s in new_segs], 0.0,
    )
    return new_segs


def new_segment_postings(index: Index, lo: int, hi: int) -> DataFrame:
    """Posting rows of the freshly-appended seg-id range.  The range
    predicate prunes whole files via parquet footer min/max (each append
    task writes only its own seg ids), so this reads O(batch) input —
    plan-asserted in tests/test_streaming.py."""
    return (
        index.spark.read.parquet(str(index.dir / "segments" / "kind=posting"))
        .filter((F.col("seg") >= lo) & (F.col("seg") < hi))
    )


def upsert_batch(index: Index, docs: DataFrame, num_partitions: int = 4) -> list[int]:
    """updateDocument analog (S2, IndexWriter.java:1353): atomic
    delete-by-key + add — existing (repo, path, commit) rows are tombstoned,
    then the batch is appended as new segments."""
    index.delete_by_keys(docs)
    return append_batch(index, docs, num_partitions=num_partitions)


def attach_stream(index: Index, stream_df: DataFrame, checkpoint: str,
                  num_partitions: int = 4, stream_name: str | None = None):
    """foreachBatch writer: each micro-batch becomes new published segments.

    Exactly-once under replay: foreachBatch re-delivers a micro-batch when
    the driver dies between the append's meta swap and the streaming
    checkpoint commit; the batch_id rides append_batch's stream_batch_id
    so the already-applied batch is skipped instead of indexed twice (the
    same swap that publishes the segments records the watermark).

    Batch ids are only meaningful within ONE streaming query, so the
    watermark is scoped to the query: keyed by `stream_name` if given,
    else by the checkpoint path.  A NEW query (fresh checkpoint, ids
    restart at 0) therefore gets a fresh watermark instead of silently
    losing every batch below the previous query's high-water mark.
    Resuming an interrupted stream requires reusing the SAME checkpoint
    (that is already Structured Streaming's contract — a fresh checkpoint
    replays the source from scratch).  Deleting and RECREATING a
    checkpoint directory at the same path to reprocess a source keeps the
    old path-keyed watermark — pass a fresh `stream_name` or call
    `reset_stream_watermark` first, or every replayed batch is skipped.

    Migration: an index written before per-stream watermarks carries a
    single legacy int (`stream_batch_applied`).  Every attach treats it
    as a global floor — EVERY resumed pre-upgrade checkpoint keeps
    exactly-once, regardless of attach order (and a brand-new query on a
    legacy index sees exactly the pre-upgrade behavior, no worse).  A
    skip under the legacy floor is WARNING-logged with the batch id (the
    offsets commit at that checkpoint regardless — Structured Streaming
    will not redeliver them there), so an unintended floor is loud in
    the driver log instead of silent data loss; the key stays in meta
    until `reset_stream_watermark(..., include_legacy=True)` removes it
    for a deliberate reprocess."""
    import hashlib
    import logging

    log = logging.getLogger(__name__)
    key = stream_name or hashlib.sha1(
        os.path.abspath(checkpoint).encode()).hexdigest()[:16]

    def handle(batch_df: DataFrame, batch_id: int):
        marks = index.meta.get("stream_batches_applied", {})
        # read the legacy floor FRESH each batch (not closed over at
        # attach time) so a reset between attach and start takes effect
        legacy = int(index.meta.get("stream_batch_applied", -1))
        if int(batch_id) <= int(marks.get(key, -1)):
            return  # replayed batch of THIS stream: the index holds it
        if int(batch_id) <= legacy:
            log.warning(
                "attach_stream[%s]: skipping batch %s under the legacy "
                "global watermark %s (pre-upgrade index) — its offsets "
                "commit at this checkpoint; if this source was NOT "
                "already indexed, reset_stream_watermark(..., "
                "include_legacy=True) and restart from a fresh "
                "checkpoint", key, batch_id, legacy)
            return
        if batch_df.isEmpty():
            return
        append_batch(index, batch_df, num_partitions=num_partitions,
                     stream_batch_id=int(batch_id), stream_key=key)

    return (
        stream_df.writeStream.foreachBatch(handle)
        .option("checkpointLocation", checkpoint)
        .trigger(availableNow=True)
    )


def reset_stream_watermark(index: Index, checkpoint: str | None = None,
                           stream_name: str | None = None,
                           include_legacy: bool = False) -> None:
    """Forget the applied-batch watermark for one stream (by the same key
    attach_stream derives: `stream_name` if given, else the checkpoint
    path).  Use before reprocessing a source from scratch at a REUSED
    checkpoint path — the path-keyed watermark would otherwise skip every
    replayed batch.

    On a pre-upgrade index the legacy `stream_batch_applied` int is a
    GLOBAL floor shared by every stream that has no per-stream entry
    yet; clearing it for one stream's reset would strip the only replay
    protection the OTHER pre-upgrade checkpoints still have.  It is
    therefore only removed when `include_legacy=True` — the explicit
    opt-in for a deliberate whole-index reprocess (without it, a reset
    on a purely-legacy index leaves the floor and attach_stream's
    WARNING log points here)."""
    import hashlib

    if stream_name is None and checkpoint is None:
        raise ValueError("pass checkpoint or stream_name")
    key = stream_name or hashlib.sha1(
        os.path.abspath(checkpoint).encode()).hexdigest()[:16]
    marks = dict(index.meta.get("stream_batches_applied", {}))
    had_legacy = False
    if include_legacy:
        had_legacy = index.meta.pop("stream_batch_applied", None) is not None
    if key in marks or had_legacy:
        marks.pop(key, None)
        index.meta["stream_batches_applied"] = marks
        index._swap_meta()


def windowed_event_counts(events: DataFrame, hours: int = 6,
                          watermark: str = "1 hour") -> DataFrame:
    """Tumbling-window event aggregation, batch OR streaming.

    On a streaming DataFrame this is the watermarked windowed-agg shape
    (readStream -> withWatermark -> window groupBy -> writeStream): late
    rows beyond `watermark` are dropped and append-mode emits each window
    once it closes.  On a batch DataFrame the same transformation runs as a
    plain agg — relational.events_window exposes that form to the DuckDB
    oracle, so the streaming logic itself is correctness-gated.
    """
    src = events
    if events.isStreaming:
        # watermarks require TIMESTAMP (tz-aware); parquet NTZ event time is
        # interpreted session-local, matching the batch NTZ grouping
        src = src.withColumn("ts", F.col("ts").cast("timestamp"))
        src = src.withWatermark("ts", watermark)
    w = F.window("ts", f"{hours} hours")
    return (
        src.groupBy(w.alias("w"), "event_type")
        .agg(F.count("*").cast("long").alias("n"),
             F.round(F.sum("value"), 4).alias("sum_value"))
        .select(
            F.date_format(F.col("w.start"), "yyyy-MM-dd HH:mm:ss").alias("win_start"),
            "event_type", "n", "sum_value",
        )
    )
