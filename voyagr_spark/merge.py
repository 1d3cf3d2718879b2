"""Tiered segment merging (SURVEY.md §2.4).

* Planner: a faithful-in-spirit TieredMergePolicy over the segment manifest —
  same constants (maxMergeAtOnce=10, segsPerTier=10, floorSegmentBytes=2MB,
  maxMergedSegmentBytes=5GB; TieredMergePolicy.java:81-88): segments are
  floored, sorted by size, grouped into tiers of ~equal log-size; when a tier
  holds more than segsPerTier segments, the smallest maxMergeAtOnce of them
  become one merge job.  Runs on the driver over tiny metadata.

* Executor: SegmentMerger (SegmentMerger.java:74-116) as
  `groupBy(term, bucket).applyInPandas(merge_term)` — decode the term's
  posting rows from the source segments, concatenate in ascending doc order
  (global doc ids never change, so no docID remap is needed — doc ranges of
  source segments are disjoint), re-encode with a fresh block directory.

* Skew (north_rule "per-term posting-block splitting"): the shuffle key is
  (term, bucket) where bucket groups source segments into contiguous runs, so
  a stopword-like hot term becomes several bounded tasks instead of one giant
  one.  The output then carries multiple posting-block rows for that term,
  which the query reader (search.TermPostings) treats as one logical list.

* Visibility: new segment files are appended, then meta.json's
  `live_segments` swaps atomically (tmp+rename) — the Iceberg-snapshot-commit
  stand-in.  Old rows stay on disk as tombstoned lineage.
"""

from __future__ import annotations

import json
import os
import time
from pathlib import Path

import numpy as np
import pandas as pd
from pyspark.sql import functions as F

from .codec import (
    BLOCK_SIZE,
    CODEC_VERSION,
    decode_postings,
    encode_postings,
)
from .indexer import SEGMENT_SCHEMA, Index, _append_manifest
from .smallfloat import NORM_TABLE

# TieredMergePolicy.java:81-88
MAX_MERGE_AT_ONCE = 10
SEGS_PER_TIER = 10
FLOOR_SEGMENT_BYTES = 2 * 1024 * 1024
MAX_MERGED_SEGMENT_BYTES = 5 * 1024**3


def plan_merges(seg_bytes: dict[int, int]) -> list[list[int]]:
    """Pick merge groups from {segment_id: approx_bytes}.

    Tiering: floor sizes, sort ascending; while more than SEGS_PER_TIER
    segments remain, merge the MAX_MERGE_AT_ONCE smallest whose combined size
    stays under MAX_MERGED_SEGMENT_BYTES.
    """
    floored = sorted(
        ((max(b, FLOOR_SEGMENT_BYTES), s) for s, b in seg_bytes.items())
    )
    merges: list[list[int]] = []
    while len(floored) > SEGS_PER_TIER:
        group, total = [], 0
        rest = []
        for size, seg in floored:
            if len(group) < MAX_MERGE_AT_ONCE and total + size <= MAX_MERGED_SEGMENT_BYTES:
                group.append(seg)
                total += size
            else:
                rest.append((size, seg))
        if len(group) < 2:
            break
        merges.append(group)
        floored = rest
    return merges


def _merge_term(pdf: pd.DataFrame, new_seg: int,
                tombstones: tuple[str, int] | None = None) -> pd.DataFrame:
    """Merge one (term, bucket) group: decode, concat doc-ordered, re-encode.

    Tombstoned docs are dropped here — merge is where deletes are reclaimed
    (SegmentMerger.java:74-116 skips non-live docs).  Tombstones are loaded
    EXECUTOR-side per source row's doc range (indexer.load_tombstones, the
    per-segment .liv read), not shipped in the task closure."""
    pdf = pdf.sort_values("first_doc", kind="mergesort")
    term = pdf["term"].iloc[0]
    docs = []
    tfs = []
    norms = []
    pos_chunks = []
    pay_chunks = []  # float32 per-occurrence payloads, 1:1 with positions
    has_pay = "pay_blob" in pdf.columns and pdf["pay_blob"].notna().any()
    for _, r in pdf.iterrows():
        d, t = decode_postings(
            r["docs_blob"], r["tfs_blob"],
            np.asarray(r["block_doc_boff"], dtype=np.int64),
            np.asarray(r["block_tf_boff"], dtype=np.int64),
            int(r["df"]),
        )
        from .codec import decode_positions_flat

        flat, doc_idx = decode_positions_flat(r["pos_blob"], t)
        # per-row guard (not just group-level): a group can mix
        # payload-bearing rows with null-pay rows (pre-payload segments
        # merging with post-payload ones); missing payloads fill 0.0,
        # keeping the stream 1:1 with positions
        if has_pay:
            pay = (np.frombuffer(r["pay_blob"], dtype="<f4")
                   if r["pay_blob"] is not None
                   else np.zeros(int(t.sum()), dtype="<f4"))
        else:
            pay = None
        nb = np.frombuffer(r["norms_blob"], dtype=np.uint8)
        deleted = None
        if tombstones is not None and d.size:
            from .indexer import load_tombstones

            deleted = load_tombstones(
                tombstones[0], tombstones[1], int(d[0]), int(d[-1])
            )
        if deleted is not None and deleted.size:
            idx = np.searchsorted(deleted, d)
            idx_c = np.minimum(idx, deleted.size - 1)
            live = deleted[idx_c] != d
            if not live.all():
                keep_pos = live[doc_idx]
                if pay is not None:
                    pay = pay[keep_pos]  # payloads ride the positions stream
                flat, doc_idx_old = flat[keep_pos], doc_idx[keep_pos]
                # re-map doc_idx to surviving ordinals
                remap = np.cumsum(live) - 1
                doc_idx = remap[doc_idx_old]
                d, t, nb = d[live], t[live], nb[live]
        if d.size == 0:
            continue
        docs.append(d)
        tfs.append(t)
        norms.append(nb)
        pos_chunks.append((flat, t))
        if pay is not None:
            pay_chunks.append(pay)
    if not docs:
        return pd.DataFrame(
            {c: pd.Series(dtype=object) for c in [f.name for f in SEGMENT_SCHEMA.fields]}
        )
    docs = np.concatenate(docs)
    tfs = np.concatenate(tfs)
    norms = np.concatenate(norms)
    flat_all = (
        np.concatenate([f for f, _ in pos_chunks])
        if pos_chunks
        else np.zeros(0, dtype=np.int64)
    )
    pay_all = np.concatenate(pay_chunks) if pay_chunks else None
    # first_doc order does NOT imply doc order once MERGED segments
    # re-merge: a prior merge's output spans non-contiguous id ranges, so
    # a later tier can interleave it with a segment from inside its span.
    # Permute doc-major when needed — a segmented gather over the flat
    # position/payload streams, no per-doc Python loop.
    if docs.size > 1 and not np.all(docs[1:] > docs[:-1]):
        order = np.argsort(docs, kind="stable")
        starts = np.concatenate(([0], np.cumsum(tfs)[:-1]))
        t_ord = tfs[order]
        out_starts = np.concatenate(([0], np.cumsum(t_ord)[:-1]))
        within = (np.arange(int(tfs.sum()), dtype=np.int64)
                  - np.repeat(out_starts, t_ord))
        src = np.repeat(starts[order], t_ord) + within
        flat_all = flat_all[src]
        if pay_all is not None:
            pay_all = pay_all[src]
        docs, tfs, norms = docs[order], t_ord, norms[order]
    assert np.all(docs[1:] > docs[:-1]), "duplicate doc id across segments"
    docs_blob, tfs_blob, bmax_doc, bmax_tf, dboff, tboff = encode_postings(docs, tfs)
    # positions: vectorized segmented re-delta over the concatenated flat
    # position stream (no per-doc Python loop — the hot-term merge path)
    from .codec import encode_positions_flat

    pos_blob = encode_positions_flat(flat_all, tfs)
    pay_blob = (
        np.ascontiguousarray(pay_all, dtype="<f4").tobytes()
        if pay_all is not None else None
    )
    lens = NORM_TABLE[norms]
    nblocks = (docs.size + BLOCK_SIZE - 1) // BLOCK_SIZE
    pad = nblocks * BLOCK_SIZE - docs.size
    bmin_len = (
        np.pad(lens, (0, pad), constant_values=np.float32(np.inf))
        .reshape(nblocks, BLOCK_SIZE)
        .min(axis=1)
        .astype(np.float32)
    )
    row = {
        "seg": new_seg,
        "kind": "posting",
        "term": term,
        "first_doc": int(docs[0]),
        "df": int(docs.size),
        "ttf": int(tfs.sum()),
        "max_tf": int(tfs.max()),
        "min_len": float(lens.min()),
        "docs_blob": docs_blob,
        "tfs_blob": tfs_blob,
        "pos_blob": pos_blob,
        "pay_blob": pay_blob,
        "norms_blob": norms.tobytes(),
        "block_max_doc": bmax_doc.tolist(),
        "block_max_tf": bmax_tf.tolist(),
        "block_min_len": bmin_len.tolist(),
        "block_doc_boff": dboff.tolist(),
        "block_tf_boff": tboff.tolist(),
    }
    cols = [f.name for f in SEGMENT_SCHEMA.fields]
    full = {c: [row.get(c)] for c in cols}
    return pd.DataFrame(full, columns=cols)


def merge_segments(
    index: Index,
    seg_ids: list[int],
    new_seg: int,
    seg_buckets: int = 1,
) -> None:
    """Merge seg_ids into new_seg; query-visible only after the meta swap.

    seg_buckets > 1 splits each term's merge into that many contiguous
    source-segment runs (skew control for hot terms); the merged segment then
    has up to seg_buckets posting-block rows per term.
    """
    spark = index.spark
    seg_sorted = sorted(seg_ids)
    rank = {s: i for i, s in enumerate(seg_sorted)}
    per_bucket = max(1, -(-len(seg_sorted) // seg_buckets))
    src = index.postings().filter(F.col("seg").isin(seg_ids))
    bucket_expr = (F.col("seg_rank") / per_bucket).cast("int")
    # seg is LONG: streaming appends derive segment ids from epoch +
    # partition counts, which overflow int32 (caught by test_checkindex's
    # delete+append+merge pass)
    rank_df = spark.createDataFrame(
        [(int(s), r) for s, r in rank.items()], "seg long, seg_rank int"
    )
    tombs = index.tombstone_ref()
    merged = (
        src.join(F.broadcast(rank_df), "seg")
        .withColumn("bucket", bucket_expr)
        .groupBy("term", "bucket")
        .applyInPandas(
            lambda pdf: _merge_term(
                pdf.drop(columns=["bucket", "seg_rank"]), new_seg, tombs
            ),
            SEGMENT_SCHEMA,
        )
    )
    seg_dir = index.dir / "segments"
    merged.withColumn("kind", F.lit("posting")).write.mode("append").partitionBy(
        "kind"
    ).option("parquet.block.size", str(4 * 1024 * 1024)).parquet(str(seg_dir))

    # atomic visibility swap (the Iceberg snapshot-commit analog)
    live = index.live_segments
    if live is None:
        live = [r["seg"] for r in index.postings().select("seg").distinct().collect()]
    new_live = sorted((set(live) - set(seg_ids)) | {new_seg})
    index.meta["live_segments"] = new_live
    # merged blobs are written by the CURRENT encoder — bump the stamp so a
    # legacy-only reader refuses the index (SegmentInfos version-on-write)
    index.meta["codec"] = CODEC_VERSION
    tmp = index.dir / "meta.json.tmp"
    tmp.write_text(json.dumps(index.meta))
    os.replace(tmp, index.dir / "meta.json")
    index.invalidate_reader()  # new files + live-segment swap; re-pins
    _append_manifest(
        index.spark,
        index.dir / "manifest",
        f"merge->{new_seg}",
        [(s, -1, 0) for s in seg_ids],
        0.0,
    )


def estimate_segment_bytes(index: Index) -> dict[int, int]:
    """Approximate per-segment byte sizes from posting blob lengths."""
    rows = (
        index.postings()
        .groupBy("seg")
        .agg(
            F.sum(
                F.length("docs_blob")
                + F.length("tfs_blob")
                + F.length("pos_blob")
                + F.length("norms_blob")
            ).alias("bytes")
        )
        .collect()
    )
    return {r["seg"]: int(r["bytes"]) for r in rows}


def run_tiered_merge(index: Index, seg_buckets: int = 1) -> int:
    """One round of tiered merging; returns number of merges executed."""
    sizes = estimate_segment_bytes(index)
    live = index.live_segments
    if live is not None:
        sizes = {s: b for s, b in sizes.items() if s in live}
    merges = plan_merges(sizes)
    next_seg = max(sizes) + 1 if sizes else 0
    for group in merges:
        merge_segments(index, group, next_seg, seg_buckets=seg_buckets)
        next_seg += 1
    return len(merges)


def upgrade_index(index: Index, seg_buckets: int = 1) -> int | None:
    """IndexUpgrader analog (lucene/core IndexUpgrader.java:48-86).

    The reference upgrades by force-merging every segment not already on the
    current format (UpgradeIndexMergePolicy wraps forceMerge(1)), so all
    postings are rewritten through the current codec.  Here the stamp is
    index-wide, so a legacy stamp means "some blob may predate the current
    encoder": rewrite ALL live segments into one via the normal merge path
    (``_merge_term`` always decode/re-encodes), which also bumps the stamp.
    Already-current indexes are left untouched, like the reference's no-op
    when every segment is current.  Returns the new segment id, or None.
    """
    if index.meta.get("codec") == CODEC_VERSION:
        return None
    live = index.live_segments
    if live is None:
        live = sorted(
            r["seg"] for r in index.postings().select("seg").distinct().collect()
        )
    new_seg = max(live) + 1
    merge_segments(index, list(live), new_seg, seg_buckets=seg_buckets)
    return new_seg


# ---------------------------------------------------------------------------
# addIndexes — merge a foreign index into this one without re-tokenizing
# ---------------------------------------------------------------------------


def add_indexes(dest: Index, src: Index, num_partitions: int = 4) -> list[int]:
    """IndexWriter.addIndexes analog (`lucene/core/src/java/org/apache/
    lucene/index/IndexWriter.java` addIndexes(Directory...): copy another
    index's segments in, re-basing doc ids, WITHOUT re-analyzing).

    Spark shape: one executor-parallel pass over the source segment rows
    (mapInArrow).  Doc ids here are GLOBAL with per-term absolute restarts,
    so re-basing a posting row only shifts the stream's first value — the
    kernel decodes the doc-delta stream, adds the base, re-encodes with the
    same block grid (tf/pos/norm blobs and their directories pass through
    untouched); kind=doc rows just shift doc_id.  Stats merge as an
    LSM delta dir (df/ttf sums, max/min bounds — associative), the meta
    swap publishes atomically; src files are never modified.

    Reference constraints kept: the destination's analyzer/codec must
    match (our meta records both; Lucene trusts the caller on analyzers —
    we refuse loudly instead), and a source carrying deletions is refused
    (the Directory variant copies segments whole; re-base the tombstone
    set first by force-merging the source)."""
    import pyarrow as pa

    from .codec import decode_stream, encode_stream
    from .streaming import STREAM_PARTITION_BASE

    if src.meta.get("analyzer") != dest.meta.get("analyzer"):
        raise ValueError("addIndexes: source analyzer differs from dest")
    if src.meta.get("has_blocks") or dest.meta.get("has_blocks"):
        # the blocks sidecar (child -> parent doc ids) is not re-based by
        # this pass; merging block indexes silently would orphan every
        # appended block from its parent filter
        raise ValueError(
            "addIndexes: parent/child block indexes are not supported — "
            "the blockmap doc ids would need re-basing too")
    if bool(src.meta.get("offsets")) != bool(dest.meta.get("offsets")):
        raise ValueError("addIndexes: offsets setting differs from dest")
    if src.tombstone_ref() is not None:
        raise ValueError(
            "addIndexes: source index carries deletions; force-merge it "
            "first so tombstones are reclaimed")
    spark = dest.spark
    base = dest.max_doc
    epoch = int(dest.meta.get("stream_epoch", 0))
    src_live = src.live_segments
    src_segs = sorted(
        src_live if src_live is not None else
        [r["seg"] for r in src.postings().select("seg").distinct().collect()]
    )
    # doc rows are append-only and NEVER rewritten by merge (live_segments
    # tracks POSTING segments only — checkindex documents the same), so a
    # merged source still carries doc rows under its original seg ids;
    # the seg-id remap must cover the union or those docs' stored fields
    # and norms would be dropped on copy.  docstats() (not a raw read) so
    # a crash-recovered source's dead-listed orphan rows — whose doc_ids
    # were re-issued by the tlog replay — are excluded, and a fileless
    # empty shard reads as a typed empty frame
    doc_segs = sorted(
        r["seg"] for r in src.docstats().select("seg").distinct().collect()
    )
    all_src_segs = sorted(set(src_segs) | set(doc_segs))
    pid_base = max(
        STREAM_PARTITION_BASE + epoch * max(len(all_src_segs), 1) * 2,
        int(dest.meta.get("pid_hwm", 0)),
    )
    seg_map = {s: (pid_base + i) << 20 for i, s in enumerate(all_src_segs)}

    def _remap_seg(seg_np):
        idx = np.searchsorted(src_seg_arr, seg_np)
        return new_seg_arr[idx]

    src_seg_arr = np.asarray(all_src_segs, dtype=np.int64)
    new_seg_arr = np.asarray(
        [seg_map[s] for s in all_src_segs], dtype=np.int64)
    post_keep_arr = np.asarray(src_segs, dtype=np.int64)

    def post_kernel(batches):
        import pyarrow as pa

        for b in batches:
            if b.num_rows == 0:
                continue
            names = b.schema.names
            col = {nm: b.column(i) for i, nm in enumerate(names)}
            seg_np = col["seg"].to_numpy(zero_copy_only=False)
            keep = np.isin(seg_np, post_keep_arr)
            if not keep.all():
                b = b.filter(pa.array(keep))
                if b.num_rows == 0:
                    continue
                col = {nm: b.column(i) for i, nm in enumerate(names)}
                seg_np = col["seg"].to_numpy(zero_copy_only=False)
            dfs = col["df"].to_numpy(zero_copy_only=False)
            blobs = col["docs_blob"].to_pylist()
            boffs = col["block_doc_boff"].to_pylist()
            new_blobs, new_boffs = [], []
            for blob, boff, df_ in zip(blobs, boffs, dfs):
                df_ = int(df_)
                vals = decode_stream(
                    blob, np.asarray(boff, dtype=np.int64), df_
                ).astype(np.int64)
                vals[0] += base  # the per-term absolute restart re-bases
                nblocks = -(-df_ // BLOCK_SIZE)
                starts = np.arange(nblocks, dtype=np.int64) * BLOCK_SIZE
                counts = np.minimum(df_ - starts, BLOCK_SIZE)
                nb, noff = encode_stream(vals.astype(np.uint64), starts,
                                         counts)
                new_blobs.append(nb)
                new_boffs.append(noff.tolist())
            bmd = col["block_max_doc"]
            flat = bmd.flatten().to_numpy(zero_copy_only=False) + base
            new_bmd = pa.ListArray.from_arrays(
                bmd.offsets, pa.array(flat, type=pa.int64()))
            out = {
                **{nm: col[nm] for nm in names},
                "seg": pa.array(_remap_seg(seg_np), type=pa.int64()),
                "first_doc": pa.array(
                    col["first_doc"].to_numpy(zero_copy_only=False) + base,
                    type=pa.int64()),
                "docs_blob": pa.array(new_blobs, type=pa.binary()),
                "block_doc_boff": pa.array(
                    new_boffs, type=pa.list_(pa.int64())),
                "block_max_doc": new_bmd,
            }
            yield pa.RecordBatch.from_arrays(
                [out[nm] for nm in names], names)

    def doc_kernel(batches):
        import pyarrow as pa

        for b in batches:
            if b.num_rows == 0:
                continue
            names = b.schema.names
            col = {nm: b.column(i) for i, nm in enumerate(names)}
            seg_np = col["seg"].to_numpy(zero_copy_only=False)
            # no live filter here: every doc row copies (append-only;
            # a merged-away posting segment's docs are still live docs)
            out = {
                **{nm: col[nm] for nm in names},
                "seg": pa.array(_remap_seg(seg_np), type=pa.int64()),
                "doc_id": pa.array(
                    col["doc_id"].to_numpy(zero_copy_only=False) + base,
                    type=pa.int64()),
            }
            yield pa.RecordBatch.from_arrays(
                [out[nm] for nm in names], names)

    seg_dir = dest.dir / "segments"
    for kind, kern in (("posting", post_kernel), ("doc", doc_kernel)):
        # _read_kind handles a fileless empty-shard dir; dead-seg ranges
        # (crashed-append orphans) are dropped BEFORE the kernels so no
        # orphan posting or doc row is ever copied into dest
        part = src._drop_dead_segs(src._read_kind(kind))
        (
            part.repartition(num_partitions)
            .mapInArrow(kern, part.schema)
            .write.mode("append")
            .option("parquet.block.size", str(4 * 1024 * 1024))
            .parquet(str(seg_dir / f"kind={kind}"))
        )
    dest.invalidate_reader()  # new files under segments/; re-pins

    # stats: the source's already-aggregated table IS the delta
    delta_rel = f"term_stats_d{epoch + 1}"
    (
        src.term_stats()
        .repartition(1, "term").sortWithinPartitions("term")
        .write.mode("overwrite").parquet(str(dest.dir / delta_rel))
    )
    stats_dirs = dest.stats_dirs() + [delta_rel]

    new_segs = sorted(seg_map.values())
    # only posting-bearing remapped segs join dest's live set / manifest:
    # doc-only seg ids (merged-away source segments) never carry posting
    # rows, and inserting them would put phantom posting seg ids into
    # live_segments
    new_post_segs = sorted(seg_map[s] for s in src_segs)
    live = dest.live_segments
    dest.meta["max_doc"] = base + src.max_doc
    dest.meta["sum_total_term_freq"] = (
        dest.sum_total_term_freq + src.sum_total_term_freq)
    dest.meta["stream_epoch"] = epoch + 1
    dest.meta["pid_hwm"] = pid_base + max(len(all_src_segs), 1)
    dest.meta.pop("index_sort", None)  # appended ids break the global sort
    dest.meta.pop("stats_dir", None)
    dest.meta["stats_dirs"] = stats_dirs
    if live is not None:
        dest.meta["live_segments"] = sorted(set(live) | set(new_post_segs))
    dest.meta["codec"] = CODEC_VERSION  # re-based doc blobs use the current encoder
    tmp = dest.dir / "meta.json.tmp"
    tmp.write_text(json.dumps(dest.meta))
    os.replace(tmp, dest.dir / "meta.json")
    dest._stats_df = None
    _append_manifest(
        dest.spark, dest.dir / "manifest", f"add_indexes_{epoch}",
        [(s, -1, 0) for s in new_post_segs], 0.0,
    )
    # return the POSTING-bearing new seg ids only — doc-only remapped ids
    # (merged-away source segments) are an internal storage detail and
    # would read as phantom ids to callers feeding this into merge plans
    return new_post_segs
