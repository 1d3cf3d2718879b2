"""Distributed index build: doc_id assignment + per-partition inverted segments.

Spark-first re-expression of the Lucene write path (SURVEY.md §3.1):

* a Spark partition task == a DocumentsWriterPerThread: it inverts its rows
  in one vectorized pass and emits one immutable *segment*
  (DocumentsWriterPerThread.java; segments at SegmentReader.java)
* doc ids are deterministic: dense rank over (repo, path, commit), realized as
  range-repartition + per-partition row_number + broadcast partition offsets —
  the scalable zipWithIndex (no driver collect of data, no global sort on one
  reducer).  Reproducible across cluster sizes, so top-k tie-breaks (HitQueue
  .java:76-81) are stable (SURVEY §7.4.2)
* each stage ends in an atomically-visible parquet directory with _SUCCESS +
  a manifest row — the sandbox stand-in for an Iceberg snapshot commit
  (IndexWriter.java:954-967 two-phase commit); `build_index(resume=True)`
  skips completed stages
* skew: range partitioning on (repo, path, commit) splits a giant repo across
  consecutive segments by construction; term skew is handled at merge time
  with (term, bucket) sub-keys (see merge.py)

Everything flows through applyInPandas / built-in SQL functions — no per-row
Python, no RDD API.
"""

from __future__ import annotations

import json
import shutil
import time
from itertools import chain
from pathlib import Path

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F
from pyspark.sql import types as T

from .analysis import analyze_series
from .bm25 import NORM_TABLE
from .codec import BLOCK_SIZE, encode_postings, varint_encode
from .smallfloat import encode_norm

DOC_KEY = ["repo", "path", "commit"]

SEGMENT_SCHEMA = T.StructType(
    [
        T.StructField("seg", T.IntegerType()),
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
        T.StructField("norms_blob", T.BinaryType()),
        T.StructField("block_max_doc", T.ArrayType(T.LongType())),
        T.StructField("block_max_tf", T.ArrayType(T.LongType())),
        T.StructField("block_min_len", T.ArrayType(T.FloatType())),
        T.StructField("block_doc_boff", T.ArrayType(T.LongType())),
        T.StructField("block_tf_boff", T.ArrayType(T.LongType())),
        # docstat rows
        T.StructField("doc_id", T.LongType()),
        T.StructField("doclen", T.LongType()),
        T.StructField("norm_byte", T.IntegerType()),
    ]
)


def invert_segment(pdf: pd.DataFrame) -> pd.DataFrame:
    """Invert one segment (group of rows sharing `seg`): the DWPT flush.

    One vectorized pass: analyze -> flatten -> lexsort by (term, doc, pos) ->
    run-length boundaries -> per-term delta+varint encoding with the 128-doc
    block directory.  Mirrors DefaultIndexingChain.processDocument/invert
    (DefaultIndexingChain.java:277,567-682) + Lucene50PostingsWriter encode.
    """
    seg = int(pdf["seg"].iloc[0])
    pdf = pdf.sort_values("doc_id", kind="mergesort").reset_index(drop=True)
    doc_ids = pdf["doc_id"].to_numpy(dtype=np.int64)

    terms, positions = analyze_series(pdf["content"])
    doclens = terms.map(len).to_numpy(dtype=np.int64)
    norm_bytes = encode_norm(doclens)
    dec_len = NORM_TABLE[norm_bytes]  # quantized length for block-max pruning

    rows: list[dict] = []
    total_tokens = int(doclens.sum())
    if total_tokens > 0:
        flat_terms = np.fromiter(chain.from_iterable(terms), dtype=object, count=total_tokens)
        flat_pos = np.fromiter(
            chain.from_iterable(positions), dtype=np.int64, count=total_tokens
        )
        flat_docidx = np.repeat(np.arange(doc_ids.size, dtype=np.int64), doclens)

        codes, uniques = pd.factorize(flat_terms, sort=True)
        order = np.lexsort((flat_pos, flat_docidx, codes))
        c = codes[order]
        d = flat_docidx[order]
        p = flat_pos[order]

        # (term, doc) run boundaries -> tf
        new_pair = np.empty(c.size, dtype=bool)
        new_pair[0] = True
        np.not_equal(c[1:], c[:-1], out=new_pair[1:])
        new_pair[1:] |= d[1:] != d[:-1]
        pair_starts = np.flatnonzero(new_pair)
        tfs_all = np.diff(np.concatenate((pair_starts, [c.size])))
        pair_term = c[pair_starts]
        pair_doc = d[pair_starts]

        # per-doc-restarting position deltas over the sorted token stream
        pos_delta = np.empty(p.size, dtype=np.int64)
        pos_delta[0] = p[0]
        np.subtract(p[1:], p[:-1], out=pos_delta[1:])
        pos_delta[pair_starts] = p[pair_starts]  # absolute at each doc start

        # term run boundaries over the pair arrays
        new_term = np.empty(pair_term.size, dtype=bool)
        new_term[0] = True
        np.not_equal(pair_term[1:], pair_term[:-1], out=new_term[1:])
        term_starts = np.flatnonzero(new_term)
        term_ends = np.concatenate((term_starts[1:], [pair_term.size]))
        # token-stream offsets per pair for slicing the position deltas
        pair_tok_start = pair_starts
        pair_tok_end = np.concatenate((pair_starts[1:], [c.size]))

        for ti, (s, e) in enumerate(zip(term_starts, term_ends)):
            term = uniques[pair_term[s]]
            docs_local = pair_doc[s:e]
            tfs = tfs_all[s:e]
            gdocs = doc_ids[docs_local]
            docs_blob, tfs_blob, bmax_doc, bmax_tf, dboff, tboff = encode_postings(
                gdocs, tfs
            )
            pos_blob = varint_encode(
                pos_delta[pair_tok_start[s]: pair_tok_end[e - 1]].astype(np.uint64)
            )
            nb = norm_bytes[docs_local]
            lens = dec_len[docs_local]
            npost = docs_local.size
            nblocks = (npost + BLOCK_SIZE - 1) // BLOCK_SIZE
            pad = nblocks * BLOCK_SIZE - npost
            bmin_len = (
                np.pad(lens, (0, pad), constant_values=np.float32(np.inf))
                .reshape(nblocks, BLOCK_SIZE)
                .min(axis=1)
                .astype(np.float32)
            )
            rows.append(
                {
                    "seg": seg,
                    "kind": "posting",
                    "term": term,
                    "first_doc": int(gdocs[0]),
                    "df": int(npost),
                    "ttf": int(tfs.sum()),
                    "max_tf": int(tfs.max()),
                    "min_len": float(lens.min()),
                    "docs_blob": docs_blob,
                    "tfs_blob": tfs_blob,
                    "pos_blob": pos_blob,
                    "norms_blob": nb.tobytes(),
                    "block_max_doc": bmax_doc.tolist(),
                    "block_max_tf": bmax_tf.tolist(),
                    "block_min_len": bmin_len.tolist(),
                    "block_doc_boff": dboff.tolist(),
                    "block_tf_boff": tboff.tolist(),
                    "doc_id": None,
                    "doclen": None,
                    "norm_byte": None,
                }
            )

    stat = pd.DataFrame(
        {
            "seg": seg,
            "kind": "docstat",
            "doc_id": doc_ids,
            "doclen": doclens,
            "norm_byte": norm_bytes.astype(np.int32),
        }
    )
    cols = [f.name for f in SEGMENT_SCHEMA.fields]
    post = pd.DataFrame(rows, columns=cols)
    out = pd.concat([post, stat], ignore_index=True).reindex(columns=cols)
    # pandas fills missing cells with NaN; Arrow needs None for non-numeric types
    for f in SEGMENT_SCHEMA.fields:
        if isinstance(f.dataType, (T.ArrayType, T.BinaryType, T.StringType)):
            col = out[f.name].astype(object)
            out[f.name] = col.where(pd.notna(col), None)
    return out


def _done(path: Path) -> bool:
    return (path / "_SUCCESS").exists()


def build_index(
    spark: SparkSession,
    docs: DataFrame,
    index_dir: str,
    num_segments: int | None = None,
    docs_per_segment: int = 100_000,
    resume: bool = False,
) -> "Index":
    """Build the full index at index_dir; checkpoint-resumable per stage."""
    root = Path(index_dir)
    root.mkdir(parents=True, exist_ok=True)
    docmap_p = root / "docmap"
    seg_p = root / "segments"
    stats_p = root / "term_stats"
    manifest_p = root / "manifest"
    meta_p = root / "meta.json"

    t0 = time.time()
    # ---- stage 1: deterministic doc ids (docmap = Lucene stored fields) ----
    if not (resume and _done(docmap_p)):
        if num_segments is None:
            n = docs.count()
            num_segments = max(1, -(-n // docs_per_segment))
        ranged = (
            docs.repartitionByRange(num_segments, *DOC_KEY)
            .withColumn("seg", F.spark_partition_id())
        )
        raw_p = root / "_docmap_raw"
        ranged.write.mode("overwrite").parquet(str(raw_p))
        raw = spark.read.parquet(str(raw_p))
        counts = raw.groupBy("seg").count().collect()
        by_seg = sorted((r["seg"], r["count"]) for r in counts)
        offsets, acc = {}, 0
        for s, cnt in by_seg:
            offsets[s] = acc
            acc += cnt
        off_df = spark.createDataFrame(
            [(s, o) for s, o in offsets.items()], "seg int, doc_base long"
        )
        w = Window.partitionBy("seg").orderBy(*DOC_KEY)
        (
            raw.join(F.broadcast(off_df), "seg")
            .withColumn("doc_id", F.col("doc_base") + F.row_number().over(w) - 1)
            .withColumn("content_sha256", F.sha2(F.col("content"), 256))
            .drop("doc_base")
            .write.mode("overwrite")
            .parquet(str(docmap_p))
        )
        shutil.rmtree(raw_p, ignore_errors=True)
        _append_manifest(
            spark, manifest_p, "docmap",
            [(s, offsets[s], c) for s, c in by_seg], time.time() - t0,
        )

    docmap = spark.read.parquet(str(docmap_p))

    # ---- stage 2: invert each segment (flush) ----
    if not (resume and _done(seg_p)):
        (
            docmap.select("seg", "doc_id", "content")
            .groupBy("seg")
            .applyInPandas(invert_segment, SEGMENT_SCHEMA)
            .write.mode("overwrite")
            .partitionBy("kind")
            .parquet(str(seg_p))
        )

    # ---- stage 3: global stats (TermContext/collectionStatistics analog) ----
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
            .repartitionByRange(max(1, postings.rdd.getNumPartitions() // 4), "term")
            .sortWithinPartitions("term")
            .write.mode("overwrite")
            .parquet(str(stats_p))
        )
        stats = spark.read.parquet(str(seg_p / "kind=docstat")).agg(
            F.count("doc_id").alias("max_doc"), F.sum("doclen").alias("sum_ttf")
        ).collect()[0]
        meta = {
            "max_doc": int(stats["max_doc"]),
            "sum_total_term_freq": int(stats["sum_ttf"] or 0),
            "num_segments": int(num_segments or docmap.select("seg").distinct().count()),
            "built_unix": int(time.time()),
        }
        meta_p.write_text(json.dumps(meta))

    return Index(spark, index_dir)


def _append_manifest(spark, manifest_p: Path, stage: str, rows, wall_s: float):
    df = spark.createDataFrame(
        [(stage, int(s), int(b), int(c), float(wall_s)) for s, b, c in rows],
        "stage string, seg int, doc_base long, num_docs long, wall_s double",
    )
    df.write.mode("append").parquet(str(manifest_p))


class Index:
    """Handle over an on-disk index directory (the IndexReader analog)."""

    def __init__(self, spark: SparkSession, index_dir: str):
        self.spark = spark
        self.dir = Path(index_dir)
        self.meta = json.loads((self.dir / "meta.json").read_text())

    @property
    def max_doc(self) -> int:
        return self.meta["max_doc"]

    @property
    def sum_total_term_freq(self) -> int:
        return self.meta["sum_total_term_freq"]

    def reload_meta(self) -> None:
        self.meta = json.loads((self.dir / "meta.json").read_text())

    @property
    def live_segments(self) -> list[int] | None:
        """Segments visible to queries; None = all (pre-merge index)."""
        return self.meta.get("live_segments")

    def postings(self) -> DataFrame:
        df = self.spark.read.parquet(str(self.dir / "segments" / "kind=posting"))
        live = self.live_segments
        if live is not None:
            df = df.filter(F.col("seg").isin(live))  # tombstone filter (pushdown)
        return df

    def docstats(self) -> DataFrame:
        return self.spark.read.parquet(str(self.dir / "segments" / "kind=docstat"))

    def docmap(self) -> DataFrame:
        return self.spark.read.parquet(str(self.dir / "docmap"))

    def term_stats(self) -> DataFrame:
        return self.spark.read.parquet(str(self.dir / "term_stats"))

    def manifest(self) -> DataFrame:
        return self.spark.read.parquet(str(self.dir / "manifest"))
