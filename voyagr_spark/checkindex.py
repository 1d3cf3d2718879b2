"""CheckIndex: the full-index invariant checker.

Re-expresses lucene/core/src/java/org/apache/lucene/index/CheckIndex.java
(testPostings / testTerms / checkFields: decode every posting, verify doc
ids ascend, stats agree, norms round-trip) over the engine's storage:

Per POSTING row (distributed — one mapInPandas over the live posting
parquet, violations reduced to counts):
  * docs_blob decodes to exactly `df` strictly-increasing doc ids
  * first_doc == docs[0]
  * tfs >= 1 everywhere; max_tf == max(tfs); ttf == sum(tfs)
  * block_max_doc[i] == max of the i-th 128-doc block (the skip/WAND
    directory the pruned paths trust blindly at query time)
  * pos_blob, when present, decodes to exactly sum(tfs) positions with
    per-doc non-decreasing order

Per DOC row:
  * norm_byte == SmallFloat.encode(doclen)  (the lossy byte must match
    what the scorer's cache assumes)
  * doc ids unique across live segments

Cross-table:
  * term_stats df/ttf == the posting rows' per-term sums (over live
    segments) — the LSM stats lineage must agree with the data it indexes
  * meta.max_doc == live docmap row count

Returns a report dict; raises CorruptIndexError when any check fails.
The whole pass is executor-side except for the final tiny aggregates —
the Spark shape of CheckIndex's exhaustive single-node walk.
"""

from __future__ import annotations

from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import functions as F

from . import codec
from .smallfloat import encode_norm


class CorruptIndexError(RuntimeError):
    """CheckIndex found a broken invariant (CorruptIndexException analog)."""


_REPORT_SCHEMA = "check string, violations long, detail string"


def _check_posting_batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    counts: dict[str, int] = {}
    details: dict[str, str] = {}

    def bump(check: str, detail: str) -> None:
        counts[check] = counts.get(check, 0) + 1
        details.setdefault(check, detail)

    for pdf in it:
        for r in pdf.itertuples(index=False):
            where = f"seg={r.seg} term={r.term!r}"
            try:
                doc_off = np.asarray(r.block_doc_boff, dtype=np.int64)
                tf_off = np.asarray(r.block_tf_boff, dtype=np.int64)
                docs, tfs = codec.decode_postings(
                    r.docs_blob, r.tfs_blob, doc_off, tf_off, int(r.df)
                )
            except Exception as e:  # decode must never throw on a sane row
                bump("decode", f"{where}: {e}")
                continue
            if docs.size != r.df:
                bump("df", f"{where}: decoded {docs.size} != df {r.df}")
            if docs.size and (np.diff(docs) <= 0).any():
                bump("docs_ascending", f"{where}: doc ids not increasing")
            if docs.size and docs[0] != r.first_doc:
                bump("first_doc", f"{where}: {docs[0]} != {r.first_doc}")
            if tfs.size and tfs.min() < 1:
                bump("tf_positive", f"{where}: tf < 1")
            if tfs.size and tfs.max() != r.max_tf:
                bump("max_tf", f"{where}: {tfs.max()} != {r.max_tf}")
            if int(tfs.sum()) != r.ttf:
                bump("ttf", f"{where}: {int(tfs.sum())} != {r.ttf}")
            bmd = np.asarray(r.block_max_doc, dtype=np.int64)
            nblocks = bmd.size
            if nblocks:
                want = np.asarray(
                    [docs[min((i + 1) * 128, docs.size) - 1]
                     for i in range(nblocks)], dtype=np.int64)
                if docs.size != 0 and not (want == bmd).all():
                    bump("block_max_doc", f"{where}: directory mismatch")
            if r.pos_blob is not None:
                try:
                    flat, _ = codec.decode_positions_flat(r.pos_blob, tfs)
                except Exception as e:
                    bump("positions_decode", f"{where}: {e}")
                    continue
                if flat.size != int(tfs.sum()):
                    bump("positions_count",
                         f"{where}: {flat.size} != {int(tfs.sum())}")
            pay = getattr(r, "pay_blob", None)
            if pay is not None and len(pay) != 4 * int(tfs.sum()):
                # the payload stream is float32 1:1 with positions
                bump("payload_length",
                     f"{where}: {len(pay)} bytes != 4*{int(tfs.sum())}")
    yield pd.DataFrame(
        {
            "check": list(counts),
            "violations": [counts[k] for k in counts],
            "detail": [details[k] for k in counts],
        }
    ) if counts else pd.DataFrame(
        {"check": [], "violations": [], "detail": []}
    )


def check_index(index, raise_on_failure: bool = True) -> dict:
    """Run every invariant; -> {check: violations} (empty dict = clean)."""
    post_cols = [
        "seg", "term", "first_doc", "df", "ttf", "max_tf",
        "docs_blob", "tfs_blob", "pos_blob",
        "block_max_doc", "block_doc_boff", "block_tf_boff",
    ]
    if "pay_blob" in index.postings().columns:
        post_cols.append("pay_blob")
    report_rows = (
        index.postings()
        .select(post_cols)
        .mapInPandas(_check_posting_batches, _REPORT_SCHEMA)
        .groupBy("check")
        .agg(F.sum("violations").alias("violations"),
             F.min("detail").alias("detail"))
        .collect()
    )
    problems = {r["check"]: (int(r["violations"]), r["detail"])
                for r in report_rows}

    # doc rows: norm byte round-trip + id uniqueness.  Doc rows are
    # append-only and global — deletes are tombstones and merges rewrite
    # postings only — so the whole kind=doc dataset is checked, never a
    # live_segments slice (live_segments tracks POSTING segments).
    dm = index.docmap()

    @F.pandas_udf("int")
    def _want_norm(doclen: pd.Series) -> pd.Series:
        return pd.Series(
            encode_norm(doclen.to_numpy(dtype=np.int64)).astype(np.int32))

    # One distributed pass over the docmap: the norm round-trip is
    # vectorized per Arrow batch executor-side and only three counts
    # reach the driver (rows, norm mismatches, distinct ids) — at 10^10
    # docs nothing larger than one row ever leaves the executors.
    doc_counts = (
        dm.select(
            (F.col("norm_byte") != _want_norm(F.col("doclen")))
            .cast("long").alias("nb_bad"),
            "doc_id",
        )
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("nb_bad").alias("nb_bad"),
            F.countDistinct("doc_id").alias("n_ids"),
        )
        .collect()[0]
    )
    nb_bad = int(doc_counts["nb_bad"] or 0)
    if nb_bad:
        problems["norm_byte"] = (nb_bad, "norm byte != SmallFloat(doclen)")
    n_docs = int(doc_counts["n_docs"])
    n_ids = int(doc_counts["n_ids"])
    if n_ids != n_docs:
        problems["doc_id_unique"] = (n_docs - n_ids, "duplicate doc ids")
    if n_docs != index.max_doc:
        problems["max_doc"] = (
            abs(n_docs - index.max_doc),
            f"docmap rows {n_docs} != meta max_doc {index.max_doc}")

    # term stats lineage vs posting-row aggregate.  Stats may legitimately
    # sit ABOVE the posting sums (delete + reclaim-merge keeps them stale
    # until recompute — the Lucene semantics engine_merge_reclaim gates);
    # postings EXCEEDING stats, or posting terms absent from stats, is
    # always corruption.
    agg = (
        index.postings()
        .groupBy("term")
        .agg(F.sum("df").alias("df2"), F.sum("ttf").alias("ttf2"))
    )
    st = index.term_stats().select("term", "df", "ttf")
    mismatch = (
        agg.join(st, "term", "left")
        .filter(
            F.col("df").isNull()
            | (F.col("df2") > F.col("df"))
            | (F.col("ttf2") > F.col("ttf"))
        )
        .count()
    )
    if mismatch:
        problems["term_stats"] = (mismatch, "posting sums exceed stats lineage")

    # blockmap sidecar (block join): every child maps to a LATER parent
    # doc that exists in the docmap; parents never appear as children
    if index.meta.get("has_blocks"):
        from .blockjoin import BLOCK_PARENT_PATH, blockmap

        bm = blockmap(index)
        parents = dm.filter(F.col("path") == BLOCK_PARENT_PATH).select(
            F.col("doc_id").alias("parent_doc"))
        bad_order = bm.filter(F.col("parent_doc") <= F.col("doc_id")).count()
        if bad_order:
            problems["block_order"] = (
                bad_order, "child doc_id >= its parent_doc")
        orphan = bm.join(parents, "parent_doc", "left_anti").count()
        if orphan:
            problems["block_parent_exists"] = (
                orphan, "blockmap parent_doc not a parent doc row")
        child_parents = bm.join(
            dm.filter(F.col("path") == BLOCK_PARENT_PATH)
            .select("doc_id"), "doc_id", "left_semi").count()
        if child_parents:
            problems["block_parent_as_child"] = (
                child_parents, "parent doc appears as a blockmap child")

    # bloom sidecar: a filter answering definitely-NO for a term its
    # segment contains is corruption (false positives are expected,
    # false negatives never — FuzzySet's contract); one distributed
    # per-seg pass, blob fetched executor-side
    from pathlib import Path as _Path

    if (_Path(index.dir) / "bloom").exists():
        from .bloom import check_sidecar

        fn = check_sidecar(index)
        if fn:
            problems["bloom_false_negatives"] = (
                fn, "bloom filter rejects a term its segment contains")

    report = {k: v[0] for k, v in problems.items()}
    if problems and raise_on_failure:
        first = next(iter(problems.items()))
        raise CorruptIndexError(f"{report} — e.g. {first[1][1]}")
    return report
