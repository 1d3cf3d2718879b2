"""Payload scoring (reference module lucene/queries .../payloads).

Reference semantics re-expressed, not ported:

* `DelimitedPayloadTokenFilter.java:64-77` + `FloatEncoder`: index-side
  annotation — `token<delim>1.5` indexes as `token` carrying a float32
  payload per occurrence (analysis.Analyzer(payload_delim=...); stored as
  a raw little-endian float32 stream 1:1 with the positions stream on the
  posting row, the interleaved Lucene50PostingsWriter.java:253-301 data).
* `PayloadScoreQuery.java` (PayloadSpanScorer.scoreCurrentDoc): doc score
  = spanScore * payloadScore when includeSpanScore, else payloadScore
  alone; for a single wrapped SpanTermQuery the span score IS the term's
  BM25 (freq = number of spans = tf).
* `PayloadFunction` subclasses (MaxPayloadFunction.java / Min / Sum /
  AveragePayloadFunction.java): payloadScore accumulates per occurrence
  in position order IN FLOAT32 (`payloadScore = currentScore(...)` is a
  float field); docScore returns 1 when the doc's occurrences carried no
  payloads.  Occurrences without a payload are skipped (numPayloadsSeen
  does not advance).

Accumulation note: Sum/Avg run as `np.add.reduceat` over float32 — for
segments shorter than numpy's 128-element pairwise block (tf <= 128,
i.e. every realistic doc) that is the same left-to-right float32 fold as
the reference's loop, bit for bit.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from . import bm25

PAYLOAD_FUNCS = ("max", "min", "sum", "avg")


def _doc_payload_scores(
    tfs: np.ndarray, pay: np.ndarray, func: str
) -> np.ndarray:
    """Per-doc PayloadFunction fold over the per-occurrence float32 payload
    stream (NaN = occurrence without a payload; docs with none seen score
    1.0f, the reference docScore default)."""
    starts = np.concatenate(([0], np.cumsum(tfs)[:-1])).astype(np.int64)
    seen_mask = ~np.isnan(pay)
    seen = np.add.reduceat(seen_mask.astype(np.int64), starts)
    seen[tfs == 0] = 0
    if func == "max":
        vals = np.where(seen_mask, pay, np.float32(-np.inf))
        out = np.maximum.reduceat(vals, starts)
    elif func == "min":
        vals = np.where(seen_mask, pay, np.float32(np.inf))
        out = np.minimum.reduceat(vals, starts)
    else:  # sum / avg: float32 left-to-right accumulation (+0.0f is exact)
        vals = np.where(seen_mask, pay, np.float32(0.0))
        out = np.add.reduceat(vals, starts)
        if func == "avg":
            out = (out / seen.astype(np.float32)).astype(np.float32)
    out = out.astype(np.float32)
    return np.where(seen > 0, out, np.float32(1.0)).astype(np.float32)


def payload_score_topk(
    index,
    term: str,
    func: str = "max",
    include_span_score: bool = True,
    k: int = 10,
) -> DataFrame:
    """PayloadScoreQuery(SpanTermQuery(term), func, includeSpanScore) top-k
    as (doc_id, score) — per-segment Arrow kernel over posting rows, global
    merge via orderBy().limit (TakeOrderedAndProject)."""
    from .parser import TermQuery
    from .search import (
        RESULT_SCHEMA,
        _apply_live_docs,
        _group_rows,
        _term_weight,
        make_plan,
    )

    if func not in PAYLOAD_FUNCS:
        raise ValueError(f"func must be one of {PAYLOAD_FUNCS}")
    an = getattr(index, "analyzer", None)
    if an is None or an.payload_delim is None:
        raise ValueError("index was not built with a payload_delim analyzer")
    qterm = term.lower() if an.lowercase else term
    if qterm in an.stopwords:
        return index.spark.createDataFrame([], RESULT_SCHEMA)
    plan = make_plan(index, TermQuery(qterm), k=k)
    wv = _term_weight(plan, qterm)
    rows = (
        index.postings()
        .filter(F.col("term") == qterm)
        .select(
            "seg", "term", "first_doc", "df", "max_tf", "min_len",
            "docs_blob", "tfs_blob", "pay_blob", "norms_blob",
            "block_max_doc", "block_max_tf", "block_min_len",
            "block_doc_boff", "block_tf_boff",
        )
    )

    def _seg(pdf: pd.DataFrame) -> pd.DataFrame:
        # pre-sort by first_doc so the payload column aligns 1:1 with
        # TermPostings.parts (which sorts rows by first_doc, stably)
        pdf = pdf.sort_values("first_doc", kind="mergesort").reset_index(
            drop=True)
        pay_col = pdf.pop("pay_blob")
        tp = _group_rows(pdf).get(qterm)
        if tp is None:
            return pd.DataFrame({"doc_id": [], "score": []}).astype(
                {"doc_id": "int64", "score": "float32"})
        docs = tp.docs()
        tfs = tp.tfs()
        chunks = []
        for j, p in enumerate(tp.parts):
            b = pay_col.iloc[j]
            chunks.append(
                np.frombuffer(b, dtype="<f4") if b is not None
                else np.full(int(p.tfs().sum()), np.nan, dtype=np.float32)
            )
        pay = (np.concatenate(chunks) if chunks
               else np.zeros(0, dtype=np.float32))
        factor = _doc_payload_scores(tfs.astype(np.int64), pay, func)
        if include_span_score:
            # span score of a single SpanTermQuery = the term's BM25
            # (freq = span count = tf); float32 multiply at the end
            span = bm25.score(tfs, tp.norms(), plan.cache, wv)
            sc = (span.astype(np.float32) * factor).astype(np.float32)
        else:
            sc = factor
        docs, sc = _apply_live_docs(docs, sc, plan)
        return pd.DataFrame({"doc_id": docs, "score": sc})

    out = rows.groupBy("seg").applyInPandas(_seg, RESULT_SCHEMA)
    return out.orderBy(F.desc("score"), F.asc("doc_id")).limit(k)


def payload_check_topk(
    index,
    term: str,
    values,
    k: int = 10,
) -> DataFrame:
    """SpanPayloadCheckQuery(SpanTermQuery(term), payloadToMatch=values)
    top-k as (doc_id, score).

    Reference: lucene/core .../spans/SpanPayloadCheckQuery.java:52-74
    (acceptPosition): a span position with NO payload is accepted
    (isPayloadAvailable false -> AcceptStatus.YES); a payload-carrying
    position is accepted iff its payload collection equals `values`
    element-wise — for a SpanTermQuery span that collection is the single
    occurrence payload, so any multi-value `values` rejects every
    payload-carrying position.  The API takes the wrapped term directly,
    so SpanNear wrappers are structurally excluded — the reference
    constructor refuses them too (:45-47; SpanNearPayloadCheckQuery is
    the ordered-collection variant, not implemented).

    Scoring (SpanScorer.java:70-110): freq = float32 fold of
    sloppyFreq(width)=1.0 per ACCEPTED span — an integer count for the
    width-0 SpanTerm spans — then the term's BM25 chain; docs where every
    occurrence is rejected do not match."""
    from .parser import TermQuery
    from .search import (
        RESULT_SCHEMA,
        _apply_live_docs,
        _group_rows,
        _term_weight,
        make_plan,
    )

    vals = np.asarray(list(values), dtype=np.float32)
    if vals.size == 0:
        raise ValueError("payloadToMatch must carry at least one value")
    an = getattr(index, "analyzer", None)
    if an is None or an.payload_delim is None:
        raise ValueError("index was not built with a payload_delim analyzer")
    qterm = term.lower() if an.lowercase else term
    if qterm in an.stopwords:
        return index.spark.createDataFrame([], RESULT_SCHEMA)
    plan = make_plan(index, TermQuery(qterm), k=k)
    wv = _term_weight(plan, qterm)
    rows = (
        index.postings()
        .filter(F.col("term") == qterm)
        .select(
            "seg", "term", "first_doc", "df", "max_tf", "min_len",
            "docs_blob", "tfs_blob", "pay_blob", "norms_blob",
            "block_max_doc", "block_max_tf", "block_min_len",
            "block_doc_boff", "block_tf_boff",
        )
    )

    def _seg(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values("first_doc", kind="mergesort").reset_index(
            drop=True)
        pay_col = pdf.pop("pay_blob")
        tp = _group_rows(pdf).get(qterm)
        if tp is None:
            return pd.DataFrame({"doc_id": [], "score": []}).astype(
                {"doc_id": "int64", "score": "float32"})
        docs = tp.docs()
        tfs = tp.tfs().astype(np.int64)
        chunks = []
        for j, p in enumerate(tp.parts):
            b = pay_col.iloc[j]
            chunks.append(
                np.frombuffer(b, dtype="<f4") if b is not None
                else np.full(int(p.tfs().sum()), np.nan, dtype=np.float32)
            )
        pay = (np.concatenate(chunks) if chunks
               else np.zeros(0, dtype=np.float32))
        # acceptPosition: no payload -> YES; else exact collection match
        if vals.size == 1:
            accept = np.isnan(pay) | (pay == vals[0])
        else:
            accept = np.isnan(pay)
        starts = np.concatenate(([0], np.cumsum(tfs)[:-1])).astype(np.int64)
        freq = np.add.reduceat(accept.astype(np.int64), starts)
        freq[tfs == 0] = 0
        keep = freq > 0
        docs, freq = docs[keep], freq[keep]
        norms = tp.norms()[keep]
        sc = bm25.score(freq, norms, plan.cache, wv).astype(np.float32)
        docs, sc = _apply_live_docs(docs, sc, plan)
        return pd.DataFrame({"doc_id": docs, "score": sc})

    out = rows.groupBy("seg").applyInPandas(_seg, RESULT_SCHEMA)
    return out.orderBy(F.desc("score"), F.asc("doc_id")).limit(k)
