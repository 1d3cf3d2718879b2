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
    constructor refuses them too (:45-47; near_payload_check_topk below
    is the SpanNearPayloadCheckQuery variant).

    Scoring (SpanScorer.java:70-110, the engine's span contract —
    spans.py scores a SpanTerm span (p, p+1) at sloppyFreq
    fl(1/(end-start+1)) = fl(1/2)): freq = the float32 fold of 0.5 per
    ACCEPTED span, which is exactly 0.5*count (halves are exact
    dyadics); then the term's BM25 chain.  Docs where every occurrence
    is rejected do not match."""
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
        cnt = np.add.reduceat(accept.astype(np.int64), starts)
        cnt[tfs == 0] = 0
        keep = cnt > 0
        docs, cnt = docs[keep], cnt[keep]
        norms = tp.norms()[keep]
        # fl fold of 1/2 per accepted span == 0.5*count exactly
        freq = cnt.astype(np.float32) * np.float32(0.5)
        sc = bm25.score(freq, norms, plan.cache, wv).astype(np.float32)
        docs, sc = _apply_live_docs(docs, sc, plan)
        return pd.DataFrame({"doc_id": docs, "score": sc})

    out = rows.groupBy("seg").applyInPandas(_seg, RESULT_SCHEMA)
    return out.orderBy(F.desc("score"), F.asc("doc_id")).limit(k)


def near_payload_check_topk(
    index,
    terms: list[str],
    values,
    k: int = 10,
) -> DataFrame:
    """SpanNearPayloadCheckQuery(SpanNearQuery(terms, slop=0, inOrder),
    payloadToMatch=values) top-k as (doc_id, score).

    Reference: lucene/core .../spans/SpanNearPayloadCheckQuery.java:44-72
    (acceptPosition): unlike the single-term variant, a span with NO
    payload is REJECTED (:71 returns NO); a span's payload collection
    (the payloads carried by its sub-positions) must have exactly
    len(values) entries and every candidate must equal SOME value — the
    reference's order-free greedy count (:50-66, "can't rely on order",
    each candidate breaks on its first match, so duplicate candidates
    can re-match one value: kept faithful).

    Implemented span shape: ordered adjacency (slop=0) over term clauses
    — the sub-span positions of a match are start..start+n-1 exactly, so
    payload collection is well-defined; sloppy near spans don't expose
    WHICH positions matched (the javadoc's own caveat about unordered
    payloads).  Scoring follows the engine's span contract (spans.py):
    an n-term adjacency span (p, p+n) contributes sloppyFreq
    fl(1/(n+1)), accumulated as a float32 fold in match order; score =
    BM25(freq) with the summed idf of the sorted scoring terms
    (SpanWeight)."""
    from .parser import PhraseQuery
    from .search import (
        RESULT_SCHEMA,
        _apply_live_docs,
        _group_rows,
        _sum_idfs,
        make_plan,
    )

    vals = np.asarray(list(values), dtype=np.float32)
    if vals.size == 0:
        raise ValueError("payloadToMatch must carry at least one value")
    if len(terms) < 2:
        raise ValueError("near check wants >= 2 terms")
    an = getattr(index, "analyzer", None)
    if an is None or an.payload_delim is None:
        raise ValueError("index was not built with a payload_delim analyzer")
    qterms = [t.lower() if an.lowercase else t for t in terms]
    if any(t in an.stopwords for t in qterms):
        return index.spark.createDataFrame([], RESULT_SCHEMA)
    plan = make_plan(
        index, PhraseQuery(tuple(qterms), tuple(range(len(qterms))), 0),
        k=k)
    wv = bm25.weight_value(
        _sum_idfs(plan, sorted(set(qterms))), k1=plan.k1)
    rows = (
        index.postings()
        .filter(F.col("term").isin(qterms))
        .select(
            "seg", "term", "first_doc", "df", "max_tf", "min_len",
            "docs_blob", "tfs_blob", "pos_blob", "pay_blob", "norms_blob",
            "block_max_doc", "block_max_tf", "block_min_len",
            "block_doc_boff", "block_tf_boff",
        )
    )
    n = len(qterms)
    vlist = [np.float32(v) for v in vals]

    def _seg(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values("first_doc", kind="mergesort").reset_index(
            drop=True)
        pay_col = pdf.pop("pay_blob")
        tps = _group_rows(pdf)
        per = {}
        for t in set(qterms):
            tp = tps.get(t)
            if tp is None:
                return pd.DataFrame({"doc_id": [], "score": []}).astype(
                    {"doc_id": "int64", "score": "float32"})
            flat, _di = tp.positions_flat()
            off = np.concatenate(([0], np.cumsum(tp.tfs())))
            chunks = []
            for j in range(len(pdf)):
                if pdf["term"].iloc[j] != t:
                    continue
                b = pay_col.iloc[j]
                cnt = int(tps[t].parts[len(chunks)].tfs().sum()) \
                    if b is None else 0
                chunks.append(
                    np.frombuffer(b, dtype="<f4") if b is not None
                    else np.full(cnt, np.nan, dtype=np.float32))
            pay = (np.concatenate(chunks) if chunks
                   else np.zeros(0, dtype=np.float32))
            per[t] = (tp.docs(), flat, off, pay, tp.norms())
        # doc intersection
        cand = per[qterms[0]][0]
        for t in qterms[1:]:
            cand = np.intersect1d(cand, per[t][0], assume_unique=False)
        out_d, out_f = [], []
        for d in cand:
            pos, pays = [], []
            ok = True
            for t in qterms:
                docs, flat, off, pay, _ = per[t]
                i = int(np.searchsorted(docs, d))
                p = flat[off[i]:off[i + 1]]
                pos.append(p)
                pays.append(pay[off[i]:off[i + 1]])
            starts = pos[0]
            for i in range(1, n):
                starts = np.intersect1d(starts, pos[i] - i,
                                        assume_unique=False)
            nacc = 0
            for s in starts:
                cand_pays = []
                for i in range(n):
                    j = int(np.searchsorted(pos[i], s + i))
                    pv = pays[i][j]
                    if not np.isnan(pv):
                        cand_pays.append(np.float32(pv))
                if not cand_pays:            # no payload -> NO (:71)
                    continue
                if len(cand_pays) != len(vlist):
                    continue
                matches = 0
                for cp in cand_pays:         # greedy order-free count
                    for pv in vlist:
                        if cp == pv:
                            matches += 1
                            break
                if matches == len(vlist):
                    nacc += 1
            if nacc:
                f = np.float32(0.0)
                unit = np.float32(1.0) / np.float32(n + 1)
                for _ in range(nacc):
                    f = np.float32(f + unit)
                out_d.append(int(d))
                out_f.append(f)
        if not out_d:
            return pd.DataFrame({"doc_id": [], "score": []}).astype(
                {"doc_id": "int64", "score": "float32"})
        docs = np.asarray(out_d, dtype=np.int64)
        freqs = np.asarray(out_f, dtype=np.float32)
        t0 = qterms[0]
        d0, _, _, _, norms0 = per[t0]
        nidx = np.searchsorted(d0, docs)
        sc = bm25.score(freqs, norms0[nidx], plan.cache, wv)
        docs, sc = _apply_live_docs(docs, sc, plan)
        return pd.DataFrame({"doc_id": docs, "score": sc})

    out = rows.groupBy("seg").applyInPandas(_seg, RESULT_SCHEMA)
    return out.orderBy(F.desc("score"), F.asc("doc_id")).limit(k)
