"""Query execution: per-segment vectorized scoring + global top-k merge.

Spark shape (SURVEY.md §3.2-3.3): the driver plays IndexSearcher steps 1-3
(rewrite, bind *global* stats, precompute idf + the 256-entry norm cache —
IndexSearcher.java:624-635, BM25Similarity.java:207-210); executors run the
per-leaf scorers as one vectorized applyInPandas over the query's posting rows
grouped by segment (bulkScorer at IndexSearcher.java:560); the global merge is
`ORDER BY score DESC, doc_id ASC LIMIT k` over the tiny per-segment top-k
union — the same priority-queue semantics as TopScoreDocCollector/HitQueue
(ties broken by lower doc id, HitQueue.java:76-81) and Solr's shard merge
(QueryComponent.java:1060-1087).

Physical operators (all numpy set algebra on decoded posting arrays):
* term           — TermScorer.java:69-72
* AND            — leapfrog intersection, rarest list leads; non-lead lists
                   are decoded *only in blocks that can contain candidates*
                   via the block directory (ConjunctionDISI.java:65-121 +
                   skip lists MultiLevelSkipListWriter.java:68-81)
* OR             — union + per-doc score sum (DisjunctionSumScorer), with
                   MaxScore pruning: non-essential lists (cumulative upper
                   bound < current kth score) only probed for candidates
                   (rank-neutral; SURVEY §2.7 K9)
* NOT            — required-side anti-membership (ReqExclScorer)
* MUST+SHOULD    — optional scores added to required matches (ReqOptSumScorer)
* minShouldMatch — match-count filter (MinShouldMatchSumScorer)
* phrase         — doc-level intersection first, positions decoded only for
                   survivors (TwoPhaseIterator), phraseFreq = |∩(pos_i - i)|
                   (ExactPhraseScorer.java:127-160)
"""

from __future__ import annotations

from dataclasses import dataclass

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from . import bm25
from .codec import varint_decode
from .parser import (
    MUST,
    MUST_NOT,
    SHOULD,
    BooleanQuery,
    ConstScoreTerms,
    DisjunctionMaxQuery,
    MatchNoDocsQuery,
    PhraseQuery,
    PrefixQuery,
    TermQuery,
    parse,
)

RESULT_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("score", T.FloatType()),
    ]
)


@dataclass
class QueryPlan:
    """Driver-frozen global stats (the Weight; IndexSearcher.java:624-635)."""

    query: object
    k: int
    idf: dict[str, np.float32]  # per-term idf (float32)
    cache: np.ndarray  # 256 float32 norm cache
    avgdl: np.float32
    prune: bool = True
    after: tuple[float, int] | None = None  # searchAfter cursor (K4)
    deleted: np.ndarray | None = None  # sorted tombstoned doc ids (E14)
    k1: np.float32 = bm25.K1  # custom similarity (BM25Similarity.java:46-58)
    b: np.float32 = bm25.B


def query_terms(q) -> set[str]:
    if isinstance(q, TermQuery):
        return {q.term}
    if isinstance(q, (PhraseQuery, ConstScoreTerms)):
        return set(q.terms)
    if isinstance(q, BooleanQuery):
        out: set[str] = set()
        for _, sub in q.clauses:
            out |= query_terms(sub)
        return out
    if isinstance(q, DisjunctionMaxQuery):
        out = set()
        for sub in q.disjuncts:
            out |= query_terms(sub)
        return out
    return set()


def rewrite(q, index):
    """Plan-time rewrite: expand multi-term queries against the term dict
    (MultiTermQuery CONSTANT_SCORE_REWRITE; SURVEY §2.5 P5)."""
    if isinstance(q, PrefixQuery):
        terms = tuple(
            sorted(
                r["term"]
                for r in index.term_stats()
                .filter(F.col("term").startswith(q.prefix))
                .select("term")
                .collect()
            )
        )
        if not terms:
            return MatchNoDocsQuery(f"no terms match prefix {q.prefix!r}")
        return ConstScoreTerms(terms)
    if isinstance(q, BooleanQuery):
        return BooleanQuery(
            tuple((o, rewrite(s, index)) for o, s in q.clauses), q.min_should_match
        )
    if isinstance(q, DisjunctionMaxQuery):
        return DisjunctionMaxQuery(
            tuple(rewrite(s, index) for s in q.disjuncts), q.tie
        )
    return q


# ---------------------------------------------------------------------------
# posting-row access with block-directory skipping
# ---------------------------------------------------------------------------


class PostingRow:
    """One (term, segment) posting row with lazy, block-sliced decoding."""

    __slots__ = ("row", "_docs", "_tfs", "df")

    def __init__(self, row):
        self.row = row
        self._docs = None
        self._tfs = None
        self.df = int(row["df"])

    def docs(self) -> np.ndarray:
        if self._docs is None:
            self._docs = _decode_deltas(self.row["docs_blob"], base=0)
        return self._docs

    def tfs(self) -> np.ndarray:
        if self._tfs is None:
            self._tfs = varint_decode(self.row["tfs_blob"], count=self.df).astype(
                np.int64
            )
        return self._tfs

    def norms(self) -> np.ndarray:
        return np.frombuffer(self.row["norms_blob"], dtype=np.uint8)

    def lookup(self, candidates: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
        """Return (mask over candidates, posting index of hits).

        Decodes only the 128-doc blocks that may contain a candidate, using
        the block directory + byte offsets (the skip-list analog).
        """
        bmax = np.asarray(self.row["block_max_doc"], dtype=np.int64)
        dboff = np.asarray(self.row["block_doc_boff"], dtype=np.int64)
        nblocks = bmax.size
        need = np.unique(np.searchsorted(bmax, candidates, side="left"))
        need = need[need < nblocks]
        if self._docs is not None or need.size > nblocks * 0.5 or nblocks <= 2:
            docs = self.docs()
            idx = np.searchsorted(docs, candidates)
            idx_c = np.minimum(idx, docs.size - 1)
            mask = docs[idx_c] == candidates
            return mask, idx_c[mask]
        blob = self.row["docs_blob"]
        mask = np.zeros(candidates.size, dtype=bool)
        pidx = np.zeros(candidates.size, dtype=np.int64)
        from .codec import BLOCK_SIZE

        for b in need:
            base = 0 if b == 0 else int(bmax[b - 1])
            deltas = varint_decode(bytes(blob[dboff[b]: dboff[b + 1]]))
            docs_b = base + np.cumsum(deltas.astype(np.int64))
            lo = np.searchsorted(candidates, docs_b[0])
            hi = np.searchsorted(candidates, docs_b[-1], side="right")
            cand = candidates[lo:hi]
            ii = np.searchsorted(docs_b, cand)
            ii_c = np.minimum(ii, docs_b.size - 1)
            m = docs_b[ii_c] == cand
            mask[lo:hi] |= m
            pidx[lo:hi][m] = b * BLOCK_SIZE + ii_c[m]
        return mask, pidx[mask]


def _decode_deltas(blob: bytes, base: int) -> np.ndarray:
    return base + np.cumsum(varint_decode(bytes(blob)).astype(np.int64))


class TermPostings:
    """All posting rows of one term in one segment.

    A freshly-built segment has one row per term; a merged segment may carry
    several *posting-block rows* per term (per-term posting-block splitting
    for skewed/stopword-like terms, north_rule) with disjoint ascending doc
    ranges.  This wrapper presents them as one logical posting list.
    """

    __slots__ = ("parts", "df", "_offsets")

    def __init__(self, rows: list):
        rows = sorted(rows, key=lambda r: r["first_doc"])
        self.parts = [PostingRow(r) for r in rows]
        dfs = [p.df for p in self.parts]
        self.df = int(sum(dfs))
        self._offsets = np.concatenate(([0], np.cumsum(dfs)))

    @property
    def row(self):  # term-level stats for upper bounds
        if len(self.parts) == 1:
            return self.parts[0].row
        return {
            "max_tf": max(p.row["max_tf"] for p in self.parts),
            "min_len": min(p.row["min_len"] for p in self.parts),
        }

    def docs(self) -> np.ndarray:
        if len(self.parts) == 1:
            return self.parts[0].docs()
        return np.concatenate([p.docs() for p in self.parts])

    def tfs(self) -> np.ndarray:
        if len(self.parts) == 1:
            return self.parts[0].tfs()
        return np.concatenate([p.tfs() for p in self.parts])

    def norms(self) -> np.ndarray:
        if len(self.parts) == 1:
            return self.parts[0].norms()
        return np.concatenate([p.norms() for p in self.parts])

    def positions_flat(self) -> tuple[np.ndarray, np.ndarray]:
        """(flat absolute positions, posting index per position) across parts."""
        from .codec import decode_positions_flat

        flats, idxs = [], []
        for off, p in zip(self._offsets[:-1], self.parts):
            f, di = decode_positions_flat(p.row["pos_blob"], p.tfs())
            flats.append(f)
            idxs.append(di + off)
        return np.concatenate(flats), np.concatenate(idxs)

    def lookup(self, candidates: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
        if len(self.parts) == 1:
            return self.parts[0].lookup(candidates)
        mask = np.zeros(candidates.size, dtype=bool)
        pidx = np.zeros(candidates.size, dtype=np.int64)
        for off, p in zip(self._offsets[:-1], self.parts):
            m, pi = p.lookup(candidates)
            pidx[m] = pi + off
            mask |= m
        return mask, pidx[mask]


# ---------------------------------------------------------------------------
# per-segment clause scorers
# ---------------------------------------------------------------------------


def _term_weight(plan: QueryPlan, term: str) -> np.float32:
    return bm25.weight_value(plan.idf.get(term, np.float32(0.0)), k1=plan.k1)


def _score_posting(
    pr: PostingRow, idx: np.ndarray, wv: np.float32, plan: QueryPlan
) -> np.ndarray:
    tfs = pr.tfs()[idx]
    norms = pr.norms()[idx]
    return bm25.score(tfs, norms, plan.cache, wv)


def _clause_scorer(
    q, rows: dict[str, PostingRow], plan: QueryPlan
) -> tuple[np.ndarray, np.ndarray]:
    """Return (sorted doc_ids, float32 scores) for one clause in one segment."""
    if isinstance(q, TermQuery):
        pr = rows.get(q.term)
        if pr is None:
            return _EMPTY
        docs = pr.docs()
        scores = _score_posting(pr, np.arange(docs.size), _term_weight(plan, q.term), plan)
        return docs, scores
    if isinstance(q, PhraseQuery):
        return _phrase_scorer(q, rows, plan)
    if isinstance(q, BooleanQuery):
        return _bool_scorer(q, rows, plan)
    if isinstance(q, ConstScoreTerms):
        parts = [rows[t].docs() for t in q.terms if t in rows]
        if not parts:
            return _EMPTY
        docs = np.unique(np.concatenate(parts))
        return docs, np.full(docs.size, np.float32(q.boost), dtype=np.float32)
    if isinstance(q, DisjunctionMaxQuery):
        return _dismax_scorer(q, rows, plan)
    if isinstance(q, MatchNoDocsQuery):
        return _EMPTY
    raise TypeError(f"unsupported query {type(q)}")


def _dismax_scorer(q: DisjunctionMaxQuery, rows, plan):
    """score = max + tie*(sum - max), all float32 (DisjunctionMaxScorer)."""
    parts = []
    for sub in q.disjuncts:
        d, s = _clause_scorer(sub, rows, plan)
        if d.size:
            parts.append((d, s))
    if not parts:
        return _EMPTY
    docs = np.unique(np.concatenate([d for d, _ in parts]))
    smax = np.zeros(docs.size, dtype=np.float32)
    ssum = np.zeros(docs.size, dtype=np.float32)
    for d, s in parts:
        pos = np.searchsorted(docs, d)
        np.maximum.at(smax, pos, s)
        ssum[pos] = (ssum[pos] + s).astype(np.float32)
    tie = np.float32(q.tie)
    return docs, (smax + tie * (ssum - smax)).astype(np.float32)


_EMPTY = (np.zeros(0, dtype=np.int64), np.zeros(0, dtype=np.float32))


def _intersect_candidates(
    terms: list[str], rows: dict[str, PostingRow]
) -> tuple[np.ndarray, dict[str, np.ndarray]] | None:
    """Leapfrog: rarest list fully decoded, others probed block-wise.

    Returns (docs present in ALL lists, per-term posting index of each doc).
    """
    prs = []
    for t in set(terms):
        pr = rows.get(t)
        if pr is None:
            return None
        prs.append((t, pr))
    prs.sort(key=lambda tp: tp[1].df)  # cost order: rarest leads (E2)
    lead_t, lead = prs[0]
    cand = lead.docs()
    idxmap: dict[str, np.ndarray] = {lead_t: np.arange(cand.size)}
    for t, pr in prs[1:]:
        if cand.size == 0:
            return None
        mask, pidx = pr.lookup(cand)
        cand = cand[mask]
        for tt in idxmap:
            idxmap[tt] = idxmap[tt][mask]
        idxmap[t] = pidx
    if cand.size == 0:
        return None
    return cand, idxmap


def _bool_scorer(q: BooleanQuery, rows, plan) -> tuple[np.ndarray, np.ndarray]:
    must = [sub for occ, sub in q.clauses if occ == MUST]
    should = [sub for occ, sub in q.clauses if occ == SHOULD]
    must_not = [sub for occ, sub in q.clauses if occ == MUST_NOT]

    if must:
        simple = all(isinstance(m, TermQuery) for m in must)
        if simple:
            hit = _intersect_candidates([m.term for m in must], rows)
            if hit is None:
                return _EMPTY
            docs, idxmap = hit
            scores = np.zeros(docs.size, dtype=np.float32)
            for m in must:
                scores += _score_posting(
                    rows[m.term], idxmap[m.term], _term_weight(plan, m.term), plan
                )
            scores = scores.astype(np.float32)
        else:
            docs, scores = None, None
            for m in must:
                d, s = _clause_scorer(m, rows, plan)
                if docs is None:
                    docs, scores = d, s
                else:
                    keep = np.isin(docs, d, assume_unique=True)
                    docs, scores = docs[keep], scores[keep]
                    add = s[np.isin(d, docs, assume_unique=True)]
                    scores = (scores + add).astype(np.float32)
                if docs.size == 0:
                    return _EMPTY
        # ReqOptSumScorer: optional scores added where aligned (E7)
        for sh in should:
            d, s = _clause_scorer(sh, rows, plan)
            if d.size:
                pos = np.searchsorted(d, docs)
                pos_c = np.minimum(pos, d.size - 1)
                m = d[pos_c] == docs
                scores[m] = (scores[m] + s[pos_c[m]]).astype(np.float32)
    else:
        # pure disjunction (E3), MaxScore-pruned when plan.prune
        docs, scores = _union_scorer(should, rows, plan, q.min_should_match)
        if docs is None:
            return _EMPTY

    # MUST_NOT: ReqExclScorer (E6)
    for mn in must_not:
        d, _ = _clause_scorer(mn, rows, plan)
        if d.size:
            keep = ~np.isin(docs, d)
            docs, scores = docs[keep], scores[keep]
    if docs.size == 0:
        return _EMPTY
    return docs, scores


def _union_scorer(should, rows, plan, min_should_match: int):
    """Disjunction with per-doc score sum; optional match-count filter."""
    parts = []
    for sh in should:
        d, s = _clause_scorer(sh, rows, plan)
        if d.size:
            parts.append((d, s))
    if not parts:
        return None, None
    docs = np.unique(np.concatenate([d for d, _ in parts]))
    # float32 sum parity: subscorer scores accumulated in clause order, each
    # addition rounded to float32 (DisjunctionSumScorer sums Java floats)
    scores32 = np.zeros(docs.size, dtype=np.float32)
    counts = np.zeros(docs.size, dtype=np.int64)
    for d, s in parts:
        pos = np.searchsorted(docs, d)
        scores32[pos] = (scores32[pos] + s).astype(np.float32)
        counts[pos] += 1
    if min_should_match > 1:
        keep = counts >= min_should_match
        docs, scores32 = docs[keep], scores32[keep]
    return docs, scores32


def _phrase_scorer(q: PhraseQuery, rows, plan) -> tuple[np.ndarray, np.ndarray]:
    """Exact phrase: doc intersection, then position alignment (E9/E11)."""
    hit = _intersect_candidates(list(q.terms), rows)
    if hit is None:
        return _EMPTY
    docs, idxmap = hit
    if getattr(q, "slop", 0) > 0:
        return _sloppy_scorer(q, rows, plan, docs, idxmap)
    # two-phase: decode positions only now, only for survivor docs
    keys = None
    for term, qpos in zip(q.terms, q.positions):
        pr = rows[term]
        idx = idxmap[term]
        flat, doc_idx = pr.positions_flat()
        tfs_all = pr.tfs()
        # select positions belonging to survivor postings
        sel = np.isin(doc_idx, idx)
        p = flat[sel] - qpos  # adjusted start position; must be >= 0
        d = doc_idx[sel]
        ok = p >= 0
        p, d = p[ok], d[ok]
        # map posting index -> dense survivor ordinal; key = (ordinal, start)
        # (positions < 2^22 per doc: Arrow batch docs are far smaller)
        ord_of = np.full(tfs_all.size, -1, dtype=np.int64)
        ord_of[idx] = np.arange(idx.size)
        kk = ord_of[d] * (1 << 22) + p
        keys = kk if keys is None else np.intersect1d(keys, kk, assume_unique=True)
        if keys.size == 0:
            return _EMPTY
    survivor_ord = keys >> 22
    freq = np.bincount(survivor_ord, minlength=docs.size)
    m = freq > 0
    wv = bm25.weight_value(_sum_idfs(plan, q.terms), k1=plan.k1)
    # score(doc, phraseFreq): ExactPhraseScorer.java:108-110
    norms = rows[q.terms[0]].norms()[idxmap[q.terms[0]]]
    scores = bm25.score(freq[m].astype(np.float32), norms[m], plan.cache, wv)
    return docs[m], scores


def _sloppy_scorer(
    q: PhraseQuery, rows, plan, docs: np.ndarray, idxmap: dict[str, np.ndarray]
) -> tuple[np.ndarray, np.ndarray]:
    """Sloppy phrase (E10): two-phase like the exact path — doc-level
    conjunction first, then the greedy SloppyPhraseScorer walk per survivor
    (sloppy.sloppy_phrase_freq), score = BM25(doc, sloppyFreq) with the
    phrase's summed idf (SloppyPhraseScorer.java:92-128)."""
    from .sloppy import sloppy_phrase_freq

    term_pos: dict[str, tuple[np.ndarray, np.ndarray]] = {}
    for t in set(q.terms):
        pr = rows[t]
        flat, _doc_idx = pr.positions_flat()
        off = np.concatenate(([0], np.cumsum(pr.tfs())))
        term_pos[t] = (flat, off)
    freqs = np.zeros(docs.size, dtype=np.float32)
    for s in range(docs.size):
        plists = []
        for t in q.terms:
            flat, off = term_pos[t]
            i = int(idxmap[t][s])
            plists.append(flat[off[i]: off[i + 1]])
        freqs[s] = sloppy_phrase_freq(q.terms, q.positions, plists, q.slop)
    m = freqs > 0
    if not m.any():
        return _EMPTY
    wv = bm25.weight_value(_sum_idfs(plan, q.terms), k1=plan.k1)
    norms = rows[q.terms[0]].norms()[idxmap[q.terms[0]]]
    scores = bm25.score(freqs[m], norms[m], plan.cache, wv)
    return docs[m], scores


def _sum_idfs(plan: QueryPlan, terms) -> np.float32:
    """Phrase idf = per-term idfs accumulated in float (BM25Similarity:187-198)."""
    acc = np.float32(0.0)
    for t in terms:
        acc = np.float32(acc + plan.idf.get(t, np.float32(0.0)))
    return acc


# ---------------------------------------------------------------------------
# block-max pruning for single-term top-k (rank-neutral)
# ---------------------------------------------------------------------------


def _term_blockmax_topk(tp: TermPostings, wv: np.float32, plan: QueryPlan):
    """Block-max WAND for one term (K9): score blocks in descending
    upper-bound order, stop once the next block's bound is below the running
    kth score.  Exact: stops only on strict <, so boundary ties survive.

    Per-block upper bound from the block directory (block_max_tf +
    block_min_len): score <= wv*bmtf/(bmtf + k1*((1-b)+b*bminlen/avgdl)) —
    every op is monotone under float32 rounding, so the bound is sound.
    """
    from .codec import BLOCK_SIZE

    blocks = []  # (ub, part_idx, block_idx)
    for pi, p in enumerate(tp.parts):
        bmtf = np.asarray(p.row["block_max_tf"], dtype=np.float32)
        bminl = np.asarray(p.row["block_min_len"], dtype=np.float32)
        c = plan.k1 * ((np.float32(1) - plan.b) + plan.b * bminl / plan.avgdl)
        ubs = (wv * bmtf / (bmtf + c)).astype(np.float32)
        for bi in range(ubs.size):
            blocks.append((float(ubs[bi]), pi, bi))
    blocks.sort(key=lambda x: -x[0])

    cand_docs: list[np.ndarray] = []
    cand_scores: list[np.ndarray] = []
    nseen = 0
    tau = -np.inf
    for ub, pi, bi in blocks:
        if nseen >= plan.k and ub < tau:
            break  # no remaining block can beat the kth score
        p = tp.parts[pi]
        bmax = np.asarray(p.row["block_max_doc"], dtype=np.int64)
        dboff = np.asarray(p.row["block_doc_boff"], dtype=np.int64)
        tboff = np.asarray(p.row["block_tf_boff"], dtype=np.int64)
        base = 0 if bi == 0 else int(bmax[bi - 1])
        deltas = varint_decode(bytes(p.row["docs_blob"][dboff[bi]: dboff[bi + 1]]))
        docs_b = base + np.cumsum(deltas.astype(np.int64))
        tfs_b = varint_decode(
            bytes(p.row["tfs_blob"][tboff[bi]: tboff[bi + 1]])
        ).astype(np.int64)
        lo = bi * BLOCK_SIZE
        norms_b = np.frombuffer(
            p.row["norms_blob"], dtype=np.uint8, count=docs_b.size, offset=lo
        )
        scores_b = bm25.score(tfs_b, norms_b, plan.cache, wv)
        cand_docs.append(docs_b)
        cand_scores.append(scores_b)
        nseen += docs_b.size
        if nseen >= plan.k:
            allsc = np.concatenate(cand_scores)
            if allsc.size >= plan.k:
                tau = np.partition(allsc, allsc.size - plan.k)[allsc.size - plan.k]
    if not cand_docs:
        return _EMPTY
    return np.concatenate(cand_docs), np.concatenate(cand_scores)


# ---------------------------------------------------------------------------
# MaxScore pruning for pure disjunctions (rank-neutral)
# ---------------------------------------------------------------------------


def _term_upper_bound(row, wv: np.float32, plan: QueryPlan) -> np.float32:
    """score <= wv * max_tf / (max_tf + cache(min_len)) — monotone-rounded."""
    max_tf = np.float32(row["max_tf"])
    min_len = np.float32(row["min_len"])
    c = plan.k1 * ((np.float32(1) - plan.b) + plan.b * min_len / plan.avgdl)
    return np.float32(wv * max_tf / (max_tf + np.float32(c)))


def _or_maxscore(q: BooleanQuery, rows, plan) -> tuple[np.ndarray, np.ndarray]:
    """MaxScore over term-only disjunctions: essential lists scored fully,
    non-essential lists only probed for candidate docs. Exact top-k."""
    terms = [sub.term for _, sub in q.clauses if isinstance(sub, TermQuery)]
    prs = [(t, rows[t]) for t in terms if t in rows]
    if not prs:
        return _EMPTY
    ubs = np.array(
        [_term_upper_bound(p.row, _term_weight(plan, t), plan) for t, p in prs],
        dtype=np.float32,
    )
    order = np.argsort(-ubs, kind="stable")
    prs = [prs[i] for i in order]
    ubs = ubs[order]

    # threshold from the highest-ub list's own top-k
    t0, p0 = prs[0]
    s0 = _score_posting(p0, np.arange(p0.df), _term_weight(plan, t0), plan)
    if s0.size >= plan.k:
        tau = np.partition(s0, s0.size - plan.k)[s0.size - plan.k]
    else:
        tau = np.float32(-1.0)
    # suffix sums of ubs: lists from index j onward can contribute at most suf[j]
    suf = np.cumsum(ubs[::-1])[::-1]
    n_essential = 1
    for j in range(1, len(prs)):
        if suf[j] < tau:
            break
        n_essential = j + 1

    essential = {t for t, _ in prs[:n_essential]}
    cand = np.unique(np.concatenate([p.docs() for t, p in prs if t in essential]))
    # accumulate in ORIGINAL clause order so float32 sums are bit-identical
    # to the unpruned path / oracle (float addition is not associative)
    scores = np.zeros(cand.size, dtype=np.float32)
    for t in terms:
        p = rows.get(t)
        if p is None:
            continue
        if t in essential:
            d = p.docs()
            pos = np.searchsorted(cand, d)
            s = _score_posting(p, np.arange(d.size), _term_weight(plan, t), plan)
            scores[pos] = (scores[pos] + s).astype(np.float32)
        else:
            mask, pidx = p.lookup(cand)
            if mask.any():
                s = _score_posting(p, pidx, _term_weight(plan, t), plan)
                scores[mask] = (scores[mask] + s).astype(np.float32)
    return cand, scores


# ---------------------------------------------------------------------------
# top level
# ---------------------------------------------------------------------------


def make_plan(
    index, query, k: int = 10, prune: bool = True,
    after: tuple[float, int] | None = None,
    k1: float = None, b: float = None,
) -> QueryPlan:
    """Bind global stats on the driver (createNormalizedWeight analog).

    k1/b override the BM25 constants per query — the custom-similarity
    surface (BM25Similarity.java:46-58 constructor args); defaults keep the
    reference's 1.2/0.75 and bit parity."""
    query = rewrite(query, index)
    terms = sorted(query_terms(query))
    stats = index.term_dfs(terms) if terms else {}
    max_doc = index.max_doc
    idf = {t: bm25.idf(stats[t], max_doc) for t in stats}
    avgdl = bm25.avg_field_length(index.sum_total_term_freq, max_doc)
    deleted = index.deleted_doc_ids() if hasattr(index, "deleted_doc_ids") else None
    k1f = bm25.K1 if k1 is None else np.float32(k1)
    bf = bm25.B if b is None else np.float32(b)
    return QueryPlan(
        query=query, k=k, idf=idf, cache=bm25.norm_cache(avgdl, k1f, bf),
        avgdl=avgdl, prune=prune, after=after, deleted=deleted, k1=k1f, b=bf,
    )


def _group_rows(pdf: pd.DataFrame) -> dict[str, TermPostings]:
    by_term: dict[str, list] = {}
    for _, r in pdf.iterrows():
        by_term.setdefault(r["term"], []).append(r)
    return {t: TermPostings(rs) for t, rs in by_term.items()}


def _apply_live_docs(docs: np.ndarray, scores: np.ndarray, plan: QueryPlan):
    """E14: push tombstones into every scorer (acceptDocs analog)."""
    if plan.deleted is None or docs.size == 0:
        return docs, scores
    idx = np.searchsorted(plan.deleted, docs)
    idx_c = np.minimum(idx, plan.deleted.size - 1)
    dead = plan.deleted[idx_c] == docs
    return docs[~dead], scores[~dead]


def _score_in_segment(
    rows: dict[str, TermPostings], plan: QueryPlan
) -> tuple[np.ndarray, np.ndarray]:
    """One query against one segment's decoded posting rows -> (docs, scores).

    Shared by the single-query and batched paths; picks the rank-neutral
    pruned path (block-max WAND / MaxScore) when applicable."""
    q = plan.query
    if (
        plan.prune
        and plan.deleted is None
        and plan.after is None
        and isinstance(q, TermQuery)
        and q.term in rows
    ):
        docs, scores = _term_blockmax_topk(
            rows[q.term], _term_weight(plan, q.term), plan
        )
    elif (
        plan.prune
        and plan.deleted is None
        and isinstance(q, BooleanQuery)
        and all(o == SHOULD and isinstance(s, TermQuery) for o, s in q.clauses)
        and q.min_should_match <= 1
        and len({s.term for _, s in q.clauses}) == len(q.clauses)
    ):
        docs, scores = _or_maxscore(q, rows, plan)
    else:
        docs, scores = _clause_scorer(q, rows, plan)
        docs, scores = _apply_live_docs(docs, scores, plan)
    if plan.after is not None and docs.size:
        # K4 searchAfter: strictly after the cursor in (score desc, doc asc)
        s_after = np.float32(plan.after[0])
        d_after = int(plan.after[1])
        keep = (scores < s_after) | ((scores == s_after) & (docs > d_after))
        docs, scores = docs[keep], scores[keep]
    return docs, scores


def _segment_topk(pdf: pd.DataFrame, plan: QueryPlan) -> pd.DataFrame:
    rows = _group_rows(pdf)
    docs, scores = _score_in_segment(rows, plan)
    if docs.size == 0:
        return pd.DataFrame({"doc_id": pd.Series(dtype="int64"),
                             "score": pd.Series(dtype="float32")})
    # K2: top-k by (-score, doc_id) — equivalent to TopScoreDocCollector's
    # heap with HitQueue tie-break (reject equal when full => lowest doc ids
    # survive among equal scores)
    order = np.lexsort((docs, -scores.astype(np.float64)))[: plan.k]
    return pd.DataFrame({"doc_id": docs[order], "score": scores[order]})


def search(
    index, query_or_text, k: int = 10, prune: bool = True,
    after: tuple[float, int] | None = None,
    k1: float = None, b: float = None,
) -> DataFrame:
    """Top-k search -> DataFrame(doc_id, score), Lucene-rank-identical.

    `after=(score, doc_id)` pages past a previous hit (searchAfter, K4:
    IndexSearcher.java:315-325)."""
    q = parse(query_or_text) if isinstance(query_or_text, str) else query_or_text
    plan = make_plan(index, q, k, prune, after, k1=k1, b=b)
    q = plan.query  # post-rewrite (prefix expansion)
    terms = sorted(query_terms(q))
    if not terms or isinstance(q, MatchNoDocsQuery):
        return index.spark.createDataFrame([], RESULT_SCHEMA)
    posting_cols = [
        "seg", "term", "first_doc", "df", "max_tf", "min_len", "docs_blob",
        "tfs_blob", "norms_blob", "block_max_doc", "block_max_tf",
        "block_min_len", "block_doc_boff", "block_tf_boff",
    ]
    if isinstance(q, PhraseQuery) or _has_phrase(q):
        posting_cols.append("pos_blob")
    rows = (
        index.postings()
        .filter(F.col("term").isin(terms))
        .select(*posting_cols)
    )
    per_seg = rows.groupBy("seg").applyInPandas(
        lambda pdf: _segment_topk(pdf, plan), RESULT_SCHEMA
    )
    # K3 global merge: identical tie-break (score desc, doc_id asc)
    return per_seg.orderBy(F.desc("score"), F.asc("doc_id")).limit(k)


MANY_SCHEMA = T.StructType(
    [
        T.StructField("query_id", T.StringType()),
        T.StructField("doc_id", T.LongType()),
        T.StructField("score", T.FloatType()),
    ]
)


def search_many(
    index, queries: dict[str, object], k: int = 10, prune: bool = True
) -> DataFrame:
    """Batched top-k: many queries in ONE distributed job.

    -> DataFrame(query_id, doc_id, score), rank-identical per query to
    `search(index, q, k)`.

    The offline-evaluation shape (the reference's benchmark module replays a
    query log the same way — lucene/benchmark SearchTask over a fixed query
    set): one posting scan covers the union of all query terms, each segment
    decodes every posting list ONCE and scores all queries against it
    (PostingRow caches decoded arrays), and scheduling overhead amortizes
    across the whole batch — per-query cost approaches pure scoring work, so
    batch throughput scales with cores unlike single-query latency, which is
    floored by per-job overhead.  Global per-query top-k is a window
    row_number over (score desc, doc_id asc) — the same HitQueue tie-break
    as the single-query path (HitQueue.java:76-81).
    """
    parsed = {
        qid: parse(q) if isinstance(q, str) else q for qid, q in queries.items()
    }
    parsed = {qid: rewrite(q, index) for qid, q in parsed.items()}
    all_terms: set[str] = set()
    for q in parsed.values():
        all_terms |= query_terms(q)
    all_terms_l = sorted(all_terms)
    if not all_terms_l:
        return index.spark.createDataFrame([], MANY_SCHEMA)

    # one cached stats fetch for the whole batch (Index.term_dfs)
    stats = index.term_dfs(all_terms_l)
    max_doc = index.max_doc
    avgdl = bm25.avg_field_length(index.sum_total_term_freq, max_doc)
    cache = bm25.norm_cache(avgdl)
    deleted = index.deleted_doc_ids() if hasattr(index, "deleted_doc_ids") else None
    plans = {
        qid: QueryPlan(
            query=q, k=k,
            idf={t: bm25.idf(stats[t], max_doc) for t in query_terms(q) & stats.keys()},
            cache=cache, avgdl=avgdl, prune=prune, deleted=deleted,
        )
        for qid, q in parsed.items()
        if not isinstance(q, MatchNoDocsQuery)
    }
    if not plans:
        return index.spark.createDataFrame([], MANY_SCHEMA)

    posting_cols = [
        "seg", "term", "first_doc", "df", "max_tf", "min_len", "docs_blob",
        "tfs_blob", "norms_blob", "block_max_doc", "block_max_tf",
        "block_min_len", "block_doc_boff", "block_tf_boff",
    ]
    if any(_has_phrase(q) for q in parsed.values()):
        posting_cols.append("pos_blob")

    def _seg_many(pdf: pd.DataFrame) -> pd.DataFrame:
        rows = _group_rows(pdf)
        qids: list[str] = []
        docs_l: list[np.ndarray] = []
        scores_l: list[np.ndarray] = []
        for qid, plan in plans.items():
            docs, scores = _score_in_segment(rows, plan)
            if docs.size == 0:
                continue
            order = np.lexsort((docs, -scores.astype(np.float64)))[: plan.k]
            qids.extend([qid] * order.size)
            docs_l.append(docs[order])
            scores_l.append(scores[order])
        if not docs_l:
            return pd.DataFrame(
                {"query_id": pd.Series(dtype="object"),
                 "doc_id": pd.Series(dtype="int64"),
                 "score": pd.Series(dtype="float32")}
            )
        return pd.DataFrame(
            {"query_id": qids,
             "doc_id": np.concatenate(docs_l),
             "score": np.concatenate(scores_l)}
        )

    rows_df = (
        index.postings()
        .filter(F.col("term").isin(all_terms_l))
        .select(*posting_cols)
    )
    per_seg = rows_df.groupBy("seg").applyInPandas(_seg_many, MANY_SCHEMA)
    from pyspark.sql import Window

    w = Window.partitionBy("query_id").orderBy(F.desc("score"), F.asc("doc_id"))
    return (
        per_seg.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= k)
        .drop("rn")
    )


def scores(index, query_or_text, prune: bool = False) -> DataFrame:
    """ALL matching (doc_id, score) rows — no top-k cut.

    The full-scores surface behind joins, filter-then-rank flows
    (solr_api.solr_select applies fq filters on this before ordering), and
    function-query composition.  Same scorers as search(), same float32
    contract; defaults to prune=False because every match must be emitted.
    """
    q = parse(query_or_text) if isinstance(query_or_text, str) else query_or_text
    plan = make_plan(index, q, k=1, prune=prune)
    q = plan.query
    terms = sorted(query_terms(q))
    if not terms or isinstance(q, MatchNoDocsQuery):
        return index.spark.createDataFrame([], RESULT_SCHEMA)
    posting_cols = [
        "seg", "term", "first_doc", "df", "max_tf", "min_len", "docs_blob",
        "tfs_blob", "norms_blob", "block_max_doc", "block_max_tf",
        "block_min_len", "block_doc_boff", "block_tf_boff",
    ]
    if _has_phrase(q):
        posting_cols.append("pos_blob")
    rows = (
        index.postings()
        .filter(F.col("term").isin(terms))
        .select(*posting_cols)
    )

    def _seg_all(pdf: pd.DataFrame) -> pd.DataFrame:
        prs = _group_rows(pdf)
        docs, sc = _clause_scorer(plan.query, prs, plan)
        docs, sc = _apply_live_docs(docs, sc, plan)
        return pd.DataFrame({"doc_id": docs, "score": sc})

    return rows.groupBy("seg").applyInPandas(_seg_all, RESULT_SCHEMA)


def count(index, query_or_text) -> int:
    """TotalHitCountCollector analog: match count, no scores (P3/K5)."""
    q = parse(query_or_text) if isinstance(query_or_text, str) else query_or_text
    plan = make_plan(index, q, k=1, prune=False)
    terms = sorted(query_terms(plan.query))
    if not terms:
        return 0
    rows = index.postings().filter(F.col("term").isin(terms))
    schema = T.StructType([T.StructField("n", T.LongType())])

    def _cnt(pdf: pd.DataFrame) -> pd.DataFrame:
        prs = _group_rows(pdf)
        docs, scores = _clause_scorer(plan.query, prs, plan)
        docs, _ = _apply_live_docs(docs, scores, plan)
        return pd.DataFrame({"n": [int(docs.size)]})

    out = rows.groupBy("seg").applyInPandas(_cnt, schema).agg(F.sum("n")).collect()
    return int(out[0][0] or 0)


def explain(index, query_or_text, doc_id: int) -> dict:
    """K6: Explanation tree for one (query, doc) — IndexSearcher.explain
    (IndexSearcher.java:669-684) + BM25Similarity.explainScore
    (BM25Similarity.java:266-287) analog.

    Returns a nested dict {match, value, description, details:[...]}.  The
    top-level `value` is bit-identical (float32) to the score `search` gives
    this doc: it is produced by the same scorer path over the doc's segment,
    not recomputed from the printed factors (Lucene's own explain text can
    drift in the last ulp from the scorer; ours never does).
    """
    q = parse(query_or_text) if isinstance(query_or_text, str) else query_or_text
    plan = make_plan(index, q, k=1, prune=False)
    q = plan.query
    terms = sorted(query_terms(q))
    no = {"match": False, "value": 0.0, "description": "no match", "details": []}
    if not terms or isinstance(q, MatchNoDocsQuery):
        return no
    seg_rows = (
        index.docstats().filter(F.col("doc_id") == int(doc_id))
        .select("seg", "doclen", "norm_byte").collect()
    )
    if not seg_rows:
        return {**no, "description": f"doc {doc_id} not in index"}
    seg = seg_rows[0]["seg"]
    pdf = (
        index.postings()
        .filter((F.col("seg") == seg) & F.col("term").isin(terms))
        .toPandas()
    )
    rows = _group_rows(pdf)
    docs, scores = _clause_scorer(q, rows, plan)
    docs, scores = _apply_live_docs(docs, scores, plan)
    pos = np.searchsorted(docs, int(doc_id))
    if pos >= docs.size or docs[pos] != int(doc_id):
        return {**no, "description": "doc does not match query"}
    value = float(scores[pos])
    return {
        "match": True,
        "value": value,
        "description": _describe(q),
        "details": _explain_details(q, rows, plan, int(doc_id)),
    }


def _describe(q) -> str:
    if isinstance(q, TermQuery):
        return f"weight(content:{q.term}) [BM25, k1=1.2, b=0.75]"
    if isinstance(q, PhraseQuery):
        kind = f'~{q.slop}' if getattr(q, "slop", 0) else ""
        return f"weight(content:\"{' '.join(q.terms)}\"{kind}) [BM25]"
    if isinstance(q, BooleanQuery):
        return "sum of:"
    if isinstance(q, DisjunctionMaxQuery):
        return f"max plus {q.tie} times others of:"
    if isinstance(q, ConstScoreTerms):
        return f"ConstantScore({len(q.terms)} terms)"
    return type(q).__name__


def _explain_details(q, rows, plan: QueryPlan, doc: int) -> list[dict]:
    if isinstance(q, TermQuery):
        tp = rows.get(q.term)
        if tp is None:
            return []
        mask, pidx = tp.lookup(np.array([doc], dtype=np.int64))
        if not mask.any():
            return []
        i = int(pidx[0])
        freq = float(tp.tfs()[i])
        nb = int(tp.norms()[i])
        idf = float(plan.idf.get(q.term, np.float32(0.0)))
        c = float(plan.cache[nb])
        return [
            {"value": freq, "description": f"freq, occurrences of {q.term!r}"},
            {"value": idf,
             "description": "idf, computed as log(1 + (maxDoc - df + 0.5) / (df + 0.5))"},
            {"value": float(NORM_TABLE_LEN(nb)),
             "description": "fieldLength (decoded norm byte)"},
            {"value": (freq * 2.2) / (freq + c),
             "description": "tfNorm, computed as (freq*(k1+1)) / (freq + k1*(1-b+b*fieldLength/avgFieldLength))"},
        ]
    if isinstance(q, PhraseQuery):
        hit = _intersect_candidates(list(q.terms), rows)
        if hit is None:
            return []
        docs, idxmap = hit
        s = np.searchsorted(docs, doc)
        if s >= docs.size or docs[s] != doc:
            return []
        plists = []
        for t in q.terms:
            pr = rows[t]
            flat, _di = pr.positions_flat()
            off = np.concatenate(([0], np.cumsum(pr.tfs())))
            i = int(idxmap[t][s])
            plists.append(flat[off[i]: off[i + 1]])
        if getattr(q, "slop", 0) > 0:
            from .sloppy import sloppy_phrase_freq

            freq = float(sloppy_phrase_freq(q.terms, q.positions, plists, q.slop))
            fdesc = f"phraseFreq, sloppy (slop={q.slop}), sum of 1/(distance+1)"
        else:
            starts = set(int(p) for p in plists[0])
            for pl, qpos in zip(plists[1:], q.positions[1:]):
                starts &= {int(p) - qpos for p in pl}
            freq = float(len(starts))
            fdesc = "phraseFreq, exact alignments"
        idf = float(_sum_idfs(plan, q.terms))
        return [
            {"value": freq, "description": fdesc},
            {"value": idf, "description": "idf, sum of per-term idfs"},
        ]
    if isinstance(q, BooleanQuery):
        out = []
        for occ, sub in q.clauses:
            d, s = _clause_scorer(sub, rows, plan)
            p = np.searchsorted(d, doc) if d.size else 0
            matched = d.size and p < d.size and d[p] == doc
            if occ == MUST_NOT:
                out.append({"match": not matched, "value": 0.0,
                            "description": f"MUST_NOT {_describe(sub)}"})
                continue
            out.append({
                "match": bool(matched),
                "value": float(s[p]) if matched else 0.0,
                "description": f"{occ} {_describe(sub)}",
                "details": _explain_details(sub, rows, plan, doc) if matched else [],
            })
        return out
    if isinstance(q, DisjunctionMaxQuery):
        out = []
        for sub in q.disjuncts:
            d, s = _clause_scorer(sub, rows, plan)
            p = np.searchsorted(d, doc) if d.size else 0
            matched = d.size and p < d.size and d[p] == doc
            out.append({
                "match": bool(matched),
                "value": float(s[p]) if matched else 0.0,
                "description": _describe(sub),
            })
        return out
    return []


def NORM_TABLE_LEN(nb: int) -> float:
    from .bm25 import NORM_TABLE

    return float(NORM_TABLE[nb])


def _has_phrase(q) -> bool:
    if isinstance(q, PhraseQuery):
        return True
    if isinstance(q, BooleanQuery):
        return any(_has_phrase(s) for _, s in q.clauses)
    return False
