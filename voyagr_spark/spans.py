"""Span queries (reference `lucene/core/.../search/spans/`), Spark-first.

Proximity algebra over position intervals — the query family behind
"terms near each other, in order, not next to X, near the start":

* `SpanTermQuery.java:40-60` — each term occurrence is the span
  (pos, pos+1).
* `SpanNearQuery.java:45-90` — spans of all clauses within `slop`,
  ordered or unordered; the matching semantics are NearSpansOrdered
  (greedy stretch-to-order + shrink-to-shortest, slop = sum of the
  non-overlap gaps, NearSpansOrdered.java:140-210) and
  NearSpansUnordered (position priority queue over the cells, match
  when maxEnd - minStart - totalSpanLength <= slop,
  NearSpansUnordered.java:180-260) — both re-expressed over
  materialized per-doc span lists, match-for-match identical.
* `SpanOrQuery.java:60-80` — union of clause spans in (start, end)
  order.
* `SpanNotQuery.java:35-66,129-170` — include-spans that do not fall
  within `pre` tokens before / `post` tokens after any exclude span;
  the exclude side is NOT a scoring term (SpanNotQuery.java:81
  extractTerms skips it).
* `SpanFirstQuery.java:31-46` / `SpanPositionRangeQuery` — spans whose
  positions fall inside [start, end].
* Scoring (`SpanScorer.java:70-110` + `BM25Similarity.java:72-74`):
  freq = sum over produced spans of sloppyFreq(end - start) =
  1/(width+1), accumulated in float; score = BM25(doc, freq) with the
  summed idf of the scoring terms (SpanWeight.java:49-72 builds ONE
  SimWeight over extractTerms() — same shape as the phrase weight).

Spark-first execution: spans ride the existing per-segment scorer
machinery — the doc-level candidate set comes from the same posting
intersections/unions every boolean scorer uses (positions decode only
for survivors, the two-phase contract E11), then the per-survivor span
walk runs the greedy reference algorithms on the materialized position
lists (the same per-survivor shape as the sloppy-phrase scorer).  The
per-segment top-k and global merge are unchanged — span queries are
just another leaf in `_clause_scorer`, so they compose with boolean
clauses, paging, tombstones, and `search_many` for free.
"""

from __future__ import annotations

import numpy as np

NO_MORE = 1 << 60


class SpanQuery:
    """Base: positions-aware query leaf (SpanQuery.java)."""

    boost: float = 1.0

    def all_terms(self) -> set[str]:
        """Terms whose postings the segment UDF must fetch."""
        raise TypeError("SpanQuery is abstract; use a concrete span type")

    def scoring_terms(self) -> set[str]:
        """Terms feeding the SimWeight (extractTerms contract: SpanNot
        excludes its NOT side)."""
        return self.all_terms()

    def candidates(self, data: dict) -> np.ndarray:
        """Doc-level approximation (the conjunction/disjunction the spans
        iterator advances on) — sorted doc ids."""
        raise TypeError("SpanQuery is abstract; use a concrete span type")

    def doc_spans(self, doc: int, data: dict) -> list[tuple[int, int]]:
        """Materialized (start, end) spans for one doc, in the order the
        reference iterator would produce them."""
        raise TypeError("SpanQuery is abstract; use a concrete span type")


def _positions(data: dict, term: str, doc: int) -> np.ndarray:
    got = data.get(term)
    if got is None:
        return np.zeros(0, dtype=np.int64)
    docs, flat, off, _norms = got
    j = int(np.searchsorted(docs, doc))
    if j >= docs.size or docs[j] != doc:
        return np.zeros(0, dtype=np.int64)
    return flat[off[j]: off[j + 1]]


_NO_DOCS = np.zeros(0, dtype=np.int64)


class SpanTermQuery(SpanQuery):
    """TermSpans: one (pos, pos+1) span per occurrence (TermSpans.java)."""

    def __init__(self, term: str, boost: float = 1.0):
        self.term = term
        self.boost = boost

    def all_terms(self):
        return {self.term}

    def candidates(self, data):
        got = data.get(self.term)
        return _NO_DOCS if got is None else got[0]

    def doc_spans(self, doc, data):
        return [(int(p), int(p) + 1) for p in _positions(data, self.term, doc)]

    def __repr__(self):
        return f"SpanTerm({self.term})"


class SpanOrQuery(SpanQuery):
    """Union in (start, end) order (SpanOrQuery.java:60-80 + the
    positionsOrdered comparator, NearSpansUnordered.java:173-180)."""

    def __init__(self, *clauses: SpanQuery, boost: float = 1.0):
        if not clauses:
            raise ValueError("SpanOrQuery needs at least one clause")
        self.clauses = clauses
        self.boost = boost

    def all_terms(self):
        out = set()
        for c in self.clauses:
            out |= c.all_terms()
        return out

    def scoring_terms(self):
        out = set()
        for c in self.clauses:
            out |= c.scoring_terms()
        return out

    def candidates(self, data):
        parts = [c.candidates(data) for c in self.clauses]
        parts = [p for p in parts if p.size]
        if not parts:
            return _NO_DOCS
        return np.unique(np.concatenate(parts))

    def doc_spans(self, doc, data):
        out = []
        for c in self.clauses:
            out.extend(c.doc_spans(doc, data))
        out.sort()
        return out

    def __repr__(self):
        return f"SpanOr({', '.join(map(repr, self.clauses))})"


class SpanNearQuery(SpanQuery):
    """Clause spans within `slop`, ordered or not (SpanNearQuery.java)."""

    def __init__(self, clauses, slop: int = 0, in_order: bool = True,
                 boost: float = 1.0):
        if not clauses:
            raise ValueError("SpanNearQuery needs at least one clause")
        self.clauses = tuple(clauses)
        self.slop = int(slop)
        self.in_order = bool(in_order)
        self.boost = boost

    def all_terms(self):
        out = set()
        for c in self.clauses:
            out |= c.all_terms()
        return out

    def scoring_terms(self):
        out = set()
        for c in self.clauses:
            out |= c.scoring_terms()
        return out

    def candidates(self, data):
        cand = None
        for c in self.clauses:
            d = c.candidates(data)
            cand = d if cand is None else np.intersect1d(
                cand, d, assume_unique=True
            )
            if cand.size == 0:
                return _NO_DOCS
        return cand

    def doc_spans(self, doc, data):
        subs = [c.doc_spans(doc, data) for c in self.clauses]
        if any(not s for s in subs):
            return []
        if len(subs) == 1:  # single clause: identity (no near semantics)
            return subs[0]
        if self.in_order:
            return _near_ordered(subs, self.slop)
        return _near_unordered(subs, self.slop)

    def __repr__(self):
        o = "ordered" if self.in_order else "unordered"
        return (f"SpanNear([{', '.join(map(repr, self.clauses))}], "
                f"slop={self.slop}, {o})")


class SpanNotQuery(SpanQuery):
    """Include-spans not within pre/post of an exclude span
    (SpanNotQuery.java:58-66 ctor, :129-170 accept)."""

    def __init__(self, include: SpanQuery, exclude: SpanQuery,
                 pre: int = 0, post: int = 0, boost: float = 1.0):
        self.include = include
        self.exclude = exclude
        self.pre = max(0, int(pre))
        self.post = max(0, int(post))
        self.boost = boost

    def all_terms(self):
        return self.include.all_terms() | self.exclude.all_terms()

    def scoring_terms(self):
        # extractTerms skips the NOT side (SpanNotQuery.java:81)
        return self.include.scoring_terms()

    def candidates(self, data):
        return self.include.candidates(data)

    def doc_spans(self, doc, data):
        inc = self.include.doc_spans(doc, data)
        if not inc:
            return []
        exc = self.exclude.doc_spans(doc, data)
        if not exc:
            return inc
        out = []
        for s, e in inc:
            # rejected iff some exclude span overlaps [s - pre, e + post):
            # excl.end > s - pre  AND  e + post > excl.start
            # (the accept() window checks, SpanNotQuery.java:156-166)
            if any(xe > s - self.pre and e + self.post > xs
                   for xs, xe in exc):
                continue
            out.append((s, e))
        return out

    def __repr__(self):
        return f"SpanNot({self.include!r}, {self.exclude!r})"


class SpanPositionRangeQuery(SpanQuery):
    """Match-spans inside [start, end] (SpanPositionRangeQuery.java)."""

    def __init__(self, match: SpanQuery, start: int, end: int,
                 boost: float = 1.0):
        self.match = match
        self.start = int(start)
        self.end = int(end)
        self.boost = boost

    def all_terms(self):
        return self.match.all_terms()

    def scoring_terms(self):
        return self.match.scoring_terms()

    def candidates(self, data):
        return self.match.candidates(data)

    def doc_spans(self, doc, data):
        # acceptPosition: start >= end bound => no more in doc (spans are
        # start-ordered, so a filter is equivalent); accept iff the span
        # lies inside [start, end] (SpanPositionRangeQuery acceptPosition)
        out = []
        for s, e in self.match.doc_spans(doc, data):
            if s >= self.end:
                break
            if s >= self.start and e <= self.end:
                out.append((s, e))
        return out

    def __repr__(self):
        return f"SpanPosRange({self.match!r}, {self.start}, {self.end})"


class SpanFirstQuery(SpanPositionRangeQuery):
    """Spans ending within the first `end` positions
    (SpanFirstQuery.java:31-46 = SpanPositionRangeQuery with start=0)."""

    def __init__(self, match: SpanQuery, end: int, boost: float = 1.0):
        super().__init__(match, 0, end, boost=boost)

    def __repr__(self):
        return f"SpanFirst({self.match!r}, {self.end})"


# ---------------------------------------------------------------------------
# the reference near-match algorithms over materialized span lists
# ---------------------------------------------------------------------------


def _near_ordered(subs: list[list[tuple[int, int]]], slop: int):
    """NearSpansOrdered.java:140-210: stretchToOrder +
    shrinkToAfterShortestMatch, greedy, minimum-slop matches only."""
    n = len(subs)
    idx = [0] * n
    exhausted = False
    matches: list[tuple[int, int]] = []

    def cur(i):
        return subs[i][idx[i]]

    def adv(i):
        idx[i] += 1
        return idx[i] < len(subs[i])

    while not exhausted:
        # stretchToOrder: order the subspans with as few advances as possible
        ok = True
        prev = 0
        for i in range(1, n):
            while cur(prev)[1] > cur(i)[0]:  # while overlapping
                if not adv(i):
                    ok = False
                    break
            if not ok:
                break
            prev = i
        if not ok:
            break
        # shrinkToAfterShortestMatch: minimize the match from the right
        mstart, mend = cur(n - 1)
        mslop = 0
        last_start = mstart
        for i in range(n - 2, -1, -1):
            prev_s, prev_e = cur(i)
            while True:  # advance i until just before (last_start, ...)
                if not adv(i):
                    exhausted = True
                    break
                pp_s, pp_e = cur(i)
                if pp_e > last_start:  # overlapping: stop
                    break
                prev_s, prev_e = pp_s, pp_e
            if mstart > prev_e:  # only non-overlapping gaps add slop
                mslop += mstart - prev_e
            mstart = prev_s
            last_start = prev_s
        if mslop <= slop:
            matches.append((mstart, mend))
    return matches


def _near_unordered(subs: list[list[tuple[int, int]]], slop: int):
    """NearSpansUnordered.java:180-260: position queue over the cells,
    match when maxEnd - minStart - totalSpanLength <= slop."""
    import heapq

    n = len(subs)
    idx = [0] * n
    lengths = [subs[i][0][1] - subs[i][0][0] for i in range(n)]
    total = sum(lengths)
    # maxEndPositionCell: cells enter in query order, strict > to replace
    maxend = 0
    for i in range(1, n):
        if subs[i][0][1] > subs[maxend][0][1]:
            maxend = i
    # heap ordered by positionsOrdered: (start, end), cell index breaks
    # exact ties deterministically (the reference PQ's internal order is
    # likewise arbitrary-but-fixed for equal spans)
    heap = [(subs[i][0][0], subs[i][0][1], i) for i in range(n)]
    heapq.heapify(heap)
    matches: list[tuple[int, int]] = []

    def at_match():
        return subs[maxend][idx[maxend]][1] - heap[0][0] - total <= slop

    def advance_min():
        nonlocal total, maxend
        _s, _e, i = heap[0]
        idx[i] += 1
        if idx[i] >= len(subs[i]):
            return False
        s, e = subs[i][idx[i]]
        total += (e - s) - lengths[i]  # adjustLength
        lengths[i] = e - s
        if e > subs[maxend][idx[maxend]][1]:  # adjustMax
            maxend = i
        heapq.heapreplace(heap, (s, e, i))
        return True

    # toMatchDoc loop: advance the min cell until the first match
    while not at_match():
        if not advance_min():
            return matches
    matches.append((heap[0][0], subs[maxend][idx[maxend]][1]))
    # nextStartPosition loop: one advance per iteration, yield on match
    while True:
        if not advance_min():
            return matches
        if at_match():
            matches.append((heap[0][0], subs[maxend][idx[maxend]][1]))


# ---------------------------------------------------------------------------
# scoring bridge (SpanScorer + SpanWeight over the engine's segment rows)
# ---------------------------------------------------------------------------


def _fast_freqs(q, cand: np.ndarray, data: dict) -> np.ndarray | None:
    """Vectorized freq for the width-1 span shapes — a hot SpanTerm can
    match every doc of a hot term, and a per-doc Python walk there is the
    exact anti-pattern the engine avoids everywhere else.  Width-1 spans
    contribute fl(1/2) each and k halves sum exactly, so freq is a single
    numpy expression:

    * SpanTerm           -> 0.5 * tf
    * SpanOr(terms...)   -> 0.5 * sum of the clause tfs present
    * SpanFirst(term, n) -> 0.5 * |positions < n|   (end = pos+1 <= n)

    Returns None for every other shape (near/not/nested: the greedy walk
    is the semantics, it stays per-survivor)."""
    half = np.float32(0.5)

    def _tf_of(term: str) -> np.ndarray:
        got = data.get(term)
        if got is None:
            return np.zeros(cand.size, dtype=np.int64)
        docs, _flat, off, _n = got
        j = np.searchsorted(docs, cand)
        jc = np.minimum(j, docs.size - 1)
        hit = docs[jc] == cand
        tfs = (off[jc + 1] - off[jc]) * hit
        return tfs.astype(np.int64)

    if isinstance(q, SpanTermQuery):
        return (_tf_of(q.term).astype(np.float32) * half).astype(np.float32)
    if isinstance(q, SpanOrQuery) and all(
        isinstance(c, SpanTermQuery) for c in q.clauses
    ):
        total = np.zeros(cand.size, dtype=np.int64)
        for c in q.clauses:
            total += _tf_of(c.term)
        return (total.astype(np.float32) * half).astype(np.float32)
    if (
        isinstance(q, SpanPositionRangeQuery)
        and isinstance(q.match, SpanTermQuery)
        and q.start == 0
    ):
        got = data.get(q.match.term)
        if got is None:
            return np.zeros(cand.size, dtype=np.float32)
        docs, flat, off, _n = got
        # accept iff span end = pos+1 <= q.end, i.e. pos < q.end; one
        # segmented count over the flat position stream (every doc in
        # `docs` has >= 1 position, so off[:-1] is strictly increasing)
        counts_all = np.add.reduceat(
            (flat < q.end).astype(np.int64), off[:-1]
        )
        j = np.searchsorted(docs, cand)
        jc = np.minimum(j, docs.size - 1)
        hit = docs[jc] == cand
        counts = counts_all[jc] * hit
        return (counts.astype(np.float32) * half).astype(np.float32)
    return None


def span_scorer(q: SpanQuery, rows: dict, plan, boost: float = 1.0):
    """One segment: (sorted doc ids, float32 scores) for a span query.

    freq(doc) = sum over produced spans of fl(1/(width+1)) accumulated in
    float32 match order (SpanScorer.setFreqCurrentDoc);
    score = BM25(freq) with the summed idf of the sorted scoring terms
    (SpanWeight builds one SimWeight over extractTerms' TreeSet)."""
    from . import bm25
    from .search import _EMPTY, _sum_idfs

    data: dict[str, tuple | None] = {}
    for t in q.all_terms():
        pr = rows.get(t)
        if pr is None:
            data[t] = None
        else:
            flat, _doc_idx = pr.positions_flat()
            off = np.concatenate(([0], np.cumsum(pr.tfs())))
            data[t] = (pr.docs(), flat, off, pr.norms())
    cand = q.candidates(data)
    if cand.size == 0:
        return _EMPTY
    freqs = _fast_freqs(q, cand, data)
    if freqs is None:  # generic per-survivor walk (near/not/nested forms)
        freqs = np.zeros(cand.size, dtype=np.float32)
        one = np.float32(1.0)
        for i in range(cand.size):
            f = np.float32(0.0)
            for s, e in q.doc_spans(int(cand[i]), data):
                f = np.float32(f + one / np.float32(e - s + 1))
            freqs[i] = f
    m = freqs > 0
    if not m.any():
        return _EMPTY
    # norms: per-doc quantized doclen from any scoring term's posting row
    norm_of = {}
    for t in sorted(q.scoring_terms()):
        got = data.get(t)
        if got is None:
            continue
        docs, _f, _o, norms = got
        for j in range(docs.size):
            norm_of.setdefault(int(docs[j]), norms[j])
    wv = bm25.weight_value(
        _sum_idfs(plan, sorted(q.scoring_terms())), boost=boost, k1=plan.k1
    )
    norms = np.array([norm_of[int(d)] for d in cand[m]], dtype=np.uint8)
    scores = bm25.score(freqs[m], norms, plan.cache, wv)
    return cand[m], scores


def span_search(index, q: SpanQuery, k: int = 10, **kw):
    """Top-k for a span query through the normal engine path."""
    from .search import search

    return search(index, q, k=k, **kw)
