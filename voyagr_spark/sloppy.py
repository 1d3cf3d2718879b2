"""Sloppy-phrase frequency: a faithful transliteration of SloppyPhraseScorer.

Reference: /root/reference/lucene/core/src/java/org/apache/lucene/search/
SloppyPhraseScorer.java (the whole file), PhrasePositions.java,
PhraseQueue.java, and util/PriorityQueue.java.  BM25's slop factor is
1/(distance+1) (BM25Similarity.java:72-74,246-248).

The algorithm is a GREEDY priority-queue walk whose result is
order-dependent (SloppyPhraseScorer.java:74-90 documents that equivalent
queries can score differently), so rank-identical scores require
replicating the exact walk — including Lucene's 1-based binary heap
(util/PriorityQueue.java upHeap/downHeap) whose element order after
in-place mutation during repeat-collision handling is part of the observable
behavior (advanceRpts pops a possibly-stale heap and re-adds).

Scope: single-term positions only (our analysis chain emits one term per
position — no synonyms/multi-term postings), so `hasMultiTermRpts` is
always false and only the simple + single-term-repeat paths exist
(SloppyPhraseScorer.java:231-246 initSimple, :275-303 advanceRepeatGroups
non-MTP branch, :374-399 gatherRptGroups non-MTP branch).

This kernel is shared by the distributed engine (search._phrase_scorer)
and the pure-Python oracle — like the analysis chain and SmallFloat, it
carries its own Java-derived golden tests (tests/test_sloppy_phrase.py),
so engine-vs-oracle comparisons still exercise the segment/codec/shuffle
layers independently.
"""

from __future__ import annotations

import numpy as np


class _PP:
    """PhrasePositions.java: a term's position iterator, offset-adjusted."""

    __slots__ = ("plist", "idx", "count", "position", "offset", "ord",
                 "rpt_group", "rpt_ind")

    def __init__(self, plist, offset: int, ord_: int):
        self.plist = plist  # sorted absolute positions of this term in doc
        self.offset = offset  # position in phrase
        self.ord = ord_
        self.rpt_group = -1
        self.rpt_ind = 0
        self.idx = 0
        self.count = 0
        self.position = 0

    def first_position(self) -> bool:
        self.count = len(self.plist)  # PhrasePositions.java:45-47
        self.idx = 0
        return self.next_position()

    def next_position(self) -> bool:
        if self.count > 0:  # PhrasePositions.java:56-61
            self.count -= 1
            self.position = int(self.plist[self.idx]) - self.offset
            self.idx += 1
            return True
        return False


def _less(a: _PP, b: _PP) -> bool:
    """PhraseQueue.lessThan (PhraseQueue.java:27-40)."""
    if a.position == b.position:
        if a.offset == b.offset:
            return a.ord < b.ord
        return a.offset < b.offset
    return a.position < b.position


class _PQ:
    """util/PriorityQueue.java: 1-based array heap, upHeap/downHeap."""

    __slots__ = ("heap", "size")

    def __init__(self, max_size: int):
        self.heap = [None] * (max_size + 1)
        self.size = 0

    def add(self, pp: _PP) -> None:
        self.size += 1
        self.heap[self.size] = pp
        self._up(self.size)

    def top(self) -> _PP:
        return self.heap[1]

    def pop(self) -> _PP:
        result = self.heap[1]
        self.heap[1] = self.heap[self.size]
        self.heap[self.size] = None
        self.size -= 1
        self._down(1)
        return result

    def clear(self) -> None:
        for i in range(self.size + 1):
            self.heap[i] = None
        self.size = 0

    def _up(self, orig: int) -> None:
        i = orig
        node = self.heap[i]
        j = i >> 1
        while j > 0 and _less(node, self.heap[j]):
            self.heap[i] = self.heap[j]
            i = j
            j = j >> 1
        self.heap[i] = node

    def _down(self, i: int) -> None:
        node = self.heap[i]
        j = i << 1
        k = j + 1
        if k <= self.size and _less(self.heap[k], self.heap[j]):
            j = k
        while j <= self.size and _less(self.heap[j], node):
            self.heap[i] = self.heap[j]
            i = j
            j = i << 1
            k = j + 1
            if k <= self.size and _less(self.heap[k], self.heap[j]):
                j = k
        self.heap[i] = node


def _tp_pos(pp: _PP) -> int:
    return pp.position + pp.offset  # SloppyPhraseScorer.java:433-435


def _lesser(a: _PP, b: _PP) -> _PP:
    """Compare by (position, offset) only (SloppyPhraseScorer.java:183-189)."""
    if a.position < b.position or (a.position == b.position and a.offset < b.offset):
        return a
    return b


def _collide(pp: _PP, rpt_groups) -> int:
    """Index of a colliding pp in pp's group, or -1 (:192-203)."""
    tp = _tp_pos(pp)
    for pp2 in rpt_groups[pp.rpt_group]:
        if pp2 is not pp and _tp_pos(pp2) == tp:
            return pp2.rpt_ind
    return -1


def sloppy_phrase_freq(terms, offsets, plists, slop: int) -> np.float32:
    """phraseFreq() for one candidate doc (contains every term >= once).

    terms[i]/offsets[i]/plists[i] describe the i-th phrase position: its
    term text, query offset, and the term's sorted absolute positions in
    the doc.  Repeated query terms pass the same plist twice (independent
    iterator state per _PP).  Returns the float32 sloppy frequency: sum of
    1/(matchLength+1) over the greedy walk's matches within `slop`.
    """
    n = len(terms)
    pps = [_PP(plists[i], int(offsets[i]), i) for i in range(n)]

    # ---- initFirstTime (:332-351), non-MTP ---------------------------------
    for pp in pps:
        pp.first_position()  # placeFirstPositions (:258-262)

    seen: dict[str, int] = {}
    for t in terms:
        seen[t] = seen.get(t, 0) + 1
    rpt_terms = {t for t, c in seen.items() if c >= 2}
    has_rpts = bool(rpt_terms)

    rpt_groups: list[list[_PP]] = []
    if has_rpts:
        # gatherRptGroups non-MTP branch (:374-399): group by equal tpPos at
        # first placement, skipping same-offset pairs.  With single-term
        # positions this is exactly "same term" grouping.
        rpp = [pp for pp in pps if terms[pp.ord] in rpt_terms]
        for i, pp in enumerate(rpp):
            if pp.rpt_group >= 0:
                continue
            tp = _tp_pos(pp)
            for pp2 in rpp[i + 1:]:
                if (pp2.rpt_group >= 0 or pp2.offset == pp.offset
                        or _tp_pos(pp2) != tp):
                    continue
                if pp.rpt_group < 0:
                    pp.rpt_group = len(rpt_groups)
                    rpt_groups.append([pp])
                pp2.rpt_group = pp.rpt_group
                rpt_groups[pp.rpt_group].append(pp2)
        # sortRptGroups (:354-372)
        for rg in rpt_groups:
            rg.sort(key=lambda p: p.offset)
            for j, p in enumerate(rg):
                p.rpt_ind = j
        has_rpts = bool(rpt_groups)
        # advanceRepeatGroups non-MTP branch (:275-303): rg[j] advances j
        # extra times so the group starts collision-free
        for rg in rpt_groups:
            for j in range(1, len(rg)):
                for _ in range(j):
                    if not rg[j].next_position():
                        return np.float32(0.0)  # PPs exhausted

    # fillQueue (:264-272)
    end = -(1 << 62)
    pq = _PQ(n)
    for pp in pps:
        if pp.position > end:
            end = pp.position
        pq.add(pp)

    def advance_pp(pp: _PP) -> bool:  # :131-139
        nonlocal end
        if not pp.next_position():
            return False
        if pp.position > end:
            end = pp.position
        return True

    def advance_rpts(pp: _PP) -> bool:  # :144-181
        if pp.rpt_group < 0:
            return True
        rg = rpt_groups[pp.rpt_group]
        num_bits = len(rg)  # FixedBitSet(rg.length)
        bits: set[int] = set()
        k0 = pp.rpt_ind
        while True:
            k = _collide(pp, rpt_groups)
            if k < 0:
                break
            pp = _lesser(pp, rg[k])  # local reassignment, like Java
            if not advance_pp(pp):
                return False  # exhausted
            if k != k0:
                bits.add(k)
        # re-queue every advanced pp that is currently in the queue: pop
        # (possibly-stale heap order is the observable Lucene behavior)
        # until all marked inds seen, then re-add in reverse pop order
        stack: list[_PP] = []
        while bits:
            pp2 = pq.pop()
            stack.append(pp2)
            if (pp2.rpt_group >= 0 and pp2.rpt_ind < num_bits
                    and pp2.rpt_ind in bits):
                bits.discard(pp2.rpt_ind)
        for pp2 in reversed(stack):
            pq.add(pp2)
        return True

    # ---- the greedy walk: phraseFreq() (:92-128) ---------------------------
    freq = np.float32(0.0)
    pp = pq.pop()
    match_length = end - pp.position
    next_pos = pq.top().position
    while advance_pp(pp):
        if has_rpts and not advance_rpts(pp):
            break  # pps exhausted -> fall through to final match check
        if pp.position > next_pos:  # done minimizing current match-length
            if match_length <= slop:
                freq = np.float32(
                    freq + np.float32(1.0) / np.float32(match_length + 1)
                )
            pq.add(pp)
            pp = pq.pop()
            next_pos = pq.top().position
            match_length = end - pp.position
        else:
            ml2 = end - pp.position
            if ml2 < match_length:
                match_length = ml2
    if match_length <= slop:
        freq = np.float32(freq + np.float32(1.0) / np.float32(match_length + 1))
    return freq
