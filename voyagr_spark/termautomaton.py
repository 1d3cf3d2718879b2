"""TermAutomatonQuery — a proximity automaton whose transitions are terms.

Reference: `lucene/sandbox/src/java/org/apache/lucene/search/
TermAutomatonQuery.java` + `TermAutomatonScorer.java` — the
generalization of PhraseQuery / MultiPhraseQuery / SpanNearQuery: build
an automaton with createState / setAccept / addTransition /
addAnyTransition, finish() determinizes it, and a document matches when
some path consumes the tokens at consecutive positions into an accept
state.  Matching is disjunction-shaped ("it is likely slow, since it
visits any document having any of the terms", class javadoc) — every doc
holding any automaton term is visited and its merged query-term position
stream is run through the DFA.

Semantics kept exactly (TermAutomatonScorer.countMatches:212-330):

* a new match may START only at a position holding a query term
  (step(0, termID), :305-312);
* ANY transitions advance live states through position GAPS one step per
  position index (:253-279), abandoning the walk when the frontier peters
  out; finish() rejects automata that lead or end with ANY (:136-155) and
  expands ANY arcs to the full term alphabet before determinizing
  (:157-183);
* freq counts EVERY arrival in an accept state — the per-position state
  list is a multiset (PosState.add does not dedupe, :372-377), so freq is
  the number of distinct matching paths ending at each position;
* score = BM25(doc, freq) with the weight built over ALL the automaton's
  term statistics (TermAutomatonWeight:346-356 computeWeight with the
  full TermStatistics array -> summed idf), norms from the shared byte.

Scale shape: candidate docs and their position streams are decoded
vectorized per segment (the engine's two-phase discipline); the DFA walk
itself is per-doc like the reference's.  Determinization happens ONCE on
the driver (query-sized subset construction), never per executor task.
"""

from __future__ import annotations

from dataclasses import dataclass, field

import numpy as np


class TermAutomatonBuilder:
    """createState/setAccept/addTransition/addAnyTransition/finish
    (TermAutomatonQuery.java:85-123)."""

    def __init__(self):
        self._n = 0
        self._accepts: set[int] = set()
        self._trans: list[tuple[int, int, int]] = []  # (src, dst, termID)
        self._term_ids: dict[str, int] = {}
        self._any_id = -1
        self._finished = False

    def create_state(self) -> int:
        s = self._n
        self._n += 1
        return s

    def set_accept(self, state: int, accept: bool = True) -> None:
        if accept:
            self._accepts.add(state)
        else:
            self._accepts.discard(state)

    def _tid(self, term: str | None) -> int:
        """Sequential id assignment over terms INCLUDING the null (ANY)
        slot (TermAutomatonQuery.getTermID:217-233)."""
        key = "\x00any" if term is None else term
        if key not in self._term_ids:
            self._term_ids[key] = len(self._term_ids)
            if term is None:
                self._any_id = self._term_ids[key]
        return self._term_ids[key]

    def _n_terms(self) -> int:
        return len(self._term_ids)

    def add_transition(self, src: int, dst: int, term: str) -> None:
        if term is None:
            raise ValueError("term should not be null")
        self._trans.append((src, dst, self._tid(term)))

    def add_any_transition(self, src: int, dst: int) -> None:
        self._trans.append((src, dst, self._tid(None)))

    def finish(self) -> "TermAutomatonQuery":
        """Validate ANY placement, expand ANY arcs over the full alphabet,
        determinize by subset construction, drop dead states
        (TermAutomatonQuery.finish:112-190)."""
        nterms = self._n_terms()
        any_id = self._any_id
        if any_id != -1:
            for s, d, t in self._trans:
                if t == any_id and s == 0:
                    raise ValueError(
                        "automaton cannot lead with an ANY transition")
                if t == any_id and d in self._accepts:
                    raise ValueError(
                        "automaton cannot end with an ANY transition")
        # NFA arcs per (state, termID) — ANY expands to every term id
        # (including its own slot, matching the min..termCount-1 expansion)
        nfa: dict[tuple[int, int], set[int]] = {}
        for s, d, t in self._trans:
            tids = range(nterms) if t == any_id else (t,)
            for tid in tids:
                nfa.setdefault((s, tid), set()).add(d)
        # subset construction from {0}
        start = frozenset([0])
        ids = {start: 0}
        order = [start]
        table: list[list[int]] = []
        i = 0
        while i < len(order):
            cur = order[i]
            row = []
            for tid in range(nterms):
                nxt = frozenset(
                    d for s in cur for d in nfa.get((s, tid), ()))
                if not nxt:
                    row.append(-1)
                    continue
                if nxt not in ids:
                    ids[nxt] = len(order)
                    order.append(nxt)
                row.append(ids[nxt])
            table.append(row)
            i += 1
        accepts = {ids[g] for g in order if g & self._accepts}
        # remove dead states: states that cannot reach an accept state
        n = len(order)
        alive = set(accepts)
        changed = True
        while changed:
            changed = False
            for s in range(n):
                if s in alive:
                    continue
                if any(d in alive for d in table[s] if d != -1):
                    alive.add(s)
                    changed = True
        step = np.full((n, nterms), -1, dtype=np.int64)
        for s in range(n):
            for tid in range(nterms):
                d = table[s][tid]
                if d != -1 and d in alive:  # arcs into dead states dropped
                    step[s, tid] = d
        terms = tuple(t for t in self._term_ids if t != "\x00any")
        id_of = {self._term_ids[t]: j for j, t in enumerate(terms)}
        # compact the alphabet to real terms only (ANY arcs were expanded)
        cstep = np.full((n, len(terms)), -1, dtype=np.int64)
        for tid, j in id_of.items():
            cstep[:, j] = step[:, tid]
        any_col = (step[:, any_id] if any_id != -1
                   else np.full(n, -1, dtype=np.int64))
        return TermAutomatonQuery(
            terms=terms,
            step=tuple(map(tuple, cstep.tolist())),
            any_step=tuple(any_col.tolist()),
            accepts=frozenset(accepts),
            boost=1.0,
        )


@dataclass(frozen=True)
class TermAutomatonQuery:
    """The finished (determinized) query — hashable plan-side value."""

    terms: tuple[str, ...]
    step: tuple[tuple[int, ...], ...]  # [state][term ordinal] -> state|-1
    any_step: tuple[int, ...]  # [state] -> state|-1 for a gap token
    accepts: frozenset[int]
    boost: float = 1.0


def count_matches(q: TermAutomatonQuery, pos: np.ndarray,
                  tid: np.ndarray) -> int:
    """TermAutomatonScorer.countMatches for ONE doc: `pos` ascending
    query-term positions, `tid` the term ordinal at each.  Per-position
    state MULTISET (duplicate arrivals each count), matches may start
    only at query-term positions, ANY advances through gaps."""
    step = q.step
    any_step = q.any_step
    accepts = q.accepts
    states: dict[int, list[int]] = {}
    freq = 0
    last = -1
    has_any = any(s != -1 for s in any_step)
    for p, t in zip(pos.tolist(), tid.tolist()):
        if last != -1 and has_any:
            start_last = last
            lp = last
            while lp < p:
                ps = states.get(lp, ())
                if not ps and lp > start_last:
                    break  # petered out (TermAutomatonScorer.java:257-261)
                nxt = states.setdefault(lp + 1, [])
                for s in ps:
                    ns = any_step[s]
                    if ns != -1:
                        nxt.append(ns)
                lp += 1
        row_next = states.setdefault(p + 1, [])
        for s in states.get(p, ()):
            ns = step[s][t]
            if ns != -1:
                row_next.append(ns)
                if ns in accepts:
                    freq += 1
        ns = step[0][t]
        if ns != -1:
            row_next.append(ns)
            if ns in accepts:
                freq += 1
        last = p
    return freq


def taq_scorer(q: TermAutomatonQuery, rows, plan, boost: float = 1.0):
    """Per-segment scorer: every doc holding any automaton term is
    visited (the disjunction shape), its merged query-term position
    stream runs through the DFA, freq>0 docs score BM25(freq) with the
    summed-idf weight (TermAutomatonWeight:346-356)."""
    from . import bm25

    parts_pos, parts_tid, parts_doc = [], [], []
    norm_docs, norm_vals = [], []
    for j, t in enumerate(q.terms):
        pr = rows.get(t)
        if pr is None:
            continue
        flat, doc_idx = pr.positions_flat()
        docs = pr.docs()
        parts_pos.append(flat)
        parts_tid.append(np.full(flat.size, j, dtype=np.int64))
        parts_doc.append(docs[doc_idx])
        norm_docs.append(docs)
        norm_vals.append(pr.norms())
    if not parts_pos:
        return np.zeros(0, dtype=np.int64), np.zeros(0, dtype=np.float32)
    pos = np.concatenate(parts_pos)
    tid = np.concatenate(parts_tid)
    doc = np.concatenate(parts_doc)
    # (doc, pos, tid) sort: the posQueue pop order per doc
    order = np.lexsort((tid, pos, doc))
    pos, tid, doc = pos[order], tid[order], doc[order]
    bounds = np.flatnonzero(np.concatenate(([True], doc[1:] != doc[:-1],
                                            [True])))
    out_docs, out_freqs = [], []
    for i in range(bounds.size - 1):
        lo, hi = bounds[i], bounds[i + 1]
        f = count_matches(q, pos[lo:hi], tid[lo:hi])
        if f > 0:
            out_docs.append(int(doc[lo]))
            out_freqs.append(f)
    if not out_docs:
        return np.zeros(0, dtype=np.int64), np.zeros(0, dtype=np.float32)
    out = np.asarray(out_docs, dtype=np.int64)
    freqs = np.asarray(out_freqs, dtype=np.float32)
    nd = np.concatenate(norm_docs)
    nv = np.concatenate(norm_vals)
    uniq, first = np.unique(nd, return_index=True)
    norms = nv[first][np.searchsorted(uniq, out)]
    # weight over ALL automaton terms' stats, float32 idf fold in term-id
    # order (BM25Similarity idfExplain accumulates the float sum)
    idf_sum = np.float32(0.0)
    for t in q.terms:
        idf_sum = np.float32(idf_sum + plan.idf.get(t, np.float32(0.0)))
    wv = bm25.weight_value(idf_sum, boost=boost * q.boost, k1=plan.k1)
    return out, bm25.score(freqs, norms, plan.cache, wv)
