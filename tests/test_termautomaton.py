"""TermAutomatonQuery — builder/determinize/match semantics vs the
phrase machinery and hand-computed goldens (lucene/sandbox
TermAutomatonQuery.java / TermAutomatonScorer.java)."""

import sys
from pathlib import Path

import numpy as np
import pytest

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

from voyagr_spark.parser import PhraseQuery
from voyagr_spark.termautomaton import TermAutomatonBuilder, count_matches


def _linear(*terms, any_at=()):
    b = TermAutomatonBuilder()
    states = [b.create_state()]
    for i, t in enumerate(terms):
        states.append(b.create_state())
        if i in any_at:
            b.add_any_transition(states[i], states[i + 1])
        else:
            b.add_transition(states[i], states[i + 1], t)
    b.set_accept(states[-1], True)
    return b.finish()


def _run(q, tokens):
    """tokens: list of (pos, term) over q.terms vocabulary."""
    tmap = {t: i for i, t in enumerate(q.terms)}
    hits = [(p, tmap[t]) for p, t in tokens if t in tmap]
    hits.sort()
    pos = np.array([p for p, _ in hits], dtype=np.int64)
    tid = np.array([t for _, t in hits], dtype=np.int64)
    return count_matches(q, pos, tid)


def test_linear_matches_adjacency():
    q = _linear("a", "b")
    assert _run(q, [(0, "a"), (1, "b")]) == 1
    assert _run(q, [(0, "a"), (2, "b")]) == 0
    assert _run(q, [(0, "a"), (1, "b"), (2, "a"), (3, "b")]) == 2
    assert _run(q, [(0, "b"), (1, "a")]) == 0


def test_any_transition_gap():
    q = _linear("a", "?", "b", any_at=(1,))
    assert _run(q, [(0, "a"), (2, "b")]) == 1  # gap token not in vocab
    assert _run(q, [(0, "a"), (1, "b")]) == 0
    # the gap may hold a query term too (ANY covers the whole alphabet);
    # the reference counts TWO arrivals here — the expanded token arc AND
    # the gap ANY-advance both step s1 at pos 1 (countMatches processes
    # the any-advance over states the token step already consumed, and
    # PosState is a multiset) — kept faithful
    assert _run(q, [(0, "a"), (1, "a"), (2, "b")]) == 2


def test_alternation_and_multiset_freq():
    # fast (key | any key): accepts 'fast key' and 'fast ? key'
    b = TermAutomatonBuilder()
    s0, s1, s2, acc = (b.create_state() for _ in range(4))
    b.add_transition(s0, s1, "fast")
    b.add_transition(s1, acc, "key")
    b.add_any_transition(s1, s2)
    b.add_transition(s2, acc, "key")
    b.set_accept(acc, True)
    q = b.finish()
    # 'fast key key': three distinct accepting paths — fast.key@1,
    # fast.(key@1 as the gap).key@2, and fast.gap@1.key@2 (the ANY
    # advance) — freq counts every accept arrival (multiset PosState)
    assert _run(q, [(0, "fast"), (1, "key"), (2, "key")]) == 3
    assert _run(q, [(0, "fast"), (1, "key")]) == 1
    assert _run(q, [(0, "fast"), (2, "key")]) == 1
    assert _run(q, [(0, "fast"), (3, "key")]) == 0


def test_disjunction_automaton_counts_all_occurrences():
    b = TermAutomatonBuilder()
    s0, acc = b.create_state(), b.create_state()
    b.add_transition(s0, acc, "x")
    b.add_transition(s0, acc, "y")
    b.set_accept(acc, True)
    q = b.finish()
    assert _run(q, [(0, "x"), (3, "y"), (7, "x")]) == 3


def test_any_placement_errors():
    b = TermAutomatonBuilder()
    s0, s1, s2 = (b.create_state() for _ in range(3))
    b.add_any_transition(s0, s1)
    b.add_transition(s1, s2, "a")
    b.set_accept(s2, True)
    with pytest.raises(ValueError, match="lead with an ANY"):
        b.finish()
    b = TermAutomatonBuilder()
    s0, s1, s2 = (b.create_state() for _ in range(3))
    b.add_transition(s0, s1, "a")
    b.add_any_transition(s1, s2)
    b.set_accept(s2, True)
    with pytest.raises(ValueError, match="end with an ANY"):
        b.finish()


def test_engine_matches_phrase_query(built_index):
    """A linear automaton is rank- and score-identical to the PhraseQuery
    it generalizes (same summed-idf weight, same freq)."""
    from voyagr_spark.search import search

    q = _linear("parse", "query")
    taq = [(r["doc_id"], np.float32(r["score"]))
           for r in search(built_index, q, k=10**6).collect()]
    ph = [(r["doc_id"], np.float32(r["score"]))
          for r in search(built_index, PhraseQuery(("parse", "query"),
                                                   (0, 1)), k=10**6).collect()]
    assert taq == ph and len(taq) > 0


def test_engine_any_matches_phrase_hole(built_index):
    """a-ANY-b == the phrase with a position hole (a @0, b @2)."""
    from voyagr_spark.search import search

    q = _linear("parse", "?", "tree", any_at=(1,))
    taq = {r["doc_id"]: np.float32(r["score"])
           for r in search(built_index, q, k=10**6).collect()}
    # PhraseQuery with a hole carries the same summed idf (2 real terms)
    ph = {r["doc_id"]: np.float32(r["score"])
          for r in search(built_index, PhraseQuery(("parse", "tree"),
                                                   (0, 2)), k=10**6).collect()}
    # same MATCH SET; freq (hence score) may exceed the phrase's when the
    # gap position holds a query term (extra token-arc path — the ANY
    # expansion covers the alphabet, countMatches counts both arrivals)
    assert set(taq) == set(ph) and len(taq) > 0
    assert all(taq[d] >= ph[d] for d in taq)


def test_engine_disjunction_automaton(built_index, oracle_index):
    """One-step x|y automaton: freq = tf_x + tf_y, BM25 over summed idf."""
    from voyagr_spark import bm25
    from voyagr_spark.search import search
    from voyagr_spark.smallfloat import encode_norm  # noqa: F401

    b = TermAutomatonBuilder()
    s0, acc = b.create_state(), b.create_state()
    b.add_transition(s0, acc, "file")
    b.add_transition(s0, acc, "merge")
    b.set_accept(acc, True)
    q = b.finish()
    got = {r["doc_id"]: np.float32(r["score"])
           for r in search(built_index, q, k=10**6).collect()}
    ma = oracle_index._term_matches("file")
    mb = oracle_index._term_matches("merge")
    n = built_index.max_doc
    ia = bm25.idf(len(ma), n)
    ib = bm25.idf(len(mb), n)
    idf_sum = np.float32(np.float32(np.float32(0.0) + ia) + ib)
    wv = bm25.weight_value(idf_sum)
    cache = bm25.norm_cache(bm25.avg_field_length(
        built_index.sum_total_term_freq, n))
    want = {}
    for d in set(ma) | set(mb):
        f = ma.get(d, 0) + mb.get(d, 0)
        nb = oracle_index.norm_bytes[d]
        want[d] = bm25.score(np.array([f]), np.array([nb]), cache, wv)[0]
    assert got == want


def test_random_linear_taq_equals_phrase_sweep(built_index, oracle_index):
    """40 random 2-3 term linear automatons must be rank- AND
    score-identical to the PhraseQuery each one generalizes (no ANY arcs,
    DISTINCT terms: a repeated term legitimately diverges — the automaton
    weight sums idf over UNIQUE terms via the getTermID map
    (TermAutomatonWeight:346-356) while PhraseWeight counts repeats)."""
    from voyagr_spark.search import search

    rng = np.random.default_rng(11)
    terms = sorted(oracle_index.postings,
                   key=lambda t: -len(oracle_index.postings[t]))[:30]
    checked = 0
    for _ in range(40):
        k = int(rng.integers(2, 4))
        seq = list(np.array(terms)[rng.choice(len(terms), size=k,
                                              replace=False)])
        taq = [(r["doc_id"], np.float32(r["score"]))
               for r in search(built_index, _linear(*seq), k=10**6).collect()]
        ph = [(r["doc_id"], np.float32(r["score"]))
              for r in search(built_index,
                              PhraseQuery(tuple(seq), tuple(range(k))),
                              k=10**6).collect()]
        assert taq == ph, seq
        checked += 1 if taq else 0
    assert checked >= 5  # enough generated phrases actually matched
