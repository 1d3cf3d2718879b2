"""Span queries (lucene/core search/spans analog): reference-golden match
algorithms, scoring semantics, engine integration."""

import sys
from pathlib import Path

import numpy as np
import pytest

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

from voyagr_spark.spans import (
    SpanFirstQuery,
    SpanNearQuery,
    SpanNotQuery,
    SpanOrQuery,
    SpanTermQuery,
    _near_ordered,
    _near_unordered,
)


def _term_spans(positions):
    return [(p, p + 1) for p in positions]


# ---------------------------------------------------------------------------
# match-algorithm goldens (NearSpansOrdered.java:36-43 javadoc example)
# ---------------------------------------------------------------------------


def test_ordered_javadoc_golden():
    """Querying t1 t2 t3 with slop 1 against 't1 t2 t1 t3 t2 t3' matches
    twice: 't1 t2 .. t3' and 't1 .. t2 t3' (NearSpansOrdered javadoc)."""
    subs = [_term_spans([0, 2]), _term_spans([1, 4]), _term_spans([3, 5])]
    assert _near_ordered(subs, 1) == [(0, 4), (2, 6)]
    # slop 0 defeats both (each match carries one gap of 1)
    assert _near_ordered(subs, 0) == []


def test_ordered_adjacent_pair():
    # 'f f k': greedy shrinks to the closest f
    assert _near_ordered([_term_spans([0, 1]), _term_spans([2])], 0) == [(1, 3)]
    # 'f k k': one match, first k consumed
    assert _near_ordered([_term_spans([0]), _term_spans([1, 2])], 0) == [(0, 2)]
    # interleaved: two disjoint matches
    assert _near_ordered(
        [_term_spans([0, 5]), _term_spans([1, 6])], 0
    ) == [(0, 2), (5, 7)]


def test_ordered_requires_order():
    # t2 before t1 only: no ordered match at any slop
    assert _near_ordered([_term_spans([5]), _term_spans([1])], 100) == []


def test_unordered_matches_any_order():
    # t2 ... t1 with gap 1: unordered slop 1 matches, slop 0 does not
    subs = [_term_spans([3]), _term_spans([1])]
    assert _near_unordered(subs, 1) == [(1, 4)]
    assert _near_unordered([_term_spans([3]), _term_spans([1])], 0) == []
    # adjacent reversed: slop 0 matches (gap = 0)
    assert _near_unordered([_term_spans([2]), _term_spans([1])], 0) == [(1, 3)]


def test_unordered_multiple_matches():
    # 'a b a': query (a, b) unordered slop 0 -> (0,2) then b pairs with a@2
    subs = [_term_spans([0, 2]), _term_spans([1])]
    assert _near_unordered(subs, 0) == [(0, 2), (1, 3)]


def test_unordered_slop_formula():
    # width-1 spans: match iff |p1 - p2| - 1 <= slop
    for p1, p2, slop, want in [
        (0, 4, 2, False), (0, 4, 3, True), (7, 2, 4, True), (7, 2, 3, False),
    ]:
        got = _near_unordered([_term_spans([p1]), _term_spans([p2])], slop)
        assert bool(got) == want, (p1, p2, slop)


def test_ordered_slop0_pair_count_equals_phrase_freq():
    """For two width-1 clause lists, ordered slop=0 matches == adjacency
    occurrences (the ExactPhrase equivalence)."""
    rng = np.random.default_rng(3)
    for _ in range(300):
        n = int(rng.integers(1, 30))
        pos = np.sort(rng.choice(200, size=n, replace=False))
        split = rng.random(n) < 0.5
        p1 = pos[split]
        p2 = pos[~split]
        if not p1.size or not p2.size:
            continue
        adjacency = len(np.intersect1d(p1 + 1, p2))
        got = _near_ordered([_term_spans(p1), _term_spans(p2)], 0)
        assert len(got) == adjacency, (p1.tolist(), p2.tolist())


# ---------------------------------------------------------------------------
# engine integration (scoring + composition)
# ---------------------------------------------------------------------------


def _search(idx, q, k=10):
    from voyagr_spark.search import search

    return [(r["doc_id"], r["score"]) for r in search(idx, q, k=k).collect()]


def test_span_term_scores_half_tf(built_index, corpus_pdf):
    """TermSpans width 1 -> slop factor 1/2: freq = fold of tf halves."""
    from voyagr_spark.oracle import OracleIndex

    got = _search(built_index, SpanTermQuery("file"))
    oracle = OracleIndex(corpus_pdf)
    # halved freq cannot change the doc ORDER for a single term (BM25 is
    # monotone in freq and the same norm applies), so ranks match TermQuery
    want = oracle.search("file", 10)
    assert [d for d, _ in got] == [d for d, _ in want]
    plain = dict(oracle.search("file", 10**6))
    for d, s in got:
        assert s < plain[d]  # halved freq strictly lowers BM25


def test_span_first_restricts_and_huge_end_is_identity(built_index):
    full = _search(built_index, SpanTermQuery("file"), k=10**6)
    first = _search(
        built_index, SpanFirstQuery(SpanTermQuery("file"), 10**6), k=10**6
    )
    assert first == full
    limited = _search(
        built_index, SpanFirstQuery(SpanTermQuery("file"), 5), k=10**6
    )
    assert 0 < len(limited) < len(full)
    assert {d for d, _ in limited} <= {d for d, _ in full}


def test_span_not_empty_exclude_is_identity(built_index):
    inc = SpanTermQuery("file")
    assert _search(built_index, SpanNotQuery(inc, SpanTermQuery("zzznope"))) \
        == _search(built_index, inc)


def test_span_not_excludes_nearby(built_index):
    inc = SpanTermQuery("file")
    notq = SpanNotQuery(inc, SpanTermQuery("open"), pre=3, post=3)
    full = dict(_search(built_index, inc, k=10**6))
    got = dict(_search(built_index, notq, k=10**6))
    assert set(got) <= set(full)
    # every kept doc scores <= its unfiltered self (spans only removed)
    assert all(got[d] <= full[d] for d in got)


def test_span_or_unions_and_scores(built_index, corpus_pdf):
    q = SpanOrQuery(SpanTermQuery("file"), SpanTermQuery("merge"))
    got = dict(_search(built_index, q, k=10**6))
    a = dict(_search(built_index, SpanTermQuery("file"), k=10**6))
    b = dict(_search(built_index, SpanTermQuery("merge"), k=10**6))
    assert set(got) == set(a) | set(b)


def test_span_near_matches_phrase_docs(built_index, corpus_pdf):
    """ordered slop=0 over the phrase terms: same match docs as "..."."""
    from voyagr_spark.oracle import OracleIndex

    q = SpanNearQuery(
        [SpanTermQuery("parse"), SpanTermQuery("query"),
         SpanTermQuery("tree")], slop=0, in_order=True,
    )
    got = _search(built_index, q, k=10**6)
    oracle = OracleIndex(corpus_pdf)
    want = oracle.search('"parse query tree"', 10**6)
    assert {d for d, _ in got} == {d for d, _ in want}


def test_span_near_unordered_docset_is_conjunction(built_index):
    q = SpanNearQuery(
        [SpanTermQuery("file"), SpanTermQuery("open")],
        slop=10**6, in_order=False,
    )
    got = {d for d, _ in _search(built_index, q, k=10**6)}
    from voyagr_spark.parser import parse

    want = {d for d, _ in _search(built_index, parse("file AND open"), k=10**6)}
    assert got == want and got


def test_spans_compose_with_boolean(built_index):
    """Span leaf inside a BooleanQuery clause (the free-composition check)."""
    from voyagr_spark.parser import (
        BooleanQuery,
        TermQuery,
    )
    from voyagr_spark.parser import MUST

    sq = SpanFirstQuery(SpanTermQuery("file"), 20)
    bq = BooleanQuery(((MUST, sq), (MUST, TermQuery("open"))), 0, 1.0)
    got = _search(built_index, bq, k=10**6)
    only_span = {d for d, _ in _search(built_index, sq, k=10**6)}
    only_term = {d for d, _ in _search(built_index, TermQuery("open"), k=10**6)}
    assert {d for d, _ in got} == only_span & only_term


def test_span_search_many_composition(built_index):
    """Span queries ride search() unchanged: paging cursor applies."""
    from voyagr_spark.search import search

    q = SpanTermQuery("file")
    page1 = [(r["doc_id"], r["score"]) for r in search(built_index, q, k=5).collect()]
    after = (float(page1[-1][1]), int(page1[-1][0]))
    page2 = [
        (r["doc_id"], r["score"])
        for r in search(built_index, q, k=5, after=after).collect()
    ]
    full = _search(built_index, q, k=10)
    assert page1 + page2 == full
