"""Sloppy phrase (E10): kernel goldens + engine-vs-oracle rank identity.

Kernel goldens are hand-traced from the reference algorithm
(SloppyPhraseScorer.java:74-90 javadoc example and :92-128 walk); the
engine tests exercise the distributed path (segments, codec, two-phase
positions) against the in-memory oracle.
"""

import numpy as np
import pytest

from voyagr_spark.parser import PhraseQuery, parse
from voyagr_spark.sloppy import sloppy_phrase_freq


def _freq(qtext_terms, doc_tokens, slop):
    """Helper: run the kernel on one synthetic doc (no stopwords/holes)."""
    offsets = list(range(len(qtext_terms)))
    plists = [
        np.array([i for i, t in enumerate(doc_tokens) if t == qt], dtype=np.int64)
        for qt in qtext_terms
    ]
    return sloppy_phrase_freq(qtext_terms, offsets, plists, slop)


def test_javadoc_example_scored_twice():
    # SloppyPhraseScorer.java:80-82: for "a b"~2, doc "x a b a y" matches
    # once at distance 0 ("a b") and once at distance 2 ("b a"):
    # freq = 1/(0+1) + 1/(2+1) = 4/3 (float32 accumulation)
    f = _freq(("a", "b"), ["x", "a", "b", "a", "y"], slop=2)
    want = np.float32(np.float32(1.0) + np.float32(1.0) / np.float32(3.0))
    assert f == want


def test_exact_match_at_slop_zero():
    assert _freq(("a", "b"), ["a", "b"], 0) == np.float32(1.0)
    assert _freq(("a", "b"), ["b", "a"], 0) == np.float32(0.0)
    # reversed order needs slop 2 (positions a@-? match length = 2)
    assert _freq(("a", "b"), ["b", "a"], 2) > 0


def test_freq_monotone_in_slop():
    # the walk is slop-independent; only the match-length filter uses slop,
    # so freq is nondecreasing in slop
    doc = ["a", "x", "b", "a", "b", "y", "a"]
    prev = np.float32(0.0)
    for slop in range(6):
        f = _freq(("a", "b"), doc, slop)
        assert f >= prev
        prev = f


def test_repeated_term_query():
    # "a b a"~N over docs with repeated a: repeat-group machinery engages
    assert _freq(("a", "b", "a"), ["a", "b", "a"], 0) == np.float32(1.0)
    assert _freq(("a", "b", "a"), ["a", "b", "c"], 4) == np.float32(0.0)
    f = _freq(("a", "b", "a"), ["a", "c", "b", "a"], 2)
    assert f > 0


def test_parser_slop_syntax():
    q = parse('"fast key"~3')
    assert isinstance(q, PhraseQuery) and q.slop == 3
    q0 = parse('"fast key"')
    assert isinstance(q0, PhraseQuery) and q0.slop == 0


SLOPPY_QUERIES = [
    '"parse query tree"~1',
    '"parse query tree"~4',
    '"tree parse query"~2',     # wrong order, small slop
    '"tree parse query"~6',     # wrong order, enough slop
    '"file handle"~2',
    '"call the function"~1',    # across a removed stopword (position hole)
    '"file file"~3',            # repeated-term query
]


@pytest.mark.parametrize("qtext", SLOPPY_QUERIES)
def test_sloppy_rank_identical_vs_oracle(built_index, oracle_index, qtext):
    from voyagr_spark.search import search

    got = [
        (r["doc_id"], np.float32(r["score"]))
        for r in search(built_index, qtext, k=10).collect()
    ]
    want = oracle_index.search(qtext, 10)
    assert [d for d, _ in got] == [d for d, _ in want], qtext
    for (gd, gs), (wd, ws) in zip(got, want):
        assert gs == ws, (qtext, gd, gs, ws)


def test_sloppy_superset_of_exact(built_index, oracle_index):
    from voyagr_spark.search import count

    exact = count(built_index, '"parse query tree"')
    sloppy = count(built_index, '"parse query tree"~4')
    assert sloppy >= exact > 0
    assert oracle_index.count('"parse query tree"~4') == sloppy
