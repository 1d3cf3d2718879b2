"""ComplexPhraseQueryParser (lucene/queryparser/complexPhrase).

Wildcards / fuzzy / ranges / boolean groups INSIDE phrases resolve to span
queries: multi-terms expand SCORING_BOOLEAN-style against the dictionary
(bounded distributed scan) into SpanOr groups, the sequence runs as
SpanNear(slop, inOrder), and negatives produce the reference's
SpanNot(include, exclude) construction.
"""

import hashlib
import shutil

import numpy as np
import pandas as pd
import pytest

from voyagr_spark import spans as SP
from voyagr_spark.complexphrase import (
    ComplexPhraseQuery,
    NEVER_TERM,
    parse_complex_phrase,
    rewrite_complex_phrase,
    Resolver,
)
from voyagr_spark.indexer import build_index
from voyagr_spark.oracle import OracleIndex
from voyagr_spark.parser import BooleanQuery, TermQuery, TooManyClauses
from voyagr_spark.search import rewrite, search


# -- pass 1: parse shape ------------------------------------------------------

def test_parse_captures_phrase_content():
    q = parse_complex_phrase('"fast ke*"~2 AND batch')
    (o1, cpq), (o2, tq) = q.clauses
    assert isinstance(cpq, ComplexPhraseQuery)
    assert cpq.contents == "fast ke*" and cpq.slop == 2
    assert isinstance(tq, TermQuery) and tq.term == "batch"


def test_parse_plain_query_unchanged():
    q = parse_complex_phrase("fast AND key")
    assert isinstance(q, BooleanQuery)


def test_unordered_flag():
    q = parse_complex_phrase('"fast key"', in_order=False)
    assert q.in_order is False


# -- pass 2: span construction against a toy dictionary ----------------------

class _ToyResolver(Resolver):
    """Expansion against a fixed dictionary, no Spark."""

    def __init__(self, dictionary):
        self.dictionary = sorted(dictionary)

    def rewrite_multi(self, q):
        class _NoIndex:
            analyzer = None

        return rewrite(q, _NoIndex())

    def expand(self, cs):
        return [t for t in self.dictionary if cs.matches(t)]

    def fuzzy(self, fq):
        raise AssertionError("not used in these cases")


_DICT = ["fast", "kettle", "key", "keys", "john", "jon", "peters", "dup"]


def _resolve(qtext, **kw):
    q = parse_complex_phrase(qtext, **kw)
    return rewrite_complex_phrase(q, _ToyResolver(_DICT))


def test_single_term_phrase_collapses_to_term():
    got = _resolve('"fast"')
    assert isinstance(got, TermQuery) and got.term == "fast"


def test_wildcard_in_phrase_builds_spanor_near():
    got = _resolve('"fast ke*"')
    assert isinstance(got, SP.SpanNearQuery)
    assert got.slop == 0 and got.in_order
    a, b = got.clauses
    assert isinstance(a, SP.SpanTermQuery) and a.term == "fast"
    assert isinstance(b, SP.SpanOrQuery)
    assert {c.term for c in b.clauses} == {"kettle", "key", "keys"}


def test_no_matching_terms_inserts_never_span():
    got = _resolve('"fast zz*"')
    a, b = got.clauses
    assert isinstance(b, SP.SpanTermQuery) and b.term == NEVER_TERM


def test_group_with_negative_builds_spannot_inside():
    got = _resolve('"(john -jon) peters"')
    grp, pt = got.clauses
    assert isinstance(grp, SP.SpanNotQuery)
    assert isinstance(grp.include, SP.SpanTermQuery)
    assert grp.include.term == "john"
    assert grp.exclude.term == "jon"


def test_mixed_negative_sequence_builds_spannot():
    got = _resolve('"fast -dup key"')
    assert isinstance(got, SP.SpanNotQuery)
    inc, exc = got.include, got.exclude
    assert isinstance(inc, SP.SpanNearQuery) and inc.slop == 1  # slop+1 neg
    assert len(inc.clauses) == 2
    assert isinstance(exc, SP.SpanNearQuery) and exc.slop == 0
    assert len(exc.clauses) == 3


def test_too_many_clauses_guard():
    class _Big(_ToyResolver):
        def expand(self, cs):
            from voyagr_spark.parser import MAX_CLAUSE_COUNT

            raise TooManyClauses(f"> {MAX_CLAUSE_COUNT}")

    q = parse_complex_phrase('"fast ke*"')
    with pytest.raises(TooManyClauses):
        rewrite_complex_phrase(q, _Big(_DICT))


# -- end-to-end: engine vs oracle ---------------------------------------------

def _corpus() -> pd.DataFrame:
    texts = [
        "fast key lookup table",
        "fast keys and locks",
        "fast kettle of fish",
        "the fast and the curious key",
        "slow key fast",
        "fast dup key chain",
        "john peters wrote this",
        "jon peters wrote that",
        "johnny peterson wrote nothing",
        "fast fast key key",
    ] * 5
    rows = []
    for i, t in enumerate(texts):
        rows.append(
            {
                "repo": f"org{i % 3}/r",
                "path": f"src/f{i}.txt",
                "commit": hashlib.sha1(str(i).encode()).hexdigest(),
                "lang": "txt",
                "content": t,
            }
        )
    return pd.DataFrame(rows)


@pytest.fixture(scope="module")
def cp_index(spark, tmp_path_factory):
    pdf = _corpus()
    d = tmp_path_factory.mktemp("cp_ix")
    idx = build_index(spark, spark.createDataFrame(pdf), str(d),
                      num_segments=2)
    oracle = OracleIndex(pdf)
    yield idx, oracle
    shutil.rmtree(d, ignore_errors=True)


@pytest.mark.parametrize(
    "qtext",
    [
        '"fast ke*"',            # wildcard in phrase
        '"fast ke*"~1',          # with slop
        '"(john jon) peters"',   # or-group sequence
        '"jo* peters"',          # prefix group
        '"fast -dup key"',       # mixed negative
        '"fast zz*"',            # dummy never-match second element
        '"fast key" OR kettle',  # composes with the outer grammar
        '"john peters~1"',       # fuzzy inside phrase
    ],
)
def test_engine_matches_oracle(cp_index, qtext):
    idx, oracle = cp_index
    q_engine = parse_complex_phrase(qtext)
    got = [
        (r["doc_id"], np.float32(r["score"]))
        for r in search(idx, q_engine, k=30).collect()
    ]
    want = [
        (d, np.float32(s))
        for d, s in oracle.search(parse_complex_phrase(qtext), 30)
    ]
    assert got == want, qtext
    if "zz*" not in qtext and "-dup" not in qtext:
        assert got, f"expected hits for {qtext}"


def test_unordered_matches_oracle(cp_index):
    idx, oracle = cp_index
    q = parse_complex_phrase('"key fast"', in_order=False)
    got = [
        (r["doc_id"], np.float32(r["score"]))
        for r in search(idx, q, k=30).collect()
    ]
    want = [(d, np.float32(s)) for d, s in oracle.search(q, 30)]
    assert got == want
    assert got  # 'fast key' docs match unordered
