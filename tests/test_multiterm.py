"""Multi-term query family (P5): prefix / wildcard / regexp / range / fuzzy,
boosts, grouping — engine vs the independent Python oracle, plus the
executor-side-expansion and TooManyClauses contracts (VERDICT r1 #1/#3).
"""

import numpy as np
import pytest

from voyagr_spark.parser import (
    MAX_CLAUSE_COUNT,
    SHOULD,
    BooleanQuery,
    ConstScoreMulti,
    ConstScoreTerms,
    PrefixQuery,
    TermQuery,
    TooManyClauses,
    parse,
)
from voyagr_spark.search import rewrite, search


def _got(built_index, q, k=30):
    return [
        (r["doc_id"], np.float32(r["score"]))
        for r in search(built_index, q, k=k).collect()
    ]


def _want(oracle_index, q, k=30):
    return [(d, np.float32(s)) for d, s in oracle_index.search(q, k)]


QUERIES = [
    "par*",                      # prefix -> range predicate
    "f?le",                      # wildcard single-char
    "to*en",                     # wildcard mid-star
    "/fi.e/",                    # regexp
    "[file TO handle]",          # inclusive term range
    "{file TO handle}",          # exclusive term range
    "[parse TO *]",              # open-ended range
    "handl~1",                   # fuzzy, 1 edit
    "fil~2",                     # fuzzy, 2 edits
    "file^2 OR handle",          # leaf boost
    '"parse query"^2 OR file',   # phrase boost
    "(file OR handle) AND parse",   # grouping
    "(file OR handle)^2 AND parse",  # group boost propagation
    "par* AND file",             # multi-term as a filter clause
    "file AND NOT par*",         # multi-term under MUST_NOT
]


@pytest.mark.parametrize("q", QUERIES)
def test_engine_matches_oracle(built_index, oracle_index, q):
    assert _got(built_index, q) == _want(oracle_index, q), q


def test_prefix_rewrite_is_driver_job_free(built_index):
    # the rewrite must not enumerate the dictionary: no Spark job, no index
    # access at all (index arg unused for predicate rewrites)
    q = rewrite(PrefixQuery("par"), index=None)
    assert isinstance(q, ConstScoreMulti)
    assert q.lower == "par" and q.upper == "pas" and not q.include_upper


def test_prefix_range_reaches_pushed_filters(built_index):
    plan = (
        search(built_index, "par*", k=10)
        ._jdf.queryExecution().executedPlan().toString()
    )
    pushed = [l for l in plan.splitlines() if "PushedFilters" in l]
    assert any(
        "GreaterThanOrEqual(term,par" in l and "LessThan(term,pas" in l
        for l in pushed
    ), pushed


def test_too_many_clauses_guard():
    with pytest.raises(TooManyClauses):
        BooleanQuery(
            tuple((SHOULD, TermQuery(f"t{i}")) for i in range(MAX_CLAUSE_COUNT + 1))
        )
    with pytest.raises(TooManyClauses):
        ConstScoreTerms(tuple(f"t{i}" for i in range(MAX_CLAUSE_COUNT + 1)))
    # at the limit: fine
    BooleanQuery(tuple((SHOULD, TermQuery(f"t{i}")) for i in range(MAX_CLAUSE_COUNT)))


def test_fuzzy_expansion_is_bounded(built_index):
    # ident0000~2 matches hundreds of identNNNN terms; the rewrite must cap
    # at max_expansions (FuzzyQuery.defaultMaxExpansions=50)
    q = rewrite(parse("ident0000~2"), built_index)
    assert isinstance(q, BooleanQuery)
    assert len(q.clauses) == 50
    # and the engine still agrees with the (identically-capped) oracle
    # via the shared contract — spot-check determinism of the clause set
    q2 = rewrite(parse("ident0000~2"), built_index)
    assert q == q2


def test_fuzzy_capped_matches_oracle(built_index, oracle_index):
    got = _got(built_index, "ident0000~2")
    want = _want(oracle_index, "ident0000~2")
    assert got == want


def test_wildcard_count_matches_bruteforce(built_index, oracle_index):
    from voyagr_spark.search import count

    n = count(built_index, "ident00*")
    docs = {d for d, _ in oracle_index.search("ident00*", k=10**9)}
    assert n == len(docs) > 0


def test_malformed_syntax_raises(built_index):
    for bad in ["(file", "file)", "file AND", "nosuch:field", "file^x"]:
        with pytest.raises(ValueError):
            parse(bad)
