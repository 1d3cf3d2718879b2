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
    "/file|handle/",             # regexp alternation: no mandatory prefix
    "/files?/",                  # optional last char: prefix must shrink
    "/handle(s|d)?/",            # optional group after literal run
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


def test_regexp_prefix_only_when_mandatory():
    """ADVICE r2 (high): range bounds must only be emitted when the literal
    run is a mandatory prefix of every matching term."""
    from voyagr_spark.parser import RegexpQuery

    # alternation anywhere: no bounds at all ('dog' is outside [cat, cau))
    q = rewrite(RegexpQuery("cat|dog"), index=None)
    assert q.lower is None and q.upper is None and q.regex == "cat|dog"
    assert q.matches("dog") and q.matches("cat") and not q.matches("cow")
    # optional quantifier drops the preceding literal ('ac' matches /ab?c/)
    q = rewrite(RegexpQuery("ab?c"), index=None)
    assert q.lower == "a" and q.matches("ac") and q.matches("abc")
    # star / bounded repeat after the run shrink it the same way
    assert rewrite(RegexpQuery("ab*c"), index=None).lower == "a"
    assert rewrite(RegexpQuery("ab{0,2}c"), index=None).lower == "a"
    # '+' keeps the char mandatory; plain literal run keeps full bounds
    assert rewrite(RegexpQuery("ab+c"), index=None).lower == "ab"
    q = rewrite(RegexpQuery("abc.*"), index=None)
    assert q.lower == "abc" and q.upper == "abd"


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
    for bad in ["(file", "file)", "file AND", "nosuch:field", "file^x",
                '"foo bar', 'foo" bar', '"']:  # unbalanced quotes (ADVICE r2)
        with pytest.raises(ValueError):
            parse(bad)
