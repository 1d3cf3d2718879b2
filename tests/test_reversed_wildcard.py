"""ReversedWildcardFilter (solr/analysis/ReversedWildcardFilterFactory.java).

Index side: every token also indexes as marker+reversed twin at the same
position (withOriginal=true, ReversedWildcardFilter.java).  Query side:
`search.rewrite` applies the factory's shouldReverse defaults
(maxPosAsterisk=2, maxPosQuestion=1, minTrailing=2) so a leading-wildcard
query becomes a BOUNDED prefix range scan over the twins instead of a
full-dictionary regex walk (SolrQueryParserBase.java:786-805).
"""

import hashlib
import shutil

import numpy as np
import pandas as pd
import pytest

from voyagr_spark.analysis import (
    Analyzer,
    REVERSE_MARKER,
    should_reverse,
)
from voyagr_spark.indexer import Index, build_index
from voyagr_spark.oracle import OracleIndex
from voyagr_spark.parser import ConstScoreMulti, WildcardQuery, parse
from voyagr_spark.search import rewrite, search

RW = Analyzer(reverse_wildcards=True)


# -- shouldReverse heuristics (ReversedWildcardFilterFactory.java:100-134) --

@pytest.mark.parametrize(
    "pat,want",
    [
        ("foo", False),        # not a wildcard query
        ("*foo", True),        # leading `*` (posA=0 < 2)
        ("?foo", True),        # leading `?` (posQ=0 < 1)
        ("f*oo", True),        # `*` at 1 < maxPosAsterisk=2
        ("fo*o", False),       # `*` at 2, not < 2
        ("foo*", False),       # trailing run 1 < minTrailing=2
        ("*", False),          # trailing run 1 < 2
        ("*a", True),          # trailing run exactly minTrailing
        ("f?oo", False),       # `?` at 1, not < maxPosQuestion=1
        ("*foo*", False),      # LAST wildcard leaves 1 trailing char
        ("?*oo", True),        # posQ=0 < 1
        ("ab*cd", False),      # `*` at 2
    ],
)
def test_should_reverse_reference_defaults(pat, want):
    assert should_reverse(pat) is want


# -- analysis: twin injection ------------------------------------------------

def test_analyze_text_injects_twins():
    terms, pos = RW.analyze_text("hello world")
    assert terms == [
        "hello", REVERSE_MARKER + "olleh",
        "world", REVERSE_MARKER + "dlrow",
    ]
    assert pos == [0, 0, 1, 1]  # posinc-0 overlaps


def test_twins_after_stop_filter():
    terms, pos = RW.analyze_text("the fox")
    assert terms == ["fox", REVERSE_MARKER + "xof"]
    assert pos == [1, 1]


def test_flat_matches_per_doc_and_doclens():
    texts = pd.Series(
        ["the quick brown fox", "hello world", "", "searching strings"]
    )
    t, p, d, lens = RW.analyze_flat(texts)
    # doclens exclude the posinc-0 twins (discountOverlaps)
    assert lens.tolist() == [3, 2, 0, 2]
    for i, txt in enumerate(texts):
        want_t, want_p = RW.analyze_text(txt)
        m = d == i
        got = sorted(zip(p[m].tolist(), t[m].tolist()))
        assert got == sorted(zip(want_p, want_t)), txt


def test_query_form_strips_reversal():
    qf = RW.query_form()
    assert not qf.reverse_wildcards
    assert qf.query_form() is qf
    terms, _ = qf.analyze_text("hello")
    assert terms == ["hello"]
    # round-trip through index meta keeps the flag
    assert Analyzer.from_dict(RW.to_dict()) == RW


def test_parse_with_rw_analyzer_has_no_marker_terms():
    q = parse('"quick fox" AND brown', analyzer=RW)
    assert REVERSE_MARKER not in repr(q)


# -- rewrite: bounded reversed range ----------------------------------------

class _FakeIndex:
    analyzer = RW


def test_leading_wildcard_rewrites_to_bounded_twin_range():
    cs = rewrite(WildcardQuery("*ing"), _FakeIndex())
    assert isinstance(cs, ConstScoreMulti)
    assert cs.lower == REVERSE_MARKER + "gni"
    assert cs.upper == REVERSE_MARKER + "gnj"  # exclusive prefix bound
    # the regex matches exactly the twins of matching terms
    import re

    assert re.fullmatch(cs.regex, REVERSE_MARKER + "gnihcraes")
    assert not re.fullmatch(cs.regex, "searching")


def test_non_reversed_wildcard_excludes_twins():
    # `*foo*` fails shouldReverse (1 trailing char) -> original pattern,
    # lower bound just above the marker slice (the Operations.minus analog)
    cs = rewrite(WildcardQuery("*foo*"), _FakeIndex())
    assert cs.lower == "\u0002"
    assert not cs.matches(REVERSE_MARKER + "oofrab")
    assert cs.matches("xfoox")


def test_match_all_prefix_excludes_twins():
    from voyagr_spark.parser import PrefixQuery

    cs = rewrite(PrefixQuery(""), _FakeIndex())
    assert cs.lower == "\u0002"


# -- end-to-end: engine vs oracle over an RW index ---------------------------

def _corpus() -> pd.DataFrame:
    rows = []
    texts = [
        "searching sorting hashing",
        "the searcher searched everything",
        "cat dog catalog",
        "dogma category fishing",
        "testing tested tests retesting",
        "fox trot boxing fixing",
        "prefix suffix infix",
        "plain words here",
    ] * 6
    for i, t in enumerate(texts):
        rows.append(
            {
                "repo": f"org{i % 4}/r",
                "path": f"src/f{i}.txt",
                "commit": hashlib.sha1(str(i).encode()).hexdigest(),
                "lang": "txt",
                "content": t,
            }
        )
    return pd.DataFrame(rows)


@pytest.fixture(scope="module")
def rw_index(spark, tmp_path_factory):
    pdf = _corpus()
    d = tmp_path_factory.mktemp("rw_ix")
    idx = build_index(
        spark, spark.createDataFrame(pdf), str(d), num_segments=2, analyzer=RW
    )
    oracle = OracleIndex(pdf, analyzer=RW)
    yield idx, oracle, str(d)
    shutil.rmtree(d, ignore_errors=True)


@pytest.mark.parametrize(
    "q",
    [
        "*ing",          # reversed: leading-star suffix query
        "*ing AND fox",  # reversed inside a boolean
        "?at",           # reversed: leading `?`
        "*fix",          # reversed
        "c*og",          # reversed (posA=1)
        "test*",         # plain prefix, twins excluded by range
        "*foo*",         # NOT reversed (trailing 1): marker-minus path
        "*",             # match-all prefix: twin slice skipped
        "searching",     # plain term through the RW chain
        '"cat dog"',     # phrase: twins never enter position matching
    ],
)
def test_rw_engine_matches_oracle(rw_index, q):
    idx, oracle, _ = rw_index
    got = [
        (r["doc_id"], np.float32(r["score"]))
        for r in search(idx, q, k=30).collect()
    ]
    want = [(d, np.float32(s)) for d, s in oracle.search(q, 30)]
    assert got == want, q
    if q not in ("*foo*",):
        assert got, f"expected hits for {q}"


def test_rw_vs_plain_same_docsets(rw_index, spark, tmp_path_factory):
    """Leading-wildcard results on the RW index == brute-force regex walk
    on a plain StandardAnalyzer index (same corpus, same queries)."""
    idx, _, _ = rw_index
    pdf = _corpus()
    d = tmp_path_factory.mktemp("plain_ix")
    plain = build_index(
        spark, spark.createDataFrame(pdf), str(d), num_segments=2
    )
    try:
        for q in ("*ing", "?at", "*fix", "c*og"):
            rw_docs = {r["doc_id"] for r in search(idx, q, k=100).collect()}
            pl_docs = {r["doc_id"] for r in search(plain, q, k=100).collect()}
            assert rw_docs == pl_docs, q
    finally:
        shutil.rmtree(d, ignore_errors=True)


def test_rw_persists_on_reopen(rw_index, spark):
    idx, oracle, d = rw_index
    reopened = Index(spark, d)
    assert reopened.analyzer == RW
    got = {r["doc_id"] for r in search(reopened, "*ing", k=100).collect()}
    want = {doc for doc, _ in oracle.search("*ing", 100)}
    assert got == want
