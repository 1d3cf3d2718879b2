"""CommonTermsQuery (queries/CommonTermsQuery.java): df-based high/low
split — rewrite-shape goldens against hand-computed dfs, engine vs the
oracle's independent rewrite, and the documented edge cases."""

import numpy as np
import pytest

from voyagr_spark.parser import (
    MUST,
    SHOULD,
    BooleanQuery,
    CommonTermsQuery,
    MatchNoDocsQuery,
    TermQuery,
)
from voyagr_spark.search import rewrite, search


def test_must_not_occur_rejected():
    with pytest.raises(ValueError):
        CommonTermsQuery(("a", "b"), high_freq_occur="MUST_NOT")
    with pytest.raises(ValueError):
        CommonTermsQuery(("a", "b"), low_freq_occur="MUST_NOT")


def test_empty_and_single_term(built_index):
    assert isinstance(
        rewrite(CommonTermsQuery(()), built_index), MatchNoDocsQuery
    )
    q = rewrite(CommonTermsQuery(("file",), boost=2.0), built_index)
    assert q == TermQuery("file", boost=2.0)


def test_mixed_split_shape(built_index):
    """'open' is the Zipf-hottest fixture term; identNNNN terms are rare.
    With a fractional cutoff between their dfs, the rewrite must be
    BooleanQuery[(SHOULD, high), (MUST, low)] (buildQuery :228-231)."""
    dfs = built_index.term_dfs(["open", "ident0001", "ident0002"])
    max_doc = built_index.max_doc
    # choose a cutoff strictly between the rare and hot dfs
    frac = (dfs["open"] + dfs["ident0001"]) / 2.0 / max_doc
    q = CommonTermsQuery(
        ("open", "ident0001", "ident0002"),
        high_freq_occur=SHOULD,
        low_freq_occur=MUST,
        max_term_frequency=frac,
    )
    r = rewrite(q, built_index)
    assert isinstance(r, BooleanQuery)
    (o1, high), (o2, low) = r.clauses
    assert (o1, o2) == (SHOULD, MUST)
    assert high == TermQuery("open")  # single high clause collapses
    assert low == BooleanQuery(
        ((MUST, TermQuery("ident0001")), (MUST, TermQuery("ident0002")))
    )


def test_all_high_promotes_to_conjunction(built_index):
    """Only high-frequency terms -> plain conjunction (:211-222)."""
    q = CommonTermsQuery(
        ("open", "file"), high_freq_occur=SHOULD, low_freq_occur=SHOULD,
        max_term_frequency=0.000001,
    )
    r = rewrite(q, built_index)
    assert r == BooleanQuery(
        ((MUST, TermQuery("open")), (MUST, TermQuery("file")))
    )


def test_all_high_with_msm_keeps_should(built_index):
    q = CommonTermsQuery(
        ("open", "file", "handle"), high_freq_occur=SHOULD,
        low_freq_occur=SHOULD, max_term_frequency=0.000001,
        high_freq_msm=2.0,
    )
    r = rewrite(q, built_index)
    assert r == BooleanQuery(
        ((SHOULD, TermQuery("open")), (SHOULD, TermQuery("file")),
         (SHOULD, TermQuery("handle"))),
        2,
    )


def test_all_low(built_index):
    q = CommonTermsQuery(
        ("ident0001", "ident0002"), low_freq_occur=SHOULD,
        max_term_frequency=0.9999,
    )
    r = rewrite(q, built_index)
    assert r == BooleanQuery(
        ((SHOULD, TermQuery("ident0001")), (SHOULD, TermQuery("ident0002")))
    )


def test_absent_term_goes_low(built_index):
    """A term with no termContext (df=0) lands in the low side (:191-193)."""
    q = CommonTermsQuery(
        ("open", "zzznotaterm"), high_freq_occur=SHOULD,
        low_freq_occur=SHOULD, max_term_frequency=0.000001,
    )
    r = rewrite(q, built_index)
    assert isinstance(r, BooleanQuery)
    (o1, high), (o2, low) = r.clauses
    assert high == TermQuery("open") and low == TermQuery("zzznotaterm")


def test_fractional_msm_rounding():
    from voyagr_spark.search import _ctq_msm

    # Math.round semantics: floor(x + 0.5)
    assert _ctq_msm(0.5, 3) == 2
    assert _ctq_msm(0.5, 4) == 2
    assert _ctq_msm(0.0, 7) == 0
    assert _ctq_msm(3.0, 2) == 3


@pytest.mark.parametrize(
    "kwargs",
    [
        dict(high_freq_occur=SHOULD, low_freq_occur=MUST,
             max_term_frequency=0.1),
        dict(high_freq_occur=SHOULD, low_freq_occur=SHOULD,
             max_term_frequency=0.1),
        dict(high_freq_occur=MUST, low_freq_occur=MUST,
             max_term_frequency=0.1),
        dict(high_freq_occur=SHOULD, low_freq_occur=SHOULD,
             max_term_frequency=0.1, low_freq_msm=0.5),
        dict(high_freq_occur=SHOULD, low_freq_occur=MUST,
             max_term_frequency=0.000001),
        dict(high_freq_occur=SHOULD, low_freq_occur=MUST,
             max_term_frequency=0.9999),
    ],
)
def test_engine_matches_oracle(built_index, oracle_index, kwargs):
    q = CommonTermsQuery(("open", "file", "ident0001", "ident0002"), **kwargs)
    got = [
        (r["doc_id"], np.float32(r["score"]))
        for r in search(built_index, q, k=25).collect()
    ]
    want = [(d, np.float32(s)) for d, s in oracle_index.search(q, 25)]
    assert got == want, kwargs
