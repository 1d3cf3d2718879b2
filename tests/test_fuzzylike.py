"""FuzzyLikeThisQuery — variant selection, scoring chain, df=1 context
(lucene/sandbox FuzzyLikeThisQuery.java)."""

import sys
from pathlib import Path

import numpy as np
import pytest

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

from voyagr_spark import bm25, classic
from voyagr_spark.fuzzylike import build_flt_query, flt_variants, fuzzy_like_this
from voyagr_spark.parser import (
    BooleanQuery,
    ConstScoreTerms,
    MatchNoDocsQuery,
    TermQuery,
)


def test_variants_boost_formula(built_index):
    rows = flt_variants(built_index, ["file"], 0.5, 0).collect()
    by_term = {r["term"]: r for r in rows}
    assert "file" in by_term
    # exact match: sim 1.0 -> boost (1-0.5)*2 = 1.0
    assert by_term["file"]["boost"] == pytest.approx(1.0)
    for r in rows:  # every survivor is strictly above minSimilarity
        denom = min(len(r["term"]), 4)
        sim = 1.0 - _lev(r["term"], "file") / denom
        assert sim > 0.5
        assert r["boost"] == pytest.approx((sim - 0.5) * 2.0)


def _lev(a, b):
    import numpy as np
    m = np.zeros((len(a) + 1, len(b) + 1), dtype=int)
    m[:, 0] = np.arange(len(a) + 1)
    m[0, :] = np.arange(len(b) + 1)
    for i in range(1, len(a) + 1):
        for j in range(1, len(b) + 1):
            m[i, j] = min(m[i - 1, j] + 1, m[i, j - 1] + 1,
                          m[i - 1, j - 1] + (a[i - 1] != b[j - 1]))
    return int(m[len(a), len(b)])


def test_prefix_length_restricts(built_index):
    rows = flt_variants(built_index, ["file"], 0.5, 2).collect()
    assert rows and all(r["term"].startswith("fi") for r in rows)


def test_build_query_shape_and_overrides(built_index):
    q, ov = build_flt_query(built_index, "filz", max_num_terms=3)
    # one source -> a SHOULD group of boosted term queries (single-variant
    # groups collapse to the bare TermQuery, the reference's optimize)
    tqs = [q] if isinstance(q, TermQuery) else [c[1] for c in q.clauses]
    assert 1 <= len(tqs) <= 3
    terms = [t.term for t in tqs]
    assert terms == sorted(terms)  # clause order = term asc
    assert set(ov) == set(terms) and all(v == 1 for v in ov.values())
    # variant rank score = fl(fl(boost^2) * classic_idf(avg_df))
    rows = {r["term"]: r
            for r in flt_variants(built_index, ["filz"], 0.5, 0).collect()}
    avg = sum(int(r["df"]) for r in rows.values()) // len(rows)
    i = classic.idf(avg, built_index.max_doc)
    for t in tqs:
        b = np.float32(rows[t.term]["boost"])
        assert np.float32(t.boost) == np.float32(np.float32(b * b) * i)


def test_df1_scoring_matches_manual(built_index, oracle_index):
    """Each variant scores as a TermQuery with idf(df=1), boost folded."""
    q, ov = build_flt_query(built_index, "fyle", max_num_terms=1)
    term = (q.term if isinstance(q, TermQuery) else q.clauses[0][1].term)
    boost = (q.boost if isinstance(q, TermQuery) else q.clauses[0][1].boost)
    got = {r["doc_id"]: np.float32(r["score"])
           for r in fuzzy_like_this(built_index, "fyle", max_num_terms=1,
                                    k=10**6).collect()}
    idf1 = bm25.idf(1, built_index.max_doc)
    wv = bm25.weight_value(idf1, boost=boost)
    matches = oracle_index._term_matches(term)
    cache = bm25.norm_cache(
        bm25.avg_field_length(built_index.sum_total_term_freq,
                              built_index.max_doc))
    want = {}
    for d, tf in matches.items():
        nb = oracle_index.norm_bytes[d]
        want[d] = bm25.score(np.array([tf]), np.array([nb]), cache, wv)[0]
    assert got == want


def test_ignore_tf_constant_scores(built_index):
    q, ov = build_flt_query(built_index, "filz", max_num_terms=2,
                            ignore_tf=True)
    assert ov == {}  # no df overrides on the constant-score path
    got = fuzzy_like_this(built_index, "filz", max_num_terms=2,
                          ignore_tf=True, k=10**6).collect()
    # constant per variant: every score is a sum of <=2 fixed boosts
    css = ([q] if isinstance(q, ConstScoreTerms)
           else [c[1] for c in q.clauses])
    boosts = sorted({np.float32(cs.boost) for cs in css})
    allowed = set(boosts)
    if len(boosts) == 2:
        allowed.add(np.float32(boosts[0] + boosts[1]))
    assert {np.float32(r["score"]) for r in got} <= allowed


def test_no_terms_or_variants(built_index):
    q, ov = build_flt_query(built_index, "the and of")  # all stopwords
    assert isinstance(q, MatchNoDocsQuery)
    assert fuzzy_like_this(built_index, "the and of").count() == 0
    assert fuzzy_like_this(built_index, "zzzzqqqqxxxx").count() == 0


def test_multi_source_groups(built_index):
    q, _ = build_flt_query(built_index, "file merge", max_num_terms=50)
    assert isinstance(q, BooleanQuery) and len(q.clauses) == 2
