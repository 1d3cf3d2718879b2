"""MoreLikeThis (voyagr_spark.mlt): term selection against a pure-python
oracle, and the MLT search against OracleIndex BM25 scoring.

Reference semantics: MoreLikeThis.createQueue (tf >= minTermFreq, df >=
minDocFreq, score = tf * idf, top maxQueryTerms) with a deterministic
(score DESC, term ASC) tie-break.
"""

import math
from collections import Counter

import numpy as np
import pytest

from voyagr_spark.analysis import analyze_text
from voyagr_spark.mlt import interesting_terms, mlt_query, more_like_this

SEED_DOC = 5


@pytest.fixture(scope="module")
def source_df(spark, corpus_pdf):
    return spark.createDataFrame(corpus_pdf)


def _oracle_selection(corpus_pdf, doc_id, max_terms=25, min_tf=2, min_df=5):
    docs = corpus_pdf.sort_values(["repo", "path", "commit"]).reset_index(drop=True)
    n = len(docs)
    dfs: Counter = Counter()
    for content in docs["content"]:
        dfs.update(set(analyze_text(content)[0]))
    tf = Counter(analyze_text(docs["content"][doc_id])[0])
    scored = [
        (t, c, dfs[t], c * (math.log((n + 1) / (dfs[t] + 1)) + 1.0))
        for t, c in tf.items()
        if c >= min_tf and dfs[t] >= min_df
    ]
    scored.sort(key=lambda r: (-r[3], r[0]))
    return scored[:max_terms]


def test_interesting_terms_match_oracle(built_index, source_df, corpus_pdf):
    got = interesting_terms(built_index, source_df, SEED_DOC)
    want = _oracle_selection(corpus_pdf, SEED_DOC)
    assert got == want
    assert 0 < len(got) <= 25


def test_selection_thresholds(built_index, source_df, corpus_pdf):
    got = interesting_terms(
        built_index, source_df, SEED_DOC,
        max_query_terms=5, min_term_freq=3, min_doc_freq=10,
    )
    want = _oracle_selection(corpus_pdf, SEED_DOC, 5, 3, 10)
    assert got == want
    assert all(tf >= 3 and df >= 10 for _, tf, df, _ in got)


def test_mlt_search_matches_oracle_index(
    built_index, source_df, oracle_index
):
    q = mlt_query(built_index, source_df, SEED_DOC)
    got = [
        (int(r["doc_id"]), np.float32(r["score"]))
        for r in more_like_this(built_index, source_df, SEED_DOC, k=10).collect()
    ]
    want = oracle_index.search(q, k=10)
    assert got == want


def test_mlt_seed_doc_ranks_first(built_index, source_df):
    # the seed contains every selected term at max tf-weight; on this corpus
    # it must come back as its own best match
    top = more_like_this(built_index, source_df, SEED_DOC, k=3).collect()
    assert top and int(top[0]["doc_id"]) == SEED_DOC


def test_mlt_unknown_doc_raises(built_index, source_df):
    with pytest.raises(KeyError):
        interesting_terms(built_index, source_df, 10**12)
