"""ShingleFilter (default config: bigrams + unigrams, filler '_') —
stream goldens, batch==scalar equivalence, end-to-end rank parity."""

import hashlib
import shutil

import numpy as np
import pandas as pd
import pytest

from voyagr_spark.analysis import Analyzer
from voyagr_spark.indexer import Index, build_index
from voyagr_spark.oracle import OracleIndex
from voyagr_spark.parser import TermQuery
from voyagr_spark.search import search

SH = Analyzer(shingle=True)


def test_shingle_stream_golden():
    # 'of'/'the' are stopwords -> interior hole of length 2 -> ONE filler
    t, p = SH.analyze_text("fast key of the merge table")
    assert list(zip(t, p)) == [
        ("fast", 0), ("fast key", 0),
        ("key", 1), ("key _", 1),
        ("_ merge", 2),
        ("merge", 4), ("merge table", 4),
        ("table", 5),
    ]


def test_shingle_trailing_stop_filler():
    # trailing stopwords insert ONE filler (end position increment,
    # ShingleFilter.java:417-419); no '_'-only unigram is emitted
    t, p = SH.analyze_text("merge key the of")
    assert list(zip(t, p)) == [
        ("merge", 0), ("merge key", 0), ("key", 1), ("key _", 1),
    ]


def test_shingle_single_token_and_empty():
    assert SH.analyze_text("merge") == (["merge"], [0])
    assert SH.analyze_text("the of and") == ([], [])
    assert SH.analyze_text("") == ([], [])


def test_shingle_flat_matches_scalar():
    texts = [
        "fast key of the merge table", "merge key the of", "the of and",
        "", "one", "alpha beta gamma", "a b c the d",
    ]
    t, p, d, dl = SH.analyze_flat(pd.Series(texts))
    for i, tx in enumerate(texts):
        tt, pp = SH.analyze_text(tx)
        m = d == i
        assert sorted(zip(t[m].tolist(), p[m].tolist())) == sorted(
            zip(tt, pp)
        ), tx
        assert dl[i] == len(set(pp)), tx


def test_shingle_rejects_synonyms():
    with pytest.raises(ValueError, match="shingle"):
        Analyzer(shingle=True, synonyms={"a": ("b",)})


def _corpus() -> pd.DataFrame:
    base = [
        "fast key lookup in the merge table",
        "the merge table holds fast key rows",
        "fast key fast key fast key",
        "slow scan of the merge table",
        "key value store with fast reads",
        "merge policy picks the next segment",
    ] * 8
    rows = []
    for i, t in enumerate(base):
        rows.append({
            "repo": f"org{i % 3}/r", "path": f"src/f{i}.txt",
            "commit": hashlib.sha1(str(i).encode()).hexdigest(),
            "lang": "txt", "content": t,
        })
    return pd.DataFrame(rows)


@pytest.fixture(scope="module")
def shingle_index(spark, tmp_path_factory):
    pdf = _corpus()
    d = tmp_path_factory.mktemp("shingle_ix")
    idx = build_index(
        spark, spark.createDataFrame(pdf), str(d), num_segments=2, analyzer=SH
    )
    oracle = OracleIndex(pdf, analyzer=SH)
    yield idx, oracle, str(d)
    shutil.rmtree(d, ignore_errors=True)


@pytest.mark.parametrize("qt", ["fast key", "merge table", "_ merge"])
def test_shingle_term_rank_identical(shingle_index, qt):
    idx, oracle, _ = shingle_index
    got = [
        (r["doc_id"], np.float32(r["score"]))
        for r in search(idx, TermQuery(qt), k=50).collect()
    ]
    want = [(d, np.float32(s)) for d, s in oracle.search(TermQuery(qt), 50)]
    assert got == want and got, qt


def test_shingle_unigrams_still_searchable(shingle_index):
    idx, oracle, _ = shingle_index
    got = [
        (r["doc_id"], np.float32(r["score"]))
        for r in search(idx, "fast AND key", k=50).collect()
    ]
    want = [(d, np.float32(s)) for d, s in oracle.search("fast AND key", 50)]
    assert got == want and got


def test_shingle_analyzer_persists(shingle_index, spark):
    idx, oracle, d = shingle_index
    reopened = Index(spark, d)
    assert reopened.analyzer == SH
    got = [
        (r["doc_id"], np.float32(r["score"]))
        for r in search(reopened, TermQuery("fast key"), k=10).collect()
    ]
    want = [(d2, np.float32(s)) for d2, s in oracle.search(TermQuery("fast key"), 10)]
    assert got == want
