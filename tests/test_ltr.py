"""LTR re-ranking (solr/contrib/ltr) vs a pure-Python float32 oracle."""

import sys
from pathlib import Path

import numpy as np
import pytest

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

from voyagr_spark.ltr import (
    FieldValue,
    LinearModel,
    OriginalScore,
    QueryScore,
    TreesModel,
    Value,
    ltr_rerank,
)

FEATURES = (OriginalScore(), FieldValue("nchars"), QueryScore("f2", "file"),
            Value("bias", 1.0))

LINEAR = LinearModel(
    weights=(("originalScore", 2.0), ("nchars", 0.25), ("f2", 0.5),
             ("bias", 4.0)),
    norms={"nchars": ("minmax", 0.0, 4096.0)},
)

TREES = TreesModel(trees=(
    (0.5, {"feature": "nchars", "threshold": 1024.0,
           "left": {"value": 2.0},
           "right": {"feature": "originalScore", "threshold": 1.5,
                     "left": {"value": 0.5}, "right": {"value": 1.0}}}),
    (2.0, {"feature": "f2", "threshold": 0.0,
           "left": {"value": 0.25}, "right": {"value": 0.75}}),
))


@pytest.fixture(scope="module")
def window_oracle(corpus_pdf, oracle_index):
    ordered = corpus_pdf.sort_values(["repo", "path", "commit"]).reset_index(
        drop=True)
    window = oracle_index.search("open", k=30)
    f2 = dict(oracle_index.search("file", k=oracle_index.max_doc))
    feats = {}
    for d, sc in window:
        feats[d] = {
            "originalScore": np.float32(sc),
            "nchars": np.float32(len(ordered["content"].iloc[d])),
            "f2": np.float32(f2.get(d, np.float32(0.0))),
            "bias": np.float32(1.0),
        }
    return window, feats


def _fold_linear(fv):
    nch = np.float32(
        np.float32(fv["nchars"] - np.float32(0.0)) / np.float32(4096.0))
    acc = np.float32(np.float32(2.0) * fv["originalScore"])
    acc = np.float32(acc + np.float32(np.float32(0.25) * nch))
    acc = np.float32(acc + np.float32(np.float32(0.5) * fv["f2"]))
    return np.float32(acc + np.float32(np.float32(4.0) * np.float32(1.0)))


def _fold_trees(fv):
    t1 = (np.float32(2.0) if fv["nchars"] <= np.float32(1024.0)
          else (np.float32(0.5) if fv["originalScore"] <= np.float32(1.5)
                else np.float32(1.0)))
    t2 = (np.float32(0.25) if fv["f2"] <= np.float32(0.0)
          else np.float32(0.75))
    return np.float32(np.float32(np.float32(0.5) * t1)
                      + np.float32(np.float32(2.0) * t2))


def _expected(window_oracle, fold, k=10):
    window, feats = window_oracle
    out = [(d, fold(feats[d])) for d, _ in window]
    out.sort(key=lambda t: (-float(t[1]), t[0]))
    return out[:k]


def test_linear_rerank(built_index, window_oracle):
    got = [(r.doc_id, np.float32(r.score))
           for r in ltr_rerank(built_index, "open", LINEAR, FEATURES,
                               rerank_docs=30, k=10).collect()]
    assert got == _expected(window_oracle, _fold_linear)


def test_trees_rerank(built_index, window_oracle):
    got = [(r.doc_id, np.float32(r.score))
           for r in ltr_rerank(built_index, "open", TREES, FEATURES,
                               rerank_docs=30, k=10).collect()]
    assert got == _expected(window_oracle, _fold_trees)


def test_rerank_window_bound(built_index, oracle_index):
    """Docs outside the reRankDocs window never enter the re-ranking."""
    got = {r.doc_id for r in ltr_rerank(built_index, "open", TREES, FEATURES,
                                        rerank_docs=5, k=5).collect()}
    window = {d for d, _ in oracle_index.search("open", k=5)}
    assert got <= window


def test_feature_defaults(built_index):
    """A SolrFeature query the doc does not match contributes 0.0f."""
    model = LinearModel(weights=(("absent", 1.0), ("bias", 1.0)))
    feats = (QueryScore("absent", "zzzzmissing"), Value("bias", 0.25))
    rows = ltr_rerank(built_index, "open", model, feats,
                      rerank_docs=5, k=5).collect()
    assert rows and all(np.float32(r.score) == np.float32(0.25) for r in rows)


def test_contract_errors(built_index):
    with pytest.raises(ValueError, match="feature"):
        ltr_rerank(built_index, "open", LINEAR, ("bogus",), k=3)
    from voyagr_spark.ltr import _normalize
    with pytest.raises(ValueError, match="normalizer"):
        import pyspark.sql.functions as F
        _normalize(F.lit(1.0), ("robust", 1, 2))