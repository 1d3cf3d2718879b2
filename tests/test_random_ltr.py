"""Seeded randomized LTR differential sweep: 30 random models (linear +
additive trees, random weights/normalizers/thresholds over random feature
sets) vs a pure-Python float32 fold of the same model — rank+score
identical top-10 every case.  Deterministic (seed=37)."""

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

FEATS = (OriginalScore(), FieldValue("nchars"), FieldValue("doclen"),
         QueryScore("f2", "file"), Value("bias", 1.0))
NAMES = ["originalScore", "nchars", "doclen", "f2", "bias"]


@pytest.fixture(scope="module")
def feat_oracle(corpus_pdf, oracle_index):
    ordered = corpus_pdf.sort_values(["repo", "path", "commit"]).reset_index(
        drop=True)
    window = oracle_index.search("open", k=25)
    f2 = dict(oracle_index.search("file", k=oracle_index.max_doc))
    feats = {}
    for d, sc in window:
        content = ordered["content"].iloc[d]
        toks, _ = __import__("voyagr_spark.analysis",
                             fromlist=["analyze_text"]).analyze_text(content)
        feats[d] = {
            "originalScore": np.float32(sc),
            "nchars": np.float32(len(content)),
            "doclen": np.float32(len(toks)),
            "f2": np.float32(f2.get(d, np.float32(0.0))),
            "bias": np.float32(1.0),
        }
    return [d for d, _ in window], feats


def _norm_py(v, norm):
    if norm is None:
        return v
    if norm[0] == "minmax":
        return np.float32(np.float32(v - np.float32(norm[1]))
                          / np.float32(norm[2] - norm[1]))
    return np.float32(np.float32(v - np.float32(norm[1]))
                      / np.float32(norm[2]))


def _fold_linear_py(model, fv):
    acc = None
    for name, w in model.weights:
        f = _norm_py(fv[name], model.norms.get(name))
        term = np.float32(np.float32(w) * f)
        acc = term if acc is None else np.float32(acc + term)
    return acc


def _tree_py(node, fv, norms):
    if "value" in node:
        return np.float32(node["value"])
    f = _norm_py(fv[node["feature"]], norms.get(node["feature"]))
    return (_tree_py(node["left"], fv, norms)
            if f <= np.float32(node["threshold"])
            else _tree_py(node["right"], fv, norms))


def _fold_trees_py(model, fv):
    acc = None
    for w, root in model.trees:
        term = np.float32(np.float32(w) * _tree_py(root, fv, model.norms))
        acc = term if acc is None else np.float32(acc + term)
    return acc


def _rand_tree(rng, depth):
    if depth == 0 or rng.random() < 0.3:
        return {"value": round(float(rng.uniform(-2, 2)), 3)}
    return {
        "feature": NAMES[int(rng.integers(0, len(NAMES)))],
        "threshold": round(float(rng.uniform(0, 500)), 2),
        "left": _rand_tree(rng, depth - 1),
        "right": _rand_tree(rng, depth - 1),
    }


def test_random_ltr_sweep(built_index, feat_oracle):
    window, feats = feat_oracle
    rng = np.random.default_rng(37)
    for i in range(30):
        norms = {}
        if rng.random() < 0.5:
            norms["nchars"] = ("minmax", 0.0, 4096.0)
        if rng.random() < 0.3:
            norms["doclen"] = ("standard", 100.0, 50.0)
        if rng.random() < 0.5:
            k = int(rng.integers(2, len(NAMES) + 1))
            picked = list(rng.choice(NAMES, size=k, replace=False))
            model = LinearModel(
                weights=tuple((n, round(float(rng.uniform(-2, 3)), 3))
                              for n in picked),
                norms=norms)
            fold = _fold_linear_py
        else:
            model = TreesModel(
                trees=tuple(
                    (round(float(rng.uniform(0.1, 2)), 3), _rand_tree(rng, 3))
                    for _ in range(int(rng.integers(1, 4)))),
                norms=norms)
            fold = _fold_trees_py
        got = [(r.doc_id, np.float32(r.score))
               for r in ltr_rerank(built_index, "open", model, FEATS,
                                   rerank_docs=25, k=10).collect()]
        want = sorted(((d, fold(model, feats[d])) for d in window),
                      key=lambda t: (-float(t[1]), t[0]))[:10]
        assert got == want, (i, model)
