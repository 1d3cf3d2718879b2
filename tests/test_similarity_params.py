"""Custom similarity (§2.8): per-query k1/b overrides (BM25Similarity.java:46-58)."""

import numpy as np

from voyagr_spark.search import search


def test_default_params_unchanged(built_index, oracle_index):
    got = [
        (r["doc_id"], np.float32(r["score"]))
        for r in search(built_index, "file", k=10, k1=1.2, b=0.75).collect()
    ]
    want = [(d, s) for d, s in oracle_index.search("file", 10)]
    assert got == want  # explicit 1.2/0.75 == the reference defaults, bit-exact


def test_k1_zero_makes_tf_saturate(built_index):
    # k1=0 -> score = idf*(0+1)*freq/(freq+0) = idf: every matching doc of a
    # term scores identically regardless of tf or length
    rows = search(built_index, "file", k=50, k1=0.0, b=0.0).collect()
    scores = {np.float32(r["score"]) for r in rows}
    assert len(scores) == 1


def test_b_zero_removes_length_norm(built_index):
    # b=0 -> norm cache is the constant k1: two docs with equal tf get equal
    # scores regardless of doclen. Weaker check: results differ from default.
    d0 = [r["doc_id"] for r in search(built_index, "comment", k=20).collect()]
    db = [r["doc_id"] for r in search(built_index, "comment", k=20, b=0.0).collect()]
    assert d0 != db  # length norm changes tie-heavy ordering


def test_phrase_respects_custom_k1(built_index):
    # k1=0 -> tfNorm = freq/(freq+0) = 1, so every phrase match scores exactly
    # weight_value(sum_idfs, k1=0) = sum_idfs * (0+1).  A leaked default k1
    # in the phrase weight (ADVICE r1) would score sum_idfs * 2.2 instead.
    from voyagr_spark import bm25

    rows = search(built_index, '"parse query"', k=50, k1=0.0, b=0.0).collect()
    assert rows
    stats = built_index.term_dfs(["parse", "query"])
    acc = np.float32(0.0)
    for t in ("parse", "query"):
        acc = np.float32(acc + bm25.idf(stats[t], built_index.max_doc))
    want = np.float32(acc * np.float32(1.0))
    assert all(np.float32(r["score"]) == want for r in rows)


def test_sloppy_phrase_custom_k1_consistent(built_index):
    # sloppy phrase under custom k1: score must use the custom weight too —
    # with k1=0, score = sum_idfs * sloppyFreq/(sloppyFreq+0) = sum_idfs
    from voyagr_spark import bm25

    rows = search(built_index, '"parse query"~2', k=50, k1=0.0, b=0.0).collect()
    assert rows
    stats = built_index.term_dfs(["parse", "query"])
    acc = np.float32(0.0)
    for t in ("parse", "query"):
        acc = np.float32(acc + bm25.idf(stats[t], built_index.max_doc))
    want = np.float32(acc * np.float32(1.0))
    assert all(np.float32(r["score"]) == want for r in rows)


def test_pruned_paths_respect_custom_k1b(built_index):
    # block-max WAND + MaxScore must stay rank-identical to unpruned under
    # custom constants (their upper bounds are derived from plan.k1/plan.b)
    for q in ["file", "open OR merge OR segment"]:
        pruned = [
            (r["doc_id"], np.float32(r["score"]))
            for r in search(built_index, q, k=10, prune=True, k1=0.4, b=0.2).collect()
        ]
        full = [
            (r["doc_id"], np.float32(r["score"]))
            for r in search(built_index, q, k=10, prune=False, k1=0.4, b=0.2).collect()
        ]
        assert pruned == full, q
