"""search_many: batched execution must be rank-identical to search()."""

import numpy as np
import pytest

from voyagr_spark.search import search, search_many

QUERIES = {
    "term_hot": "file",
    "term_rare": "dup",
    "bool_and": "file AND handle",
    "bool_or": "open OR merge OR segment",
    "bool_not": "file AND NOT error",
    "phrase": '"parse query tree"',
    "prefix": "par*",
    "absent": "zzzmissing",
}


def _rows(df):
    return [(r["doc_id"], float(np.float32(r["score"]))) for r in df.collect()]


def test_search_many_matches_single(built_index):
    batch = search_many(built_index, QUERIES, k=10).collect()
    by_qid = {}
    for r in batch:
        by_qid.setdefault(r["query_id"], []).append(
            (float(np.float32(r["score"])), r["doc_id"])
        )
    for qid, qtext in QUERIES.items():
        single = [
            (float(np.float32(r["score"])), r["doc_id"])
            for r in search(built_index, qtext, k=10).collect()
        ]
        got = sorted(by_qid.get(qid, []), key=lambda t: (-t[0], t[1]))
        assert got == single, f"{qid}: batch != single"


def test_search_many_k1(built_index):
    batch = search_many(built_index, {"q": "file"}, k=1).collect()
    single = search(built_index, "file", k=1).collect()
    assert len(batch) == 1
    assert batch[0]["doc_id"] == single[0]["doc_id"]
    assert np.float32(batch[0]["score"]) == np.float32(single[0]["score"])


def test_search_many_empty(built_index):
    assert search_many(built_index, {}, k=5).count() == 0
    assert search_many(built_index, {"q": "zzzmissing"}, k=5).count() == 0
