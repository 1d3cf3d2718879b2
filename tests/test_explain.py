"""K6 explain: the Explanation value must equal the search score bit-exactly."""

import numpy as np
import pytest

from voyagr_spark.search import explain, search

QUERIES = [
    "file",
    "file AND handle",
    "open OR merge OR segment",
    '"parse query tree"',
    '"parse query tree"~3',
    "error AND NOT cache",
]


@pytest.mark.parametrize("qtext", QUERIES)
def test_explain_value_matches_search_score(built_index, qtext):
    hits = search(built_index, qtext, k=3).collect()
    assert hits, qtext
    for h in hits:
        ex = explain(built_index, qtext, h["doc_id"])
        assert ex["match"] is True
        assert np.float32(ex["value"]) == np.float32(h["score"]), (qtext, ex)


def test_explain_non_matching_doc(built_index):
    # find a doc that does NOT match a rare conjunction
    matched = {r["doc_id"] for r in search(built_index, "ident4321", k=100).collect()}
    other = next(d for d in range(built_index.max_doc) if d not in matched)
    ex = explain(built_index, "ident4321", other)
    assert ex["match"] is False and ex["value"] == 0.0


def test_explain_structure(built_index):
    h = search(built_index, "file AND handle", k=1).collect()[0]
    ex = explain(built_index, "file AND handle", h["doc_id"])
    assert ex["description"] == "sum of:"
    assert len(ex["details"]) == 2
    for d in ex["details"]:
        assert d["match"] is True
        assert any("freq" in dd["description"] for dd in d["details"])


def test_explain_missing_doc(built_index):
    ex = explain(built_index, "file", 10_000_000)
    assert ex["match"] is False


def test_explain_span_query(built_index):
    from voyagr_spark.search import explain, search
    from voyagr_spark.spans import SpanNearQuery, SpanTermQuery

    q = SpanNearQuery([SpanTermQuery("parse"), SpanTermQuery("query")],
                      slop=0, in_order=True)
    top = search(built_index, q, k=1).collect()[0]
    ex = explain(built_index, q, int(top["doc_id"]))
    assert ex["match"] is True
    # top value is the scorer's own float32 score, bit-identical
    import numpy as np
    assert np.float32(ex["value"]) == np.float32(top["score"])
    descs = " ".join(d["description"] for d in ex["details"])
    assert "numMatches" in descs and "sloppyFreq" in descs


def test_explain_classic_similarity(built_index):
    from voyagr_spark.search import explain, search

    top = search(built_index, "file", k=1, similarity="classic").collect()[0]
    ex = explain(built_index, "file", int(top["doc_id"]),
                 similarity="classic")
    import numpy as np
    assert ex["match"] is True
    assert np.float32(ex["value"]) == np.float32(top["score"])
