"""Highlighting + suggest (§2.8): fragments wrap query terms; suggestions
rank by (edit distance, docFreq)."""

import numpy as np

from voyagr_spark.highlight import _best_fragment, highlight, suggest
from voyagr_spark.search import search


def test_best_fragment_wraps_terms():
    text = "alpha beta gamma " * 10 + "needle here needle " + "delta " * 30
    frag = _best_fragment(text, {"needle"}, 100, "<em>", "</em>")
    assert "<em>needle</em>" in frag
    assert len(frag) <= 100 + 2 * len("<em></em>") * 4


def test_best_fragment_no_match_returns_head():
    frag = _best_fragment("just some words", {"absent"}, 10, "<em>", "</em>")
    assert frag == "just some w"[:10]


def test_best_fragment_stopword_never_highlighted():
    # query_terms never contains stopwords (analysis strips them), so a
    # stopword in text is left untouched even at fragment scoring time
    frag = _best_fragment("the cat the dog", {"cat"}, 50, "[", "]")
    assert "[cat]" in frag and "[the]" not in frag


def test_highlight_top_hits(built_index, spark, corpus_pdf):
    source = spark.createDataFrame(corpus_pdf)
    res = search(built_index, "file AND handle", k=5)
    out = highlight(built_index, res, source, "file AND handle").collect()
    assert len(out) == 5
    for r in out:
        assert "<em>" in r["fragment"]
        low = r["fragment"].lower()
        assert "<em>file</em>" in low or "<em>handle</em>" in low


def test_suggest_finds_near_terms(built_index):
    rows = suggest(built_index, "fil", max_edits=1, top=5).collect()
    terms = [r["term"] for r in rows]
    assert "file" in terms
    # ranked by (dist asc, df desc): all dists nondecreasing
    dists = [r["dist"] for r in rows]
    assert dists == sorted(dists)


def test_suggest_excludes_self_and_respects_edits(built_index):
    rows = suggest(built_index, "file", max_edits=1, top=10).collect()
    assert all(r["term"] != "file" for r in rows)
    assert all(r["dist"] <= 1 for r in rows)
