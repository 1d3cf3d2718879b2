"""Prospective search / percolation (MemoryIndex.java:86-96 use case).

Cross-checked against the segment engine: for every registered query, the
docs the percolator flags must be exactly the docs the engine's scorer
matches (match-only contract, scores are the engine's concern).
"""

import pytest


QUERIES = {
    "term": "file",
    "and": "file AND handle",
    "or": "file OR handle OR vector",
    "not": "file -handle",
    "phrase": '"public static"',
    "sloppy": '"file handle"~3',
    "prefix": "vec*",
    "wild": "f?le",
    "range": "[fast TO file]",
    "fuzzy": "fole~1",
    "grouped": "(file OR handle) AND parse",
}


def test_percolate_matches_engine(spark, built_index, corpus_pdf):
    from voyagr_spark.percolator import percolate
    from voyagr_spark.search import scores

    docs = spark.createDataFrame(
        corpus_pdf.assign(doc_id=range(len(corpus_pdf)))
        [["doc_id", "content"]]
    )
    got = {}
    res = percolate(docs, QUERIES, text_col="content").collect()
    for r in res:
        got.setdefault(r["query_id"], set()).add(r["doc_id"])
    # engine ground truth: docmap keys follow the same (repo,path,commit)
    # order the fixture index assigned, so engine doc ids == row order ids
    key_order = (
        built_index.docmap()
        .select("doc_id", "repo", "path", "commit")
        .collect()
    )
    pdfk = corpus_pdf.assign(rowid=range(len(corpus_pdf))).set_index(
        ["repo", "path", "commit"]
    )["rowid"]
    eng2row = {r["doc_id"]: int(pdfk.loc[(r["repo"], r["path"], r["commit"])])
               for r in key_order}
    for qid, qtext in QUERIES.items():
        want = {eng2row[r["doc_id"]]
                for r in scores(built_index, qtext).collect()}
        assert got.get(qid, set()) == want, qid


def test_percolate_unsupported_type_raises(spark):
    import pandas as pd

    from voyagr_spark.percolator import _matches

    with pytest.raises(TypeError):
        _matches(object(), {})


def test_percolate_custom_analyzer(spark):
    from voyagr_spark.analysis import Analyzer
    from voyagr_spark.percolator import percolate

    docs = spark.createDataFrame(
        [(0, "the quick fox"), (1, "a slow dog")],
        "doc_id long, text string",
    )
    an = Analyzer(stopwords=frozenset())  # 'the' matches only with this chain
    res = percolate(docs, {"q": "the"}, analyzer=an).collect()
    assert [(r["doc_id"], r["query_id"]) for r in res] == [(0, "q")]
    assert percolate(docs, {"q": "the"}).collect() == []  # standard chain


def test_percolate_random_sweep_matches_engine(spark, built_index,
                                               oracle_index, corpus_pdf):
    """Randomized differential: the percolator's match set must equal the
    engine's for generated queries across the full grammar (seeds 7/11,
    the same generators as the rank-identical sweeps)."""
    from test_random_queries import _gen_queries, _gen_queries_r2

    from voyagr_spark.percolator import percolate
    from voyagr_spark.search import scores

    queries = {f"q{i}": q for i, q in enumerate(
        _gen_queries(oracle_index, n=25, seed=7)
        + _gen_queries_r2(oracle_index, n=15, seed=11)
    )}
    docs = spark.createDataFrame(
        corpus_pdf.assign(doc_id=range(len(corpus_pdf)))
        [["doc_id", "content"]]
    )
    got: dict = {qid: set() for qid in queries}
    for r in percolate(docs, queries, text_col="content").collect():
        got[r["query_id"]].add(r["doc_id"])
    key_order = built_index.docmap().select(
        "doc_id", "repo", "path", "commit").collect()
    pdfk = corpus_pdf.assign(rowid=range(len(corpus_pdf))).set_index(
        ["repo", "path", "commit"])["rowid"]
    eng2row = {r["doc_id"]: int(pdfk.loc[(r["repo"], r["path"], r["commit"])])
               for r in key_order}
    failures = []
    for qid, qtext in queries.items():
        want = {eng2row[r["doc_id"]]
                for r in scores(built_index, qtext).collect()}
        if got[qid] != want:
            failures.append((qtext, sorted(got[qid])[:5], sorted(want)[:5]))
    assert not failures, failures[:3]


def test_percolate_spans_match_engine(spark, built_index, corpus_pdf):
    """Span queries percolate (transient per-doc positions = MemoryIndex):
    match sets identical to the live engine's, incl. surround strings."""
    from voyagr_spark.percolator import percolate
    from voyagr_spark.search import search
    from voyagr_spark.spans import (
        SpanFirstQuery,
        SpanNearQuery,
        SpanNotQuery,
        SpanOrQuery,
        SpanTermQuery,
    )
    from voyagr_spark.surround import parse_surround

    span_qs = {
        "s_near": SpanNearQuery(
            [SpanTermQuery("parse"), SpanTermQuery("query")],
            slop=0, in_order=True),
        "s_unord": SpanNearQuery(
            [SpanTermQuery("file"), SpanTermQuery("open")],
            slop=4, in_order=False),
        "s_first": SpanFirstQuery(SpanTermQuery("file"), 12),
        "s_not": SpanNotQuery(SpanTermQuery("file"), SpanTermQuery("open"),
                              pre=2, post=2),
        "s_or_near": SpanNearQuery(
            [SpanOrQuery(SpanTermQuery("open"), SpanTermQuery("merge")),
             SpanTermQuery("file")], slop=3, in_order=False),
        "s_surround": "file 3n open",  # surround string -> span tree
    }
    docs = spark.createDataFrame(
        corpus_pdf.assign(doc_id=range(len(corpus_pdf)))
        [["doc_id", "content"]]
    )
    got = {}
    res = percolate(docs, span_qs, text_col="content",
                    syntax="surround").collect()
    for r in res:
        got.setdefault(r["query_id"], set()).add(r["doc_id"])
    key_order = (
        built_index.docmap()
        .select("doc_id", "repo", "path", "commit")
        .collect()
    )
    pdfk = corpus_pdf.assign(rowid=range(len(corpus_pdf))).set_index(
        ["repo", "path", "commit"]
    )["rowid"]
    eng2row = {r["doc_id"]: int(pdfk.loc[(r["repo"], r["path"], r["commit"])])
               for r in key_order}
    for qid, q in span_qs.items():
        qq = parse_surround(q) if isinstance(q, str) else q
        want = {eng2row[r["doc_id"]]
                for r in search(built_index, qq, k=10**6).collect()}
        assert got.get(qid, set()) == want, qid
        assert want, qid  # every form matches something in the fixture
