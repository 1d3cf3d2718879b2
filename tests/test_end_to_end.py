"""End-to-end rank-identical search vs the pure-Python oracle (SURVEY §5).

The reference query set (FIXTURES.md §2): hot Zipf-head term, rare tail term,
absent term, AND of hot+rare, OR of mid-frequency terms, contiguous phrase,
scattered words (phrase must reject relative to AND), phrase across a removed
stopword, tie-producing queries; k in {1, 10, 100}.
"""

import numpy as np
import pytest
from pyspark.sql import functions as F

REFERENCE_QUERIES = [
    "file",                      # Zipf-head hot term
    "ident4321",                 # tail term
    "zzz_not_in_corpus",         # 0 hits
    "file AND ident0099",        # hot + rare conjunction
    "open OR merge OR segment",  # 3-way disjunction
    "parse AND query AND tree",
    '"parse query tree"',        # planted contiguous phrase
    '"tree parse query"',        # same words, wrong order
    '"call the function"',       # phrase across removed stopword
    "comment",                   # tie-heavy (every doc has a comment line)
    "error AND NOT cache",
    "handler OR removed OR quick",
]


def run_engine(built_index, q, k):
    from voyagr_spark.search import search

    rows = search(built_index, q, k=k).collect()
    return [(r["doc_id"], np.float32(r["score"])) for r in rows]


@pytest.mark.parametrize("qtext", REFERENCE_QUERIES)
def test_rank_identical_vs_oracle_k10(built_index, oracle_index, qtext):
    got = run_engine(built_index, qtext, 10)
    want = oracle_index.search(qtext, 10)
    assert [d for d, _ in got] == [d for d, _ in want], qtext
    for (gd, gs), (wd, ws) in zip(got, want):
        assert gs == ws, (qtext, gd, gs, ws)  # float32 bit parity


@pytest.mark.parametrize("k", [1, 100])
@pytest.mark.parametrize("qtext", ["file", "open OR merge OR segment", '"parse query tree"'])
def test_rank_identical_other_k(built_index, oracle_index, qtext, k):
    got = run_engine(built_index, qtext, k)
    want = oracle_index.search(qtext, k)
    assert got == [(d, s) for d, s in want], (qtext, k)


def test_count_matches_oracle(built_index, oracle_index):
    from voyagr_spark.search import count

    for q in ["file", "file AND ident0099", '"parse query tree"', "zzz_not_in_corpus"]:
        assert count(built_index, q) == oracle_index.count(q), q


def test_sha256_invariant(built_index, spark, corpus_pdf):
    """north_rule: per-row content sha256 equality index vs source."""
    src = spark.createDataFrame(corpus_pdf).select(
        "repo", "path", "commit", F.sha2("content", 256).alias("src_sha")
    )
    dm = built_index.docmap().select("repo", "path", "commit", "content_sha256")
    joined = dm.join(src, ["repo", "path", "commit"], "full_outer")
    bad = joined.filter(
        (F.col("src_sha").isNull())
        | (F.col("content_sha256").isNull())
        | (F.col("src_sha") != F.col("content_sha256"))
    ).count()
    assert bad == 0
    assert dm.count() == len(corpus_pdf)


def test_doc_ids_dense_and_ordered(built_index):
    dm = built_index.docmap().select("doc_id", "repo", "path", "commit").collect()
    rows = sorted((r["repo"], r["path"], r["commit"], r["doc_id"]) for r in rows_iter(dm))
    ids = [r[3] for r in rows]
    assert ids == list(range(len(rows)))  # dense rank over (repo, path, commit)


def rows_iter(rows):
    for r in rows:
        yield r


def test_property_and_subset_of_term(built_index, oracle_index):
    """Semantic property (TestBooleanQuery style): AND ⊆ each term's matches."""
    from voyagr_spark.search import count, search

    and_docs = {r["doc_id"] for r in search(built_index, "parse AND tree", k=10_000).collect()}
    parse_docs = {r["doc_id"] for r in search(built_index, "parse", k=10_000).collect()}
    tree_docs = {r["doc_id"] for r in search(built_index, "tree", k=10_000).collect()}
    assert and_docs <= parse_docs and and_docs <= tree_docs
    # phrase ⊆ AND
    ph = {r["doc_id"] for r in search(built_index, '"parse query tree"', k=10_000).collect()}
    and3 = {r["doc_id"] for r in search(built_index, "parse AND query AND tree", k=10_000).collect()}
    assert ph <= and3


def test_maxscore_pruning_rank_neutral(built_index):
    """K9: pruned OR execution must return the identical top-k."""
    from voyagr_spark.search import search

    q = "file OR open OR comment OR ident0007"
    pruned = [(r["doc_id"], r["score"]) for r in search(built_index, q, k=10, prune=True).collect()]
    full = [(r["doc_id"], r["score"]) for r in search(built_index, q, k=10, prune=False).collect()]
    assert pruned == full
