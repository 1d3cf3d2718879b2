"""Incremental appends: batch-built(full) vs build(half)+append(2 batches)."""

import shutil

import pandas as pd
import pytest

from voyagr_spark.corpus import generate_corpus
from voyagr_spark.indexer import build_index
from voyagr_spark.oracle import OracleIndex
from voyagr_spark.streaming import append_batch

QUERIES = ["file", "open OR merge OR segment", '"parse query tree"', "file AND ident0099"]


@pytest.fixture(scope="module")
def streamed(spark, tmp_path_factory):
    pdf = generate_corpus(240, seed=7)
    first, second, third = pdf.iloc[:120], pdf.iloc[120:180], pdf.iloc[180:]
    d = tmp_path_factory.mktemp("stream_idx")
    idx = build_index(
        spark, spark.createDataFrame(first), str(d), num_segments=2
    )
    append_batch(idx, spark.createDataFrame(second), num_partitions=2)
    idx.reload_meta()
    append_batch(idx, spark.createDataFrame(third), num_partitions=2)
    idx.reload_meta()

    # oracle sees the same arrival order: each batch sorted by key
    ordered = pd.concat(
        [b.sort_values(["repo", "path", "commit"]) for b in (first, second, third)],
        ignore_index=True,
    )
    oracle = OracleIndex(ordered, sort=False)
    yield idx, oracle
    shutil.rmtree(d, ignore_errors=True)


def test_append_updates_global_stats(streamed):
    idx, oracle = streamed
    assert idx.max_doc == 240 == oracle.max_doc
    assert idx.sum_total_term_freq == oracle.sum_ttf


@pytest.mark.parametrize("q", QUERIES)
def test_streamed_index_rank_identical(streamed, q):
    from voyagr_spark.search import search

    idx, oracle = streamed
    got = [(r["doc_id"], r["score"]) for r in search(idx, q, k=10).collect()]
    want = oracle.search(q, 10)
    assert got == [(d, s) for d, s in want], q
