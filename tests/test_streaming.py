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


def test_incremental_stats_equal_full_recompute(streamed):
    # after two appends, the versioned stats table must equal a from-scratch
    # aggregation over ALL posting rows (associative merge correctness)
    from pyspark.sql import functions as F

    idx, _ = streamed
    assert idx.meta["stats_dir"].startswith("term_stats_v")
    full = (
        idx.postings()
        .groupBy("term")
        .agg(
            F.sum("df").alias("df"),
            F.sum("ttf").alias("ttf"),
            F.max("max_tf").alias("max_tf"),
            F.min("min_len").alias("min_len"),
        )
    )
    inc = idx.term_stats()
    a = {r["term"]: (r["df"], r["ttf"], r["max_tf"], r["min_len"])
         for r in inc.collect()}
    b = {r["term"]: (r["df"], r["ttf"], r["max_tf"], r["min_len"])
         for r in full.collect()}
    assert a == b


def test_append_stats_input_is_o_batch(streamed):
    # the incremental aggregate's scan must push the seg-range predicate so
    # parquet footer min/max prunes pre-append files (O(batch) input)
    from voyagr_spark.streaming import STREAM_PARTITION_BASE, new_segment_postings

    idx, _ = streamed
    lo = STREAM_PARTITION_BASE << 20
    hi = (STREAM_PARTITION_BASE + 4) << 20
    plan = (
        new_segment_postings(idx, lo, hi)
        ._jdf.queryExecution().executedPlan().toString()
    )
    pushed = [l for l in plan.splitlines() if "PushedFilters" in l]
    assert any("GreaterThanOrEqual(seg" in l and "LessThan(seg" in l
               for l in pushed), pushed


def test_new_seg_ids_derived_without_scan(streamed):
    # seg ids in the manifest match the deterministic (pid_base, counts)
    # derivation — and every derived id actually exists on disk
    idx, _ = streamed
    manifest = idx.manifest()
    appended = {
        r["seg"]
        for r in manifest.filter(
            manifest["stage"].startswith("append_epoch")
        ).collect()
    }
    on_disk = {
        r["seg"]
        for r in idx.postings().select("seg").distinct().collect()
        if r["seg"] >= (1 << 30) << 20
    }
    assert appended == on_disk and appended
