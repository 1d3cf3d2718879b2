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
    # LSM lineage: base + one delta dir per append (below compaction depth)
    assert idx.meta["stats_dirs"] == [
        "term_stats", "term_stats_d1", "term_stats_d2",
    ]
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


def test_append_stats_output_is_o_batch(streamed, spark):
    # each delta dir holds only the BATCH vocabulary, not the full one —
    # the append writes O(batch) stats bytes (VERDICT r2 #4 "Done =")
    idx, _ = streamed
    base_rows = spark.read.parquet(str(idx.dir / "term_stats")).count()
    d2_rows = spark.read.parquet(str(idx.dir / "term_stats_d2")).count()
    assert 0 < d2_rows < base_rows
    base_bytes = sum(
        p.stat().st_size for p in (idx.dir / "term_stats").rglob("*.parquet")
    )
    d2_bytes = sum(
        p.stat().st_size for p in (idx.dir / "term_stats_d2").rglob("*.parquet")
    )
    assert 0 < d2_bytes < base_bytes


def test_stats_compaction_and_deferred_gc(spark, tmp_path_factory):
    # push past STATS_COMPACT_AFTER: the lineage collapses to one compacted
    # base; stale dirs survive the swap (ADVICE r2: no rmtree mid-flight)
    # and are swept by the next OPEN
    from voyagr_spark.indexer import Index
    from voyagr_spark.streaming import STATS_COMPACT_AFTER

    pdf = generate_corpus(140, seed=11)
    d = tmp_path_factory.mktemp("compact_idx")
    idx = build_index(
        spark, spark.createDataFrame(pdf.iloc[:40]), str(d), num_segments=1
    )
    lo = 40
    for i in range(STATS_COMPACT_AFTER):
        append_batch(
            idx, spark.createDataFrame(pdf.iloc[lo: lo + 20]), num_partitions=1
        )
        idx.reload_meta()
        lo += 20
    assert len(idx.meta["stats_dirs"]) == 1
    assert idx.meta["stats_dirs"][0].startswith("term_stats_v")
    # pre-compaction dirs still on disk (deferred GC), swept on reopen
    stale = [p.name for p in d.glob("term_stats*")
             if p.name not in idx.meta["stats_dirs"]]
    assert stale, "old stats lineage must survive the swap"
    idx2 = Index(spark, str(d))
    left = [p.name for p in d.glob("term_stats*")]
    assert left == idx.meta["stats_dirs"]
    # compacted stats == full recompute
    from pyspark.sql import functions as F

    full = (
        idx2.postings().groupBy("term")
        .agg(F.sum("df").alias("df"), F.sum("ttf").alias("ttf"),
             F.max("max_tf").alias("max_tf"), F.min("min_len").alias("min_len"))
    )
    a = {r["term"]: (r["df"], r["ttf"], r["max_tf"], r["min_len"])
         for r in idx2.term_stats().collect()}
    b = {r["term"]: (r["df"], r["ttf"], r["max_tf"], r["min_len"])
         for r in full.collect()}
    assert a == b
    shutil.rmtree(d, ignore_errors=True)


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
