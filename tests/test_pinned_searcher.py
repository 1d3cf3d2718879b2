"""Pinned-searcher serving mode (Index.pin): the Lucene open-IndexSearcher
analog — postings pinned in the executor columnar cache, pre-partitioned by
segment so every groupBy(seg).applyInPandas query runs with zero exchange.

Contract: pinning changes ONLY the physical plan — results stay bit-identical
to the cold parquet path; unpin restores the cold path; reopen re-pins over
the new lineage.
"""

import numpy as np
import pytest

from voyagr_spark.search import search

QUERIES = [
    "file",
    "file AND handle",
    "file OR handle OR parse",
    '"parse query tree"',
    "fil*",
    "file AND NOT handle",
]


def _rows(df):
    return [(int(r["doc_id"]), np.float32(r["score"])) for r in df.collect()]


def _final_plan(df) -> str:
    df.collect()  # AQE: final plan exists only after execution
    return df._jdf.queryExecution().executedPlan().toString()


@pytest.fixture()
def pinned(built_index):
    built_index.pin()
    yield built_index
    built_index.unpin()


def test_pinned_results_bit_identical_to_cold(built_index):
    cold = {q: _rows(search(built_index, q, k=10)) for q in QUERIES}
    built_index.pin()
    try:
        for q in QUERIES:
            assert _rows(search(built_index, q, k=10)) == cold[q], q
    finally:
        built_index.unpin()


def test_pinned_query_plan_has_no_exchange(pinned):
    plan = _final_plan(search(pinned, "file AND handle", k=10))
    final = plan.split("== Initial Plan ==")[0]
    # every line above the InMemoryRelation boundary is per-query work; the
    # exchange inside the cached subtree ran once at pin time, not per query
    above = final.split("InMemoryRelation")[0]
    assert "InMemoryTableScan" in final
    assert "Exchange" not in above, above
    assert "TakeOrderedAndProject" in final


def test_pinned_cache_prunes_term_predicate(pinned):
    plan = _final_plan(search(pinned, "file", k=10))
    # the term filter must reach the cache scan (per-batch min/max pruning)
    scan = [l for l in plan.splitlines() if "InMemoryTableScan" in l]
    assert scan and any("term" in l for l in scan), scan


def test_unpin_restores_cold_parquet_pushdown(built_index):
    built_index.pin()
    built_index.unpin()
    plan = _final_plan(search(built_index, "file", k=10))
    assert "InMemoryTableScan" not in plan
    assert any(
        "PushedFilters" in l and "term" in l for l in plan.splitlines()
    )


def test_reload_meta_repins_lazily(built_index):
    built_index.pin()
    try:
        before = _rows(search(built_index, "file", k=10))
        built_index.reload_meta()
        assert built_index._pinned_df is not None  # re-warmed over new lineage
        assert _rows(search(built_index, "file", k=10)) == before
    finally:
        built_index.unpin()
