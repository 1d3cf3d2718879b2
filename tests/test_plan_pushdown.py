"""Physical-plan assertions: the scan under a search must push the term
filter to parquet and prune position blobs for non-phrase queries (B5/E11).
"""

from voyagr_spark.search import search


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def test_term_filter_pushed_to_parquet(built_index):
    plan = _plan(search(built_index, "file AND handle", k=10))
    assert "PushedFilters" in plan
    # the In/EqualTo on `term` must reach the parquet scan
    pushed = [l for l in plan.splitlines() if "PushedFilters" in l]
    assert any("term" in l for l in pushed), pushed


def test_pos_blob_pruned_for_non_phrase(built_index):
    plan = _plan(search(built_index, "file AND handle", k=10))
    scan_lines = [l for l in plan.splitlines() if "ReadSchema" in l]
    assert scan_lines and all("pos_blob" not in l for l in scan_lines)


def test_pos_blob_read_for_phrase(built_index):
    plan = _plan(search(built_index, '"parse query tree"', k=10))
    scan_lines = [l for l in plan.splitlines() if "ReadSchema" in l]
    assert any("pos_blob" in l for l in scan_lines)


def test_content_never_scanned_by_search(built_index):
    # stored fields live in the source table; a search must not read doc rows
    plan = _plan(search(built_index, "file", k=10))
    assert "kind=doc" not in plan


def test_term_dfs_cache_no_job_on_repeat(built_index):
    # second plan for the same terms must be served from the driver cache
    built_index._df_cache = None
    first = built_index.term_dfs(["file", "handle"])
    tracker = built_index.spark.sparkContext.statusTracker()
    before = tracker.getJobIdsForGroup(None)
    second = built_index.term_dfs(["file", "handle"])
    after = tracker.getJobIdsForGroup(None)
    assert first == second and len(after) == len(before)  # no new Spark job
