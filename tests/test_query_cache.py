"""K7 query-result cache: Solr queryResultCache / LRUQueryCache analog."""

import numpy as np


def _jobs(index) -> int:
    return len(index.spark.sparkContext.statusTracker().getJobIdsForGroup(None))


def test_cache_hit_zero_jobs_and_identical(built_index):
    from voyagr_spark.search import search

    q = "file AND handle"
    cold = [(r["doc_id"], np.float32(r["score"]))
            for r in search(built_index, q, k=10, use_cache=True).collect()]
    before = _jobs(built_index)
    warm_df = search(built_index, q, k=10, use_cache=True)
    assert _jobs(built_index) == before  # plan + cache hit: zero Spark jobs
    warm = [(r["doc_id"], np.float32(r["score"])) for r in warm_df.collect()]
    assert warm == cold
    # and identical to the uncached path
    plain = [(r["doc_id"], np.float32(r["score"]))
             for r in search(built_index, q, k=10).collect()]
    assert warm == plain


def test_cache_keyed_by_params(built_index):
    from voyagr_spark.search import search

    a = [r["doc_id"] for r in
         search(built_index, "file", k=5, use_cache=True).collect()]
    b = [r["doc_id"] for r in
         search(built_index, "file", k=10, use_cache=True).collect()]
    assert a == b[:5] and len(b) == 10


def test_cache_evicts_least_recently_used(built_index):
    # LRU semantics (LRUQueryCache.java, VERDICT r2 missing #3): a HIT moves
    # the entry to the tail, so eviction at capacity removes the least
    # recently USED entry, not the oldest-inserted
    import voyagr_spark.search as S
    from voyagr_spark.search import search

    built_index._result_cache = None  # reset any earlier-test state
    old_max = S._RESULT_CACHE_MAX
    S._RESULT_CACHE_MAX = 2
    try:
        search(built_index, "file", k=3, use_cache=True).collect()
        search(built_index, "handle", k=3, use_cache=True).collect()
        # touch 'file' -> 'handle' becomes the LRU entry
        search(built_index, "file", k=3, use_cache=True).collect()
        search(built_index, "parse", k=3, use_cache=True).collect()  # evicts
        keys = [k[0] for k in built_index._result_cache]
        assert any("file" in k for k in keys), keys
        assert not any("handle" in k for k in keys), keys
        assert any("parse" in k for k in keys), keys
    finally:
        S._RESULT_CACHE_MAX = old_max
        built_index._result_cache = None


def test_cache_invalidated_by_delete(spark, tmp_path):
    import pandas as pd

    from voyagr_spark.corpus import generate_corpus
    from voyagr_spark.indexer import build_index
    from voyagr_spark.search import search

    pdf = generate_corpus(80, seed=13)
    idx = build_index(spark, spark.createDataFrame(pdf), str(tmp_path / "i"),
                      num_segments=2)
    before = [r["doc_id"] for r in
              search(idx, "file", k=5, use_cache=True).collect()]
    assert before
    idx.delete_docs(before[:1])  # bumps delete_epoch -> new version key
    after = [r["doc_id"] for r in
             search(idx, "file", k=5, use_cache=True).collect()]
    assert before[0] not in after
