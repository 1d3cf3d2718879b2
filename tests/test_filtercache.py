"""filterCache: version-keyed fq -> DocSet reuse across different q.

Reference: solr/core/src/java/org/apache/solr/search/SolrIndexSearcher.java
:128-129 (filterCache) — fq DocSets computed once per searcher, shared by
every query that sends the same fq, dropped on searcher reopen.
"""

import pandas as pd
import pytest

from voyagr_spark import solr_api as SA
from voyagr_spark.corpus import generate_corpus
from voyagr_spark.indexer import build_index
from voyagr_spark.solr_api import (
    apply_fq,
    clear_filter_cache,
    facet_domain,
    filter_docset,
    solr_select,
)
from voyagr_spark.streaming import append_batch


def _stats(idx):
    return dict(idx._fq_cache_stats)


def test_repeated_fq_is_a_hit_with_identical_results(built_index):
    # r5: field-predicate fqs always push down and skip the cache (the
    # predicate rides an existing scan — measured 2.2x faster); QUERY fqs
    # are what the cache serves, and that is the Solr sharing contract
    # exercised here
    clear_filter_cache(built_index)
    fq = "open AND file"
    r1 = solr_select(built_index, "file", fq=fq, rows=10).collect()
    s1 = _stats(built_index)
    assert s1["misses"] == 1
    # DIFFERENT q, same fq: still a hit — the Solr sharing contract
    solr_select(built_index, "open", fq=fq, rows=10).collect()
    r2 = solr_select(built_index, "file", fq=fq, rows=10).collect()
    s2 = _stats(built_index)
    assert s2["misses"] == 1 and s2["hits"] == s1["hits"] + 2
    assert [(r["doc_id"], r["score"]) for r in r1] == [
        (r["doc_id"], r["score"]) for r in r2
    ]


def test_hit_recomputes_nothing(built_index, monkeypatch):
    """On a hit neither the fq predicate nor the docmap is touched."""
    clear_filter_cache(built_index)
    fq = "doclen:[10 TO 100000]"
    ds0, small = filter_docset(built_index, fq)
    n0 = ds0.count()
    assert small  # 300-doc fixture: driver-side tier

    def boom(*a, **k):
        raise AssertionError("recomputed on hit")

    monkeypatch.setattr(SA, "_fq_predicate", boom)
    monkeypatch.setattr(built_index, "docmap", boom, raising=False)
    ds1, _ = filter_docset(built_index, fq)
    assert ds1 is ds0 and ds1.count() == n0  # zero reconstruction jobs


@pytest.mark.parametrize(
    "fq",
    [
        "lang:python",
        "path:src*",
        "doclen:[20 TO 200]",
        "{!terms f=lang}python,java",
    ],
)
def test_semi_join_equals_pushed_predicate(built_index, fq):
    clear_filter_cache(built_index)
    dm = built_index.docmap()
    want = sorted(
        r["doc_id"]
        for r in dm.filter(SA._fq_predicate(fq)).select("doc_id").collect()
    )
    got = sorted(
        r["doc_id"] for r in apply_fq(built_index, dm, fq).select("doc_id").collect()
    )
    assert got == want
    # cache=false keeps the plain predicate path and the same rows
    raw = sorted(
        r["doc_id"]
        for r in apply_fq(built_index, dm, fq, use_cache=False)
        .select("doc_id")
        .collect()
    )
    assert raw == want


def test_append_invalidates_and_sweeps(spark, tmp_path_factory):
    pdf = generate_corpus(80, seed=11)
    d = tmp_path_factory.mktemp("fq_idx")
    idx = build_index(spark, spark.createDataFrame(pdf.iloc[:60]), str(d),
                      num_segments=2)
    fq = "doclen:[1 TO 100000]"
    ds0, _ = filter_docset(idx, fq)
    n0 = ds0.count()
    filter_docset(idx, "lang:python")  # a second entry, same version
    assert _stats(idx)["misses"] == 2
    append_batch(idx, spark.createDataFrame(pdf.iloc[60:]), num_partitions=2)
    idx.reload_meta()
    ds1, _ = filter_docset(idx, fq)  # searcher reopened -> recompute
    s = _stats(idx)
    assert s["misses"] == 3
    assert ds1.count() == n0 + 20  # new docs visible to the fresh DocSet
    # EVERY stale-version entry is swept on access, not just the requested
    # key — the untouched lang:python entry must be gone too
    assert set(idx._fq_cache) == {fq}


def test_cache_false_prefix_bypasses(built_index):
    """Solr's {!cache=false} local param: per-request cache opt-out
    (exercised on a QUERY fq — field predicates never cache since r5)."""
    clear_filter_cache(built_index)
    rows = solr_select(
        built_index, "file", fq="{!cache=false}open AND file", rows=10
    ).collect()
    assert rows
    stats = getattr(built_index, "_fq_cache_stats", None)
    assert stats in (None, {"hits": 0, "misses": 0, "evictions": 0})
    assert not getattr(built_index, "_fq_cache", None)  # nothing cached
    # parity with the cached form
    cached = solr_select(built_index, "file", fq="open AND file",
                         rows=10).collect()
    assert [(r["doc_id"], r["score"]) for r in rows] == [
        (r["doc_id"], r["score"]) for r in cached
    ]


def test_large_tier_persists_and_evicts(built_index, monkeypatch):
    monkeypatch.setattr(SA, "FILTER_CACHE_SMALL_ROWS", 5)
    monkeypatch.setattr(SA, "FILTER_CACHE_MAX", 1)
    clear_filter_cache(built_index)
    fq = "doclen:[1 TO 100000]"  # matches ~all 300 docs > 5
    ds, small = filter_docset(built_index, fq)
    assert not small
    assert ds.storageLevel.useMemory  # persisted executor-side tier
    want = sorted(r["doc_id"] for r in built_index.docmap()
                  .filter(SA._fq_predicate(fq)).select("doc_id").collect())
    assert sorted(r["doc_id"] for r in ds.collect()) == want
    # a second fq evicts the first (MAX=1) and unpersists its storage
    filter_docset(built_index, "lang:python")
    assert _stats(built_index)["evictions"] == 1
    assert not ds.storageLevel.useMemory
    clear_filter_cache(built_index)


def test_facet_domain_consults_cache(built_index):
    clear_filter_cache(built_index)
    from voyagr_spark.jsonfacet import json_facet

    fq = "open AND file"  # QUERY fq: the cacheable DocSet shape
    spec = {"langs": {"type": "terms", "field": "lang", "limit": 3}}
    r1 = json_facet(facet_domain(built_index, "file", fq=fq), spec)
    s1 = _stats(built_index)
    assert s1["misses"] == 1
    r2 = json_facet(facet_domain(built_index, "open", fq=fq), spec)
    assert _stats(built_index)["misses"] == 1  # drill re-used the DocSet
    assert r1["count"] > 0 and r2["count"] > 0
    # parity vs the uncached domain (fq applied as a raw match-set join)
    dm = built_index.docmap().join(
        SA.scores(built_index, "file").select("doc_id"), "doc_id", "semi"
    ).join(SA.scores(built_index, fq).select("doc_id"), "doc_id", "semi")
    assert json_facet(dm, spec) == r1


def test_query_fq_matches_predicate_free_semantics(built_index):
    """fq as a FULL QUERY (r5 surface — Solr: any query is a filter):
    /select with fq='open AND file' equals filtering the scored set by
    the fq query's match set; cached and {!cache=false} bypass agree."""
    import numpy as np

    from voyagr_spark.search import scores, search

    clear_filter_cache(built_index)
    fq = "open AND file"
    got = solr_select(built_index, "parse", fq=fq, rows=10**6).collect()
    allowed = {r["doc_id"] for r in scores(built_index, fq).collect()}
    want = [r for r in search(built_index, "parse", k=10**6)
            .join(built_index.docmap(), "doc_id").collect()
            if r["doc_id"] in allowed]
    assert {r["doc_id"] for r in got} == {r["doc_id"] for r in want}
    gs = {r["doc_id"]: np.float32(r["score"]) for r in got}
    ws = {r["doc_id"]: np.float32(r["score"]) for r in want}
    assert gs == ws  # fq never changes the q scores
    bypass = solr_select(built_index, "parse",
                         fq="{!cache=false}" + fq, rows=10**6).collect()
    assert {r["doc_id"] for r in bypass} == {r["doc_id"] for r in got}


def test_query_fq_rides_the_cache(built_index, monkeypatch):
    """A repeated query-fq is a HIT: the DocSet (a scoring pass to
    recompute) is served from the cache with zero re-evaluation."""
    clear_filter_cache(built_index)
    fq = "open AND file"
    ds0, small = filter_docset(built_index, fq)
    s1 = _stats(built_index)
    assert s1["misses"] == 1
    # poison both evaluation inputs: a hit must touch neither
    def boom(*a, **k):
        raise AssertionError("fq re-evaluated on a cache hit")

    monkeypatch.setattr(built_index, "docmap", boom, raising=False)
    monkeypatch.setattr(built_index, "postings", boom, raising=False)
    ds1, _ = filter_docset(built_index, fq)
    assert _stats(built_index)["hits"] == 1
    assert ds1 is ds0


def test_query_fq_everywhere_consumers(built_index):
    """export / cursor_page / facet_domain accept query fqs too (they all
    route through apply_fq)."""
    from voyagr_spark.solr_api import cursor_page, export, facet_domain

    clear_filter_cache(built_index)
    fq = "open AND file"
    ex = export(built_index, "parse", fl=["doc_id"], sort="doc_id asc",
                fq=fq).collect()
    from voyagr_spark.search import scores

    allowed = {r["doc_id"] for r in scores(built_index, fq).collect()}
    assert ex and {r["doc_id"] for r in ex} <= allowed
    page, _mark = cursor_page(built_index, "parse", sort="doc_id asc",
                              rows=5, fq=fq)
    assert {r["doc_id"] for r in page.collect()} <= allowed
    dom = facet_domain(built_index, q="parse", fq=fq)
    assert {r["doc_id"] for r in dom.select("doc_id").collect()} <= allowed


def test_unknown_field_fq_still_loud(built_index):
    """`field:value` with an unknown field stays a loud error — it must
    NOT silently fall back to a query parse of 'nofield:x'."""
    with pytest.raises(ValueError, match="unknown fq field"):
        solr_select(built_index, "file", fq="nofield:x", rows=5).collect()


def test_fielded_boolean_fq_is_loud(built_index):
    """'lang:java OR lang:go' must neither bind as the literal equality
    lang == 'java OR lang:go' (silent zero rows) nor fall into the
    query-fq parse (the engine has no fielded query syntax): loud."""
    with pytest.raises(ValueError, match="fielded boolean"):
        solr_select(built_index, "file", fq="lang:java OR lang:go",
                    rows=5).collect()
    # the supported union spelling still works
    rows = solr_select(built_index, "file",
                       fq="{!terms f=lang}python,java", rows=5).collect()
    assert isinstance(rows, list)


def test_fq_space_values_and_tab_bool_are_handled(built_index):
    """Plain spaces in a field value stay LEGAL (equality/prefix on a
    path containing a space); boolean structure is loud even with tabs
    (the whitespace-class guard); lenient dispatch still routes query
    fqs."""
    # no doc matches, but it must compile to a plain equality, not raise
    assert solr_select(built_index, "file", fq="path:my doc.py",
                       rows=5).collect() == []
    assert solr_select(built_index, "file", fq="path:my doc*",
                       rows=5).collect() == []
    with pytest.raises(ValueError, match="fielded boolean"):
        solr_select(built_index, "file", fq="lang:java\tOR\tlang:go",
                    rows=5).collect()
    with pytest.raises(ValueError, match="fielded boolean"):
        solr_select(built_index, "file", fq="lang:java doclen:3",
                    rows=5).collect()
    # ranges with their one interior space still parse
    assert isinstance(solr_select(built_index, "file",
                                  fq="doclen:[10 TO 99999]",
                                  rows=5).collect(), list)
