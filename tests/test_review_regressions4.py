"""Regressions from the round-4 review of solr_api.py / shards.py."""

import shutil

import numpy as np
import pytest
from pyspark.sql import functions as F


@pytest.fixture()
def deleted_index(spark, built_index, tmp_path):
    """Copy of the built index with one doc of a duplicated lang deleted."""
    from voyagr_spark.indexer import Index

    d = tmp_path / "del_idx"
    shutil.copytree(built_index.dir, d)
    idx = Index(spark, str(d))
    return idx


def test_select_multi_clause_sort(built_index):
    """'f desc, doc_id asc' must honor BOTH clauses (the old parser read
    direction 'desc, doc_id asc', fell back to asc, and dropped the
    second clause)."""
    from voyagr_spark.solr_api import solr_select

    rows = solr_select(built_index, "file", sort="doclen desc, doc_id asc",
                       fl="doc_id,doclen", rows=20).collect()
    lens = [r["doclen"] for r in rows]
    assert lens == sorted(lens, reverse=True)
    # malformed direction is loud, not silently ascending
    with pytest.raises(ValueError, match="bad sort direction"):
        solr_select(built_index, "file", sort="doclen descending", rows=5)


def test_frange_fq_works_everywhere(built_index):
    """{!frange} is a plain docmap predicate and must be accepted by every
    fq consumer, not just /select."""
    from voyagr_spark.solr_api import export, solr_select

    fq = "{!frange l=10 u=100000}doclen"
    sel = {r["doc_id"] for r in solr_select(
        built_index, "file", fq=fq, rows=10**6, fl="doc_id").collect()}
    exp = {r["doc_id"] for r in export(
        built_index, "file", sort="doc_id asc", fl="doc_id",
        fq=fq).collect()}
    assert sel == exp and sel


def test_elevate_dedups_and_skips_deleted(deleted_index):
    from voyagr_spark.search import search
    from voyagr_spark.solr_api import elevate

    idx = deleted_index
    victim = int(search(idx, "file", k=1).collect()[0]["doc_id"])
    idx.delete_docs([victim])
    idx.reload_meta()
    # deleted id must not be resurrected by elevation
    out = elevate(idx, "file", elevate_ids=[victim], k=10).collect()
    assert victim not in {int(r["doc_id"]) for r in out}
    # duplicate elevate ids yield ONE row
    live = int(search(idx, "file", k=1).collect()[0]["doc_id"])
    out2 = elevate(idx, "file", elevate_ids=[live, live], k=10).collect()
    assert [int(r["doc_id"]) for r in out2].count(live) == 1
    assert out2[0]["doc_id"] == live


def test_duplicate_filter_and_facet_domain_skip_deleted(deleted_index):
    from voyagr_spark.search import search
    from voyagr_spark.solr_api import duplicate_filter, facet_domain

    idx = deleted_index
    # delete the LAST (keep='last' master) doc of the top hit's lang group
    hits = search(idx, "file", k=100).collect()
    langs = {r["doc_id"]: l for r, l in zip(hits, [None] * len(hits))}
    dm = idx.docmap().select("doc_id", "lang").collect()
    lang_of = {int(r["doc_id"]): r["lang"] for r in dm}
    by_lang = {}
    for r in hits:
        by_lang.setdefault(lang_of[int(r["doc_id"])], []).append(
            int(r["doc_id"]))
    lang, members = next((l, m) for l, m in by_lang.items() if len(m) >= 2)
    group_all = sorted(d for d, lg in lang_of.items() if lg == lang)
    master = group_all[-1]
    idx.delete_docs([master])
    idx.reload_meta()
    out = {int(r["doc_id"])
           for r in duplicate_filter(idx, "file", "lang", keep="last",
                                     k=100).collect()}
    # the group survives under its new (live) master instead of vanishing
    new_master = group_all[-2]
    if new_master in {int(r["doc_id"]) for r in hits}:
        assert new_master in out
    assert master not in out
    # facet_domain *:* counts exclude the deleted doc
    n = facet_domain(idx, None).count()
    assert n == idx.max_doc - 1


def test_split_with_more_shards_than_docs(spark, tmp_path):
    """A shard receiving zero rows must come out valid-and-empty, not
    abort the split with UNABLE_TO_INFER_SCHEMA."""
    from voyagr_spark.corpus import generate_corpus
    from voyagr_spark.indexer import Index, build_index
    from voyagr_spark.shards import split_index

    idx = build_index(spark, spark.createDataFrame(generate_corpus(3, seed=31)),
                      str(tmp_path / "tiny"), num_segments=1)
    outs = [str(tmp_path / f"sh{i}") for i in range(5)]
    split_index(idx, outs)
    total = 0
    for o in outs:
        sh = Index(spark, o)
        total += sh.docmap().count()
    assert total == 3  # every doc landed somewhere; empty shards open fine
