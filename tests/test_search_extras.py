"""Paging (K4), prefix (P5), DisMax (E12), deletes (S2/S3/E14),
block-max term pruning (K9) — all vs the Python oracle."""

import shutil

import numpy as np
import pytest

from voyagr_spark.corpus import generate_corpus
from voyagr_spark.indexer import Index, build_index
from voyagr_spark.oracle import OracleIndex
from voyagr_spark.parser import DisjunctionMaxQuery, parse
from voyagr_spark.search import count, search


def run(idx, q, k=10, **kw):
    return [(r["doc_id"], r["score"]) for r in search(idx, q, k=k, **kw).collect()]


def test_search_after_paging(built_index, oracle_index):
    page1 = run(built_index, "file", k=5)
    want1 = oracle_index.search("file", 5)
    assert page1 == [(d, s) for d, s in want1]
    cursor = (float(page1[-1][1]), int(page1[-1][0]))
    page2 = run(built_index, "file", k=5, after=cursor)
    want2 = oracle_index.search("file", 5, after=cursor)
    assert page2 == [(d, s) for d, s in want2]
    # pages don't overlap and page2 continues the global ranking
    assert not {d for d, _ in page1} & {d for d, _ in page2}
    assert run(built_index, "file", k=10) == page1 + page2


def test_prefix_query(built_index, oracle_index):
    got = run(built_index, "ident000*", k=1000)
    want = oracle_index.search("ident000*", 1000)
    assert got == [(d, s) for d, s in want]
    assert all(s == np.float32(1.0) for _, s in got)  # constant score
    assert len(got) > 0
    assert run(built_index, "zzznope*", k=10) == []


def test_dismax(built_index, oracle_index):
    q = DisjunctionMaxQuery(
        (parse("open"), parse("merge"), parse("segment")), tie=0.3
    )
    got = run(built_index, q, k=10)
    want = oracle_index.search(q, 10)
    assert got == [(d, s) for d, s in want]


def test_blockmax_term_pruning_rank_neutral(spark, tmp_path):
    """K9 on a corpus big enough for many 128-doc blocks per hot term."""
    pdf = generate_corpus(1200, seed=11)
    idx = build_index(
        spark, spark.createDataFrame(pdf), str(tmp_path / "bm"),
        num_segments=3, docs_per_segment=200,
    )
    oracle = OracleIndex(pdf)
    for term in ["file", "open", "ident0003"]:
        pruned = run(idx, term, k=10)
        full = run(idx, term, k=10, prune=False)
        want = oracle.search(term, 10)
        assert pruned == full == [(d, s) for d, s in want], term
    shutil.rmtree(tmp_path / "bm", ignore_errors=True)


@pytest.fixture()
def deletable(spark, built_index, tmp_path, corpus_pdf):
    d = tmp_path / "del"
    shutil.copytree(built_index.dir, d)
    return Index(spark, str(d)), OracleIndex(corpus_pdf)


def test_deletes_and_merge_reclaim(spark, deletable):
    idx, oracle = deletable
    before = run(idx, "file", k=10)
    victims = [d for d, _ in before[:3]]
    idx.delete_docs(victims)
    oracle.delete(victims)
    got = run(idx, "file", k=10)
    want = oracle.search("file", 10)
    assert got == [(d, s) for d, s in want]
    assert all(d not in victims for d, _ in got)
    # stats stay stale pre-merge (Lucene live-docs semantics): scores equal
    assert count(idx, "file") == oracle.count("file")

    # merge reclaims: postings no longer contain the victims
    from voyagr_spark.merge import merge_segments

    segs = [r["seg"] for r in idx.postings().select("seg").distinct().collect()]
    merge_segments(idx, segs, new_seg=max(segs) + 1)
    from pyspark.sql import functions as F

    assert run(idx, "file", k=10) == got  # results unchanged after reclaim
    remaining = idx.docstats()  # doc rows unaffected; check postings directly
    # decode-free check: no posting row's block_max_doc range admits a victim
    # (full check: search for every victim across all terms comes back empty)
    for v in victims:
        assert all(d != v for d, _ in run(idx, "file", k=100000))


def test_delete_by_keys(spark, deletable, corpus_pdf):
    idx, oracle = deletable
    keys = spark.createDataFrame(corpus_pdf.iloc[:5][["repo", "path", "commit"]])
    n = idx.delete_by_keys(keys)
    assert n == 5
    assert idx.deleted_doc_ids().size == 5


def test_search_by_field_matches_docmap_order(built_index):
    # TopFieldCollector analog: top-k by doclen desc among matches of 'file'
    from voyagr_spark.search import scores, search_by_field

    rows = search_by_field(built_index, "file", "doclen", ascending=False,
                           k=8).collect()
    assert len(rows) == 8
    match_ids = {r["doc_id"] for r in scores(built_index, "file").collect()}
    dm = {r["doc_id"]: r["doclen"] for r in built_index.docmap().collect()}
    expect = sorted(
        ((dm[d], d) for d in match_ids), key=lambda t: (-t[0], t[1])
    )[:8]
    assert [(dm[r["doc_id"]], r["doc_id"]) for r in rows] == expect
    # numeric range fq composes (E15 on the engine surface)
    ranged = search_by_field(
        built_index, "file", "doclen", ascending=True, k=5,
        fq="doclen:[50 TO 200]",
    ).collect()
    assert ranged and all(50 <= dm[r["doc_id"]] <= 200 for r in ranged)


def test_count_df_and_fl_projection(built_index):
    # count_df: the distributed (1-row DataFrame) form of count (P3/K5)
    from voyagr_spark.search import count_df, search_by_field

    df = count_df(built_index, "file")
    assert df.columns == ["n_hits"]
    assert df.collect()[0]["n_hits"] == count(built_index, "file")
    # stopword-only query: zero without a job over postings
    assert count_df(built_index, "the and of").collect()[0]["n_hits"] == 0
    # fl projection rides through search_by_field to solr_select
    rows = search_by_field(
        built_index, "file", "doclen", ascending=False, k=3,
        fl=["doc_id", "score", "doclen"],
    )
    assert rows.columns == ["doc_id", "score", "doclen"]
    assert len(rows.collect()) == 3


def test_boosting_query_demotes_context(built_index, oracle_index):
    """queries/BoostingQuery.java: match-only docs keep their score; docs
    also matching the context multiply by the demote factor."""
    import numpy as np

    from voyagr_spark.parser import BoostingQuery, TermQuery, parse
    from voyagr_spark.search import search

    q = BoostingQuery(TermQuery("open"), TermQuery("file"), demote=0.25)
    got = [(r["doc_id"], np.float32(r["score"]))
           for r in search(built_index, q, k=400).collect()]
    want = [(d, np.float32(s)) for d, s in oracle_index.search(q, 400)]
    assert got == want
    # same doc set as the plain match query (k exceeds the corpus, so the
    # demotion reorders but cannot change membership)
    plain = {r["doc_id"] for r in search(built_index, "open", k=400).collect()}
    assert {d for d, _ in got} == plain
    # context works for composite queries too
    q2 = BoostingQuery(parse("open OR handle"), parse("file AND parse"), 0.1)
    got2 = [(r["doc_id"], np.float32(r["score"]))
            for r in search(built_index, q2, k=40).collect()]
    want2 = [(d, np.float32(s)) for d, s in oracle_index.search(q2, 40)]
    assert got2 == want2


def test_term_vector_matches_direct_analysis(spark, built_index, corpus_pdf):
    from collections import Counter

    from voyagr_spark.analysis import analyze_text
    from voyagr_spark.solr_api import term_vector

    source = spark.createDataFrame(corpus_pdf)
    got = {(r["term"], r["tf"])
           for r in term_vector(built_index, source, 7).collect()}
    # doc 7 = dense rank 7 over (repo, path, commit)
    row = corpus_pdf.sort_values(["repo", "path", "commit"]).iloc[7]
    terms, _ = analyze_text(row["content"])
    assert got == {(t, c) for t, c in Counter(terms).items()}
    # absent doc -> empty frame with the schema intact
    empty = term_vector(built_index, source, 10**9)
    assert empty.columns == ["term", "tf"] and empty.count() == 0


def test_diversified_topk_caps_per_key(spark, built_index, corpus_pdf,
                                       tmp_path_factory):
    """At most max_per_key hits per source in the diversified top-k, and
    the kept hits are each key's best by (score desc, doc_id)."""
    import pandas as pd

    from voyagr_spark.relational import diversified_topk

    pdf = corpus_pdf.sort_values(["repo", "path", "commit"]).reset_index(
        drop=True)
    d = tmp_path_factory.mktemp("divers")
    docs = pd.DataFrame({
        "doc_id": range(len(pdf)), "text": pdf["content"],
        "lang": pdf["lang"], "source": pdf["repo"],
    })
    spark.createDataFrame(docs).write.parquet(str(d / "documents.parquet"))
    rows = diversified_topk(spark, str(d), "open", 2, 10).collect()
    from collections import Counter

    per_key = Counter(r["source"] for r in rows)
    assert rows and max(per_key.values()) <= 2
    scores = [r["score4"] for r in rows]
    assert scores == sorted(scores, reverse=True)


def test_collate_spelling(spark, built_index, corpus_pdf):
    from voyagr_spark.relational import collate_spelling
    from voyagr_spark.search import count

    src = spark.createDataFrame(corpus_pdf)
    row = collate_spelling(built_index, src, "fille AND handle").collect()[0]
    assert row["collation"] == "file AND handle"
    assert row["hits"] == count(built_index, "file AND handle")
    # nothing misspelled -> query unchanged
    row2 = collate_spelling(built_index, src, "file OR handle").collect()[0]
    assert row2["collation"] == "file OR handle"


# ---------------------------------------------------------------------------
# facet.interval parse rules (IntervalFacets.java FacetInterval)
# ---------------------------------------------------------------------------


def test_facet_interval_parse():
    import pytest

    from voyagr_spark.relational import parse_facet_interval as p

    assert p("[1,5]") == ("[1,5]", 1.0, 5.0, False, False)
    assert p("(1,5)") == ("(1,5)", 1.0, 5.0, True, True)
    assert p("[*,5)") == ("[*,5)", None, 5.0, False, True)
    assert p("(1,*]") == ("(1,*]", 1.0, None, True, False)
    for bad in ["", "1,5]", "[1,5", "[1 5]", "[1,2,3]", "[,5]", "[5,1]"]:
        with pytest.raises(ValueError):
            p(bad)


# ---------------------------------------------------------------------------
# QueryRescorer (lucene/core QueryRescorer.java linear combine)
# ---------------------------------------------------------------------------


def test_query_rescore_combine(built_index):
    import numpy as np

    from voyagr_spark.search import query_rescore, scores, search

    first = search(built_index, "file", k=20)
    got = {r["doc_id"]: np.float32(r["score"])
           for r in query_rescore(built_index, first, "merge",
                                  weight=2.0, top_n=10**6).collect()}
    f = {r["doc_id"]: np.float32(r["score"]) for r in first.collect()}
    s = {r["doc_id"]: np.float32(r["score"])
         for r in scores(built_index, "merge").collect()}
    assert set(got) == set(f)  # only first-pass docs, all of them
    for d, v in got.items():
        if d in s:
            want = np.float32(float(f[d]) + 2.0 * float(s[d]))
        else:
            want = f[d]  # non-matching docs keep the first-pass score
        assert v == want, (d, v, want)


def test_query_rescore_topn_cut(built_index):
    from voyagr_spark.search import query_rescore, search

    first = search(built_index, "file", k=20)
    assert query_rescore(built_index, first, "merge", 1.0, top_n=5).count() == 5


def test_sort_rescore(built_index):
    import numpy as np

    from voyagr_spark.search import search, sort_rescore

    first = search(built_index, "file", k=20)
    got = sort_rescore(built_index, first, "doclen", ascending=True,
                       top_n=20).collect()
    f = {r["doc_id"]: np.float32(r["score"]) for r in first.collect()}
    assert {r["doc_id"] for r in got} == set(f)
    keys = [(r["sort_value"], r["doc_id"]) for r in got]
    assert keys == sorted(keys)  # field order with doc_id tiebreak
    for r in got:  # scores carried through unchanged (trackScores=true)
        assert np.float32(r["score"]) == f[r["doc_id"]]


def test_spellcheck_collate(built_index):
    """SpellCheckCollator: corrections splice into the ORIGINAL query,
    only verified (hits>0) collations emit, ranked combos try in order."""
    from voyagr_spark.highlight import spellcheck_collate, suggest
    from voyagr_spark.search import count

    rows = spellcheck_collate(built_index, "opeb AND file",
                              max_collations=1).collect()
    assert len(rows) == 1
    best = suggest(built_index, "opeb", top=1).collect()[0]["term"]
    assert rows[0]["collation"] == f"{best} AND file"
    assert rows[0]["hits"] == count(built_index, f"{best} AND file") > 0
    # a fully-known query needs no collation
    assert spellcheck_collate(built_index, "open AND file").count() == 0
    # unknown term with no suggestions within maxEdits -> empty
    assert spellcheck_collate(
        built_index, "zzqqzzqqzz AND file").count() == 0
    # two misspelled terms: both corrected in one collation
    multi = spellcheck_collate(built_index, "opeb AND filr",
                               max_collations=1, max_tries=8).collect()
    if multi:  # both corrections must be dictionary terms
        dfs = built_index.term_dfs(
            [w.lower() for w in multi[0]["collation"].split()
             if w not in ("AND",)])
        assert all(v > 0 for v in dfs.values())
        assert multi[0]["hits"] > 0
