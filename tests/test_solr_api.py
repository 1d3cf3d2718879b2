"""Solr /select surface: q + fq + sort + paging vs engine/oracle ground truth."""

import numpy as np
import pytest

from voyagr_spark.search import scores, search
from voyagr_spark.solr_api import solr_select


def test_scores_matches_oracle_all(built_index, oracle_index):
    got = {
        r["doc_id"]: np.float32(r["score"])
        for r in scores(built_index, "file AND handle").collect()
    }
    want = dict(oracle_index.search("file AND handle", k=10**9))
    assert got == {d: np.float32(s) for d, s in want.items()}


def test_select_default_matches_search(built_index):
    sel = solr_select(built_index, "file", rows=10).collect()
    top = search(built_index, "file", k=10).collect()
    assert [r["doc_id"] for r in sel] == [r["doc_id"] for r in top]
    assert all(np.float32(a["score"]) == np.float32(b["score"])
               for a, b in zip(sel, top))


def test_select_fq_filters_before_ranking(built_index):
    all_rows = solr_select(built_index, "file", rows=10**6).collect()
    langs = {r["lang"] for r in all_rows}
    lang = sorted(langs)[0]
    filtered = solr_select(built_index, "file", fq=f"lang:{lang}", rows=10).collect()
    assert filtered and all(r["lang"] == lang for r in filtered)
    # filter-then-rank: the filtered top-10 is the best 10 among that lang,
    # which can include docs outside the unfiltered top-10
    expect = [r["doc_id"] for r in all_rows if r["lang"] == lang][:10]
    assert [r["doc_id"] for r in filtered] == expect


def test_select_paging(built_index):
    page1 = solr_select(built_index, "file", rows=5, start=0).collect()
    page2 = solr_select(built_index, "file", rows=5, start=5).collect()
    full = solr_select(built_index, "file", rows=10).collect()
    assert [r["doc_id"] for r in page1 + page2] == [r["doc_id"] for r in full]


def test_select_fl_and_sort(built_index):
    sel = solr_select(built_index, "file", fl="doc_id,lang", sort="doclen desc",
                      rows=5)
    rows = sel.collect()
    assert rows and set(rows[0].asDict().keys()) == {"doc_id", "lang"}


def test_select_fq_range(built_index):
    rows = solr_select(built_index, "file", fq="doclen:[1 TO 50]",
                       rows=100).collect()
    # range fq applies to docmap doclen; spot-check via docmap join
    dm = {r["doc_id"]: r["doclen"] for r in built_index.docmap().collect()}
    assert all(1 <= dm[r["doc_id"]] <= 50 for r in rows)


def test_select_bad_fq_raises(built_index):
    with pytest.raises(ValueError):
        solr_select(built_index, "file", fq="nosuchfield:x").collect()


def test_select_bad_fl_raises(built_index):
    # unknown fl fields error loudly (never a silent zero-column projection)
    with pytest.raises(ValueError):
        solr_select(built_index, "file", fl="doc_id,nosuchfield")
    with pytest.raises(ValueError):
        solr_select(built_index, "file", fl="nosuchfield")


def test_elevate_pins_censors_and_ranks(spark, built_index):
    """QueryElevationComponent: config order first (even non-matching ids,
    score 0.0), excluded ids censored, the rest by (score desc, doc_id)."""
    from voyagr_spark.search import search
    from voyagr_spark.solr_api import elevate

    base = [(r["doc_id"], r["score"])
            for r in search(built_index, "open", k=12).collect()]
    base_ids = [d for d, _ in base]
    # pick a doc that does NOT match 'open' to prove forced inclusion
    non_match = next(i for i in range(built_index.max_doc)
                     if i not in {d for d, _ in base} and i not in base_ids)
    res = elevate(built_index, "open", [non_match, base_ids[3]],
                  [base_ids[0]], k=10).collect()
    got = [(r["rank"], r["doc_id"], r["score"]) for r in res]
    assert got[0][1] == non_match and got[0][2] == 0.0
    assert got[1][1] == base_ids[3]  # second priority
    rest_ids = [d for _, d, _ in got[2:]]
    assert base_ids[0] not in rest_ids          # censored
    assert non_match not in rest_ids
    # remaining order = base order minus spliced ids
    expect_rest = [d for d in base_ids
                   if d not in (base_ids[0], base_ids[3], non_match)][:8]
    assert rest_ids == expect_rest
    assert [r for r, _, _ in got] == list(range(1, len(got) + 1))


def test_cursor_walk_reproduces_full_order(built_index):
    """CursorMark paging: walking pages of 3 reproduces the full sorted
    result exactly and terminates with a repeated mark (the reference's
    exhaustion contract)."""
    from voyagr_spark.solr_api import CURSOR_MARK_START, cursor_page

    full = solr_select(built_index, "file", sort="doclen desc",
                       rows=10**6).collect()
    want = [r["doc_id"] for r in full]
    got, mark, hops = [], CURSOR_MARK_START, 0
    while True:
        page, nxt = cursor_page(built_index, "file",
                                sort="doclen desc, doc_id asc",
                                rows=3, cursor_mark=mark)
        rows = page.collect()
        if nxt == mark:
            assert not rows
            break
        got.extend(r["doc_id"] for r in rows)
        mark = nxt
        hops += 1
        assert hops < 1000
    assert got == want


def test_cursor_score_sort_matches_search(built_index):
    from voyagr_spark.search import search
    from voyagr_spark.solr_api import cursor_page

    top = search(built_index, "file", k=8).collect()
    p1, m1 = cursor_page(built_index, "file",
                         sort="score desc, doc_id asc", rows=4)
    p2, _ = cursor_page(built_index, "file",
                        sort="score desc, doc_id asc", rows=4,
                        cursor_mark=m1)
    got = p1.collect() + p2.collect()
    assert [r["doc_id"] for r in got] == [r["doc_id"] for r in top]
    assert all(np.float32(a["score"]) == np.float32(b["score"])
               for a, b in zip(got, top))


def test_cursor_requires_unique_key_sort(built_index):
    from voyagr_spark.solr_api import cursor_page

    with pytest.raises(ValueError, match="uniqueKey"):
        cursor_page(built_index, "file", sort="doclen desc", rows=3)
    with pytest.raises(ValueError, match="unknown sort field"):
        cursor_page(built_index, "file", sort="nosuch asc, doc_id asc")


# ---------------------------------------------------------------------------
# /export handler (SortingResponseWriter.java)
# ---------------------------------------------------------------------------


def test_export_full_sorted_match_set(built_index):
    from voyagr_spark.solr_api import export

    got = export(built_index, "file", sort="doclen desc, repo asc",
                 fl="doc_id,repo,doclen").collect()
    # every match, no rows cap
    want_ids = {r["doc_id"] for r in scores(built_index, "file").collect()}
    assert {r["doc_id"] for r in got} == want_ids
    assert len(got) == len(want_ids) > 10
    # globally ordered with doc_id tiebreak
    keys = [(-r["doclen"], r["repo"], r["doc_id"]) for r in got]
    assert keys == sorted(keys)
    assert got[0].asDict().keys() == {"doc_id", "repo", "doclen"}


def test_export_fq_filters(built_index):
    from voyagr_spark.solr_api import export

    base = export(built_index, "file", sort="doc_id asc", fl="doc_id,lang")
    lang = sorted({r["lang"] for r in base.collect()})[0]
    got = export(built_index, "file", sort="doc_id asc", fl="doc_id,lang",
                 fq=f"lang:{lang}").collect()
    assert got and all(r["lang"] == lang for r in got)


def test_export_contract_errors(built_index):
    import pytest

    from voyagr_spark.solr_api import export

    with pytest.raises(ValueError, match="No sort criteria"):
        export(built_index, "file", sort="", fl="doc_id")
    with pytest.raises(ValueError, match="field list"):
        export(built_index, "file", sort="doc_id asc", fl=None)
    with pytest.raises(ValueError, match="Scoring is not"):
        export(built_index, "file", sort="doc_id asc", fl="doc_id,score")
    with pytest.raises(ValueError, match="Scoring is not"):
        export(built_index, "file", sort="score desc", fl="doc_id")
    with pytest.raises(ValueError, match="max of 4 sorts"):
        export(built_index, "file",
               sort="doclen asc, repo asc, lang asc, nchars asc, doc_id asc",
               fl="doc_id")
    with pytest.raises(ValueError, match="unknown sort"):
        export(built_index, "file", sort="bogus asc", fl="doc_id")
    with pytest.raises(ValueError, match="unknown fl"):
        export(built_index, "file", sort="doc_id asc", fl="doc_id,bogus")


# ---------------------------------------------------------------------------
# DuplicateFilter (lucene/sandbox DuplicateFilter.java)
# ---------------------------------------------------------------------------


def test_duplicate_filter_masters(built_index):
    from voyagr_spark.solr_api import duplicate_filter

    dm = {r["doc_id"]: r["lang"]
          for r in built_index.docmap().select("doc_id", "lang").collect()}
    last = {}
    first = {}
    for d in sorted(dm):
        last[dm[d]] = d
        first.setdefault(dm[d], d)
    matches = {r["doc_id"] for r in scores(built_index, "file").collect()}
    got_last = {r["doc_id"] for r in duplicate_filter(
        built_index, "file", "lang", keep="last", k=10**6).collect()}
    assert got_last == matches & set(last.values())
    got_first = {r["doc_id"] for r in duplicate_filter(
        built_index, "file", "lang", keep="first", k=10**6).collect()}
    assert got_first == matches & set(first.values())


def test_duplicate_filter_scores_unchanged(built_index):
    import numpy as np

    from voyagr_spark.solr_api import duplicate_filter

    base = {r["doc_id"]: np.float32(r["score"])
            for r in scores(built_index, "file").collect()}
    for r in duplicate_filter(built_index, "file", "lang",
                              k=10**6).collect():
        assert np.float32(r["score"]) == base[r["doc_id"]]


def test_duplicate_filter_errors(built_index):
    import pytest

    from voyagr_spark.solr_api import duplicate_filter

    with pytest.raises(ValueError, match="keep"):
        duplicate_filter(built_index, "file", "lang", keep="middle")
    with pytest.raises(ValueError, match="unknown field"):
        duplicate_filter(built_index, "file", "bogus")


def test_terms_qparser_set_filter(built_index):
    """{!terms f=lang}en,de == the union of the per-value fq filters."""
    both = {r.doc_id for r in solr_select(
        built_index, "open", fq="{!terms f=lang}python,go", rows=1000
    ).collect()}
    union = set()
    for v in ("python", "go"):
        union |= {r.doc_id for r in solr_select(
            built_index, "open", fq=f"lang:{v}", rows=1000).collect()}
    assert both == union and both


def test_terms_qparser_separator(built_index):
    a = {r.doc_id for r in solr_select(
        built_index, "open", fq="{!terms f=lang separator=|}python|go",
        rows=1000).collect()}
    b = {r.doc_id for r in solr_select(
        built_index, "open", fq="{!terms f=lang}python,go", rows=1000).collect()}
    assert a == b


def test_hash_qparser_partitions_cover_disjointly(built_index):
    """The N {!hash} workers partition the match set: disjoint, and their
    union is exactly the unfiltered result — over a STRING key (Java
    String.hashCode path) and a composite key."""
    base = {r.doc_id for r in solr_select(
        built_index, "open", rows=1000).collect()}
    for keys in ("repo", "repo,path", "doc_id"):
        seen: set = set()
        for w in range(4):
            part = {r.doc_id for r in solr_select(
                built_index, "open",
                fq=f"{{!hash workers=4 worker={w} keys={keys}}}",
                rows=1000).collect()}
            assert not (seen & part), (keys, w)
            seen |= part
        assert seen == base, keys


def test_hash_qparser_string_hash_is_java(spark, built_index):
    """The string-key partition assignment must follow Java
    String.hashCode exactly (BytesHash, HashQParserPlugin.java:292)."""
    rows = built_index.docmap().select("doc_id", "repo").collect()

    def jhash(s):
        h = 0
        for ch in s:
            h = (h * 31 + ord(ch)) % (1 << 32)
        return h

    want = {r.doc_id for r in rows if (jhash(r.repo) % (1 << 31)) % 3 == 2}
    got = {r.doc_id for r in solr_select(
        built_index, "*:*" if False else "open",
        fq="{!hash workers=3 worker=2 keys=repo}", rows=10000).collect()}
    base = {r.doc_id for r in solr_select(
        built_index, "open", rows=10000).collect()}
    assert got == (want & base)


def test_qparser_errors(built_index):
    with pytest.raises(ValueError, match="unknown fq field"):
        solr_select(built_index, "open", fq="{!terms f=nope}x")
    with pytest.raises(ValueError, match="unsupported fq query parser"):
        solr_select(built_index, "open", fq="{!graph from=a to=b}x")
    with pytest.raises(ValueError, match="requires keys"):
        solr_select(built_index, "open", fq="{!hash workers=2 worker=0}")


def test_collapse_one_head_per_group(built_index):
    rows = solr_select(built_index, "open", fq="{!collapse field=lang}",
                       rows=100).collect()
    langs = [r.lang for r in rows]
    assert len(langs) == len(set(langs)) and langs
    # each head is that group's best (score desc, doc_id asc)
    full = solr_select(built_index, "open", rows=10000).collect()
    best = {}
    for r in sorted(full, key=lambda r: (-r.score, r.doc_id)):
        best.setdefault(r.lang, r.doc_id)
    assert {r.lang: r.doc_id for r in rows} == {
        lang: best[lang] for lang in langs}


def test_collapse_min_selector(built_index):
    fl = ["doc_id", "score", "lang", "doclen"]
    rows = solr_select(built_index, "open",
                       fq="{!collapse field=lang min=doclen}",
                       fl=fl, rows=100).collect()
    full = solr_select(built_index, "open", fl=fl, rows=10000).collect()
    want = {}
    for r in sorted(full, key=lambda r: (r.doclen, -r.score, r.doc_id)):
        want.setdefault(r.lang, r.doc_id)
    assert {r.lang: r.doc_id for r in rows} == want
    rows_max = solr_select(built_index, "open",
                           fq="{!collapse field=lang max=doclen}",
                           fl=fl, rows=100).collect()
    want_max = {}
    for r in sorted(full, key=lambda r: (-r.doclen, -r.score, r.doc_id)):
        want_max.setdefault(r.lang, r.doc_id)
    assert {r.lang: r.doc_id for r in rows_max} == want_max


def test_frange_filters_by_function_value(built_index):
    rows = solr_select(
        built_index, "open",
        fq="{!frange l=0.8 u=0.95}recip(doclen,1,1000,1000)",
        fl=["doc_id", "doclen"], rows=10000).collect()
    assert rows
    for r in rows:
        v = 1000.0 / (r.doclen + 1000.0)
        assert 0.8 <= v <= 0.95
    # exclusive bounds
    excl = solr_select(
        built_index, "open",
        fq="{!frange l=0.8 u=0.95 incl=false incu=false}"
           "recip(doclen,1,1000,1000)",
        fl=["doc_id", "doclen"], rows=10000).collect()
    assert {r.doc_id for r in excl} <= {r.doc_id for r in rows}


def test_collapse_frange_errors(built_index):
    with pytest.raises(ValueError, match="unknown collapse field"):
        solr_select(built_index, "open", fq="{!collapse field=nope}")
    with pytest.raises(ValueError, match="at most one"):
        solr_select(built_index, "open",
                    fq=["{!collapse field=lang}", "{!collapse field=repo}"])
    with pytest.raises(ValueError, match="requires l= and/or u="):
        solr_select(built_index, "open", fq="{!frange}doclen")
    with pytest.raises(ValueError, match="unknown frange field"):
        solr_select(built_index, "open", fq="{!frange l=0}nope")
