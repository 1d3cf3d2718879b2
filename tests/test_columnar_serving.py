"""Columnar serving fast path (search._columnar_topk): eligible term/AND/OR
queries answered from the pinned decoded cache with NO Python stage and NO
per-query exchange, bit-identical to the Pandas scorers.

Contract mirrors test_pinned_searcher: the fast path changes ONLY the
physical plan — ids and float32 scores stay exact; exact phrases have
their own columnar path (_columnar_phrase_topk) over the cache's pos
arrays; ineligible shapes (sloppy phrase, spans, multi-term, non-BM25,
tombstones) still route to the Pandas path; unpin restores the cold path.
"""

import numpy as np
import pytest

from voyagr_spark.search import search


def _rows(df):
    return [(int(r["doc_id"]), np.float32(r["score"]).tobytes())
            for r in df.collect()]


def _final_plan(df) -> str:
    df.collect()
    return df._jdf.queryExecution().executedPlan().toString()


def _gen(seed=11, n=80):
    rng = np.random.default_rng(seed)
    head = ["file", "handle", "parse", "tree", "node", "query", "index"]
    tail = ["zzqx", "file", "handle"]

    def pick(pool):
        return pool[int(rng.integers(0, len(pool)))]

    out = []
    for _ in range(n):
        kind = int(rng.integers(0, 6))
        if kind == 0:
            out.append(pick(head + tail))
        elif kind == 1:
            out.append(f"{pick(head)} AND {pick(head + tail)}")
        elif kind == 2:
            out.append(" OR ".join(
                pick(head + tail) for _ in range(int(rng.integers(2, 5)))))
        elif kind == 3:
            out.append(f"{pick(head)} AND NOT {pick(head)}")
        elif kind == 4:
            out.append(f"{pick(head)}^{int(rng.integers(1, 4))} OR {pick(head)}")
        else:
            terms = [pick(head) for _ in range(3)]
            out.append("(" + " OR ".join(terms) + f") AND {pick(head)}")
    return out


@pytest.fixture(scope="module")
def cold_and_pinned(built_index):
    qs = _gen()
    cold = {q: _rows(search(built_index, q, k=10)) for q in qs}
    built_index.pin()
    yield built_index, qs, cold
    built_index.unpin()


def test_randomized_parity_bit_exact(cold_and_pinned):
    idx, qs, cold = cold_and_pinned
    bad = [q for q in qs if _rows(search(idx, q, k=10)) != cold[q]]
    assert not bad, bad


def test_fast_path_plan_is_python_free(cold_and_pinned):
    idx, _, _ = cold_and_pinned
    for q in ("file", "file AND handle", "file OR handle OR parse",
              "file AND NOT handle"):
        plan = _final_plan(search(idx, q, k=10))
        final = plan.split("== Initial Plan ==")[0]
        above = final.split("InMemoryRelation")[0]
        assert "Pandas" not in above and "Python" not in above, (q, above)
        assert "Exchange" not in above, (q, above)
        assert "TakeOrderedAndProject" in above, (q, above)


def test_ineligible_shapes_still_pandas(cold_and_pinned):
    idx, _, _ = cold_and_pinned
    # sloppy phrase (slop>0) and regex-refined multi-term rewrites stay on
    # the Pandas path; exact phrases and pure-range rewrites (fil*) are
    # columnar since their fast paths landed
    for q in ('"parse tree"~2', "f?le"):
        plan = _final_plan(search(idx, q, k=10))
        final = plan.split("== Initial Plan ==")[0]
        assert "FlatMapGroupsInPandas" in final, q


CONSTS = ("fil*", "[file TO index]", "{file TO parse}", "zzq*")


def test_const_multiterm_parity_bit_exact(cold_and_pinned):
    """Prefix / term-range rewrites on the columnar path: constant-score
    doc sets identical to the Pandas ConstScoreMulti scorer."""
    idx, _, _ = cold_and_pinned
    idx.unpin()
    try:
        cold = {q: _rows(search(idx, q, k=10)) for q in CONSTS}
    finally:
        idx.pin()
    for q in CONSTS:
        assert _rows(search(idx, q, k=10)) == cold[q], q
    assert any(cold[q] for q in CONSTS)


def test_const_multiterm_plan_is_python_free(cold_and_pinned):
    idx, _, _ = cold_and_pinned
    plan = _final_plan(search(idx, "fil*", k=10))
    final = plan.split("== Initial Plan ==")[0]
    above = final.split("InMemoryRelation")[0]
    assert "Pandas" not in above and "Python" not in above, above
    assert "Exchange" not in above, above
    assert "TakeOrderedAndProject" in above, above


PHRASES = (
    '"parse query tree"', '"file handle"', '"query parse"', '"file file"',
    '"tree node"^2', '"handle parse file"', '"zzqx file"',
)


def test_phrase_parity_bit_exact(cold_and_pinned):
    """Exact phrases on the columnar path: ids and float32 scores identical
    to the Pandas two-phase scorer, including repeated-term phrases,
    boosts, and empty results."""
    idx, _, _ = cold_and_pinned
    idx.unpin()
    try:
        cold = {q: _rows(search(idx, q, k=10)) for q in PHRASES}
    finally:
        idx.pin()
    for q in PHRASES:
        assert _rows(search(idx, q, k=10)) == cold[q], q
    assert any(cold[q] for q in PHRASES)  # non-degenerate


def test_phrase_fast_path_plan_is_python_free(cold_and_pinned):
    idx, _, _ = cold_and_pinned
    plan = _final_plan(search(idx, '"file handle"', k=10))
    final = plan.split("== Initial Plan ==")[0]
    above = final.split("InMemoryRelation")[0]
    assert "Pandas" not in above and "Python" not in above, above
    assert "Exchange" not in above, above
    assert "TakeOrderedAndProject" in above, above


def test_phrase_after_paging_parity(cold_and_pinned):
    idx, _, _ = cold_and_pinned
    first = search(idx, '"file handle"', k=3).collect()
    if not first:
        pytest.skip("corpus has no 'file handle' bigram")
    after = (float(first[-1]["score"]), int(first[-1]["doc_id"]))
    fast = _rows(search(idx, '"file handle"', k=5, after=after))
    idx.unpin()
    try:
        cold = _rows(search(idx, '"file handle"', k=5, after=after))
    finally:
        idx.pin()
    assert fast == cold


MIXES = (
    "+file handle", "+file +parse handle tree", "+file handle -node",
    "+file zzqx", "+zzqxmissing handle",
)


def _dismaxes():
    from voyagr_spark.parser import DisjunctionMaxQuery, TermQuery

    return [
        DisjunctionMaxQuery((TermQuery("file"), TermQuery("handle")), 0.0),
        DisjunctionMaxQuery((TermQuery("file"), TermQuery("handle")), 0.3),
        DisjunctionMaxQuery(
            (TermQuery("file", 2.0), TermQuery("parse"), TermQuery("tree")),
            1.0, boost=1.5),
        DisjunctionMaxQuery((TermQuery("file"),), 0.7),
        DisjunctionMaxQuery((TermQuery("zzqxmissing"), TermQuery("file")),
                            0.5),
    ]


def test_mix_parity_bit_exact(cold_and_pinned):
    """MUST+SHOULD mixes on the columnar path: ids and float32 scores
    identical to the Pandas ReqOptSum scorer, incl. MUST_NOT and
    absent-term edge cases."""
    idx, _, _ = cold_and_pinned
    idx.unpin()
    try:
        cold = {q: _rows(search(idx, q, k=10)) for q in MIXES}
    finally:
        idx.pin()
    for q in MIXES:
        assert _rows(search(idx, q, k=10)) == cold[q], q
    assert any(cold[q] for q in MIXES)


def test_dismax_parity_bit_exact(cold_and_pinned):
    idx, _, _ = cold_and_pinned
    dqs = _dismaxes()
    idx.unpin()
    try:
        cold = [_rows(search(idx, q, k=10)) for q in dqs]
    finally:
        idx.pin()
    for q, c in zip(dqs, cold):
        assert _rows(search(idx, q, k=10)) == c, q
    assert any(cold)


def test_mix_dismax_plan_is_python_free(cold_and_pinned):
    idx, _, _ = cold_and_pinned
    for q in ("+file handle -node", _dismaxes()[1]):
        plan = _final_plan(search(idx, q, k=10))
        final = plan.split("== Initial Plan ==")[0]
        above = final.split("InMemoryRelation")[0]
        assert "Pandas" not in above and "Python" not in above, (q, above)
        assert "Exchange" not in above, (q, above)
        assert "TakeOrderedAndProject" in above, (q, above)


def _many_rows(df):
    return sorted(
        (r["query_id"], int(r["doc_id"]), np.float32(r["score"]).tobytes())
        for r in df.collect()
    )


def test_search_many_columnar_parity(cold_and_pinned):
    """All-eligible batches run as ONE Python-free plan: rows bit-identical
    to the Pandas batch path."""
    from voyagr_spark.search import search_many

    idx, _, _ = cold_and_pinned
    batch = {
        "q1": "file", "q2": "file AND handle", "q3": "file OR parse OR tree",
        "q4": "+file handle", "q5": "file AND NOT node", "q6": "zzqxmissing",
        "q8": '"file handle"',  # exact phrase rides its own pivot
    }
    batch["q7"] = _dismaxes()[1]
    idx.unpin()
    try:
        cold = _many_rows(search_many(idx, batch, k=5))
    finally:
        idx.pin()
    fast_df = search_many(idx, batch, k=5, columnar=True)
    assert _many_rows(fast_df) == cold
    assert cold  # non-degenerate
    plan = _final_plan(fast_df)
    # the pin-time decode (MapInPandas) legitimately appears INSIDE the
    # cached relation's lineage; the per-query plan above it must be
    # Python-free
    above = plan.split("== Initial Plan ==")[0].split("InMemoryRelation")[0]
    assert "Pandas" not in above and "Python" not in above, above


def test_search_many_mixed_batch_falls_back(cold_and_pinned):
    from voyagr_spark.search import search_many

    idx, _, _ = cold_and_pinned
    batch = {"q1": "file", "q2": '"parse tree"~2'}  # sloppy: ineligible
    idx.unpin()
    try:
        cold = _many_rows(search_many(idx, batch, k=5))
    finally:
        idx.pin()
    df = search_many(idx, batch, k=5, columnar=True)
    assert _many_rows(df) == cold
    assert "FlatMapGroupsInPandas" in _final_plan(df)


def test_pin_without_positions_falls_back(cold_and_pinned):
    """pin(positions=False): leaner cache (no pos arrays) — term/AND/OR
    stay columnar, exact phrases fall back to the Pandas scorer with
    identical results."""
    idx, _, _ = cold_and_pinned
    idx.unpin()
    try:
        cold = _rows(search(idx, '"file handle"', k=10))
        idx.pin(positions=False)
        assert "pos" not in idx.decoded_postings().columns
        assert _rows(search(idx, '"file handle"', k=10)) == cold
        pph = _final_plan(search(idx, '"file handle"', k=10))
        assert "FlatMapGroupsInPandas" in pph.split("== Initial Plan ==")[0]
        tplan = _final_plan(search(idx, "file AND handle", k=10))
        above = tplan.split("== Initial Plan ==")[0].split(
            "InMemoryRelation")[0]
        assert "Pandas" not in above and "Python" not in above
    finally:
        idx.unpin()
        idx.pin()  # restore the module fixture's serving state


def test_after_paging_parity(cold_and_pinned):
    idx, _, _ = cold_and_pinned
    first = search(idx, "file OR handle", k=5).collect()
    after = (float(first[-1]["score"]), int(first[-1]["doc_id"]))
    fast = _rows(search(idx, "file OR handle", k=5, after=after))
    idx.unpin()
    try:
        cold = _rows(search(idx, "file OR handle", k=5, after=after))
    finally:
        idx.pin()
    assert fast == cold and fast


def test_custom_k1_b_parity(cold_and_pinned):
    idx, _, _ = cold_and_pinned
    fast = _rows(search(idx, "file OR handle", k=10, k1=0.9, b=0.4))
    idx.unpin()
    try:
        cold = _rows(search(idx, "file OR handle", k=10, k1=0.9, b=0.4))
    finally:
        idx.pin()
    assert fast == cold
    # b=0 makes the norm cache NaN at byte 0 -> must route to pandas
    from voyagr_spark.search import make_plan, _columnar_clauses
    from voyagr_spark.parser import parse

    plan = make_plan(idx, parse("file"), 10, True, None, b=0.0)
    assert _columnar_clauses(plan) is None


def test_count_parity(cold_and_pinned):
    from voyagr_spark.search import count

    idx, qs, _ = cold_and_pinned
    sample = qs[:20] + ["file AND NOT handle", "zzqx", "file OR zzqx"]
    fast = [count(idx, q) for q in sample]
    idx.unpin()
    try:
        cold = [count(idx, q) for q in sample]
    finally:
        idx.pin()
    assert fast == cold


def test_delete_invalidates_fast_path(spark, corpus_pdf, tmp_path_factory):
    """Tombstones make plan.tombstones non-None -> pandas path, results
    reflect the delete on the still-pinned index."""
    import shutil

    from voyagr_spark.indexer import build_index

    d = tmp_path_factory.mktemp("colsrv_del")
    idx = build_index(
        spark, spark.createDataFrame(corpus_pdf).repartition(4),
        str(d / "i"), num_segments=3)
    idx.pin()
    try:
        before = search(idx, "file", k=5).collect()
        top = int(before[0]["doc_id"])
        idx.delete_docs([top])
        idx.reload_meta()
        got = {int(r["doc_id"]) for r in search(idx, "file", k=5).collect()}
        assert top not in got and got
    finally:
        idx.unpin()
        shutil.rmtree(d, ignore_errors=True)


def test_append_reopen_repins_decoded(spark, corpus_pdf, tmp_path_factory):
    import shutil

    import pandas as pd

    from voyagr_spark.indexer import build_index
    from voyagr_spark.streaming import append_batch

    d = tmp_path_factory.mktemp("colsrv_app")
    idx = build_index(
        spark, spark.createDataFrame(corpus_pdf.iloc[:200]).repartition(4),
        str(d / "i"), num_segments=3)
    idx.pin()
    try:
        append_batch(idx, spark.createDataFrame(corpus_pdf.iloc[200:]))
        idx.reload_meta()
        pinned_rows = _rows(search(idx, "file OR handle", k=10))
        idx.unpin()
        cold_rows = _rows(search(idx, "file OR handle", k=10))
        assert pinned_rows == cold_rows
    finally:
        idx.unpin()
        shutil.rmtree(d, ignore_errors=True)


def test_msm_mix_parity_and_python_free(cold_and_pinned):
    """MUST+SHOULD with msm>0: msm FILTERS in a mix (ConjunctionScorer
    (req, opt), BooleanWeight.java:326-342 — r5 semantics fix); columnar
    rows identical to the Pandas scorer, and a Python-free plan."""
    from voyagr_spark.parser import MUST, SHOULD, BooleanQuery, TermQuery

    idx, _, _ = cold_and_pinned
    q = BooleanQuery(
        clauses=((MUST, TermQuery("file")), (SHOULD, TermQuery("handle")),
                 (SHOULD, TermQuery("parse"))),
        min_should_match=1,
    )
    idx.unpin()
    try:
        cold = _rows(search(idx, q, k=10))
    finally:
        idx.pin()
    assert cold
    assert _rows(search(idx, q, k=10)) == cold
    plan = _final_plan(search(idx, q, k=10))
    above = plan.split("== Initial Plan ==")[0].split("InMemoryRelation")[0]
    assert "Pandas" not in above and "Python" not in above


def test_scores_full_matchset_columnar(cold_and_pinned):
    """scores() — the /select filter-then-rank surface — rides the
    columnar path when eligible: full match set bit-identical to the
    Pandas path, zero Python stages, zero per-query exchange."""
    from voyagr_spark.search import scores

    idx, _, _ = cold_and_pinned
    for q in ("file", "file AND handle", "file OR handle OR parse",
              "+file handle -node"):
        idx.unpin()
        try:
            cold = sorted(_rows(scores(idx, q)))
        finally:
            idx.pin()
        got = sorted(_rows(scores(idx, q)))
        assert cold and got == cold, q
        plan = _final_plan(scores(idx, q))
        above = plan.split("== Initial Plan ==")[0].split("InMemoryRelation")[0]
        assert "Pandas" not in above and "Python" not in above, q
        assert "Exchange" not in above, q


def test_count_mix_matches_pandas(cold_and_pinned):
    """count() on MUST+SHOULD shapes: the columnar count gates on the
    full MUST prefix, plus — when msm>0 — on >= msm SHOULD hits (the r5
    mix-filters semantics); with msm=0 optionals score but never filter
    (r4 review fix: SHOULD hits used to count toward the MUST
    requirement, so a doc matching only the optional term was counted)."""
    from voyagr_spark.parser import MUST, SHOULD, BooleanQuery, TermQuery
    from voyagr_spark.search import count

    idx, _, _ = cold_and_pinned
    qs = [
        BooleanQuery(((MUST, TermQuery("handle")),
                      (SHOULD, TermQuery("file"))), min_should_match=1),
        BooleanQuery(((MUST, TermQuery("zzqxabsentterm")),
                      (SHOULD, TermQuery("file"))), min_should_match=1),
        BooleanQuery(((MUST, TermQuery("file")), (MUST, TermQuery("handle")),
                      (SHOULD, TermQuery("parse")))),
        BooleanQuery(((MUST, TermQuery("file")),
                      (SHOULD, TermQuery("handle")),
                      (SHOULD, TermQuery("parse")))),
    ]
    idx.unpin()
    try:
        cold = [count(idx, q) for q in qs]
    finally:
        idx.pin()
    warm = [count(idx, q) for q in qs]
    assert warm == cold, (warm, cold)
    assert cold[1] == 0 and cold[0] > 0
