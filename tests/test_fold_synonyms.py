"""ASCIIFoldingFilter + SynonymFilter analyzer plug-ins.

Folding: Unicode Latin -> nearest ASCII (ASCIIFoldingFilter.java:142-170
foldToASCII semantics via NFKD + the non-decomposable special table).
Synonyms: extra terms injected at the SAME position (posinc 0,
SynonymFilter.java:48-79); norm length discounts overlaps
(discountOverlaps=true, BM25Similarity.java:111); the classic parser turns
several-tokens-at-one-position into a SHOULD disjunction
(QueryParserBase.getFieldQuery:470-540) and refuses synonym phrases
(MultiPhraseQuery unsupported, documented)."""

import hashlib
import shutil

import numpy as np
import pandas as pd
import pytest

from voyagr_spark.analysis import Analyzer, fold_to_ascii
from voyagr_spark.parser import SHOULD, BooleanQuery, TermQuery, parse
from voyagr_spark.search import search

FOLD = Analyzer(fold_ascii=True)
SYN = Analyzer(synonyms={"quick": ("fast",), "jumps": ("leaps", "hops")})


# -- folding ------------------------------------------------------------------


@pytest.mark.parametrize(
    "raw,folded",
    [
        ("café", "cafe"),
        ("Über", "Uber"),
        ("straße", "strasse"),
        ("œuvre", "oeuvre"),
        ("łódź", "lodz"),
        ("Ærø", "AEro"),
        ("naïve", "naive"),
        ("señor", "senor"),
        ("plain", "plain"),  # ASCII fast path
        ("Ｆｕｌｌ", "Full"),  # fullwidth compatibility forms
        ("中文", "中文"),  # unmapped chars pass through (reference behavior)
    ],
)
def test_fold_to_ascii(raw, folded):
    assert fold_to_ascii(raw) == folded


def test_fold_before_stop_filter():
    # 'thé' folds to 'the' and is then stop-removed; position hole remains
    terms, pos = FOLD.analyze_text("thé café wins")
    assert terms == ["cafe", "wins"]
    assert pos == [1, 2]


def test_fold_flat_matches_text():
    texts = pd.Series(["thé café wins", "über straße", "plain ascii"])
    t, p, d, lens = FOLD.analyze_flat(texts)
    for i, s in enumerate(texts):
        want_t, want_p = FOLD.analyze_text(s)
        got = [(tt, pp) for tt, pp, dd in zip(t, p, d) if dd == i]
        assert got == list(zip(want_t, want_p)), s
    assert list(lens) == [2, 2, 2]


# -- synonyms ------------------------------------------------------------------


def test_synonym_injection_same_position():
    terms, pos = SYN.analyze_text("quick brown jumps")
    assert terms == ["quick", "fast", "brown", "jumps", "leaps", "hops"]
    assert pos == [0, 0, 1, 2, 2, 2]


def test_synonym_flat_discounts_overlaps():
    texts = pd.Series(["quick brown jumps", "zero synonyms here"])
    t, p, d, lens = SYN.analyze_flat(texts)
    # doclen counts only original surviving tokens (discountOverlaps)
    assert list(lens) == [3, 3]
    got0 = sorted((tt, pp) for tt, pp, dd in zip(t, p, d) if dd == 0)
    assert got0 == sorted(
        [("quick", 0), ("fast", 0), ("brown", 1),
         ("jumps", 2), ("leaps", 2), ("hops", 2)]
    )
    # stream stays (doc asc, pos asc) — the invert kernel contract
    order = np.lexsort((p, d))
    assert (order == np.arange(order.size)).all()


def test_dict_roundtrip():
    d = SYN.to_dict()
    back = Analyzer.from_dict(d)
    assert back == SYN
    d2 = FOLD.to_dict()
    assert Analyzer.from_dict(d2) == FOLD


def test_parser_same_position_is_or():
    q = parse("quick", analyzer=SYN)
    assert q == BooleanQuery(
        ((SHOULD, TermQuery("quick")), (SHOULD, TermQuery("fast")))
    )


def test_parser_synonym_phrase_is_multiphrase():
    from voyagr_spark.parser import MultiPhraseQuery

    q = parse('"quick brown"', analyzer=SYN)
    assert q == MultiPhraseQuery((("quick", "fast"), ("brown",)), (0, 1), 0)


def test_synonym_phrase_end_to_end(spark, syn_index):
    """'"quick sort"' through the synonym analyzer matches via either the
    literal token or the injected one; engine == oracle bit-exact, and the
    sloppy form agrees too."""
    idx, oracle, _ = syn_index
    for qtext in ['"quick sort"', '"fast horse"', '"dog leaps"~1',
                  '"quick beats"~2']:
        got = [
            (r["doc_id"], np.float32(r["score"]))
            for r in search(idx, qtext, k=30).collect()
        ]
        want = [(d, np.float32(s)) for d, s in oracle.search(
            parse(qtext, analyzer=SYN), 30)]
        assert got == want, qtext
    # the injected-token phrase matches where only the source token occurs
    got = search(idx, '"fast sort"', k=30).count()
    assert got > 0


def test_multiphrase_union_dedupes(spark, syn_index):
    """Two members sharing positions must count each alignment once
    (UnionPostingsEnum dedupes)."""
    from voyagr_spark.parser import MultiPhraseQuery

    idx, oracle, _ = syn_index
    q = MultiPhraseQuery((("quick", "quick"), ("sort",)), (0, 1), 0)
    got = [(r["doc_id"], np.float32(r["score"]))
           for r in search(idx, q, k=30).collect()]
    # same docs as the plain phrase; score differs only via the idf fold
    plain = {r["doc_id"] for r in search(idx, '"quick sort"', k=30).collect()}
    assert {d for d, _ in got} == plain
    want = [(d, np.float32(s)) for d, s in oracle.search(q, 30)]
    assert got == want


# -- end to end ----------------------------------------------------------------


def _corpus() -> pd.DataFrame:
    texts = [
        "the quick brown fox jumps over lazy dog",
        "a fast horse runs past the fence",
        "quick sort beats bubble sort",
        "slow turtle walks under the fence",
        "the dog leaps over the gate",
    ] * 8
    rows = []
    for i, t in enumerate(texts):
        rows.append(
            {
                "repo": f"org{i % 3}/r",
                "path": f"src/f{i}.txt",
                "commit": hashlib.sha1(str(i).encode()).hexdigest(),
                "lang": "txt",
                "content": t,
            }
        )
    return pd.DataFrame(rows)


@pytest.fixture(scope="module")
def syn_index(spark, tmp_path_factory):
    from voyagr_spark.indexer import build_index
    from voyagr_spark.oracle import OracleIndex

    pdf = _corpus()
    d = tmp_path_factory.mktemp("syn_idx")
    idx = build_index(
        spark, spark.createDataFrame(pdf), str(d), num_segments=2,
        analyzer=SYN,
    )
    oracle = OracleIndex(pdf, analyzer=SYN)
    yield idx, oracle, str(d)
    shutil.rmtree(d, ignore_errors=True)


def test_synonym_search_end_to_end(spark, syn_index):
    idx, oracle, _ = syn_index
    # 'fast' matches both literal-fast docs AND quick docs (injected)
    for qtext in ["fast", "leaps", "fast AND fence", "hops OR turtle"]:
        got = [
            (r["doc_id"], np.float32(r["score"]))
            for r in search(idx, qtext, k=30).collect()
        ]
        want = [(d, np.float32(s)) for d, s in oracle.search(
            parse(qtext, analyzer=SYN), 30)]
        assert got == want, qtext
    fast_docs = {r["doc_id"] for r in search(idx, "fast", k=40).collect()}
    quick_docs = {r["doc_id"] for r in search(
        idx, TermQuery("quick"), k=40).collect()}
    assert quick_docs <= fast_docs and len(fast_docs) > len(quick_docs)


def test_synonym_query_side_expansion(spark, syn_index):
    idx, oracle, _ = syn_index
    # parsing 'quick' through the index's persisted analyzer ORs the synonym
    q = parse("quick", analyzer=idx.analyzer)
    got = [
        (r["doc_id"], np.float32(r["score"]))
        for r in search(idx, "quick", k=40).collect()
    ]
    want = [(d, np.float32(s)) for d, s in oracle.search(q, 40)]
    assert got == want


def test_fold_index_reopen_persists(spark, tmp_path_factory):
    from voyagr_spark.indexer import Index, build_index

    pdf = _corpus().assign(
        content=lambda f: f.content.str.replace("fast", "fást")
    )
    d = tmp_path_factory.mktemp("fold_idx")
    idx = build_index(
        spark, spark.createDataFrame(pdf), str(d), num_segments=2,
        analyzer=Analyzer(fold_ascii=True),
    )
    n = search(idx, "fast", k=40).count()
    assert n > 0  # 'fást' indexed as 'fast'
    reopened = Index(spark, str(d))
    assert reopened.analyzer.fold_ascii
    assert search(reopened, "fast", k=40).count() == n
    shutil.rmtree(d, ignore_errors=True)
