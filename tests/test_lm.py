"""LM similarities (LMDirichlet / LMJelinekMercer) — formula goldens,
engine bit-parity vs an independent recompute, subset validation."""

import sys
from pathlib import Path

import numpy as np
import pytest

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

from voyagr_spark import lm
from voyagr_spark.smallfloat import byte315_to_float


def test_doclen_table_is_inverse_square_of_byte315():
    f = byte315_to_float(np.arange(256, dtype=np.uint8))
    with np.errstate(divide="ignore"):  # byte 0 -> Infinity, as in Java
        want = (np.float32(1.0) / (f * f).astype(np.float32)).astype(
            np.float32
        )
    np.testing.assert_array_equal(lm.DOCLEN_TABLE, want)
    # doclen 16: 1/sqrt(16) = 0.25 is byte315-exact, so the quantized
    # docLen round-trips to exactly 16.0
    from voyagr_spark.smallfloat import encode_norm

    b = int(encode_norm(np.array([16], dtype=np.int64))[0])
    assert lm.DOCLEN_TABLE[b] == np.float32(16.0)


def test_collection_probability_float_chain():
    # (ttf + 1F) / (nft + 1F) — float widen then float divide
    got = lm.collection_probability(99, 9999)
    assert got == np.float32(np.float32(100.0) / np.float32(10000.0))
    assert got.dtype == np.float32


def test_dirichlet_clamps_nonpositive_to_zero():
    # one occurrence in a huge doc: norm part dominates negative
    from voyagr_spark.smallfloat import encode_norm

    b = encode_norm(np.array([10_000_000], dtype=np.int64))
    cp = lm.collection_probability(500, 1000)  # common term
    s = lm.dirichlet_scores(
        np.array([1]), b, cp, np.float32(1.0), np.float32(2000.0)
    )
    assert s[0] == np.float32(0.0)


def test_jm_monotone_in_tf():
    b = np.array([120, 120], dtype=np.uint8)
    s = lm.jm_scores(np.array([1, 5]), b, np.float32(0.001), np.float32(1.0))
    assert s[1] > s[0] > 0


def _lm_oracle_term(oracle, term, kind, param):
    """Independent recompute straight from the reference formulas
    (LMDirichletSimilarity.java:37-42 / LMJelinekMercerSimilarity.java:28-34)."""
    matches = oracle._term_matches(term)
    ttf = sum(matches.values())
    cp = np.float32(
        np.float32(np.float32(ttf) + np.float32(1.0))
        / np.float32(np.float32(oracle.sum_ttf) + np.float32(1.0))
    )
    out = {}
    for d, tf in matches.items():
        dlen = lm.DOCLEN_TABLE[int(oracle.norm_bytes[d])]
        freq = np.float32(tf)
        if kind == "dirichlet":
            mu = np.float32(param)
            a1 = np.float32(
                np.float32(1.0) + np.float32(freq / np.float32(mu * cp))
            )
            a2 = np.float32(mu / np.float32(dlen + mu))
            s = np.float32(np.log(np.float64(a1)) + np.log(np.float64(a2)))
            s = s if s > 0 else np.float32(0.0)
        else:
            lam = np.float32(param)
            a = np.float32(np.float32(1.0) - lam)
            num = np.float32(np.float32(a * freq) / dlen)
            arg = np.float32(
                np.float32(1.0) + np.float32(num / np.float32(lam * cp))
            )
            s = np.float32(np.log(np.float64(arg)))
        out[d] = s
    return out


@pytest.mark.parametrize(
    "sim,kind,param",
    [("lmdirichlet", "dirichlet", 2000.0), ("lmjm", "jm", 0.7)],
)
def test_engine_lm_term_bit_parity(built_index, oracle_index, sim, kind, param):
    from voyagr_spark.search import search

    got = {
        r["doc_id"]: np.float32(r["score"])
        for r in search(built_index, "file", k=10**6, similarity=sim).collect()
    }
    want = _lm_oracle_term(oracle_index, "file", kind, param)
    assert got == want


def test_engine_lmjm_custom_lambda(built_index, oracle_index):
    from voyagr_spark.search import search

    got = {
        r["doc_id"]: np.float32(r["score"])
        for r in search(built_index, "file", k=10**6, similarity="lmjm",
                        sim_param=0.1).collect()
    }
    want = _lm_oracle_term(oracle_index, "file", "jm", 0.1)
    assert got == want


def test_engine_lm_boolean_sum(built_index, oracle_index):
    """Flat OR under LM: plain clause-ordered float32 sum (coord == 1,
    Similarity.java:122 default — SimilarityBase does not override)."""
    from voyagr_spark.search import search

    got = {
        r["doc_id"]: np.float32(r["score"])
        for r in search(built_index, "file OR merge", k=10**6,
                        similarity="lmdirichlet").collect()
    }
    sa = _lm_oracle_term(oracle_index, "file", "dirichlet", 2000.0)
    sb = _lm_oracle_term(oracle_index, "merge", "dirichlet", 2000.0)
    want = {}
    for d in set(sa) | set(sb):
        acc = np.float32(0.0)
        for part in (sa, sb):  # clause order
            if d in part:
                acc = np.float32(acc + part[d])
        want[d] = acc
    assert got == want


def test_lm_ranks_differ_from_bm25(built_index):
    from voyagr_spark.search import search

    bm = [r["doc_id"] for r in search(built_index, "file", k=10**6).collect()]
    lmd = [r["doc_id"] for r in
           search(built_index, "file", k=10**6,
                  similarity="lmdirichlet").collect()]
    assert set(bm) == set(lmd)  # same matches, different similarity
    assert bm != lmd  # doc-length prior genuinely reorders somewhere


def test_lm_rejects_unsupported_shapes(built_index):
    from voyagr_spark.search import search

    for q in ['"parse query tree"', "fil*", "file AND (open OR merge)"]:
        with pytest.raises(ValueError, match="classic similarity"):
            search(built_index, q, k=5, similarity="lmdirichlet").collect()
