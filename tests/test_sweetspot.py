"""SweetSpotSimilarity — formula goldens, degeneracy to Classic, engine
parity against an independent recompute (SweetSpotSimilarity.java)."""

import sys
from pathlib import Path

import numpy as np
import pytest

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

from voyagr_spark import classic, sweetspot
from voyagr_spark.lm import DOCLEN_TABLE
from voyagr_spark.smallfloat import byte315_to_float, float_to_byte315


def test_length_norm_plateau():
    # norm is exactly 1.0 across [min, max] and falls off outside
    got = sweetspot.compute_length_norm(
        np.array([1, 3, 5, 10, 20, 50]), 3, 20, 0.5)
    assert got.dtype == np.float32
    np.testing.assert_array_equal(got[1:5], np.float32(1.0))
    assert got[0] < 1.0 and got[5] < 1.0


def test_length_norm_degrades_to_default():
    # min=max=1, steep=0.5 -> 1/sqrt(n) (SweetSpotSimilarity.java:125-130)
    n = np.arange(1, 200)
    got = sweetspot.compute_length_norm(n, 1, 1, 0.5)
    want = (1.0 / np.sqrt(n.astype(np.float64))).astype(np.float32)
    np.testing.assert_array_equal(got, want)


def test_baseline_tf_goldens():
    # base=min=0 -> sqrt(freq); freq 0 -> 0
    got = sweetspot.baseline_tf(np.array([0, 1, 4, 9]), 0.0, 0.0)
    np.testing.assert_array_equal(
        got, np.array([0, 1, 2, 3], dtype=np.float32))
    # TestSweetSpotSimilarity.testBaselineTf shape: base=1.5, min=5 ->
    # plateau of base below min, sqrt(x + base^2 - min) above
    got = sweetspot.baseline_tf(np.array([0, 1, 5, 6, 10]), 1.5, 5.0)
    assert got[0] == np.float32(0.0)
    assert got[1] == got[2] == np.float32(1.5)
    assert got[3] == np.float32(np.sqrt(np.float32(
        np.float32(6.0 + np.float32(1.5 * 1.5)) - np.float32(5.0))))
    assert np.all(np.diff(got[2:]) > 0)


def test_hyperbolic_tf_bounds():
    got = sweetspot.hyperbolic_tf(np.arange(0, 100))
    assert got[0] == np.float32(0.0)
    assert np.all(got[1:] > 0.0) and np.all(got <= 2.0)
    # midpoint: tf(xoffset) = min + (max-min)/2 = 1.0
    mid = sweetspot.hyperbolic_tf(np.array([10]))
    assert abs(float(mid[0]) - 1.0) < 1e-6


def test_parse_config():
    assert sweetspot.parse_config("sweetspot") == (1, 1, 0.5, 0.0, 0.0, False)
    assert sweetspot.parse_config("sweetspot:3,20,0.5") == (
        3, 20, 0.5, 0.0, 0.0, False)
    assert sweetspot.parse_config("sweetspot:3,20,0.5,1.5,5") == (
        3, 20, 0.5, 1.5, 5.0, False)
    assert sweetspot.parse_config("sweetspot:3,20,0.5,hyper")[5] is True
    with pytest.raises(ValueError, match="sweetspot"):
        sweetspot.parse_config("sweetspot:3,20")
    with pytest.raises(ValueError, match="ln_min"):
        sweetspot.parse_config("sweetspot:20,3,0.5")
    with pytest.raises(ValueError, match="unknown similarity"):
        sweetspot.parse_config("sugarspot")


def test_norm_table_default_equals_classic_decode():
    """min=max=1, steep=0.5 collapses computeLengthNorm to 1/sqrt(docLen);
    with docLen the quantized 1/f^2, the encode/decode round trip lands on
    the classic decode table byte-for-byte on every byte a real document
    can carry (docLen >= 1, i.e. decode <= 1 — the 1/sqrt identity flips
    to 1/sqrt(2-n) below length 1, a region encode_norm never emits).
    Byte 0 is the docLen=inf -> norm 0 edge both tables share."""
    tab = sweetspot.norm_table(1, 1, 0.5)
    real = np.flatnonzero(DOCLEN_TABLE >= 1.0)
    np.testing.assert_array_equal(tab[real], classic.DECODE_TABLE[real])
    assert tab[0] == np.float32(0.0) == classic.DECODE_TABLE[0]


def test_norm_table_is_storage_quantized():
    tab = sweetspot.norm_table(3, 20, 0.5)
    np.testing.assert_array_equal(
        tab, byte315_to_float(float_to_byte315(tab)))


def _ss_oracle_term(oracle, term, sim):
    """Independent recompute straight from the reference formulas."""
    ln_min, ln_max, steep, tf_base, tf_min, hyper = sweetspot.parse_config(sim)
    matches = oracle._term_matches(term)
    n, df = oracle.max_doc, len(matches)
    i = np.float32(np.log(n / float(df + 1)) + 1.0)
    qn = np.float32(1.0 / np.sqrt(float(np.float32(i * i))))
    value = np.float32(np.float32(i * qn) * i)
    out = {}
    for d, tf in matches.items():
        if hyper:
            tfv = sweetspot.hyperbolic_tf(np.array([tf]))[0]
        else:
            tfv = sweetspot.baseline_tf(np.array([tf]), tf_base, tf_min)[0]
        b = oracle.norm_bytes[d]
        dlen = float(DOCLEN_TABLE[b])
        ln = np.float32(1.0 / np.sqrt(float(np.float32(
            np.float32(steep) * np.float32(
                abs(dlen - ln_min) + abs(dlen - ln_max) - (ln_max - ln_min))
            + np.float32(1.0)))))
        nrm = byte315_to_float(float_to_byte315(np.array([ln])))[0]
        out[d] = np.float32(np.float32(tfv * value) * nrm)
    return out


@pytest.mark.parametrize("sim", [
    "sweetspot", "sweetspot:2,10,0.5", "sweetspot:1,5,0.75,1.5,2",
    "sweetspot:2,10,0.5,hyper",
])
def test_engine_sweetspot_bit_parity(built_index, corpus_pdf, sim):
    from voyagr_spark.oracle import OracleIndex
    from voyagr_spark.search import search

    got = {
        r["doc_id"]: np.float32(r["score"])
        for r in search(built_index, "file", k=10**6,
                        similarity=sim).collect()
    }
    want = _ss_oracle_term(OracleIndex(corpus_pdf), "file", sim)
    assert got == want


def test_sweetspot_default_equals_classic(built_index):
    from voyagr_spark.search import search

    cl = [(r["doc_id"], np.float32(r["score"])) for r in
          search(built_index, "file OR merge", k=10**6,
                 similarity="classic").collect()]
    ss = [(r["doc_id"], np.float32(r["score"])) for r in
          search(built_index, "file OR merge", k=10**6,
                 similarity="sweetspot").collect()]
    assert cl == ss


def test_sweetspot_plateau_changes_ranks(built_index):
    from voyagr_spark.search import search

    base = [r["doc_id"] for r in
            search(built_index, "file", k=10**6,
                   similarity="sweetspot").collect()]
    plat = [r["doc_id"] for r in
            search(built_index, "file", k=10**6,
                   similarity="sweetspot:50,200,0.5").collect()]
    assert set(base) == set(plat)
    assert base != plat  # the plateau genuinely reorders by length


def test_sweetspot_rejects_unsupported_shapes(built_index):
    from voyagr_spark.search import search

    with pytest.raises(ValueError, match="classic similarity"):
        search(built_index, '"parse query tree"', k=5,
               similarity="sweetspot").collect()
