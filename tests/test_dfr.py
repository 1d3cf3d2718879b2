"""DFR / IB similarities — component goldens, engine bit-parity vs an
independent recompute, config validation."""

import sys
from pathlib import Path

import numpy as np
import pytest

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

from voyagr_spark import dfr, lm

LOG2 = np.log(2.0)


def test_parse_config():
    assert dfr.parse_config("dfr") == ("dfr", ("In", "L", "H2"))
    assert dfr.parse_config("dfr:G,B,H1") == ("dfr", ("G", "B", "H1"))
    assert dfr.parse_config("ib") == ("ib", ("SPL", "DF", "H2"))
    for bad in ("dfr:In,L", "ib:SPL", "xyz"):
        with pytest.raises(ValueError):
            dfr.parse_config(bad)


def test_normalization_h2_golden():
    # tfn = (float)(tf * log2(1 + avg/len)) with c=1
    t = dfr.tfn("H2", np.array([3.0], dtype=np.float32),
                np.array([10.0], dtype=np.float32), np.float32(20.0),
                0, 0, None)
    arg = np.float32(1.0 + np.float32(20.0 / 10.0))
    want = np.float32(3.0 * (np.log(np.float64(arg)) / LOG2))
    assert t[0] == want


def test_basic_model_in_golden():
    # tfn * fl(log2((N+1)/(n+0.5)))
    got = dfr.basic_model("In", np.array([2.0], dtype=np.float32), 100, 9, 0)
    l = np.float32(np.log(101 / 9.5) / LOG2)
    assert got[0] == np.float32(np.float32(2.0) * l)


def test_after_effect_l_and_b():
    t = np.array([3.0], dtype=np.float32)
    assert dfr.after_effect("L", t, 0, 0)[0] == np.float32(0.25)
    # B: (F+1)/(n*(tfn+1)), F=ttf+1, n=df+1
    got = dfr.after_effect("B", t, 4, 9)
    assert got[0] == np.float32(np.float32(11.0) / np.float32(5 * np.float32(4.0)))


def test_ib_lambda_and_spl():
    lam = dfr.ib_lambda("DF", 99, 9, 0)
    assert lam == np.float32(np.float32(10.0) / np.float32(100.0))
    s = dfr.distribution("SPL", np.array([2.0], dtype=np.float32), lam)
    r = np.float32(2.0 / 3.0)
    num = np.power(np.float64(lam), np.float64(r)) - np.float64(lam)
    den = np.float64(np.float32(1.0 - lam))
    assert s[0] == np.float32(-np.log(num / den))


def _dfr_oracle_term(oracle, term, sim, param=None):
    """Independent recompute straight from the reference formulas."""
    matches = oracle._term_matches(term)
    df, ttf = len(matches), sum(matches.values())
    N, nft = oracle.max_doc, oracle.sum_ttf
    avg = np.float32(np.float32(nft) / np.float32(N))
    fam, parts = dfr.parse_config(sim)
    out = {}
    for d, tf in matches.items():
        tf32 = np.array([tf], dtype=np.float32)
        nb = np.array([oracle.norm_bytes[d]], dtype=np.uint8)
        dlen = lm.DOCLEN_TABLE[nb]
        if fam == "dfr":
            model, ae, norm = parts
            t = dfr.tfn(norm, tf32, dlen, avg, ttf, nft, param)
            s = (np.float32(1.0) * dfr.basic_model(model, t, N, df, ttf)
                 ).astype(np.float32)
            s = (s * dfr.after_effect(ae, t, df, ttf)).astype(np.float32)
        else:
            dist, lamk, norm = parts
            t = dfr.tfn(norm, tf32, dlen, avg, ttf, nft, param)
            s = (np.float32(1.0)
                 * dfr.distribution(dist, t, dfr.ib_lambda(lamk, N, df, ttf))
                 ).astype(np.float32)
        out[d] = np.float32(s[0])
    return out


@pytest.mark.parametrize("sim", [
    "dfr", "dfr:G,B,H1", "dfr:Ine,L,H3", "dfr:IF,B,Z", "dfr:P,L,H2",
    "dfr:D,B,H2", "dfr:BE,B,H1", "ib", "ib:LL,TTF,H1",
])
def test_engine_dfr_ib_bit_parity(built_index, oracle_index, sim):
    from voyagr_spark.search import search

    got = {
        r["doc_id"]: np.float32(r["score"])
        for r in search(built_index, "file", k=10**6, similarity=sim).collect()
    }
    want = _dfr_oracle_term(oracle_index, "file", sim)
    # NaN-safe exact comparison (BE/D can produce NaN on degenerate stats)
    assert set(got) == set(want)
    for d in got:
        a, b = got[d], want[d]
        assert (a == b) or (np.isnan(a) and np.isnan(b)), (d, a, b)


def test_engine_dfr_boolean_sum(built_index, oracle_index):
    from voyagr_spark.search import search

    got = {
        r["doc_id"]: np.float32(r["score"])
        for r in search(built_index, "file OR merge", k=10**6,
                        similarity="dfr").collect()
    }
    sa = _dfr_oracle_term(oracle_index, "file", "dfr")
    sb = _dfr_oracle_term(oracle_index, "merge", "dfr")
    want = {}
    for d in set(sa) | set(sb):
        acc = np.float32(0.0)
        for part in (sa, sb):
            if d in part:
                acc = np.float32(acc + part[d])
        want[d] = acc
    assert got == want


def test_dfr_norm_param_override(built_index, oracle_index):
    from voyagr_spark.search import search

    got = {
        r["doc_id"]: np.float32(r["score"])
        for r in search(built_index, "file", k=10**6, similarity="dfr:In,L,H3",
                        sim_param=500.0).collect()
    }
    want = _dfr_oracle_term(oracle_index, "file", "dfr:In,L,H3", param=500.0)
    assert got == want
