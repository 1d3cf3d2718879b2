"""Divergence-from-randomness (DFR) and information-based (IB) similarities.

Reference: `lucene/core/src/java/org/apache/lucene/search/similarities/`
`DFRSimilarity.java` (score = totalBoost * basicModel.score(stats, tfn) *
afterEffect.score(stats, tfn), left-assoc float), `IBSimilarity.java`
(score = totalBoost * distribution.score(stats, tfn, lambda(stats))), over
the SimilarityBase skeleton (same quantized docLen decode as lm.py).

Components (each a float-exact re-expression of the named Java class):

Basic models   BasicModel{BE,D,G,IF,In,Ine,P}.java
After effects  AfterEffect{L,B}.java + the no-op
Normalizations Normalization{H1(c=1),H2(c=1),H3(mu=800),Z(z=0.30)}.java + none
Distributions  Distribution{LL,SPL}.java
Lambdas        Lambda{DF,TTF}.java

log2(x) is Math.log(x)/LOG_2 (SimilarityBase.java:50,255-257) — rendered as
ln(x)/ln(2), NOT a native log2, so the double division rounding matches.

Config strings: "dfr:In,L,H2" (default), "ib:SPL,DF,H2" (default); the
normalization parameter (c / mu / z) rides search()'s sim_param.
"""

from __future__ import annotations

import numpy as np

from .lm import DOCLEN_TABLE

LOG_2 = np.log(2.0)  # SimilarityBase.LOG_2
LOG2_E = np.log(np.e) / LOG_2  # SimilarityBase.LOG2_E == 1/ln(2)


def _log2(x):
    return np.log(x) / LOG_2


# -- normalizations: tfn(tf, docLen) -> float32 ----------------------------

def tfn(norm: str, tf32: np.ndarray, dlen: np.ndarray, avg: np.float32,
        ttf: int, nft: int, param: float | None) -> np.ndarray:
    if norm == "H1":  # tf * avg / len (NormalizationH1.java tfn — the c
        # field does not enter tfn in this reference version)
        return ((tf32 * avg).astype(np.float32) / dlen).astype(np.float32)
    if norm == "H2":  # (float)(tf * log2(1 + c*avg/len))
        c = np.float32(1.0 if param is None else param)
        arg = (np.float32(1.0)
               + ((c * avg).astype(np.float32) / dlen).astype(np.float32)
               ).astype(np.float32)
        return (tf32.astype(np.float64) * _log2(arg.astype(np.float64))
                ).astype(np.float32)
    if norm == "H3":  # (tf + mu*cp) / (len + mu) * mu, all float32
        mu = np.float32(800.0 if param is None else param)
        cp = np.float32(
            np.float32(np.float32(ttf) + np.float32(1.0))
            / np.float32(np.float32(nft) + np.float32(1.0))
        )
        num = (tf32 + np.float32(mu * cp)).astype(np.float32)
        den = (dlen + mu).astype(np.float32)
        return ((num / den).astype(np.float32) * mu).astype(np.float32)
    if norm == "Z":  # (float)(tf * pow(avg/len, z))
        z = np.float32(0.30 if param is None else param)
        ratio = (avg / dlen).astype(np.float32)
        return (tf32.astype(np.float64)
                * np.power(ratio.astype(np.float64), np.float64(z))
                ).astype(np.float32)
    if norm == "none":  # Normalization.NoNormalization: tfn = tf
        return tf32
    raise ValueError(f"unknown normalization {norm!r}")


# -- basic models: score(stats, tfn) -> float32 -----------------------------

def basic_model(model: str, t: np.ndarray, N: int, df: int, ttf: int
                ) -> np.ndarray:
    td = t.astype(np.float64)
    if model == "In":  # tfn * fl(log2((N+1)/(n+0.5)))
        l = np.float32(_log2((N + 1) / (df + 0.5)))
        return (t * l).astype(np.float32)
    if model == "Ine":  # ne = N*(1-((N-1)/N)^F)
        ne = N * (1 - np.power((N - 1) / float(N), ttf))
        l = np.float32(_log2((N + 1) / (ne + 0.5)))
        return (t * l).astype(np.float32)
    if model == "IF":  # tfn * fl(log2(1 + (N+1)/(F+0.5)))
        l = np.float32(_log2(1 + (N + 1) / (ttf + 0.5)))
        return (t * l).astype(np.float32)
    if model == "G":  # lambda = F/(N+F), F = ttf+1
        Fv = float(ttf + 1)
        lam = Fv / (N + Fv)
        return (_log2(lam + 1) + td * _log2((1 + lam) / lam)).astype(
            np.float32
        )
    if model == "BE":
        F = (ttf + 1) + td
        Nd = F + N

        def f(n, m):
            return (m + 0.5) * _log2(n / m) + (n - m) * _log2(n)

        return (-_log2((Nd - 1) * np.e)
                + f(Nd + F - 1, Nd + F - td - 2) - f(F, F - td)
                ).astype(np.float32)
    if model == "D":
        F = (ttf + 1) + td
        phi = td / F
        nphi = 1 - phi
        p = 1.0 / (N + 1)
        D = phi * _log2(phi / p) + nphi * _log2(nphi / (1 - p))
        return (D * F + 0.5 * _log2(1 + 2 * np.pi * td * nphi)).astype(
            np.float32
        )
    if model == "P":  # lambda = (float)(F+1)/(N+1)
        lam = np.float64(np.float32(np.float32(ttf + 1) / np.float32(N + 1)))
        return (td * _log2(td / lam)
                + (lam + 1 / (12 * td) - td) * LOG2_E
                + 0.5 * _log2(2 * np.pi * td)).astype(np.float32)
    raise ValueError(f"unknown basic model {model!r}")


# -- after effects ----------------------------------------------------------

def after_effect(ae: str, t: np.ndarray, df: int, ttf: int) -> np.ndarray:
    if ae == "L":  # 1 / (tfn + 1)
        return (np.float32(1.0) / (t + np.float32(1.0)).astype(np.float32)
                ).astype(np.float32)
    if ae == "B":  # (F+1) / (n * (tfn+1)), F = ttf+1, n = df+1
        F, n = ttf + 1, df + 1
        den = (n * (t + np.float32(1.0)).astype(np.float32)).astype(
            np.float32
        )
        return (np.float32(F + 1) / den).astype(np.float32)
    if ae == "none":  # AfterEffect.NoAfterEffect: 1
        return np.ones_like(t, dtype=np.float32)
    raise ValueError(f"unknown after effect {ae!r}")


# -- IB distributions / lambdas ---------------------------------------------

def ib_lambda(kind: str, N: int, df: int, ttf: int) -> np.float32:
    if kind == "DF":  # (df+1F)/(N+1F)
        return np.float32(
            np.float32(np.float32(df) + np.float32(1.0))
            / np.float32(np.float32(N) + np.float32(1.0))
        )
    if kind == "TTF":
        return np.float32(
            np.float32(np.float32(ttf) + np.float32(1.0))
            / np.float32(np.float32(N) + np.float32(1.0))
        )
    raise ValueError(f"unknown lambda {kind!r}")


def distribution(dist: str, t: np.ndarray, lam: np.float32) -> np.ndarray:
    if dist == "LL":  # (float)-log(lambda/(tfn+lambda))
        arg = (lam / (t + lam).astype(np.float32)).astype(np.float32)
        return (-np.log(arg.astype(np.float64))).astype(np.float32)
    if dist == "SPL":
        if lam == np.float32(1.0):
            lam = np.float32(0.99)
        r = (t / (t + np.float32(1.0)).astype(np.float32)).astype(np.float32)
        num = np.power(np.float64(lam), r.astype(np.float64)) - np.float64(lam)
        den = np.float64(np.float32(np.float32(1.0) - lam))
        return (-np.log(num / den)).astype(np.float32)
    raise ValueError(f"unknown distribution {dist!r}")


# -- entry points -----------------------------------------------------------

DEFAULT_DFR = ("In", "L", "H2")
DEFAULT_IB = ("SPL", "DF", "H2")


def parse_config(sim: str) -> tuple:
    """'dfr' | 'dfr:In,L,H2' | 'ib' | 'ib:SPL,DF,H2' -> (family, parts)."""
    fam, _, rest = sim.partition(":")
    if fam == "dfr":
        parts = tuple(rest.split(",")) if rest else DEFAULT_DFR
        if len(parts) != 3:
            raise ValueError(f"dfr config needs model,afterEffect,norm: {sim!r}")
    elif fam == "ib":
        parts = tuple(rest.split(",")) if rest else DEFAULT_IB
        if len(parts) != 3:
            raise ValueError(f"ib config needs distribution,lambda,norm: {sim!r}")
    else:
        raise ValueError(f"unknown similarity {sim!r}")
    return fam, parts


def score_term(tfs: np.ndarray, norm_bytes: np.ndarray, values: tuple,
               sim: str) -> np.ndarray:
    """Dispatch used by search._score_posting; `values` is the plan-frozen
    (df, ttf, N, nft, avg, boost, param) tuple for the term."""
    df, ttf, N, nft, avg, boost, param = values
    fam, parts = parse_config(sim)
    tf32 = tfs.astype(np.float32)
    dlen = DOCLEN_TABLE[norm_bytes]
    with np.errstate(divide="ignore", invalid="ignore"):
        if fam == "dfr":
            model, ae, norm = parts
            t = tfn(norm, tf32, dlen, avg, ttf, nft, param)
            bm = basic_model(model, t, N, df, ttf)
            aev = after_effect(ae, t, df, ttf)
            return ((boost * bm).astype(np.float32) * aev).astype(np.float32)
        dist, lamk, norm = parts
        t = tfn(norm, tf32, dlen, avg, ttf, nft, param)
        lam = ib_lambda(lamk, N, df, ttf)
        return (boost * distribution(dist, t, lam)).astype(np.float32)
