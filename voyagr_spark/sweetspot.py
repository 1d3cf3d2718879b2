"""SweetSpotSimilarity — plateau length norm + baseline/hyperbolic tf.

Reference: `lucene/misc/src/java/org/apache/lucene/misc/
SweetSpotSimilarity.java` (a DefaultSimilarity subclass; Solr factory
`solr/core/src/java/org/apache/solr/search/similarities/
SweetSpotSimilarityFactory.java`):

* computeLengthNorm(n) = (float)(1.0f / Math.sqrt(
      s * (float)(|n-min| + |n-max| - (max-min)) + 1.0f))
  (SweetSpotSimilarity.java:137-153) — a plateau of norm 1.0 for
  min <= n <= max, sqrt falloff outside; degrades to 1/sqrt(n) at
  min=max=1, s=0.5 (the DefaultSimilarity norm).
* tf(freq) delegates to baselineTf (SweetSpotSimilarity.java:156-163):
  baselineTf(x) = 0 at x==0; x <= tf_min ? tf_base
  : (float)sqrt(x + tf_base^2 - tf_min)   (:165-185) — degrades to
  sqrt(x) at base=min=0 (the DefaultSimilarity tf).
* hyperbolicTf (:187-229) is the tanh-based helper the reference provides
  for subclasses to opt into; like the reference, the default tf() here is
  baselineTf and hyperbolic is exposed as a tested helper + opt-in config.
* idf / queryNorm / coord are inherited from DefaultSimilarity unchanged,
  so the weight chain is EXACTLY classic.py's (TFIDFSimilarity.IDFStats).

Norm-byte divergence (same design as lm.py/dfr.py, COVERAGE.md): the
reference bakes computeLengthNorm into the stored byte at INDEX time
(lengthNorm -> SmallFloat.floatToByte315); this engine's stored byte is
similarity-independent (encode(1/sqrt(doclen))), so switching similarity
needs no reindex.  At query time we recover the quantized docLen
(SimilarityBase NORM_TABLE form, 1/f^2), apply computeLengthNorm, and
reproduce the reference's storage quantization with a
floatToByte315/byte315ToFloat round trip — byte-for-byte what the
reference would have stored for that (quantized) length.
"""

from __future__ import annotations

import numpy as np

from .lm import DOCLEN_TABLE
from .smallfloat import byte315_to_float, float_to_byte315

#: factory defaults (SweetSpotSimilarity.java:43-53)
DEFAULT_LN_MIN = 1
DEFAULT_LN_MAX = 1
DEFAULT_STEEP = 0.5
DEFAULT_TF_BASE = 0.0
DEFAULT_TF_MIN = 0.0
DEFAULT_HYPER = (0.0, 2.0, 1.3, 10.0)  # min, max, base, xoffset


def compute_length_norm(num_terms: np.ndarray, ln_min: int, ln_max: int,
                        steep: float) -> np.ndarray:
    """(float)(1.0f / Math.sqrt(s * (float)(|n-l| + |n-h| - (h-l)) + 1.0f))
    — int sum cast to float, float32 mul/add, double sqrt, one final cast
    (SweetSpotSimilarity.java:137-153)."""
    n = np.asarray(num_terms, dtype=np.float64)
    # the |n-l| + |n-h| - (h-l) sum is int arithmetic in Java; float64 is
    # exact for it, then one cast reproduces the (float) conversion
    inner = (
        np.abs(n - ln_min) + np.abs(n - ln_max) - (ln_max - ln_min)
    ).astype(np.float32)
    x = (np.float32(steep) * inner).astype(np.float32)
    x = (x + np.float32(1.0)).astype(np.float32)
    return (1.0 / np.sqrt(x.astype(np.float64))).astype(np.float32)


def baseline_tf(freq: np.ndarray, tf_base: float, tf_min: float) -> np.ndarray:
    """0 at freq==0; freq <= min ? base : (float)sqrt(freq + base^2 - min)
    (SweetSpotSimilarity.java:165-185); float32 adds, double sqrt."""
    f = np.asarray(freq, dtype=np.float32)
    b2 = (np.float32(tf_base) * np.float32(tf_base)).astype(np.float32)
    t = ((f + b2).astype(np.float32) - np.float32(tf_min)).astype(np.float32)
    with np.errstate(invalid="ignore"):  # freq<min branch discards the sqrt
        out = np.sqrt(t.astype(np.float64)).astype(np.float32)
    out = np.where(f <= np.float32(tf_min), np.float32(tf_base), out)
    return np.where(f == 0, np.float32(0.0), out).astype(np.float32)


def hyperbolic_tf(freq: np.ndarray, hyper=DEFAULT_HYPER) -> np.ndarray:
    """min + (max-min)/2 * (tanh-form + 1) over base**(x-xoffset)
    (SweetSpotSimilarity.java:187-229); double pow chain, one float cast."""
    mn, mx, base, xoff = hyper
    f = np.asarray(freq, dtype=np.float32)
    x = (f - np.float32(xoff)).astype(np.float64)
    up, dn = np.power(base, x), np.power(base, -x)
    half = np.float32((mx - mn) / 2.0)
    out = (np.float32(mn)
           + (half * ((up - dn) / (up + dn) + 1.0)).astype(np.float32)
           ).astype(np.float32)
    return np.where(f == 0, np.float32(0.0), out).astype(np.float32)


_NORM_TABLES: dict[tuple, np.ndarray] = {}


def norm_table(ln_min: int, ln_max: int, steep: float) -> np.ndarray:
    """256-entry norm-byte -> SweetSpot norm float32 decode table.

    docLen is recovered from the shared stored byte (SimilarityBase
    NORM_TABLE, lm.DOCLEN_TABLE), computeLengthNorm applied, then the
    reference's index-time storage quantization reproduced with an
    encode/decode round trip (floatToByte315 -> byte315ToFloat)."""
    key = (ln_min, ln_max, float(steep))
    got = _NORM_TABLES.get(key)
    if got is not None:
        return got
    dlen = DOCLEN_TABLE.astype(np.float64)
    finite = np.isfinite(dlen)  # byte 0 decodes docLen=inf -> falloff to 0
    ln = compute_length_norm(np.where(finite, dlen, 1.0), ln_min, ln_max,
                             steep)
    norms = np.where(finite, ln, np.float32(0.0)).astype(np.float32)
    out = byte315_to_float(float_to_byte315(norms)).astype(np.float32)
    _NORM_TABLES[key] = out
    return out


def parse_config(sim: str) -> tuple[int, int, float, float, float, bool]:
    """'sweetspot' | 'sweetspot:min,max,steep[,tfbase,tfmin]' |
    'sweetspot:min,max,steep,hyper' -> (ln_min, ln_max, steep, tf_base,
    tf_min, hyperbolic)."""
    fam, _, rest = sim.partition(":")
    if fam != "sweetspot":
        raise ValueError(f"unknown similarity {sim!r}")
    if not rest:
        return (DEFAULT_LN_MIN, DEFAULT_LN_MAX, DEFAULT_STEEP,
                DEFAULT_TF_BASE, DEFAULT_TF_MIN, False)
    parts = rest.split(",")
    if len(parts) == 4 and parts[3] == "hyper":
        return (int(parts[0]), int(parts[1]), float(parts[2]),
                DEFAULT_TF_BASE, DEFAULT_TF_MIN, True)
    if len(parts) not in (3, 5):
        raise ValueError(
            f"sweetspot config needs min,max,steep[,tfbase,tfmin]: {sim!r}")
    ln_min, ln_max, steep = int(parts[0]), int(parts[1]), float(parts[2])
    if ln_min > ln_max:
        raise ValueError(f"sweetspot ln_min > ln_max: {sim!r}")
    if len(parts) == 5:
        return ln_min, ln_max, steep, float(parts[3]), float(parts[4]), False
    return ln_min, ln_max, steep, DEFAULT_TF_BASE, DEFAULT_TF_MIN, False


def score_term(tfs: np.ndarray, norm_bytes: np.ndarray, value: np.float32,
               sim: str) -> np.ndarray:
    """score(doc, freq) = fl(fl(tf(freq) * value) * norm) — the
    TFIDFSimilarity.java:712-715 chain with SweetSpot's tf and norm;
    `value` is the classic.py post-queryNorm weight (IDFStats.value)."""
    ln_min, ln_max, steep, tf_base, tf_min, hyper = parse_config(sim)
    nrm = norm_table(ln_min, ln_max, steep)[norm_bytes]
    tfv = (hyperbolic_tf(tfs) if hyper
           else baseline_tf(tfs, tf_base, tf_min))
    return ((tfv * value).astype(np.float32) * nrm).astype(np.float32)
