"""BM25 scoring with Java-float (float32) cast parity.

Reimplements BM25Similarity (k1=1.2, b=0.75) from
`/root/reference/lucene/core/src/java/org/apache/lucene/search/similarities/BM25Similarity.java`:

* idf      = (float) ln(1 + (maxDoc - df + 0.5)/(df + 0.5))        (:66-69)
* avgdl    = (float)(sumTotalTermFreq / (double) maxDoc)           (:84-91)
* cache[i] = k1 * ((1-b) + b * NORM_TABLE[i] / avgdl)              (:207-210)
* weight   = idf * queryBoost * topLevelBoost (queryNorm unused)   (:289-293)
* weightValue = weight * (k1 + 1)                                  (:222)
* score    = weightValue * freq / (freq + cache[norm_byte])        (:228)
* phrase/multi-term idf = sum of per-term idfs accumulated in float (:187-198)

Cast discipline (SURVEY.md §7.4): inner arithmetic in double exactly where
Java uses double (idf log argument, avgdl division), then a single cast to
float32; all subsequent arithmetic in float32.  Never compute in float64 and
cast at the end.
"""

from __future__ import annotations

import numpy as np

K1 = np.float32(1.2)
B = np.float32(0.75)

from .smallfloat import NORM_TABLE  # noqa: E402


def idf(df: int | np.ndarray, max_doc: int) -> np.float32 | np.ndarray:
    """BM25Similarity.idf (BM25Similarity.java:66-69)."""
    dff = np.asarray(df, dtype=np.float64)
    val = np.log1p((max_doc - dff + 0.5) / (dff + 0.5))
    return val.astype(np.float32) if val.ndim else np.float32(val)


def avg_field_length(sum_total_term_freq: int, max_doc: int) -> np.float32:
    """BM25Similarity.avgFieldLength (BM25Similarity.java:84-91)."""
    if sum_total_term_freq <= 0:
        return np.float32(1.0)
    return np.float32(sum_total_term_freq / float(max_doc))


def norm_cache(avgdl: np.float32, k1: float = None, b: float = None) -> np.ndarray:
    """256-entry freq-independent cache (BM25Similarity.java:207-210).

    Java evaluates `k1 * ((1 - b) + b * decodeNormValue(i) / avgdl)` in float
    left-to-right; numpy float32 ops round identically per operation.
    k1/b default to the reference constants (1.2, 0.75); BM25Similarity's
    constructor accepts custom values (BM25Similarity.java:46-58) and so do
    we (the §2.8 custom-similarity surface).
    """
    k1f = K1 if k1 is None else np.float32(k1)
    bf = B if b is None else np.float32(b)
    # b=0 hits 0*inf at NORM_TABLE[0] -> NaN, matching Java's 0f*Infinity;
    # silence the numpy warning so real NaN bugs elsewhere stay visible
    with np.errstate(invalid="ignore"):
        return (
            k1f * ((np.float32(1.0) - bf) + bf * NORM_TABLE / np.float32(avgdl))
        ).astype(np.float32)


def weight_value(idf_sum: np.float32, boost: float = 1.0,
                 k1: float = None) -> np.float32:
    """weight*(k1+1): BM25Similarity.java:222 with normalize() at :289-293."""
    k1f = K1 if k1 is None else np.float32(k1)
    w = np.float32(idf_sum) * np.float32(boost)
    return np.float32(w * (k1f + np.float32(1.0)))


def score(
    tf: np.ndarray, norm_bytes: np.ndarray, cache: np.ndarray, wv: np.float32
) -> np.ndarray:
    """score = weightValue * freq / (freq + cache[norm]) in float32 (:228)."""
    freq = np.asarray(tf, dtype=np.float32)
    norm = cache[np.asarray(norm_bytes, dtype=np.uint8)]
    return ((wv * freq) / (freq + norm)).astype(np.float32)
