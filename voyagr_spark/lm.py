"""Language-model similarities: LMDirichlet and LMJelinekMercer.

Reference: `lucene/core/src/java/org/apache/lucene/search/similarities/`
`LMSimilarity.java`, `LMDirichletSimilarity.java`,
`LMJelinekMercerSimilarity.java` over the SimilarityBase scoring skeleton
(`SimilarityBase.java:95-145,220-290`):

* docLen decode (SimilarityBase.java:220-245): NORM_TABLE[b] =
  1.0f / (f * f) with f = SmallFloat.byte315ToFloat(b) — the SAME stored
  norm byte BM25/Classic use, so switching similarity needs NO reindex.
* collectionProbability (LMSimilarity.DefaultCollectionModel,
  LMSimilarity.java:148-156): (totalTermFreq + 1F) /
  (numberOfFieldTokens + 1F), where numberOfFieldTokens =
  collectionStats.sumTotalTermFreq() (SimilarityBase.fillBasicStats,
  SimilarityBase.java:102-138).
* LMDirichlet (LMDirichletSimilarity.java:37-42, default mu = 2000):
    score = totalBoost * (float)(log(1 + freq / (mu * cp))
                                 + log(mu / (docLen + mu)))
    clamped to 0 when non-positive (the doc still matches, score 0.0f).
* LMJelinekMercer (LMJelinekMercerSimilarity.java:28-34; Solr factory
  default lambda = 0.7, LMJelinekMercerSimilarityFactory.java:50):
    score = totalBoost * (float)log(1 + ((1-lambda)*freq/docLen)
                                        / (lambda * cp))

Float discipline (same contract as bm25.py/classic.py): every Java float
operation is reproduced as a float32-rounded numpy op in the same order;
Math.log runs in double on a float32 argument; the two-log sum is a double
add cast once to float (the `(float)(...)` in the reference).

Engine subset: like Classic (classic.py), the LM chain covers TermQuery
and flat pure-SHOULD / pure-MUST boolean queries over terms; coord is the
Similarity.java:122 default 1.0 (SimilarityBase does not override it), so
boolean composition is the plain clause-ordered float32 sum the engine
already performs.  Block-max bounds are BM25-shaped, so LM plans run
unpruned.
"""

from __future__ import annotations

import numpy as np

from .smallfloat import byte315_to_float

#: SimilarityBase.NORM_TABLE — norm byte -> quantized docLen (float32):
#: 1.0f / (floatNorm * floatNorm)            (SimilarityBase.java:220-226)
_f = byte315_to_float(np.arange(256, dtype=np.uint8))
with np.errstate(divide="ignore"):  # byte 0 -> Infinity, as in Java
    DOCLEN_TABLE = (np.float32(1.0) / (_f * _f).astype(np.float32)).astype(
        np.float32
    )
del _f

DEFAULT_MU = np.float32(2000.0)  # LMDirichletSimilarity.java:33
DEFAULT_LAMBDA = np.float32(0.7)  # LMJelinekMercerSimilarityFactory.java:50


def collection_probability(ttf: int, num_field_tokens: int) -> np.float32:
    """(totalTermFreq + 1F) / (numberOfFieldTokens + 1F) — long widens to
    float first, then the float add/divide (LMSimilarity.java:155)."""
    num = np.float32(np.float32(ttf) + np.float32(1.0))
    den = np.float32(np.float32(num_field_tokens) + np.float32(1.0))
    return np.float32(num / den)


def dirichlet_scores(
    tfs: np.ndarray, norm_bytes: np.ndarray, cp: np.float32,
    boost: np.float32, mu: np.float32 = DEFAULT_MU,
) -> np.ndarray:
    """LMDirichletSimilarity.score(stats, freq, docLen), vectorized."""
    freq = tfs.astype(np.float32)
    dlen = DOCLEN_TABLE[norm_bytes]
    # freq / (mu * cp): float*float, float/float, 1 + float — all float32
    denom = np.float32(mu * cp)
    arg1 = (np.float32(1.0) + (freq / denom).astype(np.float32)).astype(
        np.float32
    )
    # mu / (docLen + mu): float32 chain, then double log
    arg2 = (mu / (dlen + mu).astype(np.float32)).astype(np.float32)
    s = (
        np.log(arg1.astype(np.float64)) + np.log(arg2.astype(np.float64))
    ).astype(np.float32)
    out = (boost * s).astype(np.float32)
    # `score > 0.0f ? score : 0.0f` (LMDirichletSimilarity.java:41)
    out[out <= 0] = np.float32(0.0)
    return out


def jm_scores(
    tfs: np.ndarray, norm_bytes: np.ndarray, cp: np.float32,
    boost: np.float32, lam: np.float32 = DEFAULT_LAMBDA,
) -> np.ndarray:
    """LMJelinekMercerSimilarity.score(stats, freq, docLen), vectorized."""
    freq = tfs.astype(np.float32)
    dlen = DOCLEN_TABLE[norm_bytes]
    # ((1 - lambda) * freq / docLen) / (lambda * cp): left-assoc float32
    a = np.float32(np.float32(1.0) - lam)
    num = ((a * freq).astype(np.float32) / dlen).astype(np.float32)
    den = np.float32(lam * cp)
    arg = (np.float32(1.0) + (num / den).astype(np.float32)).astype(
        np.float32
    )
    s = np.log(arg.astype(np.float64)).astype(np.float32)
    return (boost * s).astype(np.float32)


def score_term(
    tfs: np.ndarray, norm_bytes: np.ndarray, values: tuple, sim: str,
) -> np.ndarray:
    """Dispatch used by search._score_posting; `values` is the plan-frozen
    (cp, boost, param) triple for the term."""
    cp, boost, param = values
    if sim == "lmdirichlet":
        return dirichlet_scores(tfs, norm_bytes, cp, boost, param)
    return jm_scores(tfs, norm_bytes, cp, boost, param)
