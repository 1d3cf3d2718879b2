"""ClassicSimilarity (TF-IDF) — the second pluggable Similarity.

Reference: `lucene/core/src/java/org/apache/lucene/search/similarities/
DefaultSimilarity.java` (named ClassicSimilarity upstream) over the
TFIDFSimilarity scoring skeleton (`TFIDFSimilarity.java:700-770`):

* tf(freq)   = (float) sqrt(freq)                     (DefaultSimilarity.java:120-122)
* idf(df, n) = (float) (log(n / (double)(df+1)) + 1)  (:138-140)
* queryNorm  = (float) (1 / sqrt(sumOfSquaredWeights))(:67-69)
* norm(doc)  = byte315ToFloat(norm_byte)              (:96-99; the byte is
  encode(1/sqrt(doclen)) — the SAME stored byte BM25 uses, so switching
  similarity needs NO reindex, exactly as in the reference)
* IDFStats   (TFIDFSimilarity.java:736-765): queryWeight = idf * boost;
  sumOfSquaredWeights = queryWeight^2; after normalize(queryNorm):
  queryWeight *= queryNorm, value = queryWeight * idf
* score(doc, freq) = tf(freq) * value * norm(doc)     (:712-715)
* coord(overlap, maxOverlap) = overlap / (float) maxOverlap
  (DefaultSimilarity.java:60-62) — applied to disjunctions
  (DisjunctionSumScorer.java:49); BM25's coord is 1, Classic's is real.

Engine subset (documented): Classic scoring covers TermQuery and flat
BooleanQuery over terms (pure SHOULD with coord + minShouldMatch, pure
MUST where coord(m, m) == 1) — the query shapes TFIDFSimilarity's
vector-space model describes.  Phrase/span/dismax stay BM25-only;
requesting Classic for them raises.  Per the engine-wide clause-order
contract (COVERAGE.md divergence 3a), clause scores accumulate in
float32 query order (the reference sums disjuncts in double and casts
once; both are deterministic — ours is SQL-reproducible).  Block-max /
MaxScore pruning is BM25-shaped, so Classic plans run unpruned
(rank-correctness over raw speed for the non-default similarity).
"""

from __future__ import annotations

import numpy as np

from .smallfloat import byte315_to_float

#: decode table: norm byte -> float32 (1/sqrt(doclen) quantized)
DECODE_TABLE = byte315_to_float(np.arange(256, dtype=np.uint8))


def idf(df: int, max_doc: int) -> np.float32:
    """(float)(log(numDocs/(double)(docFreq+1)) + 1.0)."""
    return np.float32(np.log(max_doc / float(df + 1)) + 1.0)


def tf(freq: np.ndarray) -> np.ndarray:
    """(float) sqrt(freq) — double sqrt, one cast."""
    return np.sqrt(np.asarray(freq, dtype=np.float64)).astype(np.float32)


def query_norm(sum_sq: np.float32) -> np.float32:
    """(float)(1.0 / Math.sqrt(v)); invalid -> 1.0f
    (IndexSearcher.java:624-632 createNormalizedWeight)."""
    v = float(sum_sq)
    if v <= 0:
        return np.float32(1.0)
    n = np.float32(1.0 / np.sqrt(v))
    if not np.isfinite(n):
        return np.float32(1.0)
    return n


def coord(overlap: np.ndarray, max_overlap: int) -> np.ndarray:
    """overlap / (float) maxOverlap, per doc (DefaultSimilarity.java:60)."""
    return (
        np.asarray(overlap, dtype=np.float32) / np.float32(max_overlap)
    ).astype(np.float32)


def term_values(terms: list[str], dfs: dict[str, int], max_doc: int,
                boosts: dict[str, float] | None = None
                ) -> dict[str, np.float32]:
    """Driver-side weight chain for a flat term query set.

    sumOfSquaredWeights accumulates fl(qw^2) per scoring clause in QUERY
    order (BooleanWeight.java:94-107), queryNorm is computed once at the
    top (createNormalizedWeight), then every term's value = fl(fl(qw *
    queryNorm) * idf) (IDFStats.normalize, TFIDFSimilarity.java:760-763).
    Absent terms carry idf of df=0 (Lucene's TermWeight with docFreq 0
    still contributes to the norm sum via termStatistics)."""
    boosts = boosts or {}
    idfs = {t: idf(dfs.get(t, 0), max_doc) for t in terms}
    qws = {
        t: np.float32(idfs[t] * np.float32(boosts.get(t, 1.0))) for t in terms
    }
    ssq = np.float32(0.0)
    for t in terms:  # clause order
        ssq = np.float32(ssq + np.float32(qws[t] * qws[t]))
    qn = query_norm(ssq)
    return {
        t: np.float32(np.float32(qws[t] * qn) * idfs[t]) for t in terms
    }


def score_term(tfs: np.ndarray, norm_bytes: np.ndarray,
               value: np.float32) -> np.ndarray:
    """raw = fl(tf(freq) * value); score = fl(raw * decodeNorm)
    (TFIDFSimilarity.java:712-715)."""
    raw = (tf(tfs) * value).astype(np.float32)
    return (raw * DECODE_TABLE[np.asarray(norm_bytes, dtype=np.uint8)]).astype(
        np.float32
    )
