"""MoreLikeThis: find documents similar to a seed document.

The Lucene queries-module surface (reference:
lucene/queries/src/java/org/apache/lucene/queries/mlt/MoreLikeThis.java) —
re-analyze the seed document's stored content, pick its most "interesting"
terms by tf*idf (createQueue, MoreLikeThis.java:570-630, defaults
minTermFreq=2 / minDocFreq=5 / maxQueryTerms=25, MoreLikeThis.java:190-230),
and run the resulting term disjunction through the normal BM25 top-k path.

Spark-first shape: the seed read is one pushed-down stored-field lookup (a
single doc, the like(docNum) analog); term selection is a driver-side
computation over that ONE document's term vector (bounded by doc length,
never corpus-sized); the expensive part — scoring the disjunction — is the
engine's existing distributed zero-exchange search. Nothing here scales with
corpus size except the final search.

Documented divergences from the Java reference:
* selection scores are computed in float64 (Java uses float); ordering is
  made deterministic with a (score DESC, term ASC) tie-break where Lucene's
  priority queue leaves equal-score order unspecified;
* idf is TFIDFSimilarity.idf (log((docCount+1)/(docFreq+1)) + 1,
  TFIDFSimilarity.java:520-540) exactly as MoreLikeThis uses it, even though
  the final query scores with BM25 — same split as Lucene, where MLT
  selection and query scoring use different similarities.
"""

from __future__ import annotations

import math
from collections import Counter

from pyspark.sql import DataFrame, functions as F, types as T

from .parser import SHOULD, BooleanQuery, MatchNoDocsQuery, TermQuery

DEFAULT_MIN_TERM_FREQ = 2
DEFAULT_MIN_DOC_FREQ = 5
DEFAULT_MAX_QUERY_TERMS = 25

TERMS_SCHEMA = T.StructType(
    [
        T.StructField("rank", T.LongType()),
        T.StructField("term", T.StringType()),
        T.StructField("tf", T.LongType()),
        T.StructField("df", T.LongType()),
        T.StructField("score", T.DoubleType()),
    ]
)


def _seed_text(index, source: DataFrame, doc_id: int) -> str:
    """Stored-field read of ONE document's content (like(docNum) analog):
    docmap row -> (repo, path, commit) key -> pushed-down source lookup."""
    key = (
        index.docmap()
        .filter(F.col("doc_id") == int(doc_id))
        .select("repo", "path", "commit")
        .collect()
    )
    if not key:
        raise KeyError(f"doc_id {doc_id} not in index")
    k = key[0]
    rows = (
        source.filter(
            (F.col("repo") == k["repo"])
            & (F.col("path") == k["path"])
            & (F.col("commit") == k["commit"])
        )
        .select("content")
        .collect()
    )
    if not rows:
        raise KeyError(f"stored row for doc_id {doc_id} missing from source")
    return rows[0]["content"]


def interesting_terms(
    index,
    source: DataFrame,
    doc_id: int,
    max_query_terms: int = DEFAULT_MAX_QUERY_TERMS,
    min_term_freq: int = DEFAULT_MIN_TERM_FREQ,
    min_doc_freq: int = DEFAULT_MIN_DOC_FREQ,
) -> list[tuple[str, int, int, float]]:
    """retrieveInterestingTerms analog -> [(term, tf, df, score)] in rank
    order (score DESC, term ASC)."""
    from .analysis import analyze_text

    analyzer = index.analyzer
    if analyzer is not None:
        # seed terms become QUERY terms: index-only twin injection stripped
        analyzer = analyzer.query_form()
    text = _seed_text(index, source, doc_id)
    terms, _ = (
        analyzer.analyze_text(text) if analyzer else analyze_text(text)
    )
    tf = Counter(terms)
    cand = sorted(t for t, c in tf.items() if c >= min_term_freq)
    if not cand:
        return []
    dfs = index.term_dfs(cand)  # one pushed-down stats lookup
    n = index.max_doc
    scored = []
    for t in cand:
        df = dfs.get(t, 0)
        if df < min_doc_freq:
            continue
        idf = math.log((n + 1) / (df + 1)) + 1.0
        scored.append((t, int(tf[t]), int(df), float(tf[t] * idf)))
    scored.sort(key=lambda r: (-r[3], r[0]))
    return scored[:max_query_terms]


def mlt_query(
    index, source: DataFrame, doc_id: int, **kw
) -> BooleanQuery | MatchNoDocsQuery:
    """The MLT query itself: a SHOULD-only term disjunction in selection
    order (clause order fixes the float32 score-sum order downstream)."""
    sel = interesting_terms(index, source, doc_id, **kw)
    if not sel:
        return MatchNoDocsQuery("seed document has no interesting terms")
    return BooleanQuery([(SHOULD, TermQuery(t)) for t, _, _, _ in sel])


def interesting_terms_df(index, source: DataFrame, doc_id: int, **kw) -> DataFrame:
    """(rank, term, tf, df, score) as a DataFrame — k-row driver result,
    same footprint class as explain()."""
    sel = interesting_terms(index, source, doc_id, **kw)
    rows = [
        (i + 1, t, tf, df, score) for i, (t, tf, df, score) in enumerate(sel)
    ]
    return index.spark.createDataFrame(rows, TERMS_SCHEMA)


def more_like_this(
    index, source: DataFrame, doc_id: int, k: int = 10, **kw
) -> DataFrame:
    """Top-k similar documents -> DataFrame(doc_id, score).  The seed doc is
    not excluded (Lucene leaves exclusion to the caller)."""
    from .search import search

    return search(index, mlt_query(index, source, doc_id, **kw), k=k)
