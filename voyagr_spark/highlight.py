"""Highlighting + suggest/spellcheck (SURVEY §2.8), Spark-first.

* highlight(): the Highlighter/SimpleFragmenter/SimpleHTMLFormatter chain
  (lucene/highlighter/src/java/org/apache/lucene/search/highlight/
  Highlighter.java:65-141, SimpleFragmenter.java:43-57,
  SimpleHTMLFormatter.java:31-44): re-tokenize the stored text, split into
  fixed-size fragments at token boundaries, score each fragment by the sum
  of matched query-term hits, return the best fragment with matches wrapped
  in pre/post tags.  Runs as one mapInPandas over the hydrated top-k — the
  top-k is tiny, so this never touches the full corpus.

* suggest(): DirectSpellChecker semantics (lucene/suggest/src/java/org/
  apache/lucene/search/spell/DirectSpellChecker.java:40-60: candidates
  within maxEdits of the query term, ranked by docFreq): a distributed
  scan of the term dictionary with the built-in `levenshtein` expression —
  the term-stats table is range-partitioned by term, the length pre-filter
  prunes via column stats, and the whole rank stays JVM-side (no UDF).
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .analysis import _TOKEN_RE
from .parser import parse
from .search import query_terms


def highlight(
    index,
    results: DataFrame,
    source: DataFrame,
    query_or_text,
    fragment_size: int = 100,
    pre: str = "<em>",
    post: str = "</em>",
) -> DataFrame:
    """-> DataFrame(doc_id, score, fragment) for each result row.

    `results` is a search()/search_many() output (doc_id, score[, query_id]);
    `source` is the original corpus table carrying `content`.
    """
    q = parse(query_or_text) if isinstance(query_or_text, str) else query_or_text
    terms = query_terms(q)
    hydrated = index.hydrate(results, source).select(
        "doc_id", "score", "content"
    )

    def _fragments(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            frags = [
                _best_fragment(c, terms, fragment_size, pre, post)
                for c in pdf["content"]
            ]
            yield pd.DataFrame(
                {"doc_id": pdf["doc_id"], "score": pdf["score"],
                 "fragment": frags}
            )

    return hydrated.mapInPandas(
        _fragments, "doc_id long, score float, fragment string"
    )


def _best_fragment(
    content: str, terms: set, fragment_size: int, pre: str, post: str
) -> str:
    """Fixed `fragment_size`-char windows (SimpleFragmenter's fragment grid);
    fragment score = count of query-term tokens starting inside the window;
    best-scoring window wins, earliest on ties (Highlighter.java
    getBestTextFragments ordering).  Terms are post-analysis query terms, so
    stopwords never highlight."""
    content = content or ""
    if not content:
        return ""
    hits: dict[int, int] = {}
    for mo in _TOKEN_RE.finditer(content):
        if mo.group(0).lower() in terms:
            w = mo.start() // fragment_size
            hits[w] = hits.get(w, 0) + 1
    if not hits:
        return content[:fragment_size]
    best = max(hits.items(), key=lambda kv: (kv[1], -kv[0]))[0]
    start = best * fragment_size
    frag = content[start: start + fragment_size]
    out, last = [], 0
    for mo in _TOKEN_RE.finditer(frag):
        if mo.group(0).lower() in terms:
            out.append(frag[last: mo.start()])
            out.append(pre + mo.group(0) + post)
            last = mo.end()
    out.append(frag[last:])
    return "".join(out)


def suggest(
    index, term: str, max_edits: int = 2, top: int = 5, min_df: int = 1
) -> DataFrame:
    """-> DataFrame(term, df, dist): dictionary terms within `max_edits`
    of `term`, ranked by (dist asc, df desc, term asc).

    DirectSpellChecker ranking (docFreq-ordered candidates within maxEdits).
    The length band |len(t) - len(term)| <= max_edits is a cheap Catalyst
    pre-filter before the levenshtein evaluation; everything is built-in
    expressions, no Python in the path.
    """
    t = term.lower()
    n = len(t)
    cand = (
        index.term_stats()
        .filter(
            (F.length("term") >= n - max_edits)
            & (F.length("term") <= n + max_edits)
            & (F.col("term") != t)
            & (F.col("df") >= min_df)
        )
        .withColumn("dist", F.levenshtein(F.col("term"), F.lit(t)))
        .filter(F.col("dist") <= max_edits)
        .select("term", "df", "dist")
        .orderBy(F.asc("dist"), F.desc("df"), F.asc("term"))
        .limit(top)
    )
    return cand
