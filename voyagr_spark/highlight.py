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


def highlight_offsets(
    index,
    results: DataFrame,
    source: DataFrame,
    query_or_text,
    fragment_size: int = 100,
    pre: str = "<em>",
    post: str = "</em>",
) -> DataFrame:
    """Offsets-based highlighting — the ..._AND_OFFSETS consumer
    (IndexOptions.java:36-53; Lucene's UnifiedHighlighter OFFSETS_FROM_
    POSTINGS strategy): match spans come from the INDEX — query-term
    positions decoded from the top-k docs' postings, mapped to character
    spans through the stored per-doc offset blobs — never from re-analyzing
    the text.  Requires an index built with index_offsets=True; docs the
    offsets writer skipped (regex-fallback path) fall back to re-analysis.

    The top-k doc-id set is collected driver-side (k rows, the same pattern
    as explain); the postings read keeps the term-IN parquet pushdown, so
    only the query terms' rows are scanned."""
    import numpy as np

    from .codec import decode_doc_offsets
    from .search import _group_rows

    if not index.meta.get("offsets"):
        raise ValueError("index was not built with index_offsets=True")
    q = parse(query_or_text) if isinstance(query_or_text, str) else query_or_text
    terms = sorted(query_terms(q))
    want_ids = sorted(
        int(r["doc_id"]) for r in results.select("doc_id").collect()
    )
    want_arr = list(want_ids)

    rows = index.postings().filter(F.col("term").isin(list(terms)))

    def _match_positions(pdf: pd.DataFrame) -> pd.DataFrame:
        want = np.asarray(want_arr, dtype=np.int64)
        out_d: list = []
        out_p: list = []
        for _t, tp in _group_rows(pdf).items():
            d = tp.docs()
            sel = np.isin(d, want)
            if not sel.any():
                continue
            flat, pidx = tp.positions_flat()
            keep = sel[pidx]
            out_d.append(d[pidx[keep]])
            out_p.append(flat[keep])
        if not out_d:
            return pd.DataFrame({"doc_id": pd.Series(dtype="int64"),
                                 "pos": pd.Series(dtype="int64")})
        return pd.DataFrame({"doc_id": np.concatenate(out_d),
                             "pos": np.concatenate(out_p)})

    matches = (
        rows.groupBy("seg")
        .applyInPandas(_match_positions, "doc_id long, pos long")
        .groupBy("doc_id")
        .agg(F.sort_array(F.collect_list("pos")).alias("match_pos"))
    )
    offs = (
        index.docstats()
        .filter(F.col("doc_id").isin(want_ids))
        .select("doc_id", "off_blob")
    )
    hydrated = index.hydrate(results, source).select("doc_id", "score", "content")
    joined = hydrated.join(offs, "doc_id", "left").join(matches, "doc_id", "left")
    tset = set(terms)

    def _frag(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            frags = []
            for content, blob, mpos in zip(
                pdf["content"], pdf["off_blob"], pdf["match_pos"]
            ):
                if blob is None or mpos is None or len(mpos) == 0:
                    # offsets unavailable (fallback-path doc) or no matches
                    frags.append(
                        _best_fragment(content, tset, fragment_size, pre, post)
                    )
                    continue
                frags.append(_fragment_from_offsets(
                    content or "", bytes(blob),
                    np.asarray(mpos, dtype=np.int64),
                    fragment_size, pre, post,
                ))
            yield pd.DataFrame({"doc_id": pdf["doc_id"], "score": pdf["score"],
                                "fragment": frags})

    return joined.mapInPandas(
        _frag, "doc_id long, score float, fragment string"
    )


def _fragment_from_offsets(
    content: str, blob: bytes, mpos, fragment_size: int, pre: str, post: str
) -> str:
    """Best fixed-size window by match count (earliest on ties — the same
    grid and scoring as _best_fragment), spans straight from the stored
    offsets; wrapped tokens truncate at the window edge exactly like the
    re-analysis path (which only sees the window's slice)."""
    import numpy as np

    from .codec import decode_doc_offsets

    st, en = decode_doc_offsets(blob)
    mpos = mpos[mpos < st.size]
    if mpos.size == 0:
        return content[:fragment_size]
    s_off, e_off = st[mpos], en[mpos]
    win, cnts = np.unique(s_off // fragment_size, return_counts=True)
    start = int(win[np.argmax(cnts)]) * fragment_size
    frag_end = min(start + fragment_size, len(content))
    out, last = [], start
    for s_, e_ in zip(s_off.tolist(), e_off.tolist()):
        if s_ < start or s_ >= frag_end:
            continue
        e_ = min(e_, frag_end)
        out.append(content[last:s_])
        out.append(pre + content[s_:e_] + post)
        last = e_
    out.append(content[last:frag_end])
    return "".join(out)


def spellcheck_collate(
    index,
    qtext: str,
    max_collations: int = 1,
    max_tries: int = 5,
    max_edits: int = 2,
) -> "DataFrame":
    """SpellCheckCollator (solr/core .../spelling/SpellCheckCollator.java:
    51-184): rewrite the ORIGINAL query with spelling corrections and
    verify each candidate against the index — only collations that would
    actually return hits are emitted, with their hit counts
    (collation.setHits, :165-169).  -> DataFrame(collation, hits), best
    first, at most max_collations rows.

    Faithful shape:
    * "misspelled" = query terms absent from the dictionary (df == 0),
      checked in ONE bounded term-stats lookup; operators/range keywords
      are never corrected (getCollation replaces only term tokens).
    * candidate combinations iterate in rank order — the sum of each
      correction's suggestion rank, ties by the index tuple — the
      PossibilityIterator's ranked walk (PossibilityIterator.java).
    * each try substitutes corrections INTO the original query text at
      the term's occurrences (getCollation's offset splice, :186-235) and
      re-queries; the verification count is the distributed
      TotalHitCountCollector path (search.count), exactly the reference's
      re-query with rows=0 semantics (:144-156).
    * the loop stops after max_tries verifications or max_collations
      accepted collations (:89)."""
    import re as _re
    from itertools import product

    from .search import count as _count

    opars = {"AND", "OR", "NOT", "TO"}
    toks = _re.findall(r"[A-Za-z0-9_]+", qtext)
    terms = [w for w in dict.fromkeys(toks) if w not in opars]
    dfs = index.term_dfs([w.lower() for w in terms])
    bad = [w for w in terms if dfs.get(w.lower(), 0) == 0]
    schema = "collation string, hits long"
    if not bad:
        return index.spark.createDataFrame([], schema)
    cand: list[list[str]] = []
    for w in bad:
        s = [r["term"] for r in
             suggest(index, w, max_edits=max_edits,
                     top=max_tries).collect()]
        if not s:
            return index.spark.createDataFrame([], schema)
        cand.append(s)
    combos = sorted(
        product(*(range(len(s)) for s in cand)),
        key=lambda idxs: (sum(idxs), idxs),
    )
    rows: list[tuple[str, int]] = []
    tries = 0
    for idxs in combos:
        if tries >= max_tries or len(rows) >= max_collations:
            break
        tries += 1
        coll = qtext
        for w, s, i in zip(bad, cand, idxs):
            coll = _re.sub(rf"\b{_re.escape(w)}\b", s[i], coll)
        hits = _count(index, coll)
        if hits > 0:
            rows.append((coll, int(hits)))
    if not rows:
        return index.spark.createDataFrame([], schema)
    return index.spark.createDataFrame(rows, schema)
