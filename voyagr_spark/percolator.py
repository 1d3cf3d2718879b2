"""Prospective search (percolation) — the MemoryIndex use case, Spark-first.

Reference: `lucene/memory/src/java/org/apache/lucene/index/memory/
MemoryIndex.java:86-96` — a single-document in-RAM index whose documented
purpose is running "large numbers of queries over comparatively small
transient realtime data (prospective search)": alerting, profile matching,
classification-by-query.  The Spark-native inversion of control:

* the REGISTERED QUERY SET is small and broadcast (parsed once on the
  driver, shipped to every task — the saved-search table);
* the DOCUMENT STREAM is big: one `mapInPandas` pass analyzes each Arrow
  batch with the standard vectorized chain and evaluates every query
  against each doc's in-memory (term -> positions) map — the per-doc
  MemoryIndex, built in O(doclen) and discarded.

One scan, zero shuffles, no state: the shape that percolates a firehose on
a 1000-executor cluster.  Works identically under Structured Streaming
(`docs.readStream ... mapInPandas` -> writeStream).

Match semantics per query type mirror the engine's scorers (match-only, no
scores — the MemoryIndex percolation contract): boolean occurs with
minShouldMatch, exact/sloppy phrases over hole-preserved positions (the
sloppy walk is the same `sloppy_phrase_freq` PQ implementation the segment
scorer uses), and the multi-term family evaluated against the doc's own
term set (prefix/wildcard/regexp/range/fuzzy).
"""

from __future__ import annotations

import re
from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame

from .analysis import Analyzer, analyze_series
from .parser import (
    BooleanQuery,
    ConstScoreMulti,
    ConstScoreTerms,
    DisjunctionMaxQuery,
    FuzzyQuery,
    MatchNoDocsQuery,
    MultiPhraseQuery,
    PhraseQuery,
    PrefixQuery,
    RegexpQuery,
    TermQuery,
    TermRangeQuery,
    WildcardQuery,
    parse,
)

MUST, SHOULD, MUST_NOT = "MUST", "SHOULD", "MUST_NOT"


def _levenshtein_within(a: str, b: str, k: int) -> bool:
    """Banded edit distance <= k (the FuzzyTermsEnum acceptance test)."""
    if abs(len(a) - len(b)) > k:
        return False
    prev = list(range(len(b) + 1))
    for i, ca in enumerate(a, 1):
        cur = [i] + [0] * len(b)
        best = cur[0]
        for j, cb in enumerate(b, 1):
            cur[j] = min(prev[j] + 1, cur[j - 1] + 1,
                         prev[j - 1] + (ca != cb))
            best = min(best, cur[j])
        if best > k:
            return False
        prev = cur
    return prev[-1] <= k


def _matches(q, tpos: dict[str, list[int]]) -> bool:
    """Does query q match the doc whose (term -> positions) map is tpos?"""
    if isinstance(q, TermQuery):
        return q.term in tpos
    if isinstance(q, MatchNoDocsQuery):
        return False
    if isinstance(q, BooleanQuery):
        musts = [s for occ, s in q.clauses if occ == MUST]
        shoulds = [s for occ, s in q.clauses if occ == SHOULD]
        nots = [s for occ, s in q.clauses if occ == MUST_NOT]
        if any(_matches(s, tpos) for s in nots):
            return False
        if musts and not all(_matches(s, tpos) for s in musts):
            return False
        need = q.min_should_match if musts else max(1, q.min_should_match)
        if shoulds:
            hit = sum(1 for s in shoulds if _matches(s, tpos))
            if hit < need:
                return False
        elif not musts:
            return False
        return True
    if isinstance(q, DisjunctionMaxQuery):
        return any(_matches(s, tpos) for s in q.disjuncts)
    if isinstance(q, PhraseQuery):
        plists = [tpos.get(t) for t in q.terms]
        if any(p is None for p in plists):
            return False
        if q.slop == 0:
            base = set(plists[0])
            off0 = q.positions[0]
            return any(
                all((p - off0 + off) in set(pl)
                    for off, pl in zip(q.positions[1:], plists[1:]))
                for p in base
            )
        from .sloppy import sloppy_phrase_freq

        arrs = [np.asarray(p, dtype=np.int64) for p in plists]
        return float(sloppy_phrase_freq(
            list(q.terms), list(q.positions), arrs, q.slop)) > 0.0
    if isinstance(q, MultiPhraseQuery):
        # per slot: union of member position sets (UnionPostingsEnum)
        slot_sets = []
        for members in q.termsets:
            ps: set = set()
            for t in members:
                ps.update(tpos.get(t, ()))
            if not ps:
                return False
            slot_sets.append(ps)
        if q.slop == 0:
            off0 = q.positions[0]
            return any(
                all((p - off0 + off) in ss
                    for off, ss in zip(q.positions[1:], slot_sets[1:]))
                for p in slot_sets[0]
            )
        from .sloppy import sloppy_phrase_freq

        labels = [f"__slot{i}" for i in range(len(slot_sets))]
        arrs = [np.array(sorted(s), dtype=np.int64) for s in slot_sets]
        return float(sloppy_phrase_freq(
            labels, list(q.positions), arrs, q.slop)) > 0.0
    if isinstance(q, PrefixQuery):
        return any(t.startswith(q.prefix) for t in tpos)
    if isinstance(q, WildcardQuery):
        from .search import _wildcard_regex

        rx = re.compile(_wildcard_regex(q.pattern))
        return any(rx.fullmatch(t) for t in tpos)
    if isinstance(q, RegexpQuery):
        rx = re.compile(q.pattern)
        return any(rx.fullmatch(t) for t in tpos)
    if isinstance(q, TermRangeQuery):
        cs = ConstScoreMulti(q.lower, q.upper, q.include_lower, q.include_upper)
        return any(cs.matches(t) for t in tpos)
    if isinstance(q, ConstScoreMulti):
        return any(q.matches(t) for t in tpos)
    if isinstance(q, ConstScoreTerms):
        return any(t in tpos for t in q.terms)
    if isinstance(q, FuzzyQuery):
        return any(
            t[:q.prefix_length] == q.term[:q.prefix_length]
            and _levenshtein_within(t, q.term, q.max_edits)
            for t in tpos
        )
    if hasattr(q, "doc_spans"):  # span family: the doc's own positions ARE
        # the transient MemoryIndex; match iff any span is produced
        data: dict[str, tuple | None] = {}
        for t in q.all_terms():
            ps = tpos.get(t)
            data[t] = None if ps is None else (
                np.zeros(1, dtype=np.int64),
                np.asarray(ps, dtype=np.int64),
                np.array([0, len(ps)], dtype=np.int64),
                None,
            )
        if q.candidates(data).size == 0:
            return False
        return bool(q.doc_spans(0, data))
    raise TypeError(f"percolator: unsupported query {type(q)}")


def percolate(
    docs: DataFrame,
    queries: dict[str, str],
    id_col: str = "doc_id",
    text_col: str = "text",
    analyzer: Analyzer | None = None,
    syntax: str = "classic",
) -> DataFrame:
    """-> DataFrame(doc_id, query_id): which registered queries match each
    document.  `queries` maps query_id -> query string (engine syntax; a
    pre-built query object — e.g. a span tree — passes through unparsed);
    `syntax="surround"` parses strings with the W/N span language instead.
    Parsing happens once, the parsed set is captured in the task closure
    (broadcast-sized: a saved-search table, not a corpus)."""

    def _parse(qtext):
        if not isinstance(qtext, str):
            return qtext
        if syntax == "surround":
            from .surround import parse_surround

            return parse_surround(qtext)
        return parse(qtext, analyzer=analyzer)

    parsed = {qid: _parse(qtext) for qid, qtext in queries.items()}
    items = sorted(parsed.items())

    def _analyzed(texts: pd.Series):
        if analyzer is None or analyzer.is_standard:
            return analyze_series(texts)
        terms, pos, docidx, _ = analyzer.analyze_flat(texts)
        t_out = [[] for _ in range(len(texts))]
        p_out = [[] for _ in range(len(texts))]
        for t, p, d in zip(terms, pos, docidx):
            t_out[d].append(t)
            p_out[d].append(int(p))
        return pd.Series(t_out), pd.Series(p_out)

    def _run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            terms_s, pos_s = _analyzed(pdf[text_col].astype(str))
            out_d, out_q = [], []
            for did, terms, poss in zip(pdf[id_col], terms_s, pos_s):
                tpos: dict[str, list[int]] = {}
                for t, p in zip(terms, poss):
                    tpos.setdefault(t, []).append(p)
                for qid, q in items:
                    if _matches(q, tpos):
                        out_d.append(did)
                        out_q.append(qid)
            yield pd.DataFrame({"doc_id": pd.Series(out_d, dtype="int64"),
                                "query_id": pd.Series(out_q, dtype="object")})

    return docs.select(id_col, text_col).mapInPandas(
        _run, "doc_id long, query_id string"
    )
