"""ComplexPhraseQueryParser: wildcards / fuzzy / ranges / booleans INSIDE
phrases, resolved to span queries.

Reference `lucene/queryparser/src/java/org/apache/lucene/queryparser/
complexPhrase/ComplexPhraseQueryParser.java`:

* Pass 1 (parse): phrase content between quotes is captured verbatim as a
  ComplexPhraseQuery placeholder (:64-100); everything outside quotes is
  the classic grammar.
* Pass 2 (rewrite, :252-335): the phrase content is itself parsed with the
  classic grammar, then every clause becomes a span —
    - TermQuery            -> SpanTermQuery (single-clause contents return
                              the TermQuery unchanged, :254-256)
    - multi-term queries   -> SCORING_BOOLEAN_REWRITE dictionary expansion
                              (:183-193 newRangeQuery forces it) -> SpanOr
                              of the matching terms; TooManyClauses beyond
                              MAX_CLAUSE_COUNT, and an un-matchable dummy
                              span when NO terms match (:287-292 "must
                              match nothing")
    - nested BooleanQuery  -> SpanOr of the group (MUST_NOT members split
                              out as a SpanNot, addComplexPhraseClause
                              :337-380)
  and the sequence combines as SpanNear(slop, inOrder).  Phrases MIXING
  positive and negative clauses return SpanNot(include, exclude) where
  include = near of the positives with slop+numNegatives and exclude = the
  full sequence (:306-335).

Spark-first expansion: the reference enumerates the reader's TermsEnum on
one node; here the predicate's term RANGE + anchored regex push into a
bounded distributed scan of the term dictionary (`expand_multi`), and only
the <= 1024 surviving terms reach the driver — the same plan shape as the
fuzzy rewrite (search.py `_rewrite_fuzzy`).
"""

from __future__ import annotations

from dataclasses import dataclass

from .parser import (
    MAX_CLAUSE_COUNT,
    MUST_NOT,
    BooleanQuery,
    ConstScoreMulti,
    FuzzyQuery,
    MatchNoDocsQuery,
    PrefixQuery,
    RegexpQuery,
    TermQuery,
    TermRangeQuery,
    TooManyClauses,
    WildcardQuery,
    _lex,
    _Parser,
    parse,
)

#: the reference's "Dummy clause because no terms found" span term
#: (ComplexPhraseQueryParser.java:289-291) — a term the tokenizer can
#: never emit, so the span matches nothing
NEVER_TERM = "\u0000__no_terms_found__"


@dataclass(frozen=True)
class ComplexPhraseQuery:
    """Placeholder for quoted content awaiting pass-2 span resolution
    (ComplexPhraseQueryParser.ComplexPhraseQuery, :208-250)."""

    contents: str
    slop: int = 0
    in_order: bool = True
    boost: float = 1.0


class _ComplexParser(_Parser):
    """Classic grammar with phrases captured as ComplexPhraseQuery."""

    def __init__(self, tokens, min_should_match=0, analyzer=None,
                 in_order=True):
        super().__init__(tokens, min_should_match, analyzer)
        self.in_order = in_order

    def parse_atom(self, depth: int):
        kind, val = self.peek()
        if kind == "phrase":
            self.next()
            body, slop = val
            return self._apply_boost(
                ComplexPhraseQuery(body, slop or 0, self.in_order)
            )
        return super().parse_atom(depth)


def parse_complex_phrase(qtext: str, min_should_match: int = 0,
                         analyzer=None, in_order: bool = True):
    """Parse with the ComplexPhraseQueryParser surface: phrase interiors
    keep their wildcard/fuzzy/range/boolean syntax for span resolution."""
    tokens = _lex(qtext.strip())
    if not tokens:
        return MatchNoDocsQuery("empty query")
    if analyzer is not None:
        analyzer = analyzer.query_form()
    p = _ComplexParser(tokens, min_should_match, analyzer, in_order)
    q = p.parse_query(0)
    if p.i < len(p.toks):
        raise ValueError(f"trailing tokens {p.toks[p.i:]!r}")
    return q


# ---------------------------------------------------------------------------
# pass 2: phrase contents -> spans
# ---------------------------------------------------------------------------

def expand_multi(index, cs: ConstScoreMulti) -> list[str]:
    """SCORING_BOOLEAN_REWRITE expansion of one multi-term predicate:
    bounded distributed dictionary scan (range pushed to the parquet scan,
    anchored regex refined executor-side), term-ascending, TooManyClauses
    past MAX_CLAUSE_COUNT (MultiTermQuery.java SCORING_BOOLEAN_REWRITE +
    BooleanQuery.maxClauseCount)."""
    from pyspark.sql import functions as F

    cand = index.term_stats().select("term")
    if cs.lower is not None:
        cand = cand.filter(
            F.col("term") >= cs.lower if cs.include_lower
            else F.col("term") > cs.lower
        )
    if cs.upper is not None:
        cand = cand.filter(
            F.col("term") <= cs.upper if cs.include_upper
            else F.col("term") < cs.upper
        )
    if cs.regex is not None:
        # rlike is unanchored Java regex; ConstScoreMulti.matches is an
        # anchored Python fullmatch — the wildcard-generated dialect
        # (escapes + `.`/`.*`) is common to both
        cand = cand.filter(F.col("term").rlike(f"^(?:{cs.regex})$"))
    rows = cand.orderBy("term").limit(MAX_CLAUSE_COUNT + 1).collect()
    if len(rows) > MAX_CLAUSE_COUNT:
        raise TooManyClauses(
            f"phrase-embedded multi-term expansion exceeds {MAX_CLAUSE_COUNT}"
        )
    return [r["term"] for r in rows]


class Resolver:
    """Dictionary access for pass-2 resolution — one per execution engine.

    `rewrite_multi(q)` rewrites one Prefix/Wildcard/Regexp/TermRange to a
    TermQuery or ConstScoreMulti (the engine's plan-time rewrite, so e.g.
    ReversedWildcardFilter twin ranges apply identically inside phrases);
    `expand(cs)` enumerates the <= MAX_CLAUSE_COUNT matching dictionary
    terms ascending; `fuzzy(fq)` returns the bounded FuzzyTermsEnum
    expansion as boost-carrying TermQuerys."""

    def rewrite_multi(self, q):
        raise NotImplementedError

    def expand(self, cs: ConstScoreMulti) -> list[str]:
        raise NotImplementedError

    def fuzzy(self, fq: FuzzyQuery) -> list[TermQuery]:
        raise NotImplementedError


class EngineResolver(Resolver):
    """Pass-2 resolution against a live Index: plan-time rewrite + the
    bounded distributed dictionary scan (lazy search import — search.py
    imports this module at top level)."""

    def __init__(self, index):
        self.index = index

    def rewrite_multi(self, q):
        from .search import rewrite

        return rewrite(q, self.index)

    def expand(self, cs: ConstScoreMulti) -> list[str]:
        return expand_multi(self.index, cs)

    def fuzzy(self, fq: FuzzyQuery) -> list[TermQuery]:
        from .search import _rewrite_fuzzy

        return _boolean_to_terms(_rewrite_fuzzy(fq, self.index))


def _boolean_to_terms(q) -> list[TermQuery]:
    if isinstance(q, TermQuery):
        return [q]
    if isinstance(q, MatchNoDocsQuery):
        return []
    return [sub for _, sub in q.clauses]


def _expand_to_terms(q, resolver: Resolver) -> list[TermQuery]:
    """One phrase element -> its scoring term expansion."""
    if isinstance(q, (PrefixQuery, WildcardQuery, RegexpQuery,
                      TermRangeQuery)):
        cs = resolver.rewrite_multi(q)
        if isinstance(cs, TermQuery):  # wildcard with no metas
            return [cs]
        return [TermQuery(t, boost=q.boost) for t in resolver.expand(cs)]
    if isinstance(q, FuzzyQuery):
        return resolver.fuzzy(q)
    raise TypeError(
        f"unknown query type {type(q).__name__} in phrase contents"
    )


def _element_to_span(q, resolver: Resolver):
    """One top-level phrase clause -> a span (rewrite loop :268-305)."""
    from . import spans as SP

    if isinstance(q, TermQuery):
        return SP.SpanTermQuery(q.term, boost=q.boost)
    if isinstance(q, BooleanQuery):
        got = _group_to_spans(q, resolver)
        if got is None:
            # "Insert fake term ... - need to prevent match on just 'Fred'"
            return SP.SpanTermQuery(NEVER_TERM)
        return got
    # bare multi-term element e.g. peters*
    terms = _expand_to_terms(q, resolver)
    if not terms:
        return SP.SpanTermQuery(NEVER_TERM)
    if len(terms) == 1:
        return SP.SpanTermQuery(terms[0].term, boost=terms[0].boost)
    return SP.SpanOrQuery(
        *[SP.SpanTermQuery(t.term, boost=t.boost) for t in terms]
    )


def _group_to_spans(bq: BooleanQuery, resolver: Resolver):
    """addComplexPhraseClause (:337-380): a parenthesized group becomes
    SpanOr(positives) [guarded by SpanNot over the group's negatives]."""
    from . import spans as SP

    ors: list = []
    nots: list = []
    for occur, sub in bq.clauses:
        chosen = nots if occur == MUST_NOT else ors
        if isinstance(sub, TermQuery):
            chosen.append(SP.SpanTermQuery(sub.term, boost=sub.boost))
        elif isinstance(sub, BooleanQuery):
            got = _group_to_spans(sub, resolver)
            if got is not None:
                chosen.append(got)
        else:
            for t in _expand_to_terms(sub, resolver):
                chosen.append(SP.SpanTermQuery(t.term, boost=t.boost))
    if not ors:
        return None
    soq = ors[0] if len(ors) == 1 else SP.SpanOrQuery(*ors)
    if not nots:
        return soq
    excl = nots[0] if len(nots) == 1 else SP.SpanOrQuery(*nots)
    return SP.SpanNotQuery(soq, excl)


def rewrite_complex_phrase(q: ComplexPhraseQuery, resolver: Resolver,
                           analyzer=None):
    """Pass-2 resolution (ComplexPhraseQuery.rewrite, :252-335)."""
    from . import spans as SP

    contents = parse(q.contents, analyzer=analyzer)
    if isinstance(contents, TermQuery):
        return TermQuery(contents.term, boost=contents.boost * q.boost)
    if isinstance(contents, MatchNoDocsQuery):
        return contents
    if not isinstance(contents, BooleanQuery):
        # single multi-term phrase content, e.g. "peters*": one element
        span = _element_to_span(contents, resolver)
        span.boost = span.boost * q.boost
        return span
    clauses = contents.clauses
    all_spans = [_element_to_span(sub, resolver) for _, sub in clauses]
    negatives = [occ == MUST_NOT for occ, _ in clauses]
    n_neg = sum(negatives)
    if n_neg == 0:
        return SP.SpanNearQuery(
            all_spans, slop=q.slop, in_order=q.in_order, boost=q.boost
        )
    positives = [s for s, neg in zip(all_spans, negatives) if not neg]
    if len(positives) == 1:
        include = positives[0]
    else:
        # "increase slop factor based on gaps introduced by negatives"
        include = SP.SpanNearQuery(
            positives, slop=q.slop + n_neg, in_order=q.in_order
        )
    exclude = SP.SpanNearQuery(all_spans, slop=q.slop, in_order=q.in_order)
    return SP.SpanNotQuery(include, exclude, boost=q.boost)
