"""Classic-QueryParser subset: term, AND / OR / NOT, "phrase".

Mirrors the reference surface required by the north rule
(queryparser/classic/QueryParserBase.java:113 `parse`, analyzer applied per
field at getFieldQuery:470-493) plus the BooleanQuery rewrite simplifications
(BooleanQuery.java:188-199 single-clause collapse; PhraseQuery.java:151-165
0-term -> no-match, 1-term -> TermQuery, positions rebased to 0).

Occur semantics follow BooleanClause: MUST / SHOULD / MUST_NOT.
Query terms run through the same analysis chain as documents, and phrase
positions keep stopword holes (enablePositionIncrements=true default), so
`"call the function"` becomes terms (call@0, function@2).
"""

from __future__ import annotations

import re
from dataclasses import dataclass, field

from .analysis import analyze_text

MUST, SHOULD, MUST_NOT = "MUST", "SHOULD", "MUST_NOT"


@dataclass(frozen=True)
class TermQuery:
    term: str


@dataclass(frozen=True)
class PhraseQuery:
    terms: tuple[str, ...]
    positions: tuple[int, ...]  # rebased to start at 0, holes preserved
    slop: int = 0  # "..."~N edit distance (PhraseQuery.java:91-103); 0 = exact


@dataclass(frozen=True)
class MatchNoDocsQuery:
    reason: str = ""


@dataclass(frozen=True)
class BooleanQuery:
    clauses: tuple[tuple[str, object], ...] = field(default_factory=tuple)
    min_should_match: int = 0


@dataclass(frozen=True)
class PrefixQuery:
    """`foo*` — expands against the term dictionary at plan time and rewrites
    to a constant-score set like Lucene's CONSTANT_SCORE_REWRITE
    (MultiTermQuery.java:65, PrefixQuery.java:32)."""

    prefix: str


@dataclass(frozen=True)
class ConstScoreTerms:
    """Rewritten multi-term query: any of `terms` matches, score = boost
    (ConstantScoreQuery.java:37)."""

    terms: tuple[str, ...]
    boost: float = 1.0


@dataclass(frozen=True)
class DisjunctionMaxQuery:
    """Per-doc max over disjuncts + tie * (sum of the others)
    (DisjunctionMaxQuery.java:46-60)."""

    disjuncts: tuple[object, ...]
    tie: float = 0.0


_TOKEN_SPLIT = re.compile(r'"[^"]*"(?:~\d+)?|\S+')


def _analyze_term(text: str):
    terms, _ = analyze_text(text)
    if not terms:
        return MatchNoDocsQuery(f"term {text!r} analyzed to nothing")
    if len(terms) == 1:
        return TermQuery(terms[0])
    # multi-token term text behaves like a phrase (getFieldQuery:470-493)
    return _phrase(text)


def _phrase(text: str, slop: int = 0):
    terms, pos = analyze_text(text)
    if not terms:
        return MatchNoDocsQuery(f"phrase {text!r} analyzed to nothing")
    if len(terms) == 1:
        return TermQuery(terms[0])  # PhraseQuery.rewrite: 1 term -> TermQuery
    base = pos[0]
    return PhraseQuery(tuple(terms), tuple(p - base for p in pos), slop)


def parse(qtext: str, min_should_match: int = 0):
    """Parse `a AND b`, `a OR b OR c`, `a AND NOT b`, `"x y"`, bare terms.

    Default operator is OR (QueryParserBase default), matching the reference
    query-set classes term | bool_and | bool_or | phrase.
    """
    parts = _TOKEN_SPLIT.findall(qtext.strip())
    clauses: list[tuple[str, object]] = []
    op = SHOULD
    negate_next = False
    saw_and = False
    for p in parts:
        up = p.upper()
        if up in ("AND", "&&"):
            op, saw_and = MUST, True
            # retroactively promote the previous clause to MUST
            if clauses and clauses[-1][0] == SHOULD:
                clauses[-1] = (MUST, clauses[-1][1])
            continue
        if up in ("OR", "||"):
            op = SHOULD
            continue
        if up in ("NOT", "!"):
            negate_next = True
            continue
        if p.startswith("-"):
            negate_next, p = True, p[1:]
        if p.startswith('"'):
            # `"a b"~N` — sloppy phrase (QueryParserBase.getFieldQuery slop
            # handling; SloppyPhraseScorer when slop > 0)
            body, _, slop_s = p[1:].rpartition('"')
            slop = int(slop_s[1:]) if slop_s.startswith("~") else 0
            q = _phrase(body, slop)
        elif p.endswith("*") and len(p) > 1 and '"' not in p:
            q = PrefixQuery(p[:-1].lower())
        else:
            q = _analyze_term(p)
        occur = MUST_NOT if negate_next else (MUST if saw_and and op == MUST else op)
        clauses.append((occur, q))
        negate_next = False

    # drop no-match SHOULD clauses; a no-match MUST kills the query
    kept = []
    for occ, q in clauses:
        if isinstance(q, MatchNoDocsQuery):
            if occ == MUST:
                return MatchNoDocsQuery("MUST clause matches nothing")
            continue
        kept.append((occ, q))
    if not kept:
        return MatchNoDocsQuery("no clauses")
    # BooleanQuery.rewrite: single non-prohibited clause -> the clause itself
    if len(kept) == 1 and kept[0][0] != MUST_NOT:
        return kept[0][1]
    return BooleanQuery(tuple(kept), min_should_match)
