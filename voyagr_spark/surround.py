"""Surround query language (reference `lucene/queryparser/surround`).

The span-query syntax: positional operators `W` (ordered) and `N`
(unordered) with an optional 2..99 distance prefix, plus boolean
AND/OR/NOT — each usable infix (`a 3W b`, `a AND b`) or prefix
(`3W(a, b)`, `AND(a, b, c)`)  (QueryParser.jj:56-70,211-222).

Reference semantics re-expressed:

* `query/DistanceQuery.java:100` — `nW(...)` builds
  `SpanNearQuery(clauses, slop = n - 1, ordered)`; `nN` the unordered
  form; the default distance is 1 (QueryParser.jj:127-131), i.e. slop 0.
* `query/AndQuery.java:33-36` / `OrQuery` / `NotQuery.java:31-40` —
  boolean operators map to BooleanQuery MUST / SHOULD / first-MUST +
  rest-MUST_NOT.
* `query/DistanceQuery.java:134-140` (`distanceSubQueryNotAllowed`) —
  only terms, OR, and nested distance ops may appear inside W/N;
  AND/NOT inside a distance operator is a parse-time error.
* Operator precedence ladder (QueryParser.jj productions): OR < AND <
  NOT < N < W, parens group.

Divergence (documented): surround's `SrndTruncQuery` (`*`/`?`
truncation inside distance ops) requires dictionary expansion inside
span clauses; this subset raises a loud ValueError instead — the
engine's wildcard surface lives on the classic parser (P5).  Terms are
lowercased (the engine's term dictionary is lowercase) but NOT
stop-filtered, matching surround's unanalyzed SimpleTerm.
"""

from __future__ import annotations

import re

from .parser import MUST, MUST_NOT, SHOULD, BooleanQuery, TermQuery
from .spans import SpanNearQuery, SpanOrQuery, SpanQuery, SpanTermQuery

_TOKEN = re.compile(
    r"\s*(?:(?P<lp>\()|(?P<rp>\))|(?P<comma>,)"
    r"|(?P<op>(?:\d{1,2})?[WwNn]\b|AND\b|and\b|OR\b|or\b|NOT\b|not\b)"
    r"|(?P<term>[^\s(),]+))"
)


def _lex(src: str) -> list[tuple[str, str]]:
    out, i = [], 0
    while i < len(src):
        m = _TOKEN.match(src, i)
        if not m or m.end() == m.start():
            if src[i:].strip() == "":
                break
            raise ValueError(f"surround: bad input at {src[i:i + 10]!r}")
        i = m.end()
        for kind in ("lp", "rp", "comma", "op", "term"):
            v = m.group(kind)
            if v is not None:
                out.append((kind, v))
                break
    out.append(("eof", ""))
    return out


def _op_kind(op: str) -> tuple[str, int]:
    """('or'|'and'|'not'|'w'|'n', distance) for an operator token."""
    low = op.lower()
    if low in ("and", "or", "not"):
        return low, 0
    dist = 1 if len(low) == 1 else int(low[:-1])
    if not 1 <= dist <= 99:
        raise ValueError(f"surround: distance out of range in {op!r}")
    return low[-1], dist


class _Parser:
    def __init__(self, toks):
        self.toks = toks
        self.i = 0

    def peek(self):
        return self.toks[self.i]

    def take(self):
        t = self.toks[self.i]
        self.i += 1
        return t

    def parse(self):
        q = self.or_expr()
        if self.peek()[0] != "eof":
            raise ValueError(f"surround: trailing input {self.peek()[1]!r}")
        return q

    def _is_op(self, *kinds):
        k, v = self.peek()
        if k != "op":
            return None
        kind, dist = _op_kind(v)
        return (kind, dist) if kind in kinds else None

    def or_expr(self):
        parts = [self.and_expr()]
        while self._is_op("or"):
            self.take()
            parts.append(self.and_expr())
        if len(parts) == 1:
            return parts[0]
        return BooleanQuery(tuple((SHOULD, p) for p in parts), 0, 1.0)

    def and_expr(self):
        parts = [self.not_expr()]
        while self._is_op("and"):
            self.take()
            parts.append(self.not_expr())
        if len(parts) == 1:
            return parts[0]
        return BooleanQuery(tuple((MUST, p) for p in parts), 0, 1.0)

    def not_expr(self):
        # a NOT b NOT c -> MUST(a), MUST_NOT(b), MUST_NOT(c)
        # (NotQuery.java:31-40)
        first = self.dist_expr()
        if not self._is_op("not"):
            return first
        clauses = [(MUST, first)]
        while self._is_op("not"):
            self.take()
            clauses.append((MUST_NOT, self.dist_expr()))
        return BooleanQuery(tuple(clauses), 0, 1.0)

    def dist_expr(self):
        # N binds looser than W (QueryParser.jj NQuery/WQuery ladder)
        node = self.w_expr()
        while True:
            got = self._is_op("n")
            if not got:
                return node
            self.take()
            rhs = self.w_expr()
            node = self._near([node, rhs], got[1], in_order=False)

    def w_expr(self):
        node = self.primary()
        while True:
            got = self._is_op("w")
            if not got:
                return node
            self.take()
            rhs = self.primary()
            node = self._near([node, rhs], got[1], in_order=True)

    def _near(self, clauses, dist, in_order):
        subs = [self._as_span(c) for c in clauses]
        return SpanNearQuery(subs, slop=dist - 1, in_order=in_order)

    def _as_span(self, q) -> SpanQuery:
        """distanceSubQueryNotAllowed: only terms / OR / nested distance
        ops inside W and N (DistanceQuery.java:134-140)."""
        if isinstance(q, SpanQuery):
            return q
        if isinstance(q, TermQuery):
            return SpanTermQuery(q.term)
        if isinstance(q, BooleanQuery) and all(
            o == SHOULD for o, _ in q.clauses
        ):
            return SpanOrQuery(*[self._as_span(s) for _, s in q.clauses])
        raise ValueError(
            "surround: AND/NOT not allowed inside a distance operator"
        )

    def primary(self):
        k, v = self.peek()
        if k == "lp":
            self.take()
            q = self.or_expr()
            if self.peek()[0] != "rp":
                raise ValueError("surround: expected )")
            self.take()
            return q
        if k == "op":
            # prefix form: OP(a, b, ...) — non-unary ops only
            kind, dist = _op_kind(v)
            self.take()
            if self.peek()[0] != "lp":
                raise ValueError(f"surround: operator {v!r} needs operands")
            self.take()
            parts = [self.or_expr()]
            while self.peek()[0] == "comma":
                self.take()
                parts.append(self.or_expr())
            if self.peek()[0] != "rp":
                raise ValueError("surround: expected )")
            self.take()
            if len(parts) < 2:
                raise ValueError(f"surround: {v!r} needs >= 2 operands")
            if kind == "or":
                return BooleanQuery(tuple((SHOULD, p) for p in parts), 0, 1.0)
            if kind == "and":
                return BooleanQuery(tuple((MUST, p) for p in parts), 0, 1.0)
            if kind == "not":
                return BooleanQuery(
                    tuple([(MUST, parts[0])]
                          + [(MUST_NOT, p) for p in parts[1:]]), 0, 1.0)
            return self._near(parts, dist, in_order=(kind == "w"))
        if k == "term":
            self.take()
            if "*" in v or "?" in v:
                raise ValueError(
                    "surround: truncation (*/?) is not supported in this "
                    "subset — use the classic parser's wildcard surface"
                )
            return TermQuery(v.lower())
        raise ValueError(f"surround: unexpected token {v!r}")


def parse_surround(src: str):
    """Parse a surround query -> engine query tree (classic Query or
    SpanQuery leaves), ready for `search.search`."""
    if not src or not src.strip():
        raise ValueError("surround: empty query")
    return _Parser(_lex(src)).parse()
