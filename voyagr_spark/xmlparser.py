"""XML query parser — the lucene/queryparser/xml CoreParser surface.

Re-expresses CoreParser (xml/CoreParser.java:40-99) + the extension
builders this engine already covers (CorePlusExtensionsParser.java:55
BoostingQuery) over the existing query dataclasses: every element builder
maps 1:1 onto a query type the engine executes, so the XML surface adds
zero new execution paths — it is a faithful front-end.

Element set (builder file -> our query):

* ``TermQuery`` (TermQueryBuilder.java) -> TermQuery; text used verbatim
  (the reference does NOT analyze TermQuery text).
* ``TermsQuery`` (TermsQueryBuilder.java) -> BooleanQuery of SHOULD
  TermQueries from the ANALYZED element text, with
  ``minimumNumberShouldMatch``.
* ``MatchAllDocsQuery`` (MatchAllDocsQueryBuilder.java) -> unbounded
  ConstScoreMulti (documented divergence: a document with zero indexed
  terms cannot match — the engine has no docs-without-postings iterator).
* ``BooleanQuery`` (BooleanQueryBuilder.java) -> BooleanQuery;
  ``<Clause occurs="must|should|mustNot|filter">`` children
  (filter = non-scoring MUST: the sub-query's boost is forced to 0, the
  BooleanFilter analog).  ``disableCoord`` accepted and ignored — BM25's
  coord is identity (BooleanWeight.coord, BM25 override).
* ``DisjunctionMaxQuery`` (DisjunctionMaxQueryBuilder.java) ->
  DisjunctionMaxQuery with ``tieBreaker``.
* ``UserQuery`` (UserInputQueryBuilder.java) -> the classic QueryParser
  grammar over the element text.
* ``RangeQuery`` (RangeQueryBuilder.java) -> TermRangeQuery
  (``lowerTerm``/``upperTerm``/``includeLower``/``includeUpper``).
* ``ConstantScoreQuery`` (ConstantScoreQueryBuilder.java) wrapping a
  ``RangeFilter``/``TermsFilter`` -> ConstScoreMulti / ConstScoreTerms.
* ``FilteredQuery`` (FilteredQueryBuilder.java) -> BooleanQuery
  [(MUST, query), (MUST, filter-with-boost-0)] — FILTER semantics:
  required, never scores.  ``CachedFilter`` unwraps to its child (the
  engine's index-version-keyed result cache subsumes per-filter caching).
* Spans: ``SpanTerm``, ``SpanOr``, ``SpanOrTerms`` (analyzed),
  ``SpanNear`` (``slop``/``inOrder``), ``SpanNot`` (``Include``/
  ``Exclude``), ``SpanFirst`` (``end``) -> the spans.py family.
* ``BoostingTermQuery`` (BoostingTermBuilder.java) -> SpanTermQuery
  (documented divergence: payload scoring is out of scope, the span term
  scores plain BM25).
* ``BoostingQuery`` (BoostingQueryBuilder.java) -> BoostingQuery with
  the reference's ``<Query>``/``<BoostQuery boost=...>`` children and
  DEFAULT_BOOST = 0.01.

Unknown elements raise ParserException, mirroring
QueryBuilderFactory.getQueryBuilder's "no builder" failure.
"""

from __future__ import annotations

import xml.etree.ElementTree as ET

from .analysis import Analyzer, STANDARD_ANALYZER
from .parser import (
    MUST,
    MUST_NOT,
    SHOULD,
    BooleanQuery,
    BoostingQuery,
    ConstScoreMulti,
    ConstScoreTerms,
    DisjunctionMaxQuery,
    MatchNoDocsQuery,
    TermQuery,
    TermRangeQuery,
    parse,
)
from .spans import (
    SpanFirstQuery,
    SpanNearQuery,
    SpanNotQuery,
    SpanOrQuery,
    SpanTermQuery,
)


class ParserException(ValueError):
    """xml/ParserException.java — malformed or unsupported query XML."""


def _boost(el: ET.Element, default: float = 1.0) -> float:
    return float(el.get("boost", default))


def _with_boost(q, boost: float):
    if boost == 1.0:
        return q
    from dataclasses import replace as _replace

    try:
        return _replace(q, boost=q.boost * boost)
    except TypeError:
        # span classes are plain objects; they all carry a mutable boost
        q.boost = q.boost * boost
        return q


def _text(el: ET.Element) -> str:
    return (el.text or "").strip()


def _bool_attr(el: ET.Element, name: str, default: bool) -> bool:
    v = el.get(name)
    if v is None:
        return default
    return v.strip().lower() == "true"


def _children(el: ET.Element) -> list[ET.Element]:
    return list(el)


def _only_child(el: ET.Element) -> ET.Element:
    kids = _children(el)
    if len(kids) != 1:
        raise ParserException(
            f"<{el.tag}> expects exactly one child element, got {len(kids)}"
        )
    return kids[0]


class XmlQueryParser:
    """CoreParser analog: ``parse(xml_string) -> query object``.

    The analyzer is used exactly where the reference uses it — TermsQuery,
    SpanOrTerms, and UserQuery text; TermQuery/SpanTerm text passes
    through verbatim (TermQueryBuilder.java:37-42 reads the raw text)."""

    def __init__(self, analyzer: Analyzer = STANDARD_ANALYZER):
        self.analyzer = analyzer.query_form()

    # -- entry point ---------------------------------------------------------
    def parse(self, xml: str):
        try:
            root = ET.fromstring(xml)
        except ET.ParseError as exc:
            raise ParserException(f"malformed query XML: {exc}") from exc
        return self._query(root)

    # -- query element dispatch ----------------------------------------------
    def _query(self, el: ET.Element):
        fn = getattr(self, f"_q_{el.tag}", None)
        if fn is None:
            raise ParserException(f"no builder for element <{el.tag}>")
        return fn(el)

    def _analyzed_terms(self, text: str) -> list[str]:
        terms, _ = self.analyzer.analyze_text(text)
        return terms

    def _q_TermQuery(self, el):
        t = _text(el)
        if not t:
            raise ParserException("<TermQuery> requires term text")
        return TermQuery(t, boost=_boost(el))

    def _q_TermsQuery(self, el):
        terms = self._analyzed_terms(_text(el))
        if not terms:
            return MatchNoDocsQuery("TermsQuery analyzed to no terms")
        msm = int(el.get("minimumNumberShouldMatch", "0"))
        return BooleanQuery(
            tuple((SHOULD, TermQuery(t)) for t in terms),
            min_should_match=msm,
            boost=_boost(el),
        )

    def _q_MatchAllDocsQuery(self, el):
        return ConstScoreMulti(boost=_boost(el))

    def _q_BooleanQuery(self, el):
        clauses = []
        msm = int(el.get("minimumNumberShouldMatch", "0"))
        for c in _children(el):
            if c.tag != "Clause":
                raise ParserException(
                    f"<BooleanQuery> children must be <Clause>, got <{c.tag}>"
                )
            occurs = (c.get("occurs") or "should").strip()
            sub = self._query(_only_child(c))
            if occurs == "must":
                clauses.append((MUST, sub))
            elif occurs == "should":
                clauses.append((SHOULD, sub))
            elif occurs == "mustNot":
                clauses.append((MUST_NOT, sub))
            elif occurs == "filter":
                clauses.append((MUST, _as_filter(sub)))
            else:
                raise ParserException(f"invalid occurs value '{occurs}'")
        return BooleanQuery(tuple(clauses), min_should_match=msm,
                            boost=_boost(el))

    def _q_DisjunctionMaxQuery(self, el):
        kids = [self._query(c) for c in _children(el)]
        if not kids:
            raise ParserException("<DisjunctionMaxQuery> needs children")
        return DisjunctionMaxQuery(
            tuple(kids), tie=float(el.get("tieBreaker", "0.0")),
            boost=_boost(el),
        )

    def _q_UserQuery(self, el):
        q = parse(_text(el), analyzer=self.analyzer)
        return _with_boost(q, _boost(el))

    def _q_RangeQuery(self, el):
        lower = el.get("lowerTerm")
        upper = el.get("upperTerm")
        return TermRangeQuery(
            lower, upper,
            include_lower=_bool_attr(el, "includeLower", True),
            include_upper=_bool_attr(el, "includeUpper", True),
            boost=_boost(el),
        )

    def _q_ConstantScoreQuery(self, el):
        return _with_boost(self._filter(_only_child(el)), _boost(el))

    def _q_FilteredQuery(self, el):
        qel = el.find("Query")
        fel = el.find("Filter")
        if qel is None or fel is None:
            raise ParserException(
                "<FilteredQuery> requires <Query> and <Filter> children"
            )
        main = self._query(_only_child(qel))
        filt = _as_filter(self._filter(_only_child(fel)))
        return BooleanQuery(((MUST, main), (MUST, filt)), boost=_boost(el))

    def _q_BoostingQuery(self, el):
        qel = el.find("Query")
        bel = el.find("BoostQuery")
        if qel is None or bel is None:
            raise ParserException(
                "<BoostingQuery> requires <Query> and <BoostQuery> children"
            )
        main = self._query(_only_child(qel))
        context = self._query(_only_child(bel))
        # BoostingQueryBuilder.java:33 DEFAULT_BOOST = 0.01f
        demote = float(bel.get("boost", "0.01"))
        return BoostingQuery(main, context, demote=demote, boost=_boost(el))

    # -- spans ----------------------------------------------------------------
    def _span(self, el: ET.Element):
        q = self._query(el)
        if not isinstance(q, (SpanTermQuery, SpanOrQuery, SpanNearQuery,
                              SpanNotQuery, SpanFirstQuery)):
            raise ParserException(
                f"<{el.tag}> is not a span query (SpanQueryBuilderFactory)"
            )
        return q

    def _q_SpanTerm(self, el):
        t = _text(el)
        if not t:
            raise ParserException("<SpanTerm> requires term text")
        return SpanTermQuery(t, boost=_boost(el))

    # BoostingTermBuilder.java builds PayloadTermQuery; payloads are out of
    # scope (COVERAGE.md divergences) — the term spans score plain BM25
    _q_BoostingTermQuery = _q_SpanTerm

    def _q_SpanOr(self, el):
        kids = [self._span(c) for c in _children(el)]
        if not kids:
            raise ParserException("<SpanOr> needs child spans")
        return SpanOrQuery(*kids, boost=_boost(el))

    def _q_SpanOrTerms(self, el):
        terms = self._analyzed_terms(_text(el))
        if not terms:
            raise ParserException("<SpanOrTerms> analyzed to no terms")
        return SpanOrQuery(*(SpanTermQuery(t) for t in terms),
                           boost=_boost(el))

    def _q_SpanNear(self, el):
        slop = el.get("slop")
        if slop is None:
            raise ParserException("<SpanNear> requires a slop attribute")
        kids = [self._span(c) for c in _children(el)]
        if not kids:
            raise ParserException("<SpanNear> needs child spans")
        return SpanNearQuery(kids, slop=int(slop),
                             in_order=_bool_attr(el, "inOrder", True),
                             boost=_boost(el))

    def _q_SpanNot(self, el):
        iel = el.find("Include")
        eel = el.find("Exclude")
        if iel is None or eel is None:
            raise ParserException(
                "<SpanNot> requires <Include> and <Exclude> children"
            )
        return SpanNotQuery(self._span(_only_child(iel)),
                            self._span(_only_child(eel)),
                            boost=_boost(el))

    def _q_SpanFirst(self, el):
        end = el.get("end")
        if end is None:
            raise ParserException("<SpanFirst> requires an end attribute")
        return SpanFirstQuery(self._span(_only_child(el)), end=int(end),
                              boost=_boost(el))

    # -- filter elements (FilterBuilderFactory) -------------------------------
    def _filter(self, el: ET.Element):
        if el.tag == "RangeFilter":
            return ConstScoreMulti(
                lower=el.get("lowerTerm"),
                upper=el.get("upperTerm"),
                include_lower=_bool_attr(el, "includeLower", True),
                include_upper=_bool_attr(el, "includeUpper", True),
            )
        if el.tag == "TermsFilter":
            terms = self._analyzed_terms(_text(el))
            if not terms:
                return MatchNoDocsQuery("TermsFilter analyzed to no terms")
            return ConstScoreTerms(tuple(terms))
        if el.tag == "CachedFilter":
            # the engine's result cache is index-version-keyed; unwrap
            return self._filter(_only_child(el))
        # a query used in filter position (FilterBuilderFactory falls back
        # to QueryWrapperFilter semantics)
        return self._query(el)


def _as_filter(q):
    """Force a query into filter (non-scoring) position: boost 0 makes
    every BM25/const score exactly 0.0f while the match set is unchanged
    — BooleanClause.Occur.FILTER semantics."""
    from dataclasses import replace as _replace

    try:
        return _replace(q, boost=0.0)
    except TypeError:
        q.boost = 0.0
        return q


def parse_xml(xml: str, analyzer: Analyzer = STANDARD_ANALYZER):
    """Module-level convenience: CoreParser(analyzer).parse(stream)."""
    return XmlQueryParser(analyzer).parse(xml)
