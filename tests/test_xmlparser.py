"""XML query parser (queryparser/xml CoreParser) — tree-shape goldens,
equivalence with directly-built queries, and error handling."""

import sys
from pathlib import Path

import pytest

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

from voyagr_spark.analysis import Analyzer
from voyagr_spark.parser import (
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
from voyagr_spark.spans import (
    SpanFirstQuery,
    SpanNearQuery,
    SpanNotQuery,
    SpanOrQuery,
    SpanTermQuery,
)
from voyagr_spark.xmlparser import ParserException, parse_xml


def test_term_query_verbatim_text():
    # TermQueryBuilder does NOT analyze: text passes through verbatim
    assert parse_xml("<TermQuery>Batch</TermQuery>") == TermQuery("Batch")
    assert parse_xml('<TermQuery boost="2.5">x</TermQuery>') == \
        TermQuery("x", boost=2.5)


def test_terms_query_analyzes():
    q = parse_xml('<TermsQuery minimumNumberShouldMatch="2">'
                  "The Batch, and the DUP!</TermsQuery>")
    assert q == BooleanQuery(
        ((SHOULD, TermQuery("batch")), (SHOULD, TermQuery("dup"))),
        min_should_match=2,
    )
    assert isinstance(parse_xml("<TermsQuery>the and of</TermsQuery>"),
                      MatchNoDocsQuery)


def test_boolean_query_occurs():
    q = parse_xml("""
      <BooleanQuery boost="3">
        <Clause occurs="must"><TermQuery>a</TermQuery></Clause>
        <Clause occurs="should"><TermQuery>b</TermQuery></Clause>
        <Clause occurs="mustNot"><TermQuery>c</TermQuery></Clause>
        <Clause occurs="filter"><TermQuery>d</TermQuery></Clause>
      </BooleanQuery>""")
    assert q == BooleanQuery(
        ((MUST, TermQuery("a")), (SHOULD, TermQuery("b")),
         (MUST_NOT, TermQuery("c")), (MUST, TermQuery("d", boost=0.0))),
        boost=3.0,
    )


def test_dismax_and_range():
    q = parse_xml('<DisjunctionMaxQuery tieBreaker="0.3">'
                  "<TermQuery>a</TermQuery><TermQuery>b</TermQuery>"
                  "</DisjunctionMaxQuery>")
    assert q == DisjunctionMaxQuery((TermQuery("a"), TermQuery("b")), tie=0.3)
    q = parse_xml('<RangeQuery lowerTerm="aa" upperTerm="zz"'
                  ' includeUpper="false"/>')
    assert q == TermRangeQuery("aa", "zz", include_lower=True,
                               include_upper=False)


def test_user_query_delegates_to_classic():
    assert parse_xml("<UserQuery>a AND b</UserQuery>") == parse("a AND b")


def test_constant_score_and_filtered():
    q = parse_xml('<ConstantScoreQuery boost="0.5">'
                  '<RangeFilter lowerTerm="ba" upperTerm="bz"/>'
                  "</ConstantScoreQuery>")
    assert q == ConstScoreMulti(lower="ba", upper="bz",
                                include_upper=True, boost=0.5)
    q = parse_xml("<FilteredQuery><Query><TermQuery>x</TermQuery></Query>"
                  "<Filter><TermsFilter>Key fast</TermsFilter></Filter>"
                  "</FilteredQuery>")
    assert q == BooleanQuery((
        (MUST, TermQuery("x")),
        (MUST, ConstScoreTerms(("key", "fast"), boost=0.0)),
    ))
    # CachedFilter unwraps
    q = parse_xml("<ConstantScoreQuery><CachedFilter>"
                  '<RangeFilter lowerTerm="a" upperTerm="b"/>'
                  "</CachedFilter></ConstantScoreQuery>")
    assert q == ConstScoreMulti(lower="a", upper="b", include_upper=True)


def test_boosting_query_default_demote():
    q = parse_xml("<BoostingQuery><Query><TermQuery>m</TermQuery></Query>"
                  "<BoostQuery><TermQuery>c</TermQuery></BoostQuery>"
                  "</BoostingQuery>")
    # BoostingQueryBuilder.java:33 DEFAULT_BOOST = 0.01f
    assert q == BoostingQuery(TermQuery("m"), TermQuery("c"), demote=0.01)


def test_span_family():
    q = parse_xml('<SpanNear slop="2" inOrder="false">'
                  "<SpanTerm>fast</SpanTerm>"
                  "<SpanOrTerms>Key TABLE</SpanOrTerms></SpanNear>")
    assert isinstance(q, SpanNearQuery)
    assert q.slop == 2 and not q.in_order
    assert isinstance(q.clauses[0], SpanTermQuery)
    assert q.clauses[0].term == "fast"
    assert isinstance(q.clauses[1], SpanOrQuery)
    assert {c.term for c in q.clauses[1].clauses} == {"key", "table"}

    q = parse_xml("<SpanNot><Include><SpanTerm>a</SpanTerm></Include>"
                  "<Exclude><SpanTerm>b</SpanTerm></Exclude></SpanNot>")
    assert isinstance(q, SpanNotQuery)
    q = parse_xml('<SpanFirst end="3"><SpanTerm>a</SpanTerm></SpanFirst>')
    assert isinstance(q, SpanFirstQuery) and q.end == 3
    # BoostingTermQuery maps to a plain span term (payloads out of scope)
    assert isinstance(parse_xml("<BoostingTermQuery>x</BoostingTermQuery>"),
                      SpanTermQuery)


def test_match_all():
    assert parse_xml('<MatchAllDocsQuery boost="2"/>') == \
        ConstScoreMulti(boost=2.0)


def test_analyzer_plumbs_through():
    nostop = Analyzer(stopwords=frozenset())
    q = parse_xml("<TermsQuery>the batch</TermsQuery>", analyzer=nostop)
    assert q == BooleanQuery(
        ((SHOULD, TermQuery("the")), (SHOULD, TermQuery("batch"))))


@pytest.mark.parametrize("bad", [
    "<NopeQuery/>",
    "not xml at all <",
    "<TermQuery></TermQuery>",
    '<SpanNear slop="1"><TermQuery>x</TermQuery></SpanNear>',
    "<SpanNear><SpanTerm>x</SpanTerm></SpanNear>",  # slop required
    '<BooleanQuery><Clause occurs="bogus"><TermQuery>x</TermQuery>'
    "</Clause></BooleanQuery>",
    "<BooleanQuery><TermQuery>x</TermQuery></BooleanQuery>",
    "<FilteredQuery><Query><TermQuery>x</TermQuery></Query></FilteredQuery>",
    "<SpanNot><Include><SpanTerm>a</SpanTerm></Include></SpanNot>",
    "<SpanFirst><SpanTerm>a</SpanTerm></SpanFirst>",
    "<SpanOrTerms>the and</SpanOrTerms>",  # analyzes to nothing
])
def test_malformed_raises(bad):
    with pytest.raises((ParserException, ValueError)):
        parse_xml(bad)


def test_engine_equivalence(spark, tmp_path):
    """XML-built queries return bit-identical results to their
    directly-built / classic-parsed twins."""
    from voyagr_spark.indexer import build_index
    from voyagr_spark.search import search

    docs = spark.createDataFrame(
        [("r", f"p/{i}", f"c{i}", "py", t) for i, t in enumerate([
            "fast key table scan", "fast table key", "key value store",
            "fast fast key", "table scan only",
        ])],
        ["repo", "path", "commit", "lang", "content"],
    )
    idx = build_index(spark, docs, str(tmp_path / "idx"), num_segments=2)

    def rows(q):
        return [(r.doc_id, r.score) for r in
                search(idx, q, k=10).orderBy("doc_id").collect()]

    xml = parse_xml("<BooleanQuery>"
                    '<Clause occurs="must"><TermQuery>key</TermQuery></Clause>'
                    '<Clause occurs="should"><TermQuery>fast</TermQuery>'
                    "</Clause></BooleanQuery>")
    twin = BooleanQuery(((MUST, TermQuery("key")),
                         (SHOULD, TermQuery("fast"))))
    assert rows(xml) == rows(twin)

    xml = parse_xml('<SpanNear slop="0" inOrder="true">'
                    "<SpanTerm>fast</SpanTerm><SpanTerm>key</SpanTerm>"
                    "</SpanNear>")
    twin = SpanNearQuery([SpanTermQuery("fast"), SpanTermQuery("key")],
                         slop=0, in_order=True)
    assert rows(xml) == rows(twin)
