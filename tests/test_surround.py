"""Surround query language (lucene/queryparser/surround analog)."""

import sys
from pathlib import Path

import pytest

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

from voyagr_spark.parser import MUST, MUST_NOT, SHOULD, BooleanQuery, TermQuery
from voyagr_spark.spans import SpanNearQuery, SpanOrQuery, SpanTermQuery
from voyagr_spark.surround import parse_surround


def test_distance_ops_infix_and_prefix():
    q = parse_surround("a 3W b")
    assert isinstance(q, SpanNearQuery) and q.slop == 2 and q.in_order
    assert [c.term for c in q.clauses] == ["a", "b"]
    p = parse_surround("3W(a, b)")
    assert repr(p) == repr(q)
    n = parse_surround("5N(a, b)")
    assert isinstance(n, SpanNearQuery) and n.slop == 4 and not n.in_order
    # default distance is 1 -> slop 0 (QueryParser.jj getOpDistance)
    assert parse_surround("a w b").slop == 0
    assert parse_surround("W(a, b, c)").slop == 0


def test_precedence_w_tighter_than_n_than_not_and_or():
    q = parse_surround("a OR b AND c NOT d N e W f")
    assert isinstance(q, BooleanQuery)
    assert [o for o, _ in q.clauses] == [SHOULD, SHOULD]
    rhs = q.clauses[1][1]  # b AND (c NOT (d N (e W f)))
    assert isinstance(rhs, BooleanQuery)
    assert [o for o, _ in rhs.clauses] == [MUST, MUST]
    notq = rhs.clauses[1][1]
    assert [o for o, _ in notq.clauses] == [MUST, MUST_NOT]
    nq = notq.clauses[1][1]
    assert isinstance(nq, SpanNearQuery) and not nq.in_order
    assert isinstance(nq.clauses[1], SpanNearQuery) and nq.clauses[1].in_order


def test_or_inside_distance_becomes_span_or():
    q = parse_surround("2W((a OR b), c)")
    assert isinstance(q, SpanNearQuery) and q.slop == 1
    assert isinstance(q.clauses[0], SpanOrQuery)
    assert isinstance(q.clauses[1], SpanTermQuery)


def test_boolean_prefix_forms():
    q = parse_surround("AND(a, b, c)")
    assert isinstance(q, BooleanQuery)
    assert [o for o, _ in q.clauses] == [MUST, MUST, MUST]
    q = parse_surround("NOT(a, b)")
    assert [o for o, _ in q.clauses] == [MUST, MUST_NOT]


def test_terms_lowercased_not_stop_filtered():
    q = parse_surround("The W Quick")
    assert [c.term for c in q.clauses] == ["the", "quick"]


@pytest.mark.parametrize("src,err", [
    ("a AND", "unexpected token"),
    ("(a OR b", "expected"),
    ("W(a)", ">= 2 operands"),
    ("2W(a AND b, c)", "not allowed inside a distance"),
    ("a NOT b W (c AND d)", "not allowed inside a distance"),
    ("fil* w key", "truncation"),
    ("", "empty query"),
    ("200W(a, b)", "needs operands"),  # 200W lexes as term 200 + W(...)? no:
])
def test_parse_errors(src, err):
    with pytest.raises(ValueError):
        parse_surround(src)


def test_engine_equivalences(built_index):
    from voyagr_spark.search import search

    def run(q):
        return [(r["doc_id"], r["score"]) for r in search(built_index, q, k=20).collect()]

    # surround 'w' == directly-built SpanNear slop 0 ordered
    assert run(parse_surround("parse w query w tree")) == run(
        SpanNearQuery(
            [SpanNearQuery([SpanTermQuery("parse"), SpanTermQuery("query")],
                           slop=0, in_order=True), SpanTermQuery("tree")],
            slop=0, in_order=True,
        )
    )
    # boolean surround == classic parser query
    from voyagr_spark.parser import parse

    assert run(parse_surround("file AND open")) == run(parse("file AND open"))
    assert run(parse_surround("file NOT open")) == run(parse("file -open"))
    assert run(parse_surround("OR(file, merge)")) == run(parse("file OR merge"))
