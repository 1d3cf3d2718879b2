"""SimpleQueryParser (queryparser/simple/SimpleQueryParser.java): the
never-throws grammar — tree-shape goldens for the state machine's
documented edge cases, plus engine-vs-oracle rank identity."""

import numpy as np
import pytest

from voyagr_spark.parser import (
    MUST,
    MUST_NOT,
    SHOULD,
    BooleanQuery,
    ConstScoreMulti,
    FuzzyQuery,
    MatchNoDocsQuery,
    PhraseQuery,
    PrefixQuery,
    TermQuery,
)
from voyagr_spark.simpleqp import (
    ALL_OPERATORS,
    PREFIX_OPERATOR,
    parse_simple,
)


# -- tree-shape goldens -------------------------------------------------------


def test_default_or():
    q = parse_simple("file handle")
    assert q == BooleanQuery(
        ((SHOULD, TermQuery("file")), (SHOULD, TermQuery("handle")))
    )


def test_default_operator_must():
    q = parse_simple("file handle", default_operator=MUST)
    assert q == BooleanQuery(
        ((MUST, TermQuery("file")), (MUST, TermQuery("handle")))
    )


def test_plus_is_and():
    q = parse_simple("file + handle")
    assert q == BooleanQuery(
        ((MUST, TermQuery("file")), (MUST, TermQuery("handle")))
    )


def test_right_to_left_precedence():
    # a | b + c  ==  (a | b) + c   (javadoc :64-68)
    q = parse_simple("file | handle + parse")
    assert q == BooleanQuery(
        (
            (
                MUST,
                BooleanQuery(
                    ((SHOULD, TermQuery("file")), (SHOULD, TermQuery("handle")))
                ),
            ),
            (MUST, TermQuery("parse")),
        )
    )


def test_not_wrapper():
    q = parse_simple("-file")
    assert q == BooleanQuery(
        ((MUST_NOT, TermQuery("file")), (SHOULD, ConstScoreMulti()))
    )


def test_double_negation_cancels():
    assert parse_simple("--file") == TermQuery("file")


def test_repeated_operator_ignored():
    # second op before a token is ignored (:171-177)
    assert parse_simple("file ++ handle") == parse_simple("file + handle")
    # leading op with no previous token is ignored
    assert parse_simple("+ file") == TermQuery("file")


def test_extraneous_parens():
    # unmatched '(' is re-read as text (:258-262); stray ')' skipped
    assert parse_simple("(file") == TermQuery("file")
    assert parse_simple(")file") == TermQuery("file")
    # '()' resets the pending operator (:263-269)
    assert parse_simple("file + () handle") == BooleanQuery(
        ((SHOULD, TermQuery("file")), (SHOULD, TermQuery("handle")))
    )


def test_subquery_grouping():
    q = parse_simple("file + (handle | parse)")
    assert q == BooleanQuery(
        (
            (MUST, TermQuery("file")),
            (
                MUST,
                BooleanQuery(
                    ((SHOULD, TermQuery("handle")), (SHOULD, TermQuery("parse")))
                ),
            ),
        )
    )


def test_unbalanced_quote_is_text():
    assert parse_simple('"file') == TermQuery("file")
    # '""' resets the pending operator (:325-332)
    assert parse_simple('file + "" handle') == BooleanQuery(
        ((SHOULD, TermQuery("file")), (SHOULD, TermQuery("handle")))
    )


def test_phrase_and_slop():
    q = parse_simple('"parse query"')
    assert q == PhraseQuery(("parse", "query"), (0, 1), 0)
    q = parse_simple('"parse query"~3')
    assert q == PhraseQuery(("parse", "query"), (0, 1), 3)


def test_escaped_quote_stays_in_phrase():
    q = parse_simple('"parse\\" query"')
    assert isinstance(q, PhraseQuery)
    assert q.terms == ("parse", "query")


def test_prefix():
    assert parse_simple("handl*") == PrefixQuery("handl")
    # '*' not at the end is literal token text (analyzed)
    assert parse_simple("han*dl") == BooleanQuery(
        ((SHOULD, TermQuery("han")), (SHOULD, TermQuery("dl")))
    )
    # escaped '*' is not a prefix operator
    assert parse_simple("handl\\*", flags=ALL_OPERATORS) != PrefixQuery("handl")


def test_prefix_flag_off():
    # with PREFIX disabled, 'handl*' is plain text
    q = parse_simple("handl*", flags=ALL_OPERATORS & ~PREFIX_OPERATOR)
    assert q == TermQuery("handl")


def test_fuzzy():
    assert parse_simple("handle~1") == FuzzyQuery("handle", max_edits=1)
    # edits capped at 2 (LevenshteinAutomata max)
    assert parse_simple("handle~9") == FuzzyQuery("handle", max_edits=2)
    # ~0 and unparseable fuzziness -> plain term (:393, :489-492)
    assert parse_simple("handle~0") == TermQuery("handle")
    assert parse_simple("handle~x") == TermQuery("handle")


def test_multi_token_text_is_boolean_not_phrase():
    # QueryBuilder.createBooleanQuery semantics, unlike the classic parser
    q = parse_simple("file.handle")
    assert q == BooleanQuery(
        ((SHOULD, TermQuery("file.handle")),)
    ) or q == BooleanQuery(
        ((SHOULD, TermQuery("file")), (SHOULD, TermQuery("handle")))
    ) or isinstance(q, TermQuery)


def test_empty_and_stopword_only():
    assert isinstance(parse_simple(""), MatchNoDocsQuery)
    assert isinstance(parse_simple("   "), MatchNoDocsQuery)
    assert isinstance(parse_simple("the and of"), MatchNoDocsQuery)


@pytest.mark.parametrize(
    "garbage",
    [
        ")((", "~~", "\\", "a++b", "|||", '"""', "((()))", "-", "+-|",
        "te~rm~", "*", "a AND OR", "((a", 'x"y"z(', "\\\\\\", "-()",
        "a^2",  # '^' is not an operator here: plain text
    ],
)
def test_never_raises(garbage):
    parse_simple(garbage)  # contract: any input parses (:36-46)


# -- engine vs oracle ---------------------------------------------------------

SIMPLE_QUERIES = [
    "file handle",
    "file + handle",
    "file | handle + parse",
    "file + (handle | parse)",
    '"parse query" | open',
    '"parse tree query"~2',
    "handl* + file",
    "open -ident0001",
    "handle~1 | parse",
    "file + handle | open + parse",
]


@pytest.mark.parametrize("qtext", SIMPLE_QUERIES)
def test_engine_matches_oracle(built_index, oracle_index, qtext):
    from voyagr_spark.search import search

    q = parse_simple(qtext)
    got = [
        (r["doc_id"], np.float32(r["score"]))
        for r in search(built_index, q, k=20).collect()
    ]
    want = [(d, np.float32(s)) for d, s in oracle_index.search(q, 20)]
    assert got == want, qtext
