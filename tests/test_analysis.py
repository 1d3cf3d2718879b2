"""Analyzer goldens, transcribed from the reference's test style
(TestStandardAnalyzer.java:36-161) plus code-specific cases (FIXTURES.md §4)."""

import pandas as pd
import pytest

from voyagr_spark.analysis import (
    ENGLISH_STOP_WORDS,
    MAX_TOKEN_LENGTH,
    analyze_text,
    doc_lengths,
    analyze_series,
    tokenize_series,
)


def raw_tokens(text: str) -> list[str]:
    return tokenize_series(pd.Series([text]))[0]


@pytest.mark.parametrize(
    "text,expected",
    [
        # plain words + lowercase happens later (tokenizer preserves case)
        ("Hello World", ["Hello", "World"]),
        # UAX#29 ExtendNumLet: underscore joins (WB13a/13b)
        ("snake_case_name", ["snake_case_name"]),
        ("_private __dunder__", ["_private", "__dunder__"]),
        # camelCase stays one token (no case-splitting in StandardTokenizer)
        ("camelCaseName", ["camelCaseName"]),
        # MidNumLet dot joins letter runs (WB6/WB7): dotted path is ONE token
        ("pkg.mod.Cls", ["pkg.mod.Cls"]),
        # trailing/leading dot does not join
        ("end. .start", ["end", "start"]),
        # consecutive mids break
        ("a..b", ["a", "b"]),
        # colon is MidLetter in Unicode 6.3 (StandardTokenizerImpl.jflex:41)
        ("std::vector", ["std", "vector"]),  # double colon: two breaks
        ("a:b", ["a:b"]),
        # apostrophe (Single_Quote) joins letters
        ("John's", ["John's"]),
        # numbers: dot and comma join digit runs (WB11/WB12)
        ("3.14", ["3.14"]),
        ("1,024", ["1,024"]),
        # mixed alnum concatenates freely (WB9/WB10)
        ("utf8 2to3 0xFF", ["utf8", "2to3", "0xFF"]),
        # dot between digit and letter breaks
        ("2.x", ["2", "x"]),
        # punctuation/operators are separators
        ("x=1;y=2", ["x", "1", "y", "2"]),
        ("f(a, b) -> c", ["f", "a", "b", "c"]),
        # email-ish: '@' always breaks (StandardTokenizer has no EMAIL type)
        ("user@example.com", ["user", "example.com"]),
        # from TestStandardAnalyzer-style: possessives and hyphens
        ("B2B 2B toll-free", ["B2B", "2B", "toll", "free"]),
        ("", []),
    ],
)
def test_tokenizer_goldens(text, expected):
    assert raw_tokens(text) == expected


def test_huge_doc_like_reference():
    # TestStandardAnalyzer.testHugeDoc:105
    text = " " * 4094 + "testing 1234"
    assert raw_tokens(text) == ["testing", "1234"]


def test_overlong_token_chunked_not_discarded():
    # scanner buffer is 255 chars and never grows -> 300-char run splits
    # into a 255-char + 45-char token (StandardTokenizerImpl.java:505-535)
    tok = "a" * 300
    got = raw_tokens(f"x {tok} y")
    assert got == ["x", "a" * 255, "a" * 45, "y"]
    exact = "b" * MAX_TOKEN_LENGTH
    assert raw_tokens(exact) == [exact]


def test_stopwords_exact_set():
    assert len(ENGLISH_STOP_WORDS) == 33
    assert "the" in ENGLISH_STOP_WORDS and "with" in ENGLISH_STOP_WORDS
    assert "i" not in ENGLISH_STOP_WORDS


def test_stop_filter_leaves_position_holes():
    # positions are pre-stop ordinals: "call the function" -> call@0, function@2
    terms, pos = analyze_text("call the function")
    assert terms == ["call", "function"]
    assert pos == [0, 2]
    # uppercase stopword is lowercased before the stop check
    terms, pos = analyze_text("The Quick brown")
    assert terms == ["quick", "brown"]
    assert pos == [1, 2]


def test_analyze_series_and_doclen():
    terms, pos = analyze_series(pd.Series(["call the function", "a an and", None]))
    assert list(terms[0]) == ["call", "function"]
    assert list(pos[0]) == [0, 2]
    assert list(terms[1]) == []  # all stopwords
    assert list(terms[2]) == []
    # doc length counts survivors only (DefaultIndexingChain.java:636)
    assert list(doc_lengths(terms)) == [2, 0, 0]
