"""WordBreakSpellChecker parity: the reference's OWN test corpus and golden
assertions (TestWordBreakSpellChecker.java:40-260) reproduced over a real
index — English numbers 900..1111 plus the three extra docs."""

import shutil

import pytest

from voyagr_spark.wordbreak import (
    SUGGEST_ALWAYS,
    SUGGEST_WHEN_NOT_IN_INDEX,
    suggest_word_breaks,
    suggest_word_combinations,
)

_ONES = ["", "one", "two", "three", "four", "five", "six", "seven", "eight",
         "nine", "ten", "eleven", "twelve", "thirteen", "fourteen", "fifteen",
         "sixteen", "seventeen", "eighteen", "nineteen"]
_TENS = ["", "", "twenty", "thirty", "forty", "fifty", "sixty", "seventy",
         "eighty", "ninety"]


def _int_to_english(i: int) -> str:
    """English.intToEnglish with '-' and ',' already replaced by the test's
    regexes (TestWordBreakSpellChecker.java:55) — space-joined words."""
    parts = []
    if i >= 1000:
        parts.append(_ONES[i // 1000] + " thousand")
        i %= 1000
    if i >= 100:
        parts.append(_ONES[i // 100] + " hundred")
        i %= 100
    if i >= 20:
        t = _TENS[i // 10]
        parts.append(t + (" " + _ONES[i % 10] if i % 10 else ""))
    elif i > 0:
        parts.append(_ONES[i])
    return " ".join(parts)


@pytest.fixture(scope="module")
def numbers_index(spark, tmp_path_factory):
    from voyagr_spark.indexer import build_index

    texts = [_int_to_english(i) for i in range(900, 1112)]
    texts += [
        "thou hast sand betwixt thy toes",
        "hundredeight eightyeight yeight",
        "tres y cinco",
    ]
    rows = [("numbers", f"doc/{i}", f"c{i}", "en", t)
            for i, t in enumerate(texts)]
    docs = spark.createDataFrame(
        rows, "repo string, path string, commit string, lang string, content string"
    )
    d = tmp_path_factory.mktemp("wordbreak_idx")
    idx = build_index(spark, docs, str(d), num_segments=2)
    yield idx
    shutil.rmtree(d, ignore_errors=True)


def test_combining_words_suggest_always(numbers_index):
    """TestWordBreakSpellChecker.testCombiningWords first block (:88-136)."""
    terms = ["one", "hun", "dred", "eight", "y", "eight"]
    cs = suggest_word_combinations(
        numbers_index, terms, max_suggestions=10, suggest_mode=SUGGEST_ALWAYS,
        max_changes=3, max_combine_word_length=20,
    )
    assert len(cs) == 5
    assert cs[0]["orig_indexes"] == [1, 2]
    assert cs[0]["string"] == "hundred" and cs[0]["score"] == 1
    assert cs[1]["orig_indexes"] == [3, 4]
    assert cs[1]["string"] == "eighty" and cs[1]["score"] == 1
    assert cs[2]["orig_indexes"] == [4, 5]
    assert cs[2]["string"] == "yeight" and cs[2]["score"] == 1
    for s in cs[3:]:
        assert len(s["orig_indexes"]) == 3 and s["score"] == 2
    assert {cs[3]["string"], cs[4]["string"]} == {"hundredeight", "eightyeight"}


def test_combining_words_not_in_index(numbers_index):
    """Second block (:138-152): every suggestion includes an absent term."""
    terms = ["one", "hun", "dred", "eight", "y", "eight"]
    cs = suggest_word_combinations(
        numbers_index, terms, max_suggestions=5,
        suggest_mode=SUGGEST_WHEN_NOT_IN_INDEX, max_changes=3,
    )
    assert len(cs) == 2
    assert cs[0]["orig_indexes"] == [1, 2]
    assert cs[0]["string"] == "hundred" and cs[0]["score"] == 1
    assert cs[1]["orig_indexes"] == [1, 2, 3]
    assert cs[1]["string"] == "hundredeight" and cs[1]["score"] == 2


def test_breaking_ninetynine(numbers_index):
    """testBreakingWords block 1 (:160-172)."""
    sw = suggest_word_breaks(numbers_index, "ninetynine", max_suggestions=5,
                             max_changes=1, min_break_word_length=1,
                             min_suggestion_frequency=1)
    assert len(sw) == 1 and len(sw[0]) == 2
    assert [w["string"] for w in sw[0]] == ["ninety", "nine"]
    assert all(w["score"] == 1 for w in sw[0])


def test_breaking_onethousand_progression(numbers_index):
    """testBreakingWords block 2 (:173-215): maxChanges/minFreq sweep."""
    sw = suggest_word_breaks(numbers_index, "onethousand", max_suggestions=2,
                             max_changes=1)
    assert len(sw) == 1 and [w["string"] for w in sw[0]] == ["one", "thousand"]

    sw = suggest_word_breaks(numbers_index, "onethousand", max_suggestions=1,
                             max_changes=2)
    assert len(sw) == 1 and len(sw[0]) == 2

    sw = suggest_word_breaks(numbers_index, "onethousand", max_suggestions=2,
                             max_changes=2, min_suggestion_frequency=2)
    assert len(sw) == 1 and len(sw[0]) == 2

    sw = suggest_word_breaks(numbers_index, "onethousand", max_suggestions=2,
                             max_changes=2, min_suggestion_frequency=1)
    assert len(sw) == 2
    assert [w["string"] for w in sw[0]] == ["one", "thousand"]
    assert all(w["score"] == 1 for w in sw[0])
    assert sw[0][1]["freq"] > 1 and sw[0][0]["freq"] > sw[0][1]["freq"]
    assert [w["string"] for w in sw[1]] == ["one", "thou", "sand"]
    assert all(w["score"] == 2 for w in sw[1])
    assert sw[1][0]["freq"] > 1
    assert sw[1][1]["freq"] == 1 and sw[1][2]["freq"] == 1


def test_breaking_long_term_needs_enough_changes(numbers_index):
    """testBreakingWords block 3 (:216-233)."""
    t = "onethousandonehundredeleven"
    assert suggest_word_breaks(numbers_index, t, max_suggestions=5,
                               max_changes=3) == []
    sw = suggest_word_breaks(numbers_index, t, max_suggestions=5, max_changes=4)
    assert len(sw) == 1 and len(sw[0]) == 5
    sw = suggest_word_breaks(numbers_index, t, max_suggestions=5, max_changes=5)
    assert len(sw) == 2
    assert len(sw[0]) == 5 and sw[0][1]["string"] == "thousand"
    assert len(sw[1]) == 6
    assert sw[1][1]["string"] == "thou" and sw[1][2]["string"] == "sand"


def test_breaking_astral_codepoint(numbers_index):
    """testBreakingWords block 4 (:234-242): a single astral codepoint is
    too short to break (codepoint semantics, not UTF-16 units)."""
    assert suggest_word_breaks(numbers_index, "\U00029079",
                               max_suggestions=5, max_changes=1) == []


def test_break_when_in_index_modes(numbers_index):
    """An indexed term yields nothing under NOT_IN_INDEX but breaks under
    SUGGEST_ALWAYS (suggestWordBreaks :112-115)."""
    assert suggest_word_breaks(numbers_index, "eighty") == []
    sw = suggest_word_breaks(numbers_index, "eighty",
                             suggest_mode=SUGGEST_ALWAYS)
    assert sw and [w["string"] for w in sw[0]] == ["eight", "y"]


def test_separator_blocks_combination(numbers_index):
    from voyagr_spark.wordbreak import SEPARATOR_TERM

    cs = suggest_word_combinations(
        numbers_index, ["hun", SEPARATOR_TERM, "dred"],
        suggest_mode=SUGGEST_ALWAYS,
    )
    assert cs == []
