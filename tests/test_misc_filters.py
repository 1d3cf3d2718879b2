"""Misc analysis/common token filters: TrimFilter, LimitTokenCountFilter,
PatternReplaceFilter, KeepWordFilter, TypeTokenFilter — chain order,
position-hole semantics, flat==scalar parity, and meta roundtrips."""

import pandas as pd
import pytest

from voyagr_spark.analysis import Analyzer

CASES = [
    # TrimFilter with a comma tokenizer: whitespace-edged tokens trim;
    # an all-whitespace token becomes the EMPTY token and is KEPT
    (Analyzer(trim=True, token_pattern=r"[^,]+", stopwords=frozenset()),
     " a b , c ,  ",
     (["a b", "c", ""], [0, 1, 2])),
    # LimitTokenCount: first 3 tokenizer tokens only
    (Analyzer(limit_tokens=3), "one two three four five the",
     (["one", "two", "three"], [0, 1, 2])),
    # PatternReplace replaceAll; replacement happens before the stop
    # filter ('the' would drop if the pattern produced it)
    (Analyzer(pattern_replace=(r"\d+", "#")), "abc123 45 test9x the",
     (["abc#", "#", "test#x"], [0, 1, 2])),
    # replaceAll=False: first occurrence only
    (Analyzer(pattern_replace=(r"o", "0", False)), "foo loop the",
     (["f0o", "l0op"], [0, 1])),
    # KeepWordFilter: holes where non-listed words drop
    (Analyzer(keep_words=("alpha", "beta")), "alpha gamma beta the alpha",
     (["alpha", "beta", "alpha"], [0, 2, 4])),
    # TypeTokenFilter stop-types
    (Analyzer(stop_types=("<NUM>",)), "abc 123 x9 42 the",
     (["abc", "x9"], [0, 2])),
    (Analyzer(stop_types=("<ALPHANUM>",)), "abc 123 x9 42 the",
     (["123", "42"], [1, 3])),
]


@pytest.mark.parametrize("an,text,want", CASES)
def test_scalar_goldens(an, text, want):
    assert an.analyze_text(text) == want


@pytest.mark.parametrize("an,text,want", CASES)
def test_flat_matches_scalar(an, text, want):
    terms, pos, doc, dls = an.analyze_flat(pd.Series([text, text]))
    for d in (0, 1):
        m = doc == d
        assert (list(terms[m]), list(pos[m])) == want
        assert dls[d] == len(want[0])


@pytest.mark.parametrize("an,_t,_w", CASES)
def test_meta_roundtrip(an, _t, _w):
    assert Analyzer.from_dict(an.to_dict()) == an


def test_replacement_can_create_stopword():
    """PatternReplaceFilter runs before the stop stage: a replacement
    that lands on a stopword drops with a hole."""
    an = Analyzer(pattern_replace=(r"^thee$", "the"))
    assert an.analyze_text("thee fox") == (["fox"], [1])


def test_limit_applies_before_everything():
    # the limit counts TOKENIZER tokens, so stopwords inside the window
    # still consume budget (LimitTokenCountFilter wraps the tokenizer)
    an = Analyzer(limit_tokens=3)
    assert an.analyze_text("the fox the jumps runs") == (["fox"], [1])


def test_validation_errors():
    with pytest.raises(ValueError, match="limit_tokens"):
        Analyzer(limit_tokens=0)
    with pytest.raises(ValueError, match="unknown token types"):
        Analyzer(stop_types=("<EMAIL>",))
    with pytest.raises(Exception):
        Analyzer(pattern_replace=("(unclosed", "x"))


def test_chain_composition_with_stem():
    """trim/limit/pattern/keep compose with the rest of the chain."""
    an = Analyzer(limit_tokens=4, pattern_replace=(r"e?s$", "", True),
                  stem=None, length_filter=(2, 20))
    # 'runs'->'run', 'berries'->'berri' ('es' matches); 'x' drops (length)
    assert an.analyze_text("runs berries x deep beyond") == (
        ["run", "berri", "deep"], [0, 1, 3])


def test_index_end_to_end_keep_words(spark, tmp_path):
    """A keep_words index only ever sees the listed vocabulary; the
    chain persists in meta and applies to reopened indexes."""
    from voyagr_spark.indexer import Index, build_index

    pdf = pd.DataFrame({
        "repo": ["r"] * 3,
        "path": [f"p{i}" for i in range(3)],
        "commit": ["c"] * 3,
        "lang": ["en"] * 3,
        "content": ["alpha beta gamma", "gamma delta", "alpha alpha"],
    })
    an = Analyzer(keep_words=("alpha", "delta"))
    idx = build_index(spark, spark.createDataFrame(pdf),
                      str(tmp_path / "kw"), num_segments=1, analyzer=an)
    vocab = {r.term for r in
             idx.postings().select("term").distinct().collect()}
    assert vocab == {"alpha", "delta"}
    assert Index(spark, str(tmp_path / "kw")).analyzer.keep_words == \
        ("alpha", "delta")


KWM_CASES = [
    # KeywordMarker protects listed terms from the stemmer
    (Analyzer(stem="porter", keyword_marker=("running",)),
     "running jumps", (["running", "jump"], [0, 1])),
    # Truncate: length-4 prefixes before the stop stage
    (Analyzer(truncate=4), "elephants cat the", (["elep", "cat"], [0, 1])),
    # RemoveDuplicates: a posinc-0 duplicate (here: a synonym map that
    # re-injects the source term) emits once
    (Analyzer(synonyms={"fast": ("fast", "quick")}, remove_duplicates=True),
     "fast dog", (["fast", "quick", "dog"], [0, 0, 1])),
]


@pytest.mark.parametrize("an,text,want", KWM_CASES)
def test_marker_truncate_dedup_scalar_and_flat(an, text, want):
    assert an.analyze_text(text) == want
    terms, pos, doc, _ = an.analyze_flat(pd.Series([text]))
    assert (list(terms), list(pos)) == want
    assert Analyzer.from_dict(an.to_dict()) == an


def test_remove_duplicates_keeps_distinct_positions():
    """The same term at DIFFERENT positions is never deduped
    (RemoveDuplicatesTokenFilter clears `previous` on posinc > 0)."""
    an = Analyzer(remove_duplicates=True)
    assert an.analyze_text("dog dog dog") == (
        ["dog", "dog", "dog"], [0, 1, 2])


def test_truncate_validation():
    with pytest.raises(ValueError, match="truncate"):
        Analyzer(truncate=0)
