"""Byte-class tokenizer kernel == regex analysis chain, property-tested.

The ASCII kernel (analysis._kernel_tokenize / analyze_flat_codes) must be
bit-identical to the regex reference path (analyze_flat) on every input:
same terms, same pre-stop positions, same doc indices, same doclens —
including the regex-fallback routing for non-ASCII and overlong docs and
the doc-order merge of the two paths.
"""

import numpy as np
import pandas as pd
import pytest
from hypothesis import given, settings, strategies as st

from voyagr_spark.analysis import (
    Analyzer,
    STANDARD_ANALYZER,
    analyze_flat,
    analyze_flat_codes,
)


def _expand(res):
    codes, uniq, pos, doc, lens = res
    terms = uniq[codes] if codes.size else np.zeros(0, dtype=object)
    return terms, pos, doc, lens


def assert_same(texts: pd.Series):
    ref = analyze_flat(texts)
    ft, fp, fd, fl = _expand(analyze_flat_codes(texts))
    assert np.array_equal(ref[3], fl), "doclens"
    assert np.array_equal(ref[1], fp), "positions"
    assert np.array_equal(ref[2], fd), "docidx"
    assert ref[0].size == ft.size
    if ft.size:
        assert (ref[0] == ft).all(), "terms"


# alphabet biased toward the interesting classes: letters, digits, the mid
# chars (. , ; : '), the connector `_`, whitespace, punctuation, non-ASCII
# letters and the non-ASCII mid/connector chars
_ALPHA = "ab z AZ09_.,;:'  ()-+/\"\n\t!#éÉ’·․٬‿＿漢"


@settings(max_examples=300, deadline=None)
@given(st.lists(st.text(alphabet=_ALPHA, max_size=80), max_size=8))
def test_kernel_matches_regex_random(texts):
    assert_same(pd.Series(texts, dtype=object))


@settings(max_examples=60, deadline=None)
@given(
    st.lists(
        st.text(alphabet="a1_.'x", min_size=200, max_size=400), max_size=3
    )
)
def test_kernel_matches_regex_overlong_runs(texts):
    # dense token-ish alphabet manufactures >255-char runs -> fallback path
    assert_same(pd.Series(texts, dtype=object))


@pytest.mark.parametrize(
    "doc",
    [
        "",
        "___",
        "_a_",
        "a.b.c x:y 1.2 3,4 a,b a.2 1.a",
        "a..b 1,,2 'quoted' don't",
        "the and of into with",  # all stopwords
        "a\x00b",  # NUL inside content must not merge docs
        "é mixed ascii",
        "_" * 300,
        "x" * 256,
        "1,1" * 200,
        "tip.'.top",
        "a_.b",
        "_1_:2",
    ],
)
def test_kernel_edge_docs(doc):
    assert_same(pd.Series([doc, "plain control doc 42"], dtype=object))


def test_kernel_mixed_fast_slow_batch_order():
    # interleave fallback docs (non-ASCII / overlong) with fast docs and
    # check the merged stream keeps global (doc, pos) order
    texts = pd.Series(
        [
            "alpha beta gamma",
            "é unicode doc",
            "x" * 300 + " tail",
            "plain doc two",
            None,
            "final _doc_ here",
        ],
        dtype=object,
    )
    assert_same(texts)


def test_kernel_empty_series():
    assert_same(pd.Series([], dtype=object))


def test_codes_reference_sorted_uniques():
    codes, uniq, *_ = analyze_flat_codes(
        pd.Series(["zebra apple zebra mango apple"], dtype=object)
    )
    assert list(uniq) == sorted(uniq)
    assert [uniq[c] for c in codes] == ["zebra", "apple", "zebra", "mango", "apple"]


def test_custom_analyzer_codes_path():
    an = Analyzer(token_pattern=r"[a-z]+", lowercase=True, stopwords=frozenset({"xx"}))
    texts = pd.Series(["AA bb xx cc", "xx dd"], dtype=object)
    codes, uniq, pos, doc, lens = an.analyze_flat_codes(texts)
    terms = [uniq[c] for c in codes]
    rt, rp, rd, rl = an.analyze_flat(texts)
    assert terms == list(rt)
    assert np.array_equal(pos, rp) and np.array_equal(doc, rd)
    assert np.array_equal(lens, rl)


def test_standard_analyzer_codes_delegates_to_kernel():
    texts = pd.Series(["some plain doc", "another doc"], dtype=object)
    a = STANDARD_ANALYZER.analyze_flat_codes(texts)
    b = analyze_flat_codes(texts)
    for x, y in zip(a, b):
        assert np.array_equal(x, y)
