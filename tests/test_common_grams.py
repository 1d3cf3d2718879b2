"""CommonGramsFilter + CommonGramsQueryFilter (lucene/analysis/common
commongrams/): the reference test goldens (CommonGramsFilterTest.java:
95-160 testQueryFilter + testCommonGramsFilter), the posinc-0 overlap
norm discipline, meta persistence, and the end-to-end phrase-to-gram
collapse."""

import pandas as pd
import pytest

from voyagr_spark.analysis import Analyzer

COMMON = frozenset({"s", "of", "the"})


def _an(**kw):
    return Analyzer(stopwords=frozenset(), common_grams=tuple(COMMON), **kw)


def _index(text):
    return _an().analyze_text(text)


def _query(text):
    return _an().query_form().analyze_text(text)


def test_index_filter_goldens():
    # testCommonGramsFilter: unigrams unchanged, grams interleaved at the
    # left word's position
    assert _index("the quick brown") == (
        ["the", "the_quick", "quick", "brown"], [0, 0, 1, 2])
    assert _index("fox of the") == (
        ["fox", "fox_of", "of", "of_the", "the"], [0, 0, 1, 1, 2])
    assert _index("n n n") == (["n", "n", "n"], [0, 1, 2])


# the full testQueryFilter golden table ("s"=common, "n"=not)
QF_GOLDENS = [
    ("brown fox", ["brown", "fox"]),
    ("the fox", ["the_fox"]),
    ("fox of", ["fox_of"]),
    ("of the", ["of_the"]),
    ("the", ["the"]),
    ("foo", ["foo"]),
    ("n n n", ["n", "n", "n"]),
    ("quick brown fox", ["quick", "brown", "fox"]),
    ("quick brown the", ["quick", "brown_the"]),
    ("quick the brown", ["quick_the", "the_brown"]),
    ("fox of the", ["fox_of", "of_the"]),
    ("the quick brown", ["the_quick", "quick", "brown"]),
    ("the fox of", ["the_fox", "fox_of"]),
    ("of the fox", ["of_the", "the_fox"]),
    ("of the of", ["of_the", "the_of"]),
]


@pytest.mark.parametrize("text,want", QF_GOLDENS)
def test_query_filter_goldens(text, want):
    got, pos = _query(text)
    assert got == want
    # positions are the left-word ordinals: strictly ascending by 1
    assert pos == list(range(pos[0], pos[0] + len(pos))) if pos else True


def test_flat_path_matches_scalar_and_discounts_overlaps():
    an = _an()
    texts = ["the quick brown fox", "of the of", "plain words only"]
    terms, pos, doc, doclens = an.analyze_flat(pd.Series(texts))
    flat = sorted(zip(doc.tolist(), pos.tolist(), terms.tolist()))
    scalar = sorted(
        (i, p, t)
        for i, tx in enumerate(texts)
        for t, p in zip(*an.analyze_text(tx))
    )
    assert flat == scalar
    # grams are posinc-0 overlaps: doclen counts unigrams only
    assert doclens.tolist() == [4, 3, 3]


def test_requires_empty_stopwords_and_no_expanders():
    with pytest.raises(ValueError, match="REPLACES the stop filter"):
        Analyzer(common_grams=("the",))
    with pytest.raises(ValueError, match="composes with"):
        Analyzer(stopwords=frozenset(), common_grams=("the",),
                 stem="porter")


def test_meta_roundtrip():
    an = _an()
    assert Analyzer.from_dict(an.to_dict()) == an
    assert not Analyzer.from_dict(an.to_dict()).common_grams_query
    q = an.query_form()
    assert q.common_grams_query and q.common_grams == an.common_grams


def test_end_to_end_phrase_collapses_to_gram(spark, tmp_path):
    """Build a CG index; '"the fox"' must (a) parse to the single gram
    term and (b) return exactly the docs with the adjacent pair, ranked
    identically to an explicit the_fox term query."""
    from voyagr_spark.indexer import build_index
    from voyagr_spark.parser import TermQuery, parse
    from voyagr_spark.search import search

    texts = [
        "the fox jumped over the fence",
        "a fox and the hound",
        "the fox the fox again",
        "no common words here",
        "fox of the north",
    ]
    pdf = pd.DataFrame({
        "repo": ["r"] * len(texts),
        "path": [f"p{i}" for i in range(len(texts))],
        "commit": ["c"] * len(texts),
        "lang": ["en"] * len(texts),
        "content": texts,
    })
    an = _an()
    idx = build_index(spark, spark.createDataFrame(pdf),
                      str(tmp_path / "cg"), num_segments=2, analyzer=an)
    q = parse('"the fox"', analyzer=idx.analyzer)
    assert q == TermQuery("the_fox")
    got = search(idx, '"the fox"', k=10).collect()
    explicit = search(idx, TermQuery("the_fox"), k=10).collect()
    assert [(r["doc_id"], r["score"]) for r in got] == \
           [(r["doc_id"], r["score"]) for r in explicit]
    # only the docs with an ADJACENT 'the fox' pair match (0 and 2);
    # 'fox of the north' and 'a fox and the hound' do not
    assert len(got) == 2
    matched = {r["doc_id"] for r in got}
    assert matched == {
        r["doc_id"] for r in idx.docmap().collect()
        if "the fox" in texts[int(r["path"][1:])]
    }


def _java_cgf(tokens, common):
    """Literal transcription of CommonGramsFilter.incrementToken
    (buffer/savedState machine) — the differential reference."""
    out = []  # (term, posinc)
    buffer = ""
    last_was_common = False
    saved = None
    i = 0
    while True:
        if saved is not None:
            tok = saved
            saved = None
            buffer = tok + "_"
            last_was_common = tok in common
            out.append((tok, 1))
            continue
        if i >= len(tokens):
            break
        tok = tokens[i]
        i += 1
        if last_was_common or (tok in common and buffer):
            saved = tok
            out.append((buffer + tok, 0))
            continue
        buffer = tok + "_"
        last_was_common = tok in common
        out.append((tok, 1))
    return out


def _java_cgqf(cgf_out):
    """Literal transcription of CommonGramsQueryFilter.incrementToken
    (previous/previousType machine)."""
    out = []
    previous = None        # (term, posinc, is_gram)
    previous_type_gram = None
    for term, posinc in cgf_out:
        is_gram = "_" in term and posinc == 0
        cur = (term, posinc, is_gram)
        if previous is not None and not is_gram:
            t, p, g = previous
            previous = cur
            previous_type_gram = g
            out.append((t, 1 if g else p))
            continue
        previous = cur
    if previous is not None and not previous_type_gram:
        t, p, g = previous
        out.append((t, 1 if g else p))
    return out


def test_randomized_differential_vs_java_machines():
    """300 random token streams: our vectorized index/query forms must
    equal the literal Java state machines token-for-token."""
    import random

    from voyagr_spark.analysis import (_common_grams_index,
                                       _common_grams_query)

    rng = random.Random(7)
    vocab = ["s1", "s2", "n1", "n2", "n3", "n4"]
    common = frozenset({"s1", "s2"})
    for _ in range(300):
        n = rng.randint(1, 8)
        toks = [rng.choice(vocab) for _ in range(n)]
        # index form: same terms in the same stream order, with grams at
        # the left word's position
        want_idx = _java_cgf(toks, common)
        got_t, got_p = _common_grams_index(toks, list(range(n)), common)
        # reconstruct positions from the Java posinc stream
        pos, want_pos, want_terms = -1, [], []
        for term, inc in want_idx:
            pos += inc
            want_terms.append(term)
            want_pos.append(pos)
        assert (got_t, got_p) == (want_terms, want_pos), toks
        # query form: same surviving token sequence
        want_q = [t for t, _ in _java_cgqf(want_idx)]
        got_q, _ = _common_grams_query(toks, list(range(n)), common)
        assert got_q == want_q, toks
