"""HTMLStripCharFilter analog: the reference's own goldens
(HTMLStripCharFilterTest.java) + the char-filter position in the chain."""

import pandas as pd
import pytest

from voyagr_spark.analysis import Analyzer, strip_html, strip_html_series


GOLDENS = [
    # testInlineTagsNoSpace (:488-492): inline elements strip to NOTHING
    ('one<sPAn class="invisible">two<sup>2<sup>e</sup></sup>.</SpaN>three',
     "onetwo2e.three"),
    # testEntities (:101-106) — nbsp maps to ' ' like the reference table
    ("&nbsp; &lt;foo&gt; &Uuml;bermensch &#61; &Gamma; bar &#x393;",
     "  <foo> Übermensch = Γ bar Γ"),
    # testGamma (:97-99)
    ("&Gamma;", "Γ"),
    # testBR (:469-479): non-inline tags replace with '\n'
    ("one<BR />two<br>three", "one\ntwo\nthree"),
    ("one<BR some stuff here too>two</BR>", "one\ntwo\n"),
    # testComment (:343-350)
    ("<!--- three dashes, still a valid comment ---> ", " "),
    ("<! -- blah > ", " "),
    # unterminated comment strips to EOF (:352-356)
    ("<!--foo bar baz", ""),
    # testScriptQuotes (:435-443): block content vanishes, '\n' remains
    ("one<script attr= bare><!-- action('<!-- comment -->', "
     '"\\"-->\\""); --></script>two', "one\ntwo"),
    ("hello<script><!-- f('<!--internal--></script>'); --></script>",
     "hello\n"),
    # testStyle (:452-460)
    ("one<style type=\"text/css\">\n<!--\n@import url('http://x/css.css');"
     "\n-->\n</style>two", "one\ntwo"),
    # uppercase entity variants (:536-540 subset)
    ("&QUOT;x&AMP;y&LT;z&GT;", '"x&y<z>'),
    # plain text untouched
    ("no markup here", "no markup here"),
    ("", ""),
]


@pytest.mark.parametrize("test,gold", GOLDENS)
def test_strip_html_goldens(test, gold):
    assert strip_html(test) == gold


def test_strip_html_series_matches_scalar():
    texts = pd.Series([t for t, _ in GOLDENS] + [None])
    got = strip_html_series(texts).tolist()
    assert got == [g for _, g in GOLDENS] + [""]


def test_analyzer_strip_html_chain():
    """The char filter runs BEFORE the tokenizer: markup never tokenizes,
    entity-decoded text does."""
    an = Analyzer(strip_html=True)
    terms, positions = an.analyze_text(
        "one<span>two</span> <p>three</p> &amp; <script>x=1;</script>four"
    )
    assert terms == ["onetwo", "three", "four"]
    assert positions == [0, 1, 2]
    # serialization round-trip keeps the flag
    assert Analyzer.from_dict(an.to_dict()).strip_html is True
    assert not an.is_standard


def test_analyzer_strip_html_batch_matches_scalar():
    an = Analyzer(strip_html=True)
    texts = pd.Series([
        "alpha <b>beta</b>&nbsp;gamma",
        "<style>p{}</style>delta <i>eps</i>ilon",
        "plain words only",
    ])
    terms, pos, docidx, doclens = an.analyze_flat(texts)
    per_doc = [[] for _ in range(len(texts))]
    for t, d in zip(terms, docidx):
        per_doc[d].append(t)
    want = [an.analyze_text(t)[0] for t in texts]
    assert per_doc == want


def test_strip_html_index_end_to_end(spark, tmp_path):
    """An index built with Analyzer(strip_html=True): markup terms are not
    searchable, content terms are — and the analyzer persists in meta."""
    from voyagr_spark.indexer import Index, build_index
    from voyagr_spark.search import search

    docs = spark.createDataFrame(
        [("r", "a", "c1", "en",
          "the <b>quick</b> fox<br>jumped &amp; ran <script>var qq=1;"
          "</script>over"),
         ("r", "b", "c2", "en", "quick script content here")],
        "repo string, path string, commit string, lang string, content string",
    )
    d = str(tmp_path / "idx")
    idx = build_index(spark, docs, d, num_segments=1,
                      analyzer=Analyzer(strip_html=True))
    assert {r["doc_id"] for r in search(idx, "quick", k=10).collect()} == {0, 1}
    # 'script'/'var'/'qq' from markup never entered doc 0's postings
    assert {r["doc_id"] for r in search(idx, "script", k=10).collect()} == {1}
    assert search(idx, "qq", k=10).collect() == []
    # reloaded index analyzes queries through the persisted chain
    idx2 = Index(spark, d)
    assert idx2.analyzer is not None and idx2.analyzer.strip_html
