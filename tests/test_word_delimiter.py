"""WordDelimiterFilter (default factory config) — reference goldens from
WordDelimiterFilter.java:50-75 javadoc + WordDelimiterIterator.java rules,
batch/scalar parity, and end-to-end index+search over the expanded stream."""

import sys
from pathlib import Path

import pandas as pd
import pytest

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

from voyagr_spark.analysis import Analyzer, word_delimiter_parts

WDF = Analyzer(token_pattern=r"\S+", word_delimiter=True)


# WordDelimiterFilter.java:50-66 javadoc goldens (default config,
# combinations=0) + WordDelimiterIterator.java:97-103 constructor examples
@pytest.mark.parametrize("token,parts", [
    ("Wi-Fi", ["Wi", "Fi"]),                      # intra-word delimiter
    ("PowerShot", ["Power", "Shot"]),             # case transition
    ("SD500", ["SD", "500"]),                     # letter-number transition
    ("O'Neil's", ["O", "Neil"]),                  # possessive stripped
    ("//hello---there,", ["hello", "there"]),     # lead/trail delims ignored
    ("'dude'", ["dude"]),
    ("j2se", ["j", "2", "se"]),                   # splitOnNumerics
    ("500XL", ["500", "XL"]),
    ("ABCd", ["AB", "Cd"]),                       # acronym-run rule
    ("TransAM", ["Trans", "AM"]),
    ("A's+B's&C's", ["A", "B", "C"]),
    ("Super-Duper-XL500-42-AutoCoder!", [
        "Super", "Duper", "XL", "500", "42", "Auto", "Coder"]),
    ("hello", ["hello"]),                         # no-op passthrough
    ("---", []),                                  # all-delimiter token drops
    ("don't", ["don", "t"]),                      # bare ' is a plain delim
])
def test_reference_goldens(token, parts):
    assert word_delimiter_parts(token) == parts


def test_positions_reordinal_with_stop_holes():
    # combinations=0: each part takes one position; the stop filter then
    # leaves holes exactly like the standard chain (A7)
    terms, pos = WDF.analyze_text("The O'Neil's PowerShot500 is j2se-ready")
    assert terms == ["o", "neil", "power", "shot", "500", "j", "2", "se",
                     "ready"]
    assert pos == [1, 2, 3, 4, 5, 7, 8, 9, 10]  # holes at 'the'(0), 'is'(6)


def test_flat_matches_scalar():
    texts = [
        "The O'Neil's PowerShot500 is j2se-ready",
        "plain words here",
        "",
        "Wi-Fi Wi-Fi SD500",
    ]
    t, p, d, lens = WDF.analyze_flat(pd.Series(texts))
    flat = []
    for i, txt in enumerate(texts):
        terms, pos = WDF.analyze_text(txt)
        assert lens[i] == len(terms)
        flat.extend((i, pp, tt) for tt, pp in zip(terms, pos))
    got = sorted(zip(d.tolist(), p.tolist(), t.tolist()))
    assert got == sorted(flat)


def test_serialization_roundtrip():
    d = WDF.to_dict()
    assert Analyzer.from_dict(d) == WDF
    assert not WDF.is_standard
    # pre-WDF metas (no key) default to off
    d.pop("word_delimiter")
    assert not Analyzer.from_dict(d).word_delimiter


def test_end_to_end_index_and_search(spark, tmp_path):
    from voyagr_spark.indexer import build_index
    from voyagr_spark.search import search

    docs = spark.createDataFrame(
        [
            ("r", "p/0", "c0", "py", "the class dataLoader42 runs fast"),
            ("r", "p/1", "c1", "py", "a dataLoader is not a loader"),
            ("r", "p/2", "c2", "py", "nothing camel here"),
        ],
        ["repo", "path", "commit", "lang", "content"],
    )
    idx = build_index(
        spark, docs, str(tmp_path / "idx"), num_segments=2,
        analyzer=Analyzer(token_pattern=r"\S+", word_delimiter=True),
    )
    # 'loader' exists only through WDF splitting in docs 0/1 (plus the
    # plain token in doc 1)
    got = {r.doc_id for r in search(idx, "loader", k=10).collect()}
    assert got == {0, 1}
    # query-side analysis runs the same chain: 'dataLoader42' analyzes to
    # the adjacent subwords (data, loader, 42) -> PhraseQuery -> doc 0 only
    got = {r.doc_id for r in search(idx, '"dataLoader42 runs"', k=10).collect()}
    assert got == {0}
    # phrase across the split boundary: positions are re-ordinaled
    got = {r.doc_id for r in search(idx, '"data loader"', k=10).collect()}
    assert got == {0, 1}
