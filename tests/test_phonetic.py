"""PhoneticFilter + commons-codec Soundex (lucene/analysis/phonetic)."""

import random
import sys
from pathlib import Path

import duckdb
import pytest

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

from voyagr_spark.analysis import Analyzer
from voyagr_spark.phonetic import soundex, soundex_sql

# published commons-codec Soundex outputs (SoundexTest.java examples and
# the US-census classics)
GOLDENS = {
    "Robert": "R163",
    "Rupert": "R163",
    "Ashcraft": "A261",
    "Ashcroft": "A261",
    "Tymczak": "T522",
    "Pfister": "P236",
    "Washington": "W252",
    "Lee": "L000",
    "Gutierrez": "G362",
    "Jackson": "J250",
    "Soundex": "S532",
    "Sownteks": "S532",
    "Example": "E251",
    "Ekzampul": "E251",
    "HOL>MES": "H452",
    "a": "A000",
    "": "",
    "123": "",
    "testing": "T235",
    "The": "T000",
    "quick": "Q200",
    "brown": "B650",
    "fox": "F200",
    "jumped": "J513",
}


def test_soundex_goldens():
    for word, code in GOLDENS.items():
        assert soundex(word) == code, word


def test_soundex_hw_register_quirks():
    # H/W reset the register like vowels, and a consonant right after an
    # H/W whose code matches across the gap (or whose second predecessor
    # is itself H/W) is suppressed without touching the register —
    # Soundex.getMappingCode's exact branch structure
    assert soundex("whp") == "W000"       # s[0] is H/W -> i=2 suppressed
    assert soundex("jwqjooo") == "J200"   # suppressed char leaves reg at '0'
    assert soundex("SAHS") == "S200"      # vowel before H: no suppression
    assert soundex("SHS") == "S000"       # same code across single H


def test_sql_oracle_is_bit_exact():
    random.seed(23)
    words = [
        "".join(random.choice("abcdefghijwkquhz019")
                for _ in range(random.randint(0, 12)))
        for _ in range(4000)
    ] + list(GOLDENS)
    con = duckdb.connect()
    con.execute("CREATE TABLE t(term VARCHAR)")
    con.executemany("INSERT INTO t VALUES (?)", [(w,) for w in set(words)])
    sql = ("WITH RECURSIVE " + soundex_sql("t").lstrip()
           + "\nSELECT term, code FROM sdx")
    got = dict(con.execute(sql).fetchall())
    for w in set(words):
        assert got[w] == soundex(w), w


def test_analyzer_replace_mode():
    an = Analyzer(phonetic="soundex", phonetic_inject=False)
    terms, pos = an.analyze_text("robert jumped 123 the fox")
    # 'the' is a stopword (hole stays); '123' has no letters -> original
    # token passes through (PhoneticFilter keeps the token when the
    # encoder returns empty)
    assert terms == ["R163", "J513", "123", "F200"]
    assert pos == [0, 1, 2, 4]


def test_analyzer_inject_mode_overlaps():
    an = Analyzer(phonetic="soundex", phonetic_inject=True)
    terms, pos = an.analyze_text("robert fox")
    # code + original share one position (posinc-0 injection)
    assert sorted(zip(pos, terms)) == [
        (0, "R163"), (0, "robert"), (1, "F200"), (1, "fox")]


def test_flat_path_matches_scalar_path():
    import pandas as pd

    texts = pd.Series([
        "robert jumped over the lazy dog",
        "rupert 123 whp jwqjooo",
        "",
        "the the the",
    ])
    for inject in (False, True):
        an = Analyzer(phonetic="soundex", phonetic_inject=inject)
        f_terms, f_pos, f_doc, f_dl = an.analyze_flat(texts)
        off = 0
        for di, text in enumerate(texts):
            s_terms, s_pos = an.analyze_text(text)
            n = len(s_terms)
            got = sorted(zip(f_pos[off:off + n], f_terms[off:off + n]))
            assert got == sorted(zip(s_pos, s_terms)), (inject, di)
            # norm length counts non-overlap tokens only
            expect_dl = len({p for p in s_pos})
            assert f_dl[di] == expect_dl, (inject, di)
            off += n
        assert off == len(f_terms)


def test_meta_roundtrip():
    an = Analyzer(phonetic="soundex", phonetic_inject=False)
    assert Analyzer.from_dict(an.to_dict()) == an
    assert not an.is_standard


def test_phonetic_search_end_to_end(spark, tmp_path):
    """inject=True index: a query for 'rupert' finds 'robert' docs via
    the shared R163 twin."""
    import pandas as pd

    from voyagr_spark.indexer import build_index
    from voyagr_spark.search import search

    texts = [
        "robert writes code today",
        "nothing matches here sadly",
        "rupert reviews code today",
    ]
    pdf = pd.DataFrame({
        "repo": ["r"] * 3,
        "path": [f"f{i}.txt" for i in range(3)],
        "commit": ["c"] * 3,
        "lang": ["en"] * 3,
        "content": texts,
    })
    an = Analyzer(phonetic="soundex", phonetic_inject=True)
    idx = build_index(
        spark, spark.createDataFrame(pdf), str(tmp_path / "phx"),
        num_segments=1, analyzer=an,
    )
    hits = search(idx, "rupert", k=5).collect()
    assert {r.doc_id for r in hits} == {0, 2}
    # replace mode: original spelling no longer in the dictionary
    idx2 = build_index(
        spark, spark.createDataFrame(pdf), str(tmp_path / "phr"),
        num_segments=1,
        analyzer=Analyzer(phonetic="soundex", phonetic_inject=False),
    )
    hits2 = search(idx2, "robert", k=5).collect()
    assert {r.doc_id for r in hits2} == {0, 2}
