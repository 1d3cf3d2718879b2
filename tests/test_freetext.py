"""FreeTextSuggester (lucene/suggest analyzing/FreeTextSuggester.java):
the ngram-LM model table, the high->low model walk with stupid backoff,
last-token dedup, the trailing-space "upgrade", and the attempted-order
backoff rule (an absent prefix consumes backoff; a not-enough-input slot
does not)."""

import pytest

from voyagr_spark.relational import free_text_ngrams, free_text_suggest

# corpus (see fixture): totals used below
#   doc0/1: "the index merges segments with tokens"  (x2)
#   doc2:   "zq1 zq2 zq3 zq4 zq5 zq6 zq7 zq8"
#   doc3:   "index index index index index index"
# tokens total = 6 + 6 + 8 + 6 = 26
# uni('index') = 1 + 1 + 6 = 8; big('index merges') = 2;
# big('index index') = 5; big('the index') = 2; uni('merges') = 2
TOT = 26.0


@pytest.fixture(scope="module")
def docs_dir(spark, tmp_path_factory):
    import pandas as pd

    texts = [
        "the index merges segments with tokens",
        "the index merges segments with tokens",
        "zq1 zq2 zq3 zq4 zq5 zq6 zq7 zq8",
        "index index index index index index",
    ]
    pdf = pd.DataFrame({
        "doc_id": range(len(texts)),
        "text": texts,
        "lang": ["en"] * len(texts),
        "source": ["s"] * len(texts),
    })
    d = tmp_path_factory.mktemp("freetext")
    spark.createDataFrame(pdf).write.parquet(str(d / "documents.parquet"))
    return str(d)


def _rows(df):
    return [(r["suggestion"], r["score"]) for r in df.collect()]


def test_model_counts(spark, docs_dir):
    m = {(r["n"], r["gram"]): r["cnt"]
         for r in free_text_ngrams(spark, docs_dir, grams=3).collect()}
    assert m[(1, "index")] == 8
    assert m[(1, "merges")] == 2
    assert m[(2, "index merges")] == 2
    assert m[(2, "index index")] == 5
    assert m[(2, "the index")] == 2
    assert m[(3, "the index merges")] == 2
    assert m[(3, "index index index")] == 4
    assert sum(c for (n, _), c in m.items() if n == 1) == 26


def test_bigram_beats_unigram_and_dedups(spark, docs_dir):
    # bigram 'index merges' = 2 / ctx('index') = 8; the unigram model
    # would offer 'merges' but its last token is already seen
    assert _rows(free_text_suggest(spark, docs_dir, "index m", 5)) == [
        ("index merges", 2 / 8)
    ]


def test_self_context_completion(spark, docs_dir):
    # 'index i' -> 'index index' 5/8; unigram 'index' deduped away
    assert _rows(free_text_suggest(spark, docs_dir, "index i", 5)) == [
        ("index index", 5 / 8)
    ]


def test_trailing_space_upgrades_models(spark, docs_dir):
    # "index " suggests all bigrams with context 'index' and NO unigram
    # predictions (FreeTextSuggester.java:529-547, 565)
    got = _rows(free_text_suggest(spark, docs_dir, "index ", 5))
    assert got == [("index index", 5 / 8), ("index merges", 2 / 8)]
    got = _rows(free_text_suggest(spark, docs_dir, "the ", 5))
    assert got == [("the index", 2 / 2)]


def test_single_token_unigram_full_backoff(spark, docs_dir):
    # one typed token: the bigram slot lacks input, so it does NOT
    # consume backoff — unigrams score at 1.0 * cnt / totTokens
    assert _rows(free_text_suggest(spark, docs_dir, "m", 5)) == [
        ("merges", (1.0 * 2) / TOT)
    ]


def test_absent_prefix_consumes_backoff(spark, docs_dir):
    # two typed tokens but the bigram prefix is unseen: the model was
    # attempted, so unigrams drop to 0.4 (java :593-597 vs :565-569)
    assert _rows(free_text_suggest(spark, docs_dir, "zq1 m", 5)) == [
        ("merges", (0.4 * 2) / TOT)
    ]


def test_trigram_walk(spark, docs_dir):
    # grams=3, 'the index m': trigram 'the index merges' = 2 over ctx
    # bigram 'the index' = 2 -> score 1.0; bigram + unigram 'merges'
    # suggestions dedup away (same last token)
    got = _rows(free_text_suggest(spark, docs_dir, "the index m", 5,
                                  grams=3))
    assert got == [("the index merges", 1.0)]


def test_unigram_only_model(spark, docs_dir):
    got = _rows(free_text_suggest(spark, docs_dir, "zq", 5, grams=1))
    assert [s for s, _ in got] == [f"zq{i}" for i in range(1, 6)]
    assert all(sc == 1 / TOT for _, sc in got)


def test_empty_key_raises(spark, docs_dir):
    with pytest.raises(ValueError, match="no tokens"):
        free_text_suggest(spark, docs_dir, " ", 5)
