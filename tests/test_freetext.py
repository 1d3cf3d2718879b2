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


def _java_lookup(texts, key, num, grams):
    """Literal transcription of FreeTextSuggester.lookup
    (FreeTextSuggester.java:468-737) over an in-memory ngram model —
    the randomized differential reference."""
    from collections import Counter

    model = Counter()
    tot = 0
    for t in texts:
        toks = t.split()
        tot += len(toks)
        for n in range(1, grams + 1):
            for i in range(len(toks) - n + 1):
                model[" ".join(toks[i:i + n])] += 1

    toks = key.split()
    if not toks:
        raise ValueError("no tokens")
    ended = key != key.rstrip()
    # lastTokens per gram count (0-based: gramCount-1)
    last = [None] * grams
    for g in range(grams):
        if len(toks) >= g + 1:
            last[g] = " ".join(toks[-(g + 1):])
    if ended:
        for i in range(grams - 1, 0, -1):
            if last[i - 1] is not None:
                last[i] = last[i - 1] + " "
        last[0] = ""

    ALPHA = 0.4
    backoff = 1.0
    seen = set()
    results = []
    for gram in range(grams - 1, -1, -1):
        token = last[gram]
        if token is None or (token == "" and len(key) > 0):
            continue  # not enough input: NO backoff consumed
        # prefix lookup: completions within the SAME model order
        order = gram + 1
        comps = sorted(
            ((g, c) for g, c in model.items()
             if g.startswith(token) and len(g.split()) == order),
            key=lambda gc: (-gc[1], gc[0]),
        )
        if not any(model.get(p) for p in [token]
                   ) and not comps:
            # prefixOutput == None analog: nothing in this model starts
            # with the token
            backoff *= ALPHA
            continue
        # contextCount: the count of the prefix before the last separator
        sp = token.rsplit(" ", 1)
        if len(sp) == 2 and sp[0]:
            ctx_count = model[sp[0]]
        else:
            ctx_count = tot
        emitted = 0
        for g, c in comps:
            if emitted >= num:
                break
            last_tok = g.rsplit(" ", 1)[-1]
            if last_tok in seen:
                continue
            seen.add(last_tok)
            results.append((g, (backoff * c) / ctx_count))
            emitted += 1
        backoff *= ALPHA
    results.sort(key=lambda r: (-r[1], r[0]))
    return results[:num]


def test_randomized_differential_vs_java_lookup(spark, tmp_path_factory):
    """30 random keys over a random corpus, grams 2 and 3: the DataFrame
    pipeline must equal the literal reference walk."""
    import random

    import pandas as pd

    rng = random.Random(19)
    vocab = ["aa", "ab", "abc", "ba", "bb", "ca", "cb", "dd"]
    texts = [" ".join(rng.choice(vocab) for _ in range(rng.randint(3, 10)))
             for _ in range(12)]
    pdf = pd.DataFrame({
        "doc_id": range(len(texts)), "text": texts,
        "lang": ["en"] * len(texts), "source": ["s"] * len(texts),
    })
    d = tmp_path_factory.mktemp("ftrand")
    spark.createDataFrame(pdf).write.parquet(str(d / "documents.parquet"))

    keys = []
    for _ in range(15):
        n = rng.randint(1, 3)
        ks = [rng.choice(vocab) for _ in range(n - 1)]
        # last fragment: a prefix of a vocab word, or an unseen token
        frag = rng.choice([rng.choice(vocab)[:rng.randint(1, 2)], "zz"])
        key = " ".join(ks + [frag])
        if rng.random() < 0.3:
            key += " "
        keys.append(key)

    for grams in (2, 3):
        for key in keys:
            want = _java_lookup(texts, key, 5, grams)
            got = [(r["suggestion"], r["score"])
                   for r in free_text_suggest(spark, str(d), key, 5,
                                              grams=grams).collect()]
            assert [s for s, _ in got] == [s for s, _ in want], (
                grams, repr(key), got, want)
            for (_, gs), (_, ws) in zip(got, want):
                assert abs(gs - ws) < 1e-12, (grams, repr(key), got, want)
