"""Classification module (lucene/classification) — KNN via MLT + NaiveBayes.

KNearestNeighborClassifier.java:120-162 (MLT top-k class vote, count/k
with the sumdoc<k correction) and SimpleNaiveBayesClassifier.java:157-300
(log prior + add-1-smoothed log likelihood over per-class doc frequencies).
"""

import math

import pytest


def test_knn_vote_matches_neighbor_majority(spark, built_index, corpus_pdf):
    from voyagr_spark.classify import knn_classify
    from voyagr_spark.mlt import more_like_this

    source = spark.createDataFrame(corpus_pdf)
    got = {r["class"]: r["score"]
           for r in knn_classify(built_index, source, 5, k=10).collect()}
    # recompute the vote from the MLT neighbors directly
    res = more_like_this(built_index, source, 5, k=10).collect()
    dm = {r["doc_id"]: r["lang"] for r in built_index.docmap().collect()}
    votes = {}
    for r in res:
        votes[dm[r["doc_id"]]] = votes.get(dm[r["doc_id"]], 0) + 1
    total = sum(votes.values())
    want = {c: n / total for c, n in votes.items()}
    assert got == pytest.approx(want)
    assert abs(sum(got.values()) - 1.0) < 1e-9


def test_naive_bayes_local_oracle(spark, tmp_path, corpus_pdf):
    import numpy as np

    from voyagr_spark.classify import naive_bayes_classify

    # write a tiny documents table in the sf_dir shape
    sf = tmp_path / "sf"
    sf.mkdir()
    pdf = corpus_pdf.iloc[:80].copy().reset_index(drop=True)
    docs = pdf.assign(
        doc_id=np.arange(len(pdf)),
        text=pdf["content"],
        source=pdf["repo"],
        n_chars=pdf["content"].str.len(),
    )[["doc_id", "text", "lang", "source", "n_chars"]]
    docs.to_parquet(sf / "documents.parquet")

    got = {r["class"]: r["score4"]
           for r in naive_bayes_classify(spark, str(sf), 3).collect()}

    # pure-python oracle (SimpleNaiveBayesClassifier math)
    from voyagr_spark.analysis import analyze_text
    toks = [analyze_text(t)[0] for t in docs["text"]]
    tfs = [{w: ts.count(w) for w in set(ts)} for ts in toks]
    n = len(docs)
    n_pairs = sum(len(d) for d in tfs)
    avg_unique = n_pairs / n
    langs = docs["lang"].tolist()
    want = {}
    for c in sorted(set(langs)):
        dc = langs.count(c)
        den = avg_unique * dc + n
        score = math.log(dc / n)
        for w, tfv in tfs[3].items():
            hits = sum(1 for i in range(n) if langs[i] == c and w in tfs[i])
            score += tfv * math.log((hits + 1) / den)
        want[c] = round(score, 4)
    assert got == pytest.approx(want, abs=1.01e-4)
