"""Document classification — the reference's classification module,
Spark-first (lucene/classification/src/java/org/apache/lucene/classification):

* knn_classify: KNearestNeighborClassifier.java:120-162 — a MoreLikeThis
  query from the target doc's text, top-k neighbors, per-class vote with
  score = count/k and the sumdoc<k correction (net effect: count/sumdoc
  in every case, KNearestNeighborClassifier.java:149-161).  Rides the
  engine's `more_like_this` (bit-exact MLT gate) + a docmap join; the
  vote is a tiny groupBy over k rows.
* naive_bayes_classify: SimpleNaiveBayesClassifier.java:157-300 —
  per-class score = log prior + add-1-smoothed log likelihood:
    ln(dc/N) + sum_w tf_d(w) * ln((hits(w,c)+1) / (avg_unique*dc + N))
  where hits(w,c) = docs of class c containing w
  (getWordFreqForClass:276), avg_unique = (term,doc) pairs / N
  (getTextTermFreqForClass:261-268), dc = docs with class c, N = all
  docs.  Expressed relationally: one (term, class) aggregate + a
  broadcast-sized cross of the target doc's terms with the class list —
  at 100 TB the (term, class) table is the only shuffle and the target
  side is k rows.

Tie-break divergence (documented): Lucene returns the max-score class in
hash-map iteration order on ties; we order (score desc, class asc) so
results are deterministic.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def knn_classify(index, source: DataFrame, doc_id: int, k: int = 10,
                 class_col: str = "lang") -> DataFrame:
    """-> DataFrame(class, score): per-class KNN vote over the MLT top-k.

    score = class count / total returned hits (the k-correction folded in);
    deterministic order is the caller's concern (gate sorts by columns)."""
    from .mlt import more_like_this

    res = more_like_this(index, source, doc_id, k=k)
    dm = index.docmap().select("doc_id", F.col(class_col).alias("class"))
    voted = res.join(dm, "doc_id").groupBy("class").agg(
        F.count("*").alias("cnt")
    )
    total = voted.agg(F.sum("cnt")).collect()[0][0] or 1  # k-row aggregate
    return voted.select(
        "class", (F.col("cnt") / F.lit(float(total))).alias("score")
    )


def naive_bayes_classify(spark, sf_dir: str, doc_id: int,
                         class_col: str = "lang") -> DataFrame:
    """-> DataFrame(class, score4): SimpleNaiveBayes per-class log score
    for one target document, rounded to 4 decimals (float64 sum order
    differs across engines)."""
    from .relational import documents, terms_tf

    tf = terms_tf(spark, sf_dir)
    docs = documents(spark, sf_dir).select(
        "doc_id", F.col(class_col).alias("class")
    )
    # global constants (TermStates-style planning scalars, two tiny jobs)
    n_docs = docs.count()
    n_pairs = tf.count()
    avg_unique = n_pairs / n_docs

    dcls = docs.groupBy("class").agg(F.count("*").alias("dc"))
    hits = (
        tf.join(docs, "doc_id")
        .groupBy("term", "class")
        .agg(F.count("*").alias("h"))  # tf rows are unique per (doc, term)
    )
    target = tf.filter(F.col("doc_id") == doc_id).select("term", "tf")
    crossed = target.crossJoin(F.broadcast(dcls)).join(
        hits, ["term", "class"], "left"
    )
    den = F.lit(avg_unique) * F.col("dc") + F.lit(float(n_docs))
    loglik = F.sum(
        F.col("tf") * F.log((F.coalesce(F.col("h"), F.lit(0)) + 1) / den)
    )
    prior = F.log(F.col("dc") / F.lit(float(n_docs)))
    return (
        crossed.groupBy("class", "dc")
        .agg(loglik.alias("ll"))
        .select(
            "class", F.round(prior + F.col("ll"), 4).alias("score4")
        )
    )
