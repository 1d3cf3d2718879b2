"""FuzzyLikeThisQuery — fuzzify every query term, keep the best variants.

Reference: `lucene/sandbox/src/java/org/apache/lucene/sandbox/queries/
FuzzyLikeThisQuery.java` ("mixes the behaviour of FuzzyQuery and
MoreLikeThis"):

* each analyzed source term fuzzy-expands (SlowFuzzyTermsEnum) to variants
  with boost = (similarity - minSimilarity) * scale_factor, where
  similarity = 1 - dist / (prefixLength + min(|variant'|, |term'|)) over
  the post-prefix suffixes and scale_factor = 1/(1 - minSimilarity)
  (SlowFuzzyTermsEnum.java:113-142); only similarity > minSimilarity
  survives; top MAX_VARIANTS_PER_TERM=50 per source term (:219).
* every variant of one source term shares the SOURCE term's df — "a
  specialized TermQuery ... does not use that variant term's IDF because
  this would favour rarer terms eg misspellings" (class javadoc; :226).
  When the source term is absent, df = totalVariantDocFreqs/numVariants
  (INT division, :246-251).
* variant rank score = boost^2 * idf(df, numDocs) with the static
  DefaultSimilarity idf (:258); the global queue keeps the top
  maxNumTerms variants across all source terms (:128).
* rewrite: per source term a coord-free SHOULD group of variant
  TermQueries boosted by that score, each with an ARTIFICIAL df=1
  TermContext (newTermQuery, :269-288) so the final scoring never sees
  the variant's own df; ignoreTF=true swaps each variant for
  ConstantScoreQuery(TermQuery) (:270-272).

Spark shape: variant enumeration is ONE bounded job — the source-term
list (query-sized) broadcast-joined against the term dictionary with a
pushed-down length band, per-source top-50 by a per-group window, global
top-maxNumTerms by TakeOrdered; source dfs come from one pushed-down
term_dfs lookup; the rewritten query runs through the normal engine
top-k with `df_overrides` supplying the artificial df=1 context.
Determinism strengthening (documented, the engine-wide contract): queue
ties break (score desc, term asc) where the reference leaves them to
HashMap iteration order.
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from .analysis import analyze_text
from .classic import idf as classic_idf
from .parser import BooleanQuery, ConstScoreTerms, MatchNoDocsQuery, TermQuery

MAX_VARIANTS_PER_TERM = 50  # FuzzyLikeThisQuery.java:76
SHOULD = "SHOULD"


def flt_variants(
    index,
    source_terms: list[str],
    min_similarity: float = 0.5,
    prefix_length: int = 0,
) -> DataFrame:
    """(source, term, boost, df) for every surviving fuzzy variant —
    per-source top-50 by (boost desc, term asc).  One job: the
    query-sized source list broadcasts against the dictionary; the
    max-edits length band (1-minSim)*(min(len)+prefix) bounds the
    levenshtein like SlowFuzzyTermsEnum.initialMaxDistance (:256-262)."""
    spark = index.spark
    if not source_terms:
        return spark.createDataFrame(
            [], "source string, term string, boost double, df long")
    srcs = spark.createDataFrame(
        [(t,) for t in dict.fromkeys(source_terms)], "source string")
    cand = index.term_stats().select("term", "df")
    pairs = cand.join(F.broadcast(srcs), F.lit(True))
    if prefix_length > 0:
        pairs = pairs.filter(
            F.substring("term", 1, prefix_length)
            == F.substring("source", 1, prefix_length))
    suf_t = F.substring(F.col("term"), prefix_length + 1, 10**6)
    suf_s = F.substring(F.col("source"), prefix_length + 1, 10**6)
    # similarity = 1 - dist/(prefix + min(|suf_t|, |suf_s|)); > minSim
    # bounds dist < (1-minSim)*(prefix + min lens) — push the length band
    # before the levenshtein so the cross join prunes cheaply
    denom = F.least(F.length(suf_t), F.length(suf_s)) + F.lit(prefix_length)
    max_dist = (F.lit(1.0) - F.lit(float(min_similarity))) * denom
    pairs = pairs.filter(
        (F.length("term") - F.length("source") < max_dist)
        & (F.length("source") - F.length("term") < max_dist)
    )
    pairs = pairs.withColumn("dist", F.levenshtein(suf_t, suf_s))
    sim = F.lit(1.0) - F.col("dist") / denom
    scale = 1.0 / (1.0 - float(min_similarity))
    pairs = (
        pairs.withColumn("sim", sim)
        .filter(F.col("sim") > float(min_similarity))
        .withColumn(
            "boost",
            (F.col("sim") - F.lit(float(min_similarity))) * F.lit(scale))
    )
    w = Window.partitionBy("source").orderBy(F.desc("boost"), F.asc("term"))
    return (
        pairs.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= MAX_VARIANTS_PER_TERM)
        .select("source", "term", "boost", "df")
    )


def build_flt_query(
    index,
    query_string: str,
    max_num_terms: int = 25,
    min_similarity: float = 0.5,
    prefix_length: int = 0,
    ignore_tf: bool = False,
):
    """Parse + rewrite: returns (query object, df_overrides dict)."""
    analyzer = getattr(index, "analyzer", None)
    terms, _ = (analyzer.query_form().analyze_text(query_string)
                if analyzer is not None else analyze_text(query_string))
    sources = list(dict.fromkeys(terms))
    if not sources:
        return MatchNoDocsQuery("no analyzable terms"), {}
    rows = flt_variants(index, sources, min_similarity, prefix_length) \
        .collect()  # bounded: <= |sources| * 50 rows
    if not rows:
        return MatchNoDocsQuery("no fuzzy variants"), {}
    by_src: dict[str, list] = {}
    for r in rows:
        by_src.setdefault(r["source"], []).append(r)
    src_dfs = index.term_dfs(sources)
    max_doc = index.max_doc
    scored: list[tuple[float, str, str]] = []
    for s, variants in by_src.items():
        df = src_dfs.get(s, 0)
        if df == 0:
            df = sum(int(v["df"]) for v in variants) // len(variants)
        i = classic_idf(df, max_doc)
        for v in variants:
            b = np.float32(v["boost"])
            scored.append((float(np.float32(np.float32(b * b) * i)),
                           s, v["term"]))
    # global queue: top maxNumTerms by (score desc, term asc) — the
    # deterministic strengthening of ScoreTermQueue pop order
    scored.sort(key=lambda x: (-x[0], x[2]))
    top = scored[:max_num_terms]
    groups: dict[str, list[tuple[float, str]]] = {}
    for sc, s, t in top:
        groups.setdefault(s, []).append((sc, t))
    clauses = []
    overrides: dict[str, int] = {}
    for s in sources:  # clause order = analyzed source order
        if s not in groups:
            continue
        sub = []
        for sc, t in sorted(groups[s], key=lambda x: x[1]):  # term asc
            if ignore_tf:
                sub.append((SHOULD, ConstScoreTerms((t,), boost=sc)))
            else:
                sub.append((SHOULD, TermQuery(t, boost=sc)))
                overrides[t] = 1  # the artificial df=1 TermContext
        clauses.append(
            (SHOULD, sub[0][1] if len(sub) == 1 else BooleanQuery(tuple(sub))))
    q = clauses[0][1] if len(clauses) == 1 else BooleanQuery(tuple(clauses))
    return q, overrides


def fuzzy_like_this(
    index,
    query_string: str,
    max_num_terms: int = 25,
    min_similarity: float = 0.5,
    prefix_length: int = 0,
    ignore_tf: bool = False,
    k: int = 10,
) -> DataFrame:
    """Top-k FuzzyLikeThis search -> DataFrame(doc_id, score)."""
    from .search import search

    q, overrides = build_flt_query(
        index, query_string, max_num_terms, min_similarity, prefix_length,
        ignore_tf)
    return search(index, q, k=k, df_overrides=overrides or None)
