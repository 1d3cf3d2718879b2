"""SQL-checkable relational surface of the engine's operators.

Each function here is a DataFrame re-expression of a SURVEY.md §2 operator
(or a training-data pipeline op) over the driver's test tables
(`documents`, `embeddings`), paired 1:1 with an ANSI-SQL oracle in
`__spark_entry__.oracle_sql`.  Scores on this surface are computed in
*double* precision with exact document lengths so DuckDB can reproduce them
bit-comparably; the float32 + SmallFloat-quantized-norm contract of the real
engine is validated separately against the Python oracle in tests/ (that
contract is not expressible in portable SQL).

Everything is built-in Spark SQL expressions except tokenization, which is a
single vectorized pandas_udf shared with the engine (analysis.tokenize_series)
— no per-row Python.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.functions import pandas_udf

from .analysis import ENGLISH_STOP_WORDS, tokenize_series

K1, B = 1.2, 0.75
STOPWORDS = sorted(ENGLISH_STOP_WORDS)


@pandas_udf(T.ArrayType(T.StringType()))
def tokenize_udf(texts: pd.Series) -> pd.Series:
    """Raw ordered tokens (pre-stop, pre-lowercase) — positions = array index."""
    return tokenize_series(texts)


def distributed_topk(df: DataFrame, k: int, by: list[tuple[str, bool]]) -> DataFrame:
    """Exact global top-k without a single-reducer window (VERDICT r1 #4).

    Stage 1: per-partition top-k inside one mapInPandas pass (bounded
    memory: the running buffer is re-cut to k rows every few batches) — no
    shuffle, scales with partitions.  Stage 2: orderBy().limit(k) over the
    <= k * n_partitions survivors (tiny).  `by` = [(col, ascending), ...];
    exactness: the global top-k is a subset of the union of per-partition
    top-ks.  The same shape as search._segment_topk + its global merge."""
    cols = [c for c, _ in by]
    asc = [a for _, a in by]
    schema = df.schema

    def kernel(batches):
        best = None
        for pdf in batches:
            best = pdf if best is None else pd.concat([best, pdf], ignore_index=True)
            if len(best) > 8 * k:
                best = best.sort_values(cols, ascending=asc, kind="mergesort").head(k)
        if best is not None and len(best):
            yield best.sort_values(cols, ascending=asc, kind="mergesort").head(k)

    local = df.mapInPandas(kernel, schema)
    order = [F.asc(c) if a else F.desc(c) for c, a in by]
    return local.orderBy(*order).limit(k)


def _ranked(top: DataFrame, by: list[tuple[str, bool]], cols: list[str]) -> DataFrame:
    """Attach a rank column; the window runs over an already-limited k-row
    result, so the single partition it implies is k rows, not the corpus."""
    order = [F.asc(c) if a else F.desc(c) for c, a in by]
    w = Window.orderBy(*order)
    return top.withColumn("rank", F.row_number().over(w).cast("long")).select(
        "rank", *cols
    )


def documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/documents.parquet")


def embeddings(spark: SparkSession, sf_dir: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/embeddings.parquet")


def raw_tokens(spark, sf_dir) -> DataFrame:
    """(doc_id, pos, term) with pre-stop positions (A1/A7 semantics)."""
    d = documents(spark, sf_dir)
    return d.select(
        "doc_id", F.posexplode(tokenize_udf(F.col("text"))).alias("pos", "term")
    ).withColumn("term", F.lower("term"))


def terms_tf(spark, sf_dir) -> DataFrame:
    """q: per-(doc, term) frequency after the stop filter (A1/B1)."""
    return (
        raw_tokens(spark, sf_dir)
        .filter(~F.col("term").isin(STOPWORDS))
        .groupBy("doc_id", "term")
        .agg(F.count("*").alias("tf"))
    )


def html_terms_tf(spark, sf_dir) -> DataFrame:
    """HTMLStripCharFilter gate surface: every document wrapped in
    deterministic markup (an inline <b> that must strip to NOTHING, block
    <p> tags, a whole <script> element, an &amp; entity, one real trailing
    token), char-filtered by `analysis.strip_html`, then the standard
    tokenize -> lower -> stop -> tf chain.  Equals the plain text's tf
    table plus one 'extra' per doc iff the strip is exact — markup leaking
    a single token or eating one character breaks the hash."""
    from pyspark.sql.functions import pandas_udf

    from .analysis import strip_html_series

    strip = pandas_udf(strip_html_series, "string")
    wrapped = documents(spark, sf_dir).select(
        "doc_id",
        strip(
            F.concat(
                F.lit('<p class="x"><b>'), F.col("text"),
                F.lit("</b></p><script>var zz=9;</script> &amp; extra"),
            )
        ).alias("text"),
    )
    toks = wrapped.select(
        "doc_id", F.explode(tokenize_udf(F.col("text"))).alias("term")
    ).withColumn("term", F.lower("term"))
    return (
        toks.filter(~F.col("term").isin(STOPWORDS))
        .groupBy("doc_id", "term")
        .agg(F.count("*").alias("tf"))
    )


def doclen(spark, sf_dir) -> DataFrame:
    """q: field length for norms = surviving token count (B4)."""
    return (
        raw_tokens(spark, sf_dir)
        .filter(~F.col("term").isin(STOPWORDS))
        .groupBy("doc_id")
        .agg(F.count("*").alias("doclen"))
    )


def term_stats(spark, sf_dir) -> DataFrame:
    """q: global df/ttf per term (B9 / TermContext)."""
    return (
        terms_tf(spark, sf_dir)
        .groupBy("term")
        .agg(F.count("*").alias("df"), F.sum("tf").alias("ttf"))
    )


def collection_stats(spark, sf_dir) -> DataFrame:
    """q: maxDoc + sumTotalTermFreq (collectionStatistics, K5 count path)."""
    d = documents(spark, sf_dir).select("doc_id")
    dl = doclen(spark, sf_dir)
    return d.join(dl, "doc_id", "left").agg(
        F.count("*").alias("max_doc"),
        F.sum(F.coalesce("doclen", F.lit(0))).alias("sum_ttf"),
    )


def _scored(spark, sf_dir) -> DataFrame:
    """(doc_id, term, tf, doclen, df, score) — BM25 in double, exact lengths."""
    tf = terms_tf(spark, sf_dir)
    dl = doclen(spark, sf_dir)
    st = term_stats(spark, sf_dir).select("term", "df")
    cs = collection_stats(spark, sf_dir).collect()[0]
    n, avgdl = int(cs["max_doc"]), float(cs["sum_ttf"]) / int(cs["max_doc"])
    return (
        tf.join(dl, "doc_id")
        .join(F.broadcast(st), "term")
        .withColumn(
            "score",
            F.lit(float(1.0))
            * F.log(F.lit(1.0) + (F.lit(n) - F.col("df") + 0.5) / (F.col("df") + 0.5))
            * F.lit(2.2)
            * F.col("tf")
            / (
                F.col("tf")
                + F.lit(K1) * (F.lit(1.0 - B) + F.lit(B) * F.col("doclen") / F.lit(avgdl))
            ),
        )
    )


def bm25_term(spark, sf_dir, term: str) -> DataFrame:
    """q: all matches of one term with BM25 (E1/K1, relational form)."""
    return (
        _scored(spark, sf_dir)
        .filter(F.col("term") == term)
        .select("doc_id", F.round("score", 4).alias("score4"))
    )


def bool_and(spark, sf_dir, terms: list[str]) -> DataFrame:
    """q: conjunction with summed scores (E2)."""
    s = _scored(spark, sf_dir).filter(F.col("term").isin(terms))
    return (
        s.groupBy("doc_id")
        .agg(F.count("*").alias("nt"), F.sum("score").alias("score"))
        .filter(F.col("nt") == len(terms))
        .select("doc_id", F.round("score", 4).alias("score4"))
    )


def bool_or(spark, sf_dir, terms: list[str]) -> DataFrame:
    """q: disjunction with summed scores (E3)."""
    s = _scored(spark, sf_dir).filter(F.col("term").isin(terms))
    return (
        s.groupBy("doc_id")
        .agg(F.sum("score").alias("score"))
        .select("doc_id", F.round("score", 4).alias("score4"))
    )


def bool_not(spark, sf_dir, term: str, excluded: str) -> DataFrame:
    """q: term AND NOT excluded (E6, anti-join form)."""
    s = _scored(spark, sf_dir)
    pos = s.filter(F.col("term") == term)
    neg = s.filter(F.col("term") == excluded).select("doc_id")
    return pos.join(neg, "doc_id", "left_anti").select(
        "doc_id", F.round("score", 4).alias("score4")
    )


def min_should_match(spark, sf_dir, terms: list[str], m: int) -> DataFrame:
    """q: at least m of the terms (E5)."""
    s = _scored(spark, sf_dir).filter(F.col("term").isin(terms))
    return (
        s.groupBy("doc_id")
        .agg(F.count("*").alias("nmatch"), F.sum("score").alias("score"))
        .filter(F.col("nmatch") >= m)
        .select("doc_id", "nmatch", F.round("score", 4).alias("score4"))
    )


def phrase_freq(spark, sf_dir, w1: str, w2: str) -> DataFrame:
    """q: exact-phrase frequency via position self-join (E9).

    Positions are pre-stop ordinals, so this matches the engine's
    stopword-hole semantics for adjacent non-stop words.
    """
    t = raw_tokens(spark, sf_dir)
    a = t.filter(F.col("term") == w1).select("doc_id", F.col("pos").alias("p1"))
    b = t.filter(F.col("term") == w2).select("doc_id", F.col("pos").alias("p2"))
    return (
        a.join(b, "doc_id")
        .filter(F.col("p2") == F.col("p1") + 1)
        .groupBy("doc_id")
        .agg(F.count("*").alias("phrase_freq"))
    )


def topk_term(spark, sf_dir, term: str, k: int = 10) -> DataFrame:
    """q: deterministic top-k (K2/K3): rank by (round(score,4) desc, doc_id).

    Per-partition top-k then a k-row global merge — no full-corpus
    single-reducer window."""
    s = bm25_term(spark, sf_dir, term)
    by = [("score4", False), ("doc_id", True)]
    return _ranked(distributed_topk(s, k, by), by, ["doc_id", "score4"])


def facet_field(spark, sf_dir, term: str, field: str) -> DataFrame:
    """q: facet counts over matches on an ARBITRARY document field — the
    Solr facet.field=<f> surface (FacetComponent; VERDICT r2 missing #4
    generalized beyond the hardwired lang facet)."""
    m = terms_tf(spark, sf_dir).filter(F.col("term") == term).select("doc_id")
    d = documents(spark, sf_dir).select("doc_id", field)
    return m.join(d, "doc_id").groupBy(field).agg(F.count("*").alias("n"))


def facet_lang(spark, sf_dir, term: str) -> DataFrame:
    """q: facet counts over matches (§2.8 faceting)."""
    return facet_field(spark, sf_dir, term, "lang")


def facet_range(
    spark, sf_dir, term: str, field: str = "n_chars",
    start: int = 0, end: int = 4000, gap: int = 500,
) -> DataFrame:
    """q: numeric range facet — Solr facet.range semantics: fixed-width
    buckets [start+i*gap, start+(i+1)*gap) over matching docs, labeled by
    bucket start; values outside [start, end) fall out (no before/after
    buckets)."""
    m = terms_tf(spark, sf_dir).filter(F.col("term") == term).select("doc_id")
    d = documents(spark, sf_dir).select("doc_id", field)
    return (
        m.join(d, "doc_id")
        .filter((F.col(field) >= start) & (F.col(field) < end))
        .withColumn(
            "bucket_start",
            (F.floor((F.col(field) - start) / gap) * gap + start).cast("long"),
        )
        .groupBy("bucket_start")
        .agg(F.count("*").alias("n"))
    )


def parse_facet_interval(s: str) -> tuple[str, float | None, float | None,
                                          bool, bool]:
    """One facet.interval set string -> (key, lo, hi, startOpen, endOpen).

    Reference grammar (solr/core/src/java/org/apache/solr/request/
    IntervalFacets.java FacetInterval:409-486): '[' or '(' start, one
    comma, ']' or ')' end; '*' = unbounded on either side; start > end is
    an error.  The raw string is the output key."""
    s = (s or "").strip()
    if not s:
        raise ValueError("empty facet interval")
    if s[0] == "(":
        start_open = True
    elif s[0] == "[":
        start_open = False
    else:
        raise ValueError(f"Invalid start character {s[0]!r} in {s!r}")
    if s[-1] == ")":
        end_open = True
    elif s[-1] == "]":
        end_open = False
    else:
        raise ValueError(f"Invalid end character {s[-1]!r} in {s!r}")
    body = s[1:-1]
    if body.count(",") != 1:
        raise ValueError(
            f"Missing or extra comma separating interval ends in {s!r}")
    a, b = (p.strip() for p in body.split(","))
    if not a or not b:
        raise ValueError(f"Empty interval limit in {s!r}")
    lo = None if a == "*" else float(a)
    hi = None if b == "*" else float(b)
    if lo is not None and hi is not None and lo > hi:
        raise ValueError(
            f"Start is higher than end in interval {s!r}")
    return s, lo, hi, start_open, end_open


def facet_interval(spark, sf_dir, term: str, field: str,
                   intervals: list[str]) -> DataFrame:
    """q: Solr facet.interval (IntervalFacets.java): a document count per
    arbitrary (possibly overlapping) interval of a numeric field over the
    query's matches; '*' unbounded ends, open/closed per bracket; each
    interval reports even when 0 (:101-140 accumCounts semantics).

    Scale shape: the match set joins the field once, every interval is a
    conditional partial-agg over that single scan (one shuffle of
    |intervals| counters — the reference's one-pass DocValues walk,
    re-expressed columnar); interval count is request-sized, never
    data-sized."""
    parsed = [parse_facet_interval(s) for s in intervals]
    m = terms_tf(spark, sf_dir).filter(F.col("term") == term).select("doc_id")
    d = documents(spark, sf_dir).select("doc_id", field)
    base = m.join(d, "doc_id")
    aggs = []
    for i, (key, lo, hi, so, eo) in enumerate(parsed):
        cond = F.lit(True)
        if lo is not None:
            cond = cond & (F.col(field) > lo if so else F.col(field) >= lo)
        if hi is not None:
            cond = cond & (F.col(field) < hi if eo else F.col(field) <= hi)
        aggs.append(F.sum(F.when(cond, 1).otherwise(0))
                    .cast("long").alias(f"n{i}"))
    row = base.agg(*aggs)
    keys = F.array(*[F.lit(k) for k, *_ in parsed])
    ns = F.array(*[F.col(f"n{i}") for i in range(len(parsed))])
    return (
        row.select(F.posexplode(F.arrays_zip(keys.alias("k"),
                                             ns.alias("n"))))
        .select(F.col("pos").cast("long").alias("pos"),
                F.col("col.k").alias("interval"),
                F.coalesce(F.col("col.n"), F.lit(0)).alias("n"))
    )


def facet_pivot(spark, sf_dir, term: str, f1: str, f2: str) -> DataFrame:
    """q: hierarchical facet counts over two document fields — the Solr
    facet.pivot=<f1>,<f2> surface (solr PivotFacetProcessor).  One shuffle
    (the two-key groupBy); match set joined broadcast-style by Catalyst."""
    m = terms_tf(spark, sf_dir).filter(F.col("term") == term).select("doc_id")
    d = documents(spark, sf_dir).select("doc_id", f1, f2)
    return m.join(d, "doc_id").groupBy(f1, f2).agg(F.count("*").alias("n"))


def stats_field(spark, sf_dir, term: str, field: str, full: bool = False) -> DataFrame:
    """q: numeric field statistics over the match set — the Solr
    StatsComponent surface (stats.field=<f>&q=<term>).  count/min/max/sum
    are exact integer aggregates; mean is the ONE double division
    sum/count (not a parallel float mean), so the result is deterministic
    under any partitioning — safe at any cluster size.

    full=True adds the rest of the reference's per-field stats
    (solr/core/src/java/org/apache/solr/handler/component/
    StatsValuesFactory.java): sumOfSquares (:432 `value*value*count`
    accumulation — exact integer sum here, the values are integral),
    stddev (:524 getStandardDeviation — sqrt((n*sumSq - sum^2)/(n*(n-1))),
    0.0 when n <= 1), and calcdistinct's countDistinct (:130-145,
    TreeSet size — here an exact distributed count_distinct, which
    partial-aggregates instead of collecting the value set per node).
    Every double op (mul/sub/div/sqrt) runs on exactly-representable
    integer inputs, so the result is IEEE-deterministic under any
    partitioning and reproduces bit-equal in SQL."""
    m = terms_tf(spark, sf_dir).filter(F.col("term") == term).select("doc_id")
    d = documents(spark, sf_dir).select("doc_id", field)
    j = m.join(d, "doc_id")
    aggs = [
        F.count("*").alias("n"),
        F.min(field).alias("min_v"),
        F.max(field).alias("max_v"),
        F.sum(field).alias("sum_v"),
        (F.sum(field).cast("double") / F.count("*")).alias("mean_v"),
    ]
    if not full:
        return j.agg(*aggs)
    aggs += [
        F.sum(F.col(field).cast("long") * F.col(field).cast("long")).alias("sumsq_v"),
        F.count_distinct(field).alias("distinct_v"),
    ]
    out = j.agg(*aggs)
    nD = F.col("n").cast("double")
    sumD = F.col("sum_v").cast("double")
    sqD = F.col("sumsq_v").cast("double")
    stddev = F.when(F.col("n") <= F.lit(1), F.lit(0.0)).otherwise(
        F.sqrt((nD * sqD - sumD * sumD) / (nD * (nD - F.lit(1.0))))
    )
    return out.select(
        "n", "min_v", "max_v", "sum_v", "mean_v", "sumsq_v",
        stddev.alias("stddev_v"), "distinct_v",
    )


def group_top1(spark, sf_dir, term: str) -> DataFrame:
    """q: best doc per lang for a term (§2.8 grouping/collapse)."""
    s = bm25_term(spark, sf_dir, term)
    d = documents(spark, sf_dir).select("doc_id", "lang")
    w = Window.partitionBy("lang").orderBy(F.desc("score4"), F.asc("doc_id"))
    return (
        s.join(d, "doc_id")
        .withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("lang", "doc_id", "score4")
    )


def group_topk(spark, sf_dir, term: str, k_per_group: int = 3) -> DataFrame:
    """q: top-k docs per group (lucene/grouping TopGroups semantics —
    TopGroupsCollector's per-group doc ranks): for each lang, the k best
    matches of `term` by (score desc, doc_id asc), with the within-group
    rank.  One window over the match set — group_top1 generalized."""
    s = bm25_term(spark, sf_dir, term)
    d = documents(spark, sf_dir).select("doc_id", "lang")
    w = Window.partitionBy("lang").orderBy(F.desc("score4"), F.asc("doc_id"))
    return (
        s.join(d, "doc_id")
        .withColumn("grank", F.row_number().over(w).cast("long"))
        .filter(F.col("grank") <= k_per_group)
        .select("lang", "grank", "doc_id", "score4")
    )


def expand_groups(spark, sf_dir, term: str, rows: int = 10,
                  expand_rows: int = 2) -> DataFrame:
    """q: Solr ExpandComponent (solr/core/src/java/org/apache/solr/handler/
    component/ExpandComponent.java, the collapse/expand pair): the main
    list collapses to one best doc per group; `expand=true` then returns,
    for each group PRESENT on the collapsed page, up to expand.rows OTHER
    group members ranked by score (:120-210 — the expanded section is
    keyed by group value, representatives excluded).
    -> (lang, grank, doc_id, score4).

    Scale shape: the collapsed page is rows-sized, so the group-key set
    broadcasts; the expansion is one window over only those groups'
    matches."""
    s = bm25_term(spark, sf_dir, term)
    d = documents(spark, sf_dir).select("doc_id", "lang")
    j = s.join(d, "doc_id")
    w = Window.partitionBy("lang").orderBy(F.desc("score4"), F.asc("doc_id"))
    reps = (
        j.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("lang", F.col("doc_id").alias("rep_id"),
                F.col("score4").alias("rep_s"))
        .orderBy(F.desc("rep_s"), F.asc("rep_id"))
        .limit(rows)  # the collapsed page: top groups by their best doc
    )
    return (
        j.join(F.broadcast(reps), "lang")
        .filter(F.col("doc_id") != F.col("rep_id"))
        .withColumn("grank", F.row_number().over(w).cast("long"))
        .filter(F.col("grank") <= expand_rows)
        .select("lang", "grank", "doc_id", "score4")
    )


def infix_suggest(spark, sf_dir, fragment: str, top: int = 10) -> DataFrame:
    """q: infix completion (AnalyzingInfixSuggester.java:75-95 semantics —
    suggestions whose ANALYZED form contains the typed fragment anywhere,
    ranked by weight): dictionary terms containing `fragment`, weight = df,
    ranked (df desc, term asc).  Term-stats scan + LIKE — all JVM-side."""
    frag = fragment.lower()
    return (
        term_stats(spark, sf_dir)
        .filter(F.col("term").contains(frag))
        .select("term", "df")
        .orderBy(F.desc("df"), F.asc("term"))
        .limit(top)
    )


def drill_sideways(
    spark, sf_dir, term: str, dims: dict[str, str]
) -> DataFrame:
    """q: DrillSideways faceting (lucene/facet DrillSideways.java:49-64):
    for each drill-down dimension, facet counts are computed with every
    OTHER dimension's filter applied but NOT its own — the "what would I
    get by switching this value" panel next to fully-filtered hits.

    One matching-doc set (term match ∪ dim columns), then one small
    groupBy per dimension (len(dims) passes over the same cached-sized
    match projection — dims are a UI-sized handful, never data-sized).
    Returns (dim, value, count) rows for all dimensions."""
    base = (
        terms_tf(spark, sf_dir)
        .filter(F.col("term") == term)
        .select("doc_id")
        .join(documents(spark, sf_dir).select("doc_id", *dims), "doc_id")
    )
    out = None
    for dim in sorted(dims):
        others = base
        for other, val in dims.items():
            if other != dim:
                others = others.filter(F.col(other) == val)
        part = (
            others.groupBy(F.col(dim).alias("value"))
            .agg(F.count("*").alias("cnt"))
            .select(F.lit(dim).alias("dim"), "value", "cnt")
        )
        out = part if out is None else out.unionByName(part)
    return out


def facet_hierarchy(spark, sf_dir, term: str) -> DataFrame:
    """q: hierarchical path facets (lucene/facet taxonomy counts,
    FastTaxonomyFacetCounts.java: every PREFIX of a doc's path ordinal is
    counted): counts at "source" and "source/lang" levels for one term's
    matches, as (path, cnt) rows."""
    base = (
        terms_tf(spark, sf_dir)
        .filter(F.col("term") == term)
        .select("doc_id")
        .join(documents(spark, sf_dir).select("doc_id", "source", "lang"),
              "doc_id")
    )
    l1 = base.groupBy(F.col("source").alias("path")).agg(
        F.count("*").alias("cnt")
    )
    l2 = base.groupBy(
        F.concat_ws("/", "source", "lang").alias("path")
    ).agg(F.count("*").alias("cnt"))
    return l1.unionByName(l2)


def prefix_suggest(spark, sf_dir, prefix: str, top: int = 10) -> DataFrame:
    """q: weighted prefix completion (AnalyzingSuggester.java:77-115
    semantics — completions of the analyzed prefix ranked by weight; the
    FST-with-weight-outputs lookup re-expressed as a dictionary range
    scan): terms starting with `prefix`, weight = df, ranked (df desc,
    term asc).  The >=/< term-range predicate is the same pushdown shape
    as P5 prefix expansion — row-group pruning on the sorted dictionary."""
    p = prefix.lower()
    upper = p[:-1] + chr(ord(p[-1]) + 1)
    return (
        term_stats(spark, sf_dir)
        .filter((F.col("term") >= p) & (F.col("term") < upper))
        .select("term", "df")
        .orderBy(F.desc("df"), F.asc("term"))
        .limit(top)
    )


def fuzzy_suggest(spark, sf_dir, typed: str, top: int = 10) -> DataFrame:
    """q: fuzzy completion (FuzzySuggester.java:60-90 semantics — the
    typed prefix may contain up to maxEdits=1 errors; completions ranked
    by weight): terms whose same-length prefix is within levenshtein 1 of
    the typed text, ranked (df desc, term asc).  Built-in levenshtein —
    JVM-side, one dictionary scan."""
    t = typed.lower()
    return (
        term_stats(spark, sf_dir)
        .withColumn("pfx", F.substring("term", 1, len(t)))
        .filter(F.levenshtein(F.col("pfx"), F.lit(t)) <= 1)
        .select("term", "df")
        .orderBy(F.desc("df"), F.asc("term"))
        .limit(top)
    )


def free_text_ngrams(spark, sf_dir, grams: int = 2) -> DataFrame:
    """(n, gram, cnt): the FreeTextSuggester ngram model — token shingles
    of every order 1..grams joined by ' ', with occurrence counts.

    Reference: lucene/suggest .../analyzing/FreeTextSuggester.java:270-366
    (ShingleFilter(2, grams) over the index analyzer, term frequencies
    from a throwaway index).  Analysis is deliberately LIGHT — tokenize +
    lowercase, NO stop filter — per the class javadoc ("your analysis
    process should normally be very light"); stop holes would otherwise
    punch filler tokens into every shingle.

    Scale shape: per-order `lead()` windows partitioned by doc (one
    doc-keyed shuffle shared by all orders), then one partial-aggregated
    groupBy per order — never a self-join of the token table."""
    if grams < 1:
        raise ValueError("grams must be >= 1")
    t = raw_tokens(spark, sf_dir)
    w = Window.partitionBy("doc_id").orderBy("pos")
    cols = [F.col("term")]
    out = None
    for n in range(1, grams + 1):
        if n > 1:
            cols.append(F.lead("term", n - 1).over(w))
        g = (
            t.select(F.concat_ws(" ", *cols).alias("gram"),
                     cols[-1].isNotNull().alias("ok"))
            .filter("ok")
            .groupBy("gram")
            .agg(F.count("*").alias("cnt"))
            .select(F.lit(n).alias("n"), "gram", "cnt")
        )
        out = g if out is None else out.unionByName(g)
    return out


def bigram_logprob(
    spark, sf_dir, model_dir: str | None = None, alpha: float = 0.4
) -> DataFrame:
    """q: per-doc mean log-likelihood under a BIGRAM language model with
    stupid backoff — the LM upgrade of `unigram_logprob`, i.e. the
    CCNet-style perplexity quality filter (Wenzek et al. 2020 filter
    documents by LM perplexity; Brants et al. 2007 stupid backoff).
    -> (doc_id, logprob), logprob = mean over adjacent token pairs of
    ln P(w2 | w1), rounded to 4.

    P(w2 | w1) = c(w1 w2)/c(w1) when the bigram is in the model, else
    alpha * c(w2)/total (the backoff), with unseen continuation words
    floored at count 1.  `model_dir` scores one corpus against a model
    trained on ANOTHER (the held-out filtering setup; backoff actually
    fires there) — default is the usual self-trained in-corpus filter,
    where every doc bigram is in the model.  Analysis is the light
    (no-stop) chain, like the ngram model itself.

    Scale shape: the model is `free_text_ngrams` (lead() windows over
    one doc-keyed shuffle + partial-agg counts); scoring is one more
    lead() pass over the scored corpus plus two model joins keyed by the
    (bounded-vocabulary) gram strings — never a pairwise stage."""
    model = free_text_ngrams(spark, model_dir or sf_dir, grams=2)
    uni = model.filter(F.col("n") == 1).select(
        F.col("gram").alias("u"), F.col("cnt").alias("cu"))
    big = model.filter(F.col("n") == 2).select(
        F.col("gram").alias("b"), F.col("cnt").alias("cb"))
    tot = uni.agg(F.sum("cu").cast("double").alias("tot"))
    t = raw_tokens(spark, sf_dir)
    w = Window.partitionBy("doc_id").orderBy("pos")
    pairs = (
        t.withColumn("w2", F.lead("term").over(w))
        .filter(F.col("w2").isNotNull())
        .select("doc_id", F.col("term").alias("w1"), "w2")
    )
    scored = (
        pairs.join(big, F.concat_ws(" ", "w1", "w2") == F.col("b"), "left")
        .join(uni.withColumnRenamed("cu", "cu1"),
              F.col("w1") == F.col("u"), "left").drop("u")
        .join(uni.withColumnRenamed("cu", "cu2"),
              F.col("w2") == F.col("u"), "left").drop("u")
        .crossJoin(tot)
        .select(
            "doc_id",
            F.when(
                F.col("cb").isNotNull(),
                F.log(F.col("cb") / (F.col("cu1") * F.lit(1.0))),
            ).otherwise(
                F.log(F.lit(float(alpha))
                      * F.coalesce(F.col("cu2"), F.lit(1))
                      / F.col("tot"))
            ).alias("lp"),
        )
    )
    return scored.groupBy("doc_id").agg(
        F.round(F.avg("lp"), 4).alias("logprob"))


def free_text_suggest(
    spark, sf_dir, key: str, num: int = 10, grams: int = 2
) -> DataFrame:
    """q: FreeTextSuggester lookup (FreeTextSuggester.java:468-737) —
    ngram-LM completion of the typed text with stupid-backoff smoothing
    (ALPHA=0.4, Brants et al. 2007, cited at :98-103).

    Faithful walk, high order -> low:
    - lastTokens[g] = the last g+1 analyzed tokens joined by ' '; a key
      ending in whitespace "upgrades" every slot (token + separator, all
      completions of that context) and skips unigram predictions
      (:529-547).
    - a model order is ATTEMPTED iff the input had enough tokens; each
      attempted order multiplies the backoff by ALPHA for the orders
      below it — an absent prefix still consumes backoff (:593-597
      `backoff *= ALPHA; continue`), a not-enough-input slot does not
      (plain `continue`, :565-569).
    - completions of order n rank by (count desc, gram asc) — the
      TopNSearcher explores min-cost first and tie-breaks by input bytes
      (Util.TieBreakByInputComparator); contextCount = the count of the
      prefix-before-the-last-separator looked up in the model (:601-614),
      totTokens for unigrams.
    - score = (backoff * count) / contextCount (:711, same op order); a
      lower-order completion whose LAST token a higher-order model
      already predicted is skipped (`seen`, :556-560, 696-709).
    - final: sort score desc, key asc (UTF16), truncate to num (:719-735).

    One declarative plan: per-order prefix-range scans + TakeOrdered,
    1-row count subqueries cross-joined in, seen-dedup as anti-joins —
    a single job at collect time."""
    from .analysis import _TOKEN_RE

    toks = [m.group(0).lower() for m in _TOKEN_RE.finditer(key)]
    if not toks:
        raise ValueError("no tokens produced by analyzer")
    ended = key != key.rstrip()
    model = free_text_ngrams(spark, sf_dir, grams=grams)
    uni = model.filter(F.col("n") == 1)
    tot_df = uni.agg(F.sum("cnt").cast("double").alias("ctx_cnt"))

    t_count = len(toks)
    if ended:
        orders = [n for n in range(2, grams + 1) if t_count >= n - 1]
    else:
        orders = [n for n in range(1, grams + 1) if t_count >= n]
    orders.sort(reverse=True)

    results = []
    seen = None
    for rank_i, n in enumerate(orders):
        backoff = 1.0
        for _ in range(rank_i):
            backoff *= 0.4
        if ended:
            ctx_toks = toks[-(n - 1):]
            prefix = " ".join(ctx_toks) + " "
        else:
            ctx_toks = toks[-n:-1]
            prefix = " ".join(toks[-n:])
        if ctx_toks:
            ctx_df = (
                model.filter((F.col("n") == len(ctx_toks))
                             & (F.col("gram") == " ".join(ctx_toks)))
                .select(F.col("cnt").cast("double").alias("ctx_cnt"))
            )
        else:
            ctx_df = tot_df
        cand = (
            model.filter((F.col("n") == n)
                         & F.col("gram").startswith(prefix))
            .crossJoin(ctx_df)
            .select(
                F.col("gram").alias("suggestion"),
                F.element_at(F.split("gram", " "), -1).alias("last_tok"),
                ((F.lit(backoff) * F.col("cnt").cast("double"))
                 / F.col("ctx_cnt")).alias("score"),
                "cnt",
            )
        )
        if seen is not None:
            cand = cand.join(seen, "last_tok", "left_anti")
        cand = cand.orderBy(F.desc("cnt"), F.asc("suggestion")).limit(num)
        results.append(cand.select("suggestion", "last_tok", "score"))
        sel = cand.select("last_tok")
        seen = sel if seen is None else seen.unionByName(sel)

    if not results:
        # nothing predictable at this order (e.g. grams=1 with a
        # trailing-space key skips every n>1 order and the unigram
        # path): an empty suggestion frame, not an IndexError
        return spark.createDataFrame(
            [], "rank long, suggestion string, score double")
    allr = results[0]
    for r in results[1:]:
        allr = allr.unionByName(r)
    top = allr.orderBy(F.desc("score"), F.asc("suggestion")).limit(num)
    w = Window.orderBy(F.desc("score"), F.asc("suggestion"))
    return top.withColumn(
        "rank", F.row_number().over(w).cast("long")
    ).select("rank", "suggestion", "score")


def wildcard_term(spark, sf_dir, pattern: str) -> DataFrame:
    """q: wildcard match over the dictionary (P5 WildcardQuery, relational
    form): docs containing >=1 term LIKE pattern, with the matching-term
    count.  Constant-score semantics — no scores."""
    t = terms_tf(spark, sf_dir).filter(F.col("term").like(pattern))
    return t.groupBy("doc_id").agg(F.count_distinct("term").alias("n_terms"))


def term_range_docs(spark, sf_dir, lo: str, hi: str) -> DataFrame:
    """q: inclusive term-range match (P5 TermRangeQuery, relational form)."""
    t = terms_tf(spark, sf_dir).filter(
        (F.col("term") >= lo) & (F.col("term") <= hi)
    )
    return t.groupBy("doc_id").agg(F.count_distinct("term").alias("n_terms"))


def fuzzy_term(spark, sf_dir, term: str, max_edits: int = 2) -> DataFrame:
    """q: FuzzyQuery (P5), relational double-precision form: expand to all
    dictionary terms within max_edits, score each as a boosted TermQuery
    (boost = 1 - dist/min(len, len(term)); FuzzyTermsEnum similarity), sum
    per doc.  The engine's float32 capped twin is tested against the Python
    oracle in tests/test_multiterm.py."""
    t = term.lower()
    n = len(t)
    cand = (
        term_stats(spark, sf_dir)
        .filter(
            (F.length("term") >= n - max_edits)
            & (F.length("term") <= n + max_edits)
        )
        .withColumn("dist", F.levenshtein(F.col("term"), F.lit(t)))
        .filter(F.col("dist") <= max_edits)
        .withColumn(
            "boost",
            F.when(F.col("dist") == 0, F.lit(1.0)).otherwise(
                F.lit(1.0) - F.col("dist") / F.least(F.length("term"), F.lit(n))
            ),
        )
        .select("term", "boost")
    )
    s = _scored(spark, sf_dir).join(F.broadcast(cand), "term")
    return (
        s.groupBy("doc_id")
        .agg(
            F.count("*").alias("nmatch"),
            F.round(F.sum(F.col("boost") * F.col("score")), 4).alias("score4"),
        )
        .select("doc_id", "nmatch", "score4")
    )


# ---------------------------------------------------------------------------
# training-data pipeline ops
# ---------------------------------------------------------------------------


def dedup_exact(spark, sf_dir) -> DataFrame:
    """q: exact dedup by content hash — keeper + group size per doc."""
    d = documents(spark, sf_dir).select("doc_id", F.md5("text").alias("fp"))
    w = Window.partitionBy("fp")
    return d.select(
        "doc_id",
        "fp",
        F.min("doc_id").over(w).alias("keeper"),
        F.count("*").over(w).alias("group_n"),
    )


def minhash_signature(spark, sf_dir, bands: int = 4) -> DataFrame:
    """q: MinHash signature: per band, min md5('<band>:'||term) over doc terms."""
    t = terms_tf(spark, sf_dir)
    aggs = [
        F.min(F.md5(F.concat(F.lit(f"{j}:"), F.col("term")))).alias(f"mh{j}")
        for j in range(bands)
    ]
    return t.groupBy("doc_id").agg(*aggs)


def lsh_buckets(spark, sf_dir, bands: int = 4) -> DataFrame:
    """q: LSH bucket sizes: docs sharing a band hash are candidates."""
    sig = minhash_signature(spark, sf_dir, bands)
    parts = [
        sig.select(F.lit(j).alias("band"), F.col(f"mh{j}").alias("sig"))
        for j in range(bands)
    ]
    u = parts[0]
    for p in parts[1:]:
        u = u.unionAll(p)
    return (
        u.groupBy("band", "sig")
        .agg(F.count("*").alias("n_docs"))
        .filter(F.col("n_docs") > 1)
    )


def jaccard_pairs(spark, sf_dir, threshold: float = 0.7, max_doc: int = 300) -> DataFrame:
    """q: token-set n-gram(1) Jaccard near-dup pairs (bounded doc range)."""
    t = (
        terms_tf(spark, sf_dir)
        .filter(F.col("doc_id") < max_doc)
        .select("doc_id", "term")
    )
    sizes = t.groupBy("doc_id").agg(F.count("*").alias("sz"))
    inter = (
        t.alias("a")
        .join(t.alias("b"), "term")
        .filter(F.col("a.doc_id") < F.col("b.doc_id"))
        .groupBy(F.col("a.doc_id").alias("da"), F.col("b.doc_id").alias("db"))
        .agg(F.count("*").alias("inter"))
    )
    return (
        inter.join(sizes.withColumnRenamed("doc_id", "da").withColumnRenamed("sz", "sa"), "da")
        .join(sizes.withColumnRenamed("doc_id", "db").withColumnRenamed("sz", "sb"), "db")
        .withColumn("jac", F.round(F.col("inter") / (F.col("sa") + F.col("sb") - F.col("inter")), 4))
        .filter(F.col("jac") >= threshold)
        .select("da", "db", "jac")
    )


def _shingle_array(n: int):
    """Per-doc distinct word n-grams as ONE array expression over the token
    array — `transform(sequence(0, size-n), i -> array_join(slice(toks,
    i+1, n)))` — entirely JVM-side, NO join and NO shuffle (VERDICT r2
    "What's wrong #3": the old n-1 position self-joins tripled the heaviest
    shuffle in the dedup pipeline at scale)."""
    return F.when(
        F.size("toks") >= n,
        F.array_distinct(
            F.transform(
                F.sequence(F.lit(0), F.size("toks") - F.lit(n)),
                lambda i: F.array_join(F.slice("toks", i + 1, n), " "),
            )
        ),
    ).otherwise(F.array().cast("array<string>"))


def _doc_tokens(spark, sf_dir) -> DataFrame:
    """(doc_id, toks): the lowercased pre-stop token ARRAY per doc (A1/A7
    semantics, same stream raw_tokens posexplodes)."""
    d = documents(spark, sf_dir)
    return d.select(
        "doc_id",
        F.transform(tokenize_udf(F.col("text")), F.lower).alias("toks"),
    )


def shingles(spark, sf_dir, n: int = 3) -> DataFrame:
    """(doc_id, shingle): distinct word n-grams over the raw (pre-stop)
    token stream — the standard dedup shingling unit.  Built per doc from
    the token array (array_distinct makes per-doc dedup shuffle-free); the
    explode is narrow, so the whole op is a single scan."""
    return _doc_tokens(spark, sf_dir).select(
        "doc_id", F.explode(_shingle_array(n)).alias("shingle")
    )


def shingle_minhash(spark, sf_dir, n: int = 3, bands: int = 4) -> DataFrame:
    """q: MinHash over word n-gram shingles (the shingle->minhash->band
    pipeline of the brief): per band, min md5('<band>:'||shingle) — folded
    into a per-doc array_min, so the whole signature is computed in the
    scan projection with ZERO shuffles."""
    sh = _shingle_array(n)
    cols = [
        F.array_min(
            F.transform(sh, lambda s: F.md5(F.concat(F.lit(f"{j}:"), s)))
        ).alias(f"mh{j}")
        for j in range(bands)
    ]
    return (
        _doc_tokens(spark, sf_dir)
        .filter(F.size("toks") >= n)
        .select("doc_id", *cols)
    )


def jaccard_ngram_pairs(
    spark, sf_dir, n: int = 3, threshold: float = 0.5, max_doc: int = 100
) -> DataFrame:
    """q: n-gram-shingle Jaccard near-dup pairs (bounded doc range — the
    gate form; the scale path is LSH-banded like dedup_pipeline)."""
    s = shingles(spark, sf_dir, n).filter(F.col("doc_id") < max_doc)
    sizes = s.groupBy("doc_id").agg(F.count("*").alias("sz"))
    inter = (
        s.alias("a")
        .join(s.alias("b"), "shingle")
        .filter(F.col("a.doc_id") < F.col("b.doc_id"))
        .groupBy(F.col("a.doc_id").alias("da"), F.col("b.doc_id").alias("db"))
        .agg(F.count("*").alias("inter"))
    )
    return (
        inter.join(sizes.select(F.col("doc_id").alias("da"), F.col("sz").alias("sa")), "da")
        .join(sizes.select(F.col("doc_id").alias("db"), F.col("sz").alias("sb")), "db")
        .withColumn("jac", F.round(F.col("inter") / (F.col("sa") + F.col("sb") - F.col("inter")), 4))
        .filter(F.col("jac") >= threshold)
        .select("da", "db", "jac")
    )


def quality_stats(spark, sf_dir) -> DataFrame:
    """q: text-quality features: counts, stopword ratio, mean token length."""
    t = raw_tokens(spark, sf_dir)
    return t.groupBy("doc_id").agg(
        F.count("*").alias("n_raw"),
        F.sum(F.when(F.col("term").isin(STOPWORDS), 1).otherwise(0)).alias("n_stop"),
        F.round(
            F.sum(F.when(F.col("term").isin(STOPWORDS), 1).otherwise(0)) / F.count("*"), 4
        ).alias("stop_ratio"),
        F.round(F.avg(F.length("term")), 4).alias("avg_token_len"),
        F.count_distinct("term").alias("n_distinct"),
    )


def langid_update(spark, sf_dir, threshold: float = 0.5,
                  whitelist: tuple = ("en",),
                  fallback_fields: tuple = ("lang",),
                  fallback_value: str = "",
                  lcmap: dict | None = None) -> DataFrame:
    """q: the langid update-processor resolution chain (solr/contrib/langid
    LanguageIdentifierUpdateProcessor.java): detect -> normalize via
    langid.lcmap (:382-390) -> whitelist check -> certainty >= threshold
    else fallback (:326-350) -> fallback = first present fallback FIELD
    value, else langid.fallback value, else "" (:284-298).

    Detector: the engine's deterministic stopword-ratio heuristic as the
    DetectedLanguage source — lang 'en' with certainty
    least(1.0, stop_ratio * 10) (the abstract detectLanguage slot; the
    reference's Tika/langdetect backends are external libraries).  One
    scan, one per-doc aggregate — ingest-shaped, no shuffle beyond the
    token groupBy. -> (doc_id, language, certainty)."""
    lcmap = lcmap or {}
    q = quality_stats(spark, sf_dir)
    d = documents(spark, sf_dir).select("doc_id", *fallback_fields)
    base = q.select("doc_id", "stop_ratio").join(d, "doc_id")
    cert = F.least(F.lit(1.0), F.round(F.col("stop_ratio") * 10, 4))
    detected = lcmap.get("en", "en")
    fb = F.coalesce(
        *[F.col(f) for f in fallback_fields], F.lit(fallback_value),
        F.lit(""))
    in_wl = F.lit(not whitelist or detected in whitelist)
    lang = F.when(in_wl & (cert >= threshold), F.lit(detected)).otherwise(fb)
    return base.select(
        "doc_id", lang.alias("language"),
        cert.cast("double").alias("certainty"),
    )


def langid_heuristic(spark, sf_dir) -> DataFrame:
    """q: n-gram/stopword language-ID heuristic: English iff stopword-ratio
    above threshold (the corpus embeds English stopwords in every doc)."""
    q = quality_stats(spark, sf_dir)
    return q.select(
        "doc_id",
        F.when(F.col("stop_ratio") >= 0.05, "en").otherwise("other").alias("pred_lang"),
    )


# BPE-ish pre-tokenizer: contraction suffixes, letter runs, short digit
# runs, punctuation runs (the GPT-2 pattern's RE2-safe core — no lookahead,
# leftmost-first alternation identical in Java regex and RE2)
BPE_ISH_PATTERN = r"'(?:s|t|re|ve|m|ll|d)|[A-Za-z]+|[0-9]{1,3}|[^\sA-Za-z0-9]+"


def token_counts(spark, sf_dir) -> DataFrame:
    """q: per-doc token counts for data-pipeline budgeting: whitespace-split
    words and a BPE-ish subword-ish count (GPT-2-style pre-tokenizer core).
    All JVM-side regex expressions — no Python in the path; at 100 TB this
    is a single scan + map, no shuffle."""
    d = documents(spark, sf_dir)
    trimmed = F.trim(F.col("text"))
    return d.select(
        "doc_id",
        F.when(F.length(trimmed) == 0, F.lit(0))
        .otherwise(F.size(F.split(trimmed, r"\s+")))
        .cast("long")
        .alias("n_ws"),
        F.size(F.regexp_extract_all(F.col("text"), F.lit(BPE_ISH_PATTERN), F.lit(0)))
        .cast("long")
        .alias("n_bpe"),
    )


def unigram_logprob(spark, sf_dir) -> DataFrame:
    """q: per-doc mean unigram log-likelihood under the corpus MLE model —
    the classic cheap LM quality filter for training-data pipelines (docs
    whose token mix is implausible under the corpus distribution score
    low; gibberish and boilerplate separate from prose without any
    external model).  -> (doc_id, logprob) with logprob =
    sum_t tf * ln(ttf_t / total_tokens) / doclen, rounded to 4.

    Scale shape: one (term) aggregation for the model, one broadcast of
    the single-row total, one partial-agged (doc) aggregation — the same
    two shuffles term_stats already costs; no driver-side model."""
    tf = terms_tf(spark, sf_dir)
    ttf = tf.groupBy("term").agg(F.sum("tf").alias("ttf"))
    total = ttf.agg(F.sum("ttf").cast("double").alias("tot"))
    return (
        tf.join(ttf, "term")
        .crossJoin(F.broadcast(total))
        .groupBy("doc_id")
        .agg(
            F.round(
                F.sum(F.col("tf") * (F.log("ttf") - F.log("tot")))
                / F.sum("tf"),
                4,
            ).alias("logprob")
        )
    )


#: stratified-sample rates, quantized to 1/65536 as a 4-hex-digit md5
#: threshold (identical string comparison in Spark and any SQL oracle)
SAMPLE_RATES = {"en": 0.5, "de": 0.25, "fr": 0.25, "es": 0.1, "zh": 0.1}


def _rate_hex(rate: float) -> str:
    """4-hex-char keep threshold; rate >= 1.0 returns 'g', which sorts
    AFTER every hex string so the stratum keeps all docs (the naive
    format(65536,'04x') = '10000' is 5 chars and lexicographically
    BELOW ' 1abc'..'ffff', silently dropping ~15/16 of a rate-1.0
    stratum)."""
    n = max(0, min(65536, int(rate * 65536)))
    return "g" if n >= 65536 else format(n, "04x")


def stratified_sample(spark, sf_dir,
                      rates: dict[str, float] | None = None) -> DataFrame:
    """q: deterministic per-language stratified sampling — the training-mix
    rebalancer.  A doc is kept iff the first 4 hex chars of
    md5(doc_id) sort below the stratum's rate threshold, so the sample is
    reproducible across runs/engines/cluster sizes (no RNG state), docs
    never flicker in and out as the corpus grows, and rates are exact to
    1/65536.  Unknown languages default to rate 0.  -> kept (doc_id, lang).

    Scale shape: a single scan with a JVM-side md5 + CASE filter — no
    shuffle, no sort, trivially pushdown-friendly."""
    rates = SAMPLE_RATES if rates is None else rates
    d = documents(spark, sf_dir).select("doc_id", "lang")
    thr = F.lit("0000")
    for lang, rate in sorted(rates.items()):
        thr = F.when(F.col("lang") == lang, F.lit(_rate_hex(rate))).otherwise(thr)
    return d.filter(
        F.substring(F.md5(F.col("doc_id").cast("string")), 1, 4) < thr
    ).select("doc_id", "lang")


def pack_sequences(spark, sf_dir, capacity: int = 2048) -> DataFrame:
    """q: contiguous-fill sequence packing — assign docs to fixed-capacity
    training packs (the standard LLM pretraining packing: walk the corpus
    in deterministic order, start a new pack when the token budget would
    overflow... expressed here in its prefix-sum form: pack_id =
    floor(exclusive-running-token-sum / capacity), which splits oversize
    docs across pack boundaries exactly like block-concatenation packing).
    -> (doc_id, n_tokens, pack_id).

    Scale shape: a DISTRIBUTED PREFIX SUM, never a global window — (1)
    per-range partial sums (one small agg), (2) driver-side cumsum over
    the range sums (#ranges rows), (3) range-local running sums offset
    by the broadcast partials.  Ranges are a PURE FUNCTION of doc_id
    (uniform split of [min, max] — dense ids, so balanced), NOT
    spark_partition_id: the collected partials stay consistent with the
    final scan under any recomputation/eviction, so nothing needs to be
    persisted and the result is deterministic at every cluster size."""
    toks = (
        token_counts(spark, sf_dir)
        .select("doc_id", F.col("n_ws").alias("n_tokens"))
    )
    nparts = max(2, int(spark.sparkContext.defaultParallelism))
    mm = toks.agg(F.min("doc_id").alias("mn"),
                  F.max("doc_id").alias("mx")).collect()[0]
    if mm["mn"] is None:
        return spark.createDataFrame(
            [], "doc_id long, n_tokens long, pack_id long")
    mn, span = int(mm["mn"]), max(1, int(mm["mx"]) - int(mm["mn"]) + 1)
    part_expr = F.least(
        F.lit(nparts - 1),
        ((F.col("doc_id") - F.lit(mn)) * nparts / F.lit(span)).cast("int"),
    )
    ranged = toks.withColumn("part", part_expr)
    part_sums = (
        ranged.groupBy("part").agg(F.sum("n_tokens").alias("psum"))
        .orderBy("part")  # part is monotone in doc_id by construction
        .collect()
    )
    # driver cumsum over #ranges rows (tiny), broadcast back as offsets
    off, offsets = 0, {}
    for r in part_sums:
        offsets[r["part"]] = off
        off += r["psum"]
    off_df = F.broadcast(spark.createDataFrame(
        [(p, o) for p, o in offsets.items()], "part int, off long"
    ))
    w = Window.partitionBy("part").orderBy("doc_id") \
        .rowsBetween(Window.unboundedPreceding, -1)
    out = (
        ranged.join(off_df, "part")
        .withColumn(
            "cum_before",
            F.col("off") + F.coalesce(F.sum("n_tokens").over(w), F.lit(0)),
        )
        .select(
            "doc_id", "n_tokens",
            F.floor(F.col("cum_before") / capacity).alias("pack_id"),
        )
    )
    return out


def facet_query(spark, sf_dir, queries: dict[str, str]) -> DataFrame:
    """q: Solr facet.query (SimpleFacets.getFacetQueryCounts) — a count per
    arbitrary sub-query over the corpus; here each named query is a term,
    counted in one scan (no per-facet jobs)."""
    tf = terms_tf(spark, sf_dir)
    # term -> [facet names]: Solr allows several facet.query params over
    # the same sub-query, so this must not be a map keyed by term (a
    # duplicate create_map key raises under mapKeyDedupPolicy=EXCEPTION);
    # each name gets its own (identical) count via one explode
    names_for_term: dict[str, list] = {}
    for name, t in sorted(queries.items()):
        names_for_term.setdefault(t, []).append(name)
    arr = None
    for t, names in sorted(names_for_term.items()):
        cond = F.col("term") == F.lit(t)
        a = F.array(*[F.lit(n) for n in names])
        arr = F.when(cond, a) if arr is None else arr.when(cond, a)
    return (
        tf.filter(F.col("term").isin(sorted(names_for_term)))
        .select(F.explode(arr).alias("facet"), "doc_id")
        .groupBy("facet")
        .agg(F.countDistinct("doc_id").alias("n"))
        .orderBy("facet")
    )


def length_terms_tf(spark, sf_dir, mn: int = 3, mx: int = 8) -> DataFrame:
    """q: LengthFilter gate surface (analysis/miscellaneous/
    LengthFilter.java): per-doc tf through Analyzer(length_filter=(mn,mx))
    — tokens outside the band drop like stopwords."""
    from .analysis import Analyzer

    return _analyzer_terms_tf(spark, sf_dir, Analyzer(length_filter=(mn, mx)))


def keep_words_tf(spark, sf_dir, words: tuple) -> DataFrame:
    """q: KeepWordFilter gate surface (analysis/miscellaneous/
    KeepWordFilter.java): only the listed words survive the chain —
    the inverse stop filter, holes preserved."""
    from .analysis import Analyzer

    return _analyzer_terms_tf(spark, sf_dir, Analyzer(keep_words=words))


def pattern_replace_tf(spark, sf_dir, pattern: str, repl: str) -> DataFrame:
    """q: PatternReplaceFilter gate surface (analysis/pattern/
    PatternReplaceFilter.java): regex substitution inside each token
    (replaceAll), applied before the stop stage so replaced forms that
    become stopwords drop."""
    from .analysis import Analyzer

    return _analyzer_terms_tf(
        spark, sf_dir, Analyzer(pattern_replace=(pattern, repl, True)))


def limit_tokens_tf(spark, sf_dir, n: int) -> DataFrame:
    """q: LimitTokenCountFilter gate surface (analysis/miscellaneous/
    LimitTokenCountFilter.java): only each doc's first n tokenizer tokens
    are analyzed/indexed."""
    from .analysis import Analyzer

    return _analyzer_terms_tf(spark, sf_dir, Analyzer(limit_tokens=n))


def stop_types_tf(spark, sf_dir, types: tuple = ("<NUM>",)) -> DataFrame:
    """q: TypeTokenFilter gate surface (analysis/core/TypeTokenFilter
    .java, stop-types mode): tokens of the listed StandardTokenizer types
    drop with holes ('<NUM>' = digits-only under the ASCII subset)."""
    from .analysis import Analyzer

    return _analyzer_terms_tf(spark, sf_dir, Analyzer(stop_types=types))


def truncate_tf(spark, sf_dir, n: int) -> DataFrame:
    """q: TruncateTokenFilter gate surface (analysis/miscellaneous/
    TruncateTokenFilter.java): every token truncates to its length-n
    prefix BEFORE the stop stage."""
    from .analysis import Analyzer

    return _analyzer_terms_tf(spark, sf_dir, Analyzer(truncate=n))


def phonetic_terms_tf(spark, sf_dir) -> DataFrame:
    """q: PhoneticFilter gate surface (lucene/analysis/phonetic/
    PhoneticFilter.java, inject=false): per-doc tf with every token
    REPLACED by its commons-codec Soundex code (letterless tokens pass
    through unchanged)."""
    from .analysis import Analyzer

    return _analyzer_terms_tf(
        spark, sf_dir, Analyzer(phonetic="soundex", phonetic_inject=False))


def _analyzer_terms_tf(spark, sf_dir, an) -> DataFrame:
    """Per-doc (doc_id, term, tf) through an arbitrary Analyzer chain."""
    docs = documents(spark, sf_dir).select("doc_id", "text")

    def run(pdf: pd.DataFrame) -> pd.DataFrame:
        terms, _pos, docidx, _dl = an.analyze_flat(pdf["text"])
        ids = pdf["doc_id"].to_numpy()[docidx]
        out = pd.DataFrame({"doc_id": ids, "term": terms})
        g = out.groupby(["doc_id", "term"], as_index=False).size()
        return g.rename(columns={"size": "tf"})

    return docs.mapInPandas(
        lambda it: (run(pdf) for pdf in it),
        "doc_id long, term string, tf long",
    )


def gram_terms_tf(spark, sf_dir, mn: int = 2, mx: int = 4,
                  edge: bool = True) -> DataFrame:
    """q: NGram/EdgeNGram token-filter gate surface
    (analysis/ngram/NGramTokenFilter.java / EdgeNGramTokenFilter.java):
    documents analyzed through `Analyzer(edge_ngram=(mn,mx))` (or
    `ngram=`), per-doc gram tf — tokens shorter than minGram drop, every
    gram lands at its source token's position. -> (doc_id, term, tf)."""
    from .analysis import Analyzer

    an = Analyzer(edge_ngram=(mn, mx)) if edge else Analyzer(ngram=(mn, mx))
    return _analyzer_terms_tf(spark, sf_dir, an)


def terms_enum(spark, sf_dir, prefix: str | None = None,
               lower: str | None = None, upper: str | None = None,
               mincount: int = 1, limit: int = 10,
               sort: str = "count") -> DataFrame:
    """q: Solr TermsComponent (/terms handler,
    solr/core/src/java/org/apache/solr/handler/component/TermsComponent.java):
    enumerate dictionary terms with their document frequencies, filtered
    by terms.prefix / terms.lower..upper / terms.mincount, sorted by
    count (df desc, term asc) or index (term asc), top terms.limit.
    -> (term, df).

    Scale shape: predicates on the sorted term dictionary are exactly the
    pushdown-shaped range scans the multi-term family uses; the top-limit
    is a TakeOrdered, never a full sort."""
    st = term_stats(spark, sf_dir).select("term", "df")
    if prefix is not None:
        st = st.filter(F.col("term").startswith(prefix))
    if lower is not None:
        st = st.filter(F.col("term") >= lower)
    if upper is not None:
        st = st.filter(F.col("term") <= upper)
    st = st.filter(F.col("df") >= mincount)
    if sort == "count":
        order = [F.desc("df"), F.asc("term")]
    elif sort == "index":
        order = [F.asc("term")]
    else:
        raise ValueError(f"terms.sort must be count or index, got {sort!r}")
    return st.orderBy(*order).limit(limit)


def high_freq_terms(spark, sf_dir, num_terms: int = 100,
                    by_ttf: bool = False) -> DataFrame:
    """q: HighFreqTerms (lucene/misc/src/java/org/apache/lucene/misc/
    HighFreqTerms.java): the top-N most frequent terms with BOTH stats,
    ordered by docFreq (DocFreqComparator, :138-150) or totalTermFreq
    (-t flag, TotalTermFreqComparator, :154-168), highest first.
    -> (rank, term, ttf, df).

    Tie order kept faithful: the comparator falls through to termtext
    compareTo, and the queue pops highest-first, so equal-frequency terms
    emit in term DESC order (:124-131).  Scale shape: one partial-agg
    stats pass + TakeOrderedAndProject for the N-row cut — never a full
    sort, never a driver-side term list."""
    st = term_stats(spark, sf_dir)
    key = "ttf" if by_ttf else "df"
    w = Window.orderBy(F.desc(key), F.desc("term"))
    return (
        st.orderBy(F.desc(key), F.desc("term")).limit(num_terms)
        .select(F.row_number().over(w).cast("long").alias("rank"),
                "term", "ttf", "df")
    )


def fingerprint(spark, sf_dir) -> DataFrame:
    """q: document fingerprint (content hash + sha256 row invariant)."""
    return documents(spark, sf_dir).select(
        "doc_id", F.md5("text").alias("fp"), F.sha2("text", 256).alias("sha256")
    )


def ann_topk(spark, sf_dir, query_vec_id: int = 0, k: int = 10) -> DataFrame:
    """q: brute-force cosine top-k over the embedding column (ANN baseline).

    Dot/norms via F.aggregate+F.zip_with — JVM-side, no Python.  Rank by
    (round(cos,4) desc, vec_id asc) for cross-engine determinism.
    """
    e = embeddings(spark, sf_dir).withColumn(
        "embedding", F.col("embedding").cast("array<double>")
    )
    qv = e.filter(F.col("vec_id") == query_vec_id).select(
        F.col("embedding").alias("qe")
    )
    j = e.filter(F.col("vec_id") != query_vec_id).crossJoin(F.broadcast(qv))
    dot = F.aggregate(
        F.zip_with("embedding", "qe", lambda a, b: a * b),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )
    n1 = F.sqrt(F.aggregate(F.transform("embedding", lambda a: a * a), F.lit(0.0), lambda acc, x: acc + x))
    n2 = F.sqrt(F.aggregate(F.transform("qe", lambda a: a * a), F.lit(0.0), lambda acc, x: acc + x))
    scored = j.select(
        "vec_id", F.round(dot / (n1 * n2), 4).alias("cos4")
    )
    by = [("cos4", False), ("vec_id", True)]
    return _ranked(distributed_topk(scored, k, by), by, ["vec_id", "cos4"])


def sq8_signatures(spark, sf_dir) -> DataFrame:
    """(vec_id, q): int8 scalar quantization of the UNIT-normalized
    embedding — q_i = floor(x_i/||x|| * 127 + 0.5), the standard SQ8 form
    (4x memory vs float32; the quantized int dot product approximates
    cosine directly).  All JVM array expressions; floor(v+0.5) rounding is
    engine-portable (round() half-even vs half-away is not)."""
    e = embeddings(spark, sf_dir).select(
        "vec_id", F.col("embedding").cast("array<double>").alias("v")
    )
    nrm = F.sqrt(F.aggregate(
        F.transform("v", lambda x: x * x), F.lit(0.0), lambda a, x: a + x
    ))
    e = e.withColumn("nrm", nrm)
    q = F.transform(
        "v",
        lambda x: F.when(F.col("nrm") == 0.0, F.lit(0)).otherwise(
            F.floor(x / F.col("nrm") * F.lit(127.0) + F.lit(0.5))
        ).cast("long"),
    )
    return e.select("vec_id", q.alias("q"))


def sq8_ann_topk(spark, sf_dir, query_vec_id: int = 0, k: int = 10) -> DataFrame:
    """q: top-k by the exact INTEGER dot product of SQ8 signatures — the
    quantized first pass of a quantize-then-rescore ANN pipeline.  At
    100 TB the signatures are 4x smaller than the float vectors, the dot
    product is integer SIMD, and the float rescoring touches only the
    candidate pool (rescoring recall is pinned in tests; this surface
    gates the quantized ranking itself, which is exact integer math on
    both engines)."""
    s = sq8_signatures(spark, sf_dir)
    qv = s.filter(F.col("vec_id") == query_vec_id).select(
        F.col("q").alias("qq")
    )
    j = s.filter(F.col("vec_id") != query_vec_id).crossJoin(F.broadcast(qv))
    qdot = F.aggregate(
        F.zip_with("q", "qq", lambda a, b: a * b),
        F.lit(0).cast("long"),
        lambda acc, x: acc + x,
    )
    scored = j.select("vec_id", qdot.alias("qdot"))
    by = [("qdot", False), ("vec_id", True)]
    return _ranked(distributed_topk(scored, k, by), by, ["vec_id", "qdot"])


def cosine_pairs(spark, sf_dir, threshold: float = 0.4) -> DataFrame:
    """q: exact embedding-cosine near-dup pairs (vec_a < vec_b, round(cos,4)
    >= threshold) — the exactness baseline the LSH path
    (`pipeline.embedding_near_dup_pairs`) is verified against.

    Deliberately O(n^2): this is the VERIFY op for bounded samples; the
    100 TB path is the hyperplane-LSH bucket join (candidates ~O(n)) with
    this as the within-bucket verifier.  Dot/norms via F.aggregate +
    F.zip_with — JVM-side, no Python."""
    e = embeddings(spark, sf_dir).select(
        "vec_id", F.col("embedding").cast("array<double>").alias("vec")
    )
    a = e.select(F.col("vec_id").alias("vec_a"), F.col("vec").alias("va"))
    b = e.select(F.col("vec_id").alias("vec_b"), F.col("vec").alias("vb"))
    j = a.join(b, F.col("vec_a") < F.col("vec_b"))
    dot = F.aggregate(
        F.zip_with("va", "vb", lambda x, y: x * y),
        F.lit(0.0), lambda acc, x: acc + x,
    )
    n1 = F.sqrt(F.aggregate(
        F.transform("va", lambda x: x * x), F.lit(0.0), lambda acc, x: acc + x
    ))
    n2 = F.sqrt(F.aggregate(
        F.transform("vb", lambda x: x * x), F.lit(0.0), lambda acc, x: acc + x
    ))
    return (
        j.select("vec_a", "vec_b", F.round(dot / (n1 * n2), 4).alias("cos4"))
        .filter(F.col("cos4") >= threshold)
    )


def semantic_dedup(spark, sf_dir, threshold: float = 0.4) -> DataFrame:
    """q: embedding-space semantic dedup (the SemDeDup recipe, Abbas et
    al. 2023: drop all but one member of every semantic-duplicate
    cluster): cosine near-dup edges -> connected components -> keep the
    minimum vec_id per cluster.  -> (vec_id, cluster, keep).

    Composition of the engine's verified blocks: edges from the exact
    cosine verifier (`cosine_pairs` — at gate scale the candidate set IS
    all pairs; at 100 TB the hyperplane-LSH bucket join
    (`pipeline.embedding_near_dup_pairs`) generates the candidates and
    this same verify/cluster/keep tail runs unchanged), clusters from
    the iterative min-label propagation (`dedup_clusters` edge walk —
    one edge-keyed shuffle per round, never a pairwise corpus stage)."""
    edges = cosine_pairs(spark, sf_dir, threshold).select(
        F.col("vec_a").alias("a"), F.col("vec_b").alias("b"))
    ids = embeddings(spark, sf_dir).select(
        F.col("vec_id").cast("long").alias("vec_id"))
    labels = ids.withColumn("cluster", F.col("vec_id"))
    sym = edges.unionByName(
        edges.select(F.col("b").alias("a"), F.col("a").alias("b"))
    ).persist()  # the O(candidates) verify join runs ONCE, not per round
    # min-label propagation (same loop shape + contract as dedup_clusters)
    max_rounds = 20
    prev = None
    for _ in range(max_rounds):
        nbr = (
            sym.join(labels, sym.a == labels.vec_id)
            .select(F.col("b").alias("vec_id"), "cluster")
        )
        labels = (
            labels.unionByName(nbr)
            .groupBy("vec_id").agg(F.min("cluster").alias("cluster"))
            .localCheckpoint()
        )
        s = labels.agg(F.sum("cluster")).collect()[0][0]
        if s == prev:
            break
        prev = s
    else:
        sym.unpersist()
        raise RuntimeError(
            f"semantic_dedup did not converge in {max_rounds} rounds — "
            "pathological chain graph; switch to large-star/small-star"
        )
    sym.unpersist()
    return labels.select(
        "vec_id", "cluster",
        (F.col("vec_id") == F.col("cluster")).alias("keep"),
    )


def suggest_term(spark, sf_dir, term: str, max_edits: int = 2, top: int = 5) -> DataFrame:
    """q: spellcheck suggestions — dictionary terms within max_edits of
    `term`, ranked (dist asc, df desc, term asc).  DirectSpellChecker
    semantics (§2.8 suggest) on the relational tokenization; the engine-side
    twin is highlight.suggest over the index term dictionary."""
    t = term.lower()
    n = len(t)
    return (
        term_stats(spark, sf_dir)
        .filter(
            (F.length("term") >= n - max_edits)
            & (F.length("term") <= n + max_edits)
            & (F.col("term") != t)
        )
        .withColumn("dist", F.levenshtein(F.col("term"), F.lit(t)).cast("long"))
        .filter(F.col("dist") <= max_edits)
        .select("term", F.col("df").cast("long").alias("df"), "dist")
        .orderBy(F.asc("dist"), F.desc("df"), F.asc("term"))
        .limit(top)
    )


def events_window(spark, sf_dir, hours: int = 6) -> DataFrame:
    """q: tumbling-window event aggregation — the batch form of the
    Structured Streaming windowed-agg path (one shared transformation in
    streaming.windowed_event_counts), so the oracle check here gates the
    streaming logic too."""
    from .streaming import windowed_event_counts

    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    return windowed_event_counts(ev, hours)


def _lsh_candidates(u: DataFrame, bucket_cap: int | None = None) -> DataFrame:
    """(da, db) candidate pairs from banded signatures (band, sig, doc_id).

    bucket_cap=None: exact all-pairs-within-bucket self-join (the gate/oracle
    form).  bucket_cap=N: degenerate hot buckets (> N members — e.g.
    thousands of boilerplate-identical docs) switch from the quadratic
    self-join to LINEAR candidate generation: every member pairs with the
    bucket minimum plus its id-order neighbor.  For identical-content
    clusters this yields exactly the same keep/drop decisions as all-pairs
    (every non-min member verifies against the min); for near-dup chains it
    is the standard bounded approximation.  Planted-cluster equivalence is
    tested in tests/test_pipeline.py."""
    if bucket_cap is None:
        return (
            u.alias("a")
            .join(u.alias("b"), ["band", "sig"])
            .filter(F.col("a.doc_id") < F.col("b.doc_id"))
            .select(F.col("a.doc_id").alias("da"), F.col("b.doc_id").alias("db"))
            .distinct()
        )
    w = Window.partitionBy("band", "sig")
    wo = w.orderBy("doc_id")
    u2 = (
        u.withColumn("n", F.count("*").over(w))
        .withColumn("mn", F.min("doc_id").over(w))
        .withColumn("prev", F.lag("doc_id").over(wo))
    )
    small = u2.filter(F.col("n") <= bucket_cap).select("band", "sig", "doc_id")
    cand_small = (
        small.alias("a")
        .join(small.alias("b"), ["band", "sig"])
        .filter(F.col("a.doc_id") < F.col("b.doc_id"))
        .select(F.col("a.doc_id").alias("da"), F.col("b.doc_id").alias("db"))
    )
    big = u2.filter(F.col("n") > bucket_cap)
    min_links = big.filter(F.col("doc_id") != F.col("mn")).select(
        F.col("mn").alias("da"), F.col("doc_id").alias("db")
    )
    neighbor_links = big.filter(
        F.col("prev").isNotNull() & (F.col("prev") != F.col("mn"))
    ).select(F.col("prev").alias("da"), F.col("doc_id").alias("db"))
    return cand_small.unionAll(min_links).unionAll(neighbor_links).distinct()


def _verified_edges(spark, sf_dir, bands: int = 4, threshold: float = 0.7,
                    bucket_cap: int | None = None,
                    shingle: int | None = None) -> DataFrame:
    """(da, db) near-dup edges, da < db: banded-LSH candidates verified by
    exact set Jaccard >= threshold.  Shared by dedup_pipeline (greedy
    min-id retention) and dedup_clusters (connected components).

    `shingle=None` (the gate/oracle form) signs and verifies over the
    doc's TERM set; `shingle=k` switches both the banded signatures and
    the verification unit to word k-gram shingles — the discriminative
    form for common-vocab corpora, where whole-doc term sets collide
    (the 250k soak measured a 6,894-doc hot bucket and 9.9M candidate
    pairs under term signatures; k-gram signatures spread those buckets
    because the min-hash ranges over O(len) mostly-unique shingles
    instead of a shared vocabulary)."""
    if shingle is not None:
        sig = shingle_minhash(spark, sf_dir, shingle, bands)
    else:
        sig = minhash_signature(spark, sf_dir, bands)
    parts = [
        sig.select(F.lit(j).alias("band"), F.col(f"mh{j}").alias("sig"), "doc_id")
        for j in range(bands)
    ]
    u = parts[0]
    for p in parts[1:]:
        u = u.unionAll(p)
    cand = _lsh_candidates(u, bucket_cap)
    if shingle is not None:
        t = shingles(spark, sf_dir, shingle).select(
            "doc_id", F.col("shingle").alias("term"))
    else:
        t = terms_tf(spark, sf_dir).select("doc_id", "term")
    sizes = t.groupBy("doc_id").agg(F.count("*").alias("sz"))
    # size-ratio prefilter (the PPJoin/AllPairs length filter, Xiao et al.
    # WWW'08): inter <= min(sa, sb), so the best achievable Jaccard is
    # min/(sa+sb-min) — pairs below threshold on that bound cannot pass the
    # final filter and skip the expensive per-term verification join
    # entirely.  EXACT: J(inter) = i/(sa+sb-i) is monotone in i, division
    # is a single correctly-rounded op, and IEEE rounding is monotone, so
    # the double-valued bound dominates the double-valued J for every
    # inter <= min — no pair that would pass the final filter is dropped.
    cand = (
        cand.join(sizes.select(F.col("doc_id").alias("da"),
                               F.col("sz").alias("sa")), "da")
        .join(sizes.select(F.col("doc_id").alias("db"),
                           F.col("sz").alias("sb")), "db")
        .filter(
            F.least("sa", "sb")
            / (F.col("sa") + F.col("sb") - F.least("sa", "sb"))
            >= threshold
        )
    )
    inter = (
        cand.join(t.alias("ta"), F.col("da") == F.col("ta.doc_id"))
        .join(
            t.alias("tb"),
            (F.col("db") == F.col("tb.doc_id"))
            & (F.col("ta.term") == F.col("tb.term")),
        )
        .groupBy("da", "db", "sa", "sb")
        .agg(F.count("*").alias("inter"))
    )
    return (
        inter.filter(
            F.col("inter") / (F.col("sa") + F.col("sb") - F.col("inter"))
            >= threshold
        )
        .select("da", "db")
    )


def dedup_pipeline(spark, sf_dir, bands: int = 4, threshold: float = 0.7,
                   bucket_cap: int | None = None,
                   shingle: int | None = None) -> DataFrame:
    """q: end-to-end near-dup removal decision — the composite the three
    building blocks above exist for: MinHash signatures -> banded LSH
    candidate pairs -> exact token-set Jaccard verification -> greedy
    min-id retention (a doc is dropped iff some verified near-dup with a
    smaller doc_id exists).  -> (doc_id, keep).

    Scale shape: candidate generation is the banded self-join (bounded by
    bucket sizes — the whole point of LSH), verification touches candidate
    pairs only, and the retention rule is a semi-join; no all-pairs stage
    anywhere.
    """
    verified = (
        _verified_edges(spark, sf_dir, bands, threshold, bucket_cap,
                        shingle=shingle)
        .select("db")
        .distinct()
    )
    d = documents(spark, sf_dir).select("doc_id")
    return d.join(
        verified.withColumnRenamed("db", "doc_id").withColumn("drop", F.lit(True)),
        "doc_id", "left",
    ).select("doc_id", F.coalesce(~F.col("drop"), F.lit(True)).alias("keep"))


def dedup_clusters(spark, sf_dir, bands: int = 4, threshold: float = 0.7,
                   bucket_cap: int | None = None,
                   max_rounds: int = 20,
                   edges: DataFrame | None = None,
                   shingle: int | None = None) -> DataFrame:
    """q: connected-component duplicate CLUSTERING — cluster id = the
    minimum doc_id reachable through verified near-dup edges (full
    transitive closure).  -> (doc_id, cluster); singletons keep their own
    id.  This is the exact grouping that dedup_pipeline's greedy min-LINK
    retention approximates: with clusters in hand a pipeline can keep one
    canonical doc per group, count duplication factors, or stratify
    training mixes by cluster size.

    Scale shape: iterative min-label propagation over the EDGE set only —
    per round one (edge x label) shuffle join + one groupBy(min), never a
    corpus-wide pairwise stage.  Rounds = graph diameter; banded-LSH
    near-dup components are clique-dense (every member shares a band
    bucket with the rest), so diameter is 1-3 in practice.  Labels are
    localCheckpoint'd each round to keep the plan flat, and convergence is
    detected by the (monotone non-increasing) sum of labels reaching a
    fixpoint — one tiny aggregate per round, no label-vs-label join.  For
    adversarial long-chain graphs the O(log n) large-star/small-star
    alternation (Kiveris et al., SOCC'14) drops into the same loop.

    `edges` overrides the MinHash edge derivation with a caller-supplied
    (da, db) similarity graph — e.g. embedding-cosine or SimHash pairs —
    so any near-dup signal composes with the same clustering.
    """
    e = (edges if edges is not None
         else _verified_edges(spark, sf_dir, bands, threshold, bucket_cap,
                              shingle=shingle))
    edges = (
        e.select(F.col("da").alias("src"), F.col("db").alias("dst"))
        .unionAll(e.select(F.col("db").alias("src"), F.col("da").alias("dst")))
        .persist()
    )
    labels = (
        documents(spark, sf_dir)
        .select("doc_id", F.col("doc_id").alias("cluster"))
        .localCheckpoint()
    )
    prev_total = labels.agg(F.sum("cluster")).collect()[0][0]
    for _ in range(max_rounds):
        nb = (
            edges.join(
                labels.select(F.col("doc_id").alias("dst"),
                              F.col("cluster").alias("nb_cluster")),
                "dst",
            )
            .groupBy("src")
            .agg(F.min("nb_cluster").alias("nb_min"))
        )
        labels = (
            labels.join(nb, labels.doc_id == nb.src, "left")
            .select(
                "doc_id",
                F.least(
                    F.col("cluster"), F.coalesce(F.col("nb_min"), F.col("cluster"))
                ).alias("cluster"),
            )
            .localCheckpoint()
        )
        total = labels.agg(F.sum("cluster")).collect()[0][0]
        if total == prev_total:
            break
        prev_total = total
    else:
        raise RuntimeError(
            f"dedup_clusters did not converge in {max_rounds} rounds — "
            "pathological chain graph; switch to large-star/small-star"
        )
    edges.unpersist()
    return labels


def scored_join_parents(spark, sf_dir, term: str, mode: str = "max",
                        k: int = 10) -> DataFrame:
    """q: SCORED query-time join — GlobalOrdinalsWithScoreQuery /
    ToParentBlockJoin semantics (lucene/join ScoreMode.java:23-43): child
    docs matching `term` aggregate up to their parent key (`source`) with
    per-parent score = Max / Total(sum) / Avg of child BM25 scores; top-k
    parents by (score desc, source asc).

    Spark shape: one partial-aggregated groupBy on the (small) match set —
    the big table is never shuffled; at 100 TB the children scan prunes by
    term and the parent agg is map-side-combined."""
    if mode not in ("max", "total", "avg"):
        raise ValueError(f"unknown ScoreMode {mode!r}")
    d = documents(spark, sf_dir).select("doc_id", "source")
    s = (
        _scored(spark, sf_dir)
        .filter(F.col("term") == term)
        .join(d, "doc_id")
    )
    agg = {"max": F.max("score"), "total": F.sum("score"),
           "avg": F.avg("score")}[mode]
    return (
        s.groupBy("source")
        .agg(F.round(agg, 4).alias("score4"),
             F.count("*").alias("n_children"))
        .orderBy(F.desc("score4"), F.asc("source"))
        .limit(k)
    )


def join_children(spark, sf_dir, term: str) -> DataFrame:
    """q: ToChildBlockJoinQuery analog (lucene/join
    ToChildBlockJoinQuery.java): query PARENTS (here: `source` groups whose
    members match `term`), return the CHILD docs of every matching parent.
    -> (doc_id, source).  Same broadcast LEFT SEMI shape as the
    parent-side join — the big table never shuffles."""
    d = documents(spark, sf_dir).select("doc_id", "source")
    matching_parents = (
        terms_tf(spark, sf_dir)
        .filter(F.col("term") == term)
        .join(d, "doc_id")
        .select("source")
        .distinct()
    )
    return d.join(F.broadcast(matching_parents), "source", "left_semi").select(
        "doc_id", "source"
    )


def group_count(spark, sf_dir, term: str) -> DataFrame:
    """q: AllGroupsCollector / Solr group.ngroups (lucene/grouping
    AllGroupsCollector.java): the number of distinct groups among a
    query's matches — one partial-aggregated countDistinct on the match
    set.  -> single row (ngroups, nhits)."""
    m = (
        terms_tf(spark, sf_dir)
        .filter(F.col("term") == term)
        .join(documents(spark, sf_dir).select("doc_id", "source"), "doc_id")
    )
    return m.agg(
        F.countDistinct("source").alias("ngroups"),
        F.count("*").alias("nhits"),
    )


def repetition_stats(spark, sf_dir) -> DataFrame:
    """q: within-document repetition signals (the Gopher/MassiveText
    quality-rule family: Rae et al. 2021 §A1.1 — fraction of duplicate
    lines and fraction of tokens inside repeated 2-grams mark boilerplate
    and spam).  -> (doc_id, dup_line_frac, dup_2gram_frac) rounded to 4.

    All JVM-side array expressions over one scan: lines split on newline,
    2-grams built with transform(sequence(...)) — zero shuffles, zero
    Python."""
    d = documents(spark, sf_dir)
    lines = F.filter(F.split(F.col("text"), "\n"), lambda x: F.length(x) > 0)
    toks = F.split(F.trim(F.col("text")), r"\s+")
    grams = F.when(
        F.size(toks) >= 2,
        F.transform(
            F.sequence(F.lit(0), F.size(toks) - 2),
            lambda i: F.concat_ws(" ", F.element_at(toks, i + 1),
                                  F.element_at(toks, i + 2)),
        ),
    ).otherwise(F.array())
    return d.select(
        "doc_id",
        F.round(
            F.when(F.size(lines) > 0,
                   1.0 - F.size(F.array_distinct(lines)) / F.size(lines))
            .otherwise(0.0), 4,
        ).alias("dup_line_frac"),
        F.round(
            F.when(F.size(grams) > 0,
                   1.0 - F.size(F.array_distinct(grams)) / F.size(grams))
            .otherwise(0.0), 4,
        ).alias("dup_2gram_frac"),
    )


def decontaminate(spark, sf_dir, eval_ids: list[int], n: int = 8) -> DataFrame:
    """q: training-set decontamination — flag any training doc sharing an
    n-token shingle with a held-out evaluation set (the standard 8-13-gram
    collision test run before pretraining).  -> (doc_id, contaminated),
    eval docs excluded from the output.

    Scale shape: the eval side is benchmark-sized, so its shingle set
    BROADCASTs; the training side streams one scan through a JVM-side
    shingle transform + semi-join — no shuffle of the big table, no
    Python.  The same shape holds at 100 TB: contamination checks are
    (huge corpus) x (small eval suite) by construction."""
    shingled = _doc_tokens(spark, sf_dir).select(
        "doc_id", F.explode(_shingle_array(n)).alias("shingle")
    )
    ev_sh = (
        shingled.filter(F.col("doc_id").isin(eval_ids))
        .select("shingle")
        .distinct()
    )
    hits = (
        shingled.filter(~F.col("doc_id").isin(eval_ids))
        .join(F.broadcast(ev_sh), "shingle", "left_semi")
        .select("doc_id")
        .distinct()
        .withColumn("hit", F.lit(True))
    )
    train = documents(spark, sf_dir).filter(
        ~F.col("doc_id").isin(eval_ids)).select("doc_id")
    return train.join(hits, "doc_id", "left").select(
        "doc_id", F.coalesce(F.col("hit"), F.lit(False)).alias("contaminated")
    )


def diversified_topk(spark, sf_dir, term: str, max_per_key: int = 2,
                     k: int = 10) -> DataFrame:
    """q: DiversifiedTopDocsCollector (lucene/misc/search/
    DiversifiedTopDocsCollector.java:50-90): top-k where at most
    `max_per_key` hits share a key (here: `source`) — result
    diversification without a post-filter.  Expressed in its set form:
    rank within key by (score desc, doc_id), keep rank <= max_per_key,
    then the global top-k cut.  -> (rank, doc_id, source, score4).

    Scale shape: the within-key window runs on the MATCH set partitioned
    by key (the natural shuffle), the global cut is a TakeOrdered."""
    m = (
        _scored(spark, sf_dir)
        .filter(F.col("term") == term)
        .join(documents(spark, sf_dir).select("doc_id", "source"), "doc_id")
        .select("doc_id", "source", F.round("score", 4).alias("score4"))
    )
    wk = Window.partitionBy("source").orderBy(
        F.desc("score4"), F.asc("doc_id"))
    kept = (
        m.withColumn("krank", F.row_number().over(wk))
        .filter(F.col("krank") <= max_per_key)
        .drop("krank")
    )
    by = [("score4", False), ("doc_id", True)]
    top = distributed_topk(kept, k, by)
    return _ranked(top, by, ["doc_id", "source", "score4"])


def collate_spelling(index, source: DataFrame, qtext: str) -> DataFrame:
    """q: Solr SpellCheckCollator (solr/core/src/java/org/apache/solr/
    spelling/SpellCheckCollator.java): rewrite a query by replacing each
    zero-hit term with its best dictionary suggestion, and report the
    collation with its hit count — the 'did you mean' surface.
    -> one row (collation string, hits long).

    Driver work is query-sized (df lookups + one suggest per misspelled
    term); the final count is the engine's distributed count path."""
    from .highlight import suggest as _suggest
    from .parser import parse
    from .search import count as _count

    an = getattr(index, "analyzer", None)
    words = qtext.split()
    fixed = []
    for w in words:
        if w in ("AND", "OR", "NOT") or not w.replace("-", "").isalnum():
            fixed.append(w)
            continue
        analyzed = (an.analyze_text(w) if an is not None
                    else __import__("voyagr_spark.analysis",
                                    fromlist=["analyze_text"]).analyze_text(w))[0]
        if not analyzed:
            # the analyzer filtered the word away (stopword, length,
            # keep-word...): it is not misspelled, it is simply not
            # indexed — SpellCheckCollator only rewrites terms the
            # checker flagged, so pass it through untouched
            fixed.append(w)
            continue
        t = analyzed[0]
        df = index.term_dfs([t]).get(t, 0)
        if df > 0:
            fixed.append(w)
            continue
        cand = _suggest(index, t, max_edits=2, top=1).collect()
        fixed.append(cand[0]["term"] if cand else w)
    collation = " ".join(fixed)
    hits = _count(index, parse(collation, analyzer=an))
    return index.spark.createDataFrame(
        [(collation, int(hits))], "collation string, hits long"
    )


def join_by_source(spark, sf_dir, term: str) -> DataFrame:
    """q: query-time join (JoinQParserPlugin / GlobalOrdinalsQuery analog,
    SURVEY §2.8): all docs whose `source` matches the source of ANY doc
    matching `term` — `{!join from=source to=source}text:term` in Solr
    syntax.  Constant-score (Solr joins drop scores).

    Spark shape: the matching side reduces to a small distinct key set ->
    broadcast LEFT SEMI join against the full table; no shuffle of the big
    side.
    """
    d = documents(spark, sf_dir)
    matching = (
        terms_tf(spark, sf_dir)
        .filter(F.col("term") == term)
        .select("doc_id")
        .distinct()
        .join(d, "doc_id")
        .select("source")
        .distinct()
    )
    return (
        d.join(F.broadcast(matching), "source", "left_semi")
        .select("doc_id", "source")
    )


def cluster_results(spark, sf_dir, term: str) -> DataFrame:
    """q: search-result clustering — the Solr ClusteringComponent surface
    (solr/contrib/clustering/src/java/org/apache/solr/handler/clustering/
    ClusteringComponent.java + carrot2/CarrotClusteringEngine.java).

    Carrot2's Lingo/STC label documents in the RESULT SET by their salient
    shared terms; the deterministic re-expression: every matching doc is
    labeled by its highest-scoring term under result-set tf-idf
    (score = tf * ln(|R| / df_R), df_R = doc frequency WITHIN the result
    set, round-4, ties broken by term asc; the query term itself is
    excluded).  Clusters = label groups with doc counts and the min doc id
    as the representative.

    Spark shape: the result set R is a semi-join key set; df_R is one
    groupBy over R's postings; the per-doc argmax is a row_number window
    PARTITIONED BY doc_id (group size = a doc's vocabulary, never the
    corpus).  No corpus-wide window, no collect.
    """
    tf = terms_tf(spark, sf_dir)
    r = tf.filter(F.col("term") == term).select("doc_id")
    tfr = (
        tf.join(r, "doc_id", "left_semi")
        .filter(F.col("term") != term)
    )
    dfr = tfr.groupBy("term").agg(F.count("*").alias("df_r"))
    nr = r.agg(F.count("*").alias("n_r"))
    scored = (
        tfr.join(dfr, "term")
        .crossJoin(F.broadcast(nr))
        .withColumn(
            "lscore",
            F.round(F.col("tf") * F.log(F.col("n_r") / F.col("df_r")), 4),
        )
    )
    w = Window.partitionBy("doc_id").orderBy(
        F.desc("lscore"), F.asc("term")
    )
    labeled = (
        scored.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("doc_id", F.col("term").alias("label"))
    )
    return labeled.groupBy("label").agg(
        F.count("*").alias("n_docs"), F.min("doc_id").alias("rep_doc")
    )


def analytics_stats(spark, sf_dir, term: str, field: str = "n_chars") -> DataFrame:
    """q: the Solr analytics component's stats expressions over a query's
    matches — unique + median + discrete percentiles
    (solr/contrib/analytics/.../statistics/UniqueStatsCollector.java,
    MedianStatsCollector.java, PercentileStatsCollector.java).

    Exact reference semantics: median = MedianCalculator.getMedian
    (midpoint average of the two middle order statistics, a plain value
    for odd counts); percentile(p) = PercentileCalculator.getPercentiles'
    order statistic at 0-based index round(p*n - .5) == floor(p*n).

    Spark shape (exact at any scale, unlike collect-and-sort): build the
    VALUE HISTOGRAM (groupBy(field).count() — shuffle keyed by value),
    cumulative-sum it with a window over the DISTINCT-VALUE table (size =
    value cardinality, never the corpus), then each wanted order statistic
    is min(value where cum > idx) via a broadcast join of a 5-row index
    frame.  The reference's calculators sort a collected List — single
    node; this is the distributed-exact form.
    """
    m = terms_tf(spark, sf_dir).filter(F.col("term") == term).select("doc_id")
    d = documents(spark, sf_dir).select("doc_id", field, "source")
    vals = m.join(d, "doc_id")
    base = vals.agg(
        F.count("*").alias("n"),
        F.countDistinct("source").alias("unique_sources"),
    )
    hist = vals.groupBy(field).agg(F.count("*").alias("cnt"))
    wv = Window.orderBy(field).rowsBetween(Window.unboundedPreceding, 0)
    cum = hist.withColumn("cum", F.sum("cnt").over(wv)).select(field, "cum")

    # 0-based order-statistic indexes (reference formulas above)
    idx = (
        base.select(
            F.floor(0.25 * F.col("n")).alias("p25"),
            F.floor(0.5 * (F.col("n") - 1)).alias("med_lo"),
            (
                F.floor(0.5 * (F.col("n") - 1))
                + ((F.col("n") - 1) % 2)
            ).alias("med_hi"),
            F.floor(0.75 * F.col("n")).alias("p75"),
            F.floor(0.99 * F.col("n")).alias("p99"),
        )
        .select(
            F.explode(
                F.create_map(
                    F.lit("p25"), F.col("p25"),
                    F.lit("med_lo"), F.col("med_lo"),
                    F.lit("med_hi"), F.col("med_hi"),
                    F.lit("p75"), F.col("p75"),
                    F.lit("p99"), F.col("p99"),
                )
            ).alias("stat", "idx")
        )
    )
    picked = (
        cum.join(F.broadcast(idx), F.col("cum") > F.col("idx"))
        .groupBy("stat")
        .agg(F.min(field).alias("v"))
    )
    stats = picked.groupBy().pivot(
        "stat", ["p25", "med_lo", "med_hi", "p75", "p99"]
    ).agg(F.first("v"))
    return base.crossJoin(F.broadcast(stats)).select(
        "n",
        "unique_sources",
        F.col("p25").cast("double").alias("p25"),
        ((F.col("med_lo") + F.col("med_hi")) / 2.0).alias("median"),
        F.col("p75").cast("double").alias("p75"),
        F.col("p99").cast("double").alias("p99"),
    )


def dedup_lines(docs: DataFrame, min_docs: int = 2, sep: str = "\n") -> DataFrame:
    """Line-level boilerplate removal (the CCNet / RefinedWeb paragraph-dedup
    step): drop every line whose normalized form (lower + trim) appears in
    >= `min_docs` DISTINCT documents — headers, footers, nav bars, license
    blurbs — and reassemble each document from its surviving lines in
    original order.  Docs whose every line was boilerplate keep text ''.

    Input: (doc_id, text); output: (doc_id, text_clean).

    Spark shape at 100 TB: posexplode lines -> groupBy(line key) with a
    partial-aggregated countDistinct (map-side combine) -> one key-
    partitioned shuffle join back -> per-doc reassembly via array_sort on
    (pos, line) structs.  No driver state, no Python; the line-count table
    is boilerplate-vocabulary sized.  Hot degenerate keys (the empty line)
    are just counts, never candidate pairs — unlike MinHash buckets there
    is no pairwise stage to cap.
    """
    lines = docs.select(
        "doc_id", F.posexplode(F.split("text", sep)).alias("pos", "line")
    )
    key = F.lower(F.trim(F.col("line")))
    counts = (
        lines.groupBy(key.alias("key"))
        .agg(F.count_distinct("doc_id").alias("n_docs"))
    )
    kept = (
        lines.join(counts, key == counts.key)
        .filter(F.col("n_docs") < min_docs)
        .groupBy("doc_id")
        .agg(
            F.array_join(
                F.transform(
                    F.array_sort(F.collect_list(F.struct("pos", "line"))),
                    lambda s: s["line"],
                ),
                sep,
            ).alias("text_clean")
        )
    )
    return (
        docs.join(kept, "doc_id", "left")
        .select(
            "doc_id",
            F.coalesce("text_clean", F.lit("")).alias("text_clean"),
        )
    )


def dedup_lines_table(spark, sf_dir, line_tokens: int = 2,
                      min_docs: int = 2) -> DataFrame:
    """dedup_lines over the documents table, with deterministic synthetic
    line structure (the corpus is single-line): consecutive `line_tokens`-
    token runs become lines.  Gate surface for the boilerplate-removal op."""
    d = documents(spark, sf_dir).select(
        "doc_id", F.split("text", " ").alias("toks")
    )
    n_lines = F.ceil(F.size("toks") / F.lit(line_tokens)).cast("int")
    lined = d.select(
        "doc_id",
        F.array_join(
            F.transform(
                F.sequence(F.lit(0), n_lines - 1),
                lambda i: F.array_join(
                    F.slice("toks", i * line_tokens + 1, line_tokens), " "
                ),
            ),
            "\n",
        ).alias("text"),
    )
    return dedup_lines(lined, min_docs=min_docs).orderBy("doc_id")


def chunk_documents(spark, sf_dir, window: int = 64, stride: int = 48) -> DataFrame:
    """q: context-window chunking for training-data prep: overlapping
    fixed-size token windows per document (the standard LLM pretraining
    windowing step; complements pack_sequences, which packs whole docs).

    Chunks start at 0, stride, 2*stride, ... through ceil((n-window)/
    stride)*stride (one chunk when n <= window), each `window` tokens long
    (the final chunk may be shorter).  Whitespace tokens, matching the
    corpus generator's spacing.

    Spark shape: one JVM-side array expression per doc — split ->
    sequence(0, n_chunks-1) -> posexplode -> slice; zero shuffles, zero
    Python.  Chunk identity = md5 of the joined slice so the gate hashes
    content without shipping it twice.
    """
    d = documents(spark, sf_dir).select(
        "doc_id", F.split("text", " ").alias("toks")
    )
    n = F.size("toks")
    last = F.greatest(
        F.lit(0), -F.floor(-(n - F.lit(window)) / F.lit(stride))
    )
    return (
        d.withColumn("ci", F.explode(F.sequence(F.lit(0), last.cast("int"))))
        .select(
            "doc_id",
            F.col("ci").cast("long").alias("chunk_id"),
            (F.col("ci") * stride).cast("long").alias("start"),
            F.least(n - F.col("ci") * stride, F.lit(window))
            .cast("long")
            .alias("chunk_len"),
            F.md5(
                F.concat_ws(
                    " ", F.slice("toks", F.col("ci") * stride + 1, window)
                )
            ).alias("chunk_md5"),
        )
    )


def substring_dup_spans(spark, sf_dir, window: int = 10,
                        min_docs: int = 2) -> DataFrame:
    """q: exact-substring dedup spans (Lee et al., "Deduplicating Training
    Data Makes Language Models Better", 2022 — the window-hash practical
    form of the paper's suffix-array pass): hash EVERY `window`-token
    window, keep hashes appearing in >= min_docs DISTINCT documents, and
    merge each doc's overlapping duplicate windows into maximal token
    spans -> (doc_id, span_start, span_end (exclusive), n_windows).
    Callers cut [span_start, span_end) to remove verbatim cross-document
    text.

    Scale shape: window extraction is one JVM-side slice/md5 expression
    per position (token-rate rows — the algorithm's granularity; the
    shuffle key is the hash, so dup detection is one partial-agg);
    surviving windows are a tiny fraction, and the span merge is a
    per-document gaps-and-islands window (doc-sized partitions)."""
    d = documents(spark, sf_dir).select(
        "doc_id", F.split("text", " ").alias("toks"))
    n = F.size("toks")
    wins = (
        d.filter(n >= window)
        .withColumn("ci", F.explode(F.sequence(F.lit(0),
                                               (n - window).cast("int"))))
        .select(
            "doc_id",
            F.col("ci").cast("long").alias("start"),
            F.md5(F.concat_ws(
                " ", F.slice("toks", F.col("ci") + 1, window))).alias("h"),
        )
    )
    dup = (
        wins.groupBy("h")
        .agg(F.countDistinct("doc_id").alias("nd"))
        .filter(F.col("nd") >= min_docs)
        .select("h")
    )
    hits = wins.join(dup, "h").select(
        "doc_id", "start", (F.col("start") + window).alias("end"))
    w1 = Window.partitionBy("doc_id").orderBy("start")
    prev_end = F.max("end").over(
        w1.rowsBetween(Window.unboundedPreceding, -1))
    grp = F.sum(
        F.when(prev_end.isNull() | (F.col("start") > prev_end), 1)
        .otherwise(0)
    ).over(w1)
    return (
        hits.withColumn("grp", grp)
        .groupBy("doc_id", "grp")
        .agg(F.min("start").alias("span_start"),
             F.max("end").alias("span_end"),
             F.count("*").alias("n_windows"))
        .select("doc_id", "span_start", "span_end", "n_windows")
    )


# -- PII redaction (training-data pipeline op) -------------------------------

#: redaction patterns, ordered; each pattern is in the common RE2/Java
#: regex subset so the engine (Spark/Java) and the oracle (DuckDB/RE2)
#: evaluate literally the same expressions
PII_PATTERNS = (
    ("email", r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}", "<EMAIL>"),
    ("ipv4", r"\b(\d{1,3}\.){3}\d{1,3}\b", "<IP>"),
    ("phone", r"\b\d{3}-\d{3}-\d{4}\b", "<PHONE>"),
    ("ssn", r"\b\d{3}-\d{2}-\d{4}\b", "<SSN>"),
)


def pii_augmented(spark, sf_dir) -> DataFrame:
    """documents with deterministic PII spans appended (derived from
    doc_id), so every row exercises every redaction pattern — the corpus
    itself is synthetic and PII-free.  No external data, no RNG."""
    d = documents(spark, sf_dir)
    return d.withColumn(
        "text",
        F.concat(
            F.col("text"),
            F.lit(" contact user"), F.col("doc_id"),
            F.lit("@example.com at 10.0."), F.col("doc_id") % 256,
            F.lit(".7 call 555-123-4567 ssn 123-45-6789"),
        ),
    )


def redact_pii(spark, sf_dir) -> DataFrame:
    """q: PII detection + redaction — the standard pre-training scrub pass
    (emails, IPv4, phone, SSN-shaped ids).  Counts are detected BEFORE
    redaction; patterns then apply in declaration order (an email's digits
    can't be re-matched as a phone once replaced).

    Spark shape: one scan, regexp_extract_all + chained regexp_replace,
    all JVM-side (whole-stage codegen) — zero Python, zero shuffles; at
    100 TB this is embarrassingly parallel.  -> (doc_id, n_email, n_ipv4,
    n_phone, n_ssn, red_md5) with red_md5 = md5 of the redacted text so
    the gate hashes full redaction output without shipping it twice."""
    d = pii_augmented(spark, sf_dir)
    cols = [F.col("doc_id")]
    for name, pat, _ in PII_PATTERNS:
        cols.append(
            F.size(F.regexp_extract_all(F.col("text"), F.lit(pat), F.lit(0)))
            .cast("long").alias(f"n_{name}")
        )
    red = F.col("text")
    for _, pat, repl in PII_PATTERNS:
        red = F.regexp_replace(red, pat, repl)
    cols.append(F.md5(red).alias("red_md5"))
    return d.select(*cols)


# -- Gopher quality rules (training-data pipeline op) ------------------------

#: the 8 high-frequency English stop words the Gopher rules require >= 2 of
GOPHER_STOPS = ("the", "be", "to", "of", "and", "that", "have", "with")


def gopher_quality(spark, sf_dir) -> DataFrame:
    """q: the Gopher quality-filter rule set (Rae et al. 2021, appendix A1)
    as one JVM-side expression pass: word count in [50, 100000], mean word
    length in [3, 10], symbol-to-word ratio ('#' or '...') <= 0.1, >= 80%
    of words contain an alphabetic char, >= 2 distinct required stop words.
    -> per-doc metrics + the overall keep flag.

    Spark shape: single scan, split/transform/filter array expressions —
    no UDF, no shuffle; the filter composes with stratified_sample /
    dedup_* for the full pipeline."""
    d = documents(spark, sf_dir)
    words = F.expr(r"regexp_extract_all(text, '\\S+', 0)")
    n_words = F.size(words).cast("long")
    mean_wl = F.round(
        F.expr(
            r"aggregate(transform(regexp_extract_all(text, '\\S+', 0),"
            r" w -> length(w)), 0L, (a, x) -> a + x)"
        ).cast("double") / F.greatest(n_words, F.lit(1)),
        4,
    )
    n_hash = F.length("text") - F.length(F.regexp_replace("text", r"#", ""))
    n_ell = (
        F.length("text")
        - F.length(F.expr("replace(text, '...', '')"))
    ) / 3
    sym_ratio = F.round(
        (n_hash + n_ell).cast("double") / F.greatest(n_words, F.lit(1)), 4
    )
    n_alpha = F.expr(
        r"size(filter(regexp_extract_all(text, '\\S+', 0),"
        r" w -> w rlike '[A-Za-z]'))"
    ).cast("long")
    alpha_ratio = F.round(
        n_alpha.cast("double") / F.greatest(n_words, F.lit(1)), 4
    )
    low_words = F.expr(
        r"transform(regexp_extract_all(text, '\\S+', 0), w -> lower(w))"
    )
    stop_hits = sum(
        F.array_contains(low_words, s).cast("int") for s in GOPHER_STOPS
    ).cast("long")
    keep = (
        n_words.between(50, 100_000)
        & mean_wl.between(3.0, 10.0)
        & (sym_ratio <= 0.1)
        & (alpha_ratio >= 0.8)
        & (stop_hits >= 2)
    )
    return d.select(
        "doc_id",
        n_words.alias("n_words"),
        mean_wl.alias("mean_word_len"),
        sym_ratio.alias("symbol_ratio"),
        alpha_ratio.alias("alpha_ratio"),
        stop_hits.alias("stop_hits"),
        keep.alias("keep"),
    )


# ---------------------------------------------------------------------------
# DSIR — Data Selection via Importance Resampling (Xie et al., NeurIPS 2023).
# Hashed-ngram bag features, a target/raw bucket-unigram likelihood ratio per
# document, and deterministic Gumbel-top-k resampling.  All hashing is md5-
# derived so the whole pipeline is RNG-free and bit-reproducible across
# engines/runs/cluster sizes (same idiom as stratified_sample).
# ---------------------------------------------------------------------------

#: hashed-ngram feature space size — bucket = first md5 byte of the ngram.
#: The paper uses 10k buckets at web scale; 256 keeps the SQL oracle's
#: hexmap join exact while exercising the identical pipeline shape.
DSIR_BUCKETS = 256


def dsir_features(spark, sf_dir) -> DataFrame:
    """Per-doc hashed-ngram bucket counts -> (doc_id, lang, bucket, c).

    Features are whitespace unigrams + bigrams (the DSIR recipe), hashed to
    `DSIR_BUCKETS` buckets via the first md5 byte.  Bigrams are built with a
    JVM-side `transform(sequence(...))` over the split array — one scan, no
    token-table self-join, no Python; the only shuffle is the
    (doc_id, bucket) partial-aggregated groupBy."""
    d = documents(spark, sf_dir).select(
        "doc_id", "lang", F.split(F.lower("text"), " ").alias("ws")
    )
    bigrams = F.when(
        F.size("ws") >= 2,
        F.expr("transform(sequence(0, size(ws)-2),"
               " i -> concat(ws[i], ' ', ws[i+1]))"),
    ).otherwise(F.expr("array()").cast("array<string>"))
    grams = F.concat(F.col("ws"), bigrams)
    return (
        d.select("doc_id", "lang", F.explode(grams).alias("ng"))
        .filter(F.col("ng") != "")
        .withColumn(
            "bucket", F.conv(F.substring(F.md5("ng"), 1, 2), 16, 10).cast("int")
        )
        .groupBy("doc_id", "lang", "bucket")
        .agg(F.count("*").alias("c"))
    )


def _dsir_llr(spark, feats: DataFrame, target_lang: str) -> DataFrame:
    """Per-bucket log likelihood ratio ln(p_target) - ln(p_raw) over the full
    bucket domain, Laplace +1 smoothed: p(b) = (c_b + 1) / (total + B).

    The raw model is the whole corpus; the target model is the docs whose
    lang matches (the paper's target-distribution proxy).  Both models are
    B-row aggregates -> broadcast back; nothing here scales with the corpus
    beyond the one partial-agg pass over the feature table."""
    raw = feats.groupBy("bucket").agg(F.sum("c").alias("cr"))
    tgt = (
        feats.filter(F.col("lang") == target_lang)
        .groupBy("bucket")
        .agg(F.sum("c").alias("ct"))
    )
    dom = spark.range(DSIR_BUCKETS).select(F.col("id").cast("int").alias("bucket"))
    joined = (
        dom.join(raw, "bucket", "left")
        .join(tgt, "bucket", "left")
        .select(
            "bucket",
            F.coalesce("cr", F.lit(0)).alias("cr"),
            F.coalesce("ct", F.lit(0)).alias("ct"),
        )
    )
    tot = joined.agg(
        F.sum("cr").cast("double").alias("tr"),
        F.sum("ct").cast("double").alias("tt"),
    )
    b = float(DSIR_BUCKETS)
    return joined.crossJoin(F.broadcast(tot)).select(
        "bucket",
        (
            F.log((F.col("ct") + 1) / (F.col("tt") + b))
            - F.log((F.col("cr") + 1) / (F.col("tr") + b))
        ).alias("llr"),
    )


def dsir_weights(spark, sf_dir, target_lang: str = "en") -> DataFrame:
    """q: per-doc DSIR importance log-weight -> (doc_id, logw).

    logw(d) = sum_b c_{d,b} * [ln p_target(b) - ln p_raw(b)] — the hashed-
    ngram importance weight of Xie et al. 2023 eq. (2).  Scale shape: one
    feature scan + (doc_id, bucket) partial agg, two B-row model aggregates
    broadcast back, one doc-keyed partial-agg sum.  No driver loops, no
    UDFs past the shared tokenizer split."""
    feats = dsir_features(spark, sf_dir)
    llr = _dsir_llr(spark, feats, target_lang)
    return (
        feats.join(F.broadcast(llr), "bucket")
        .groupBy("doc_id")
        .agg(F.round(F.sum(F.col("c") * F.col("llr")), 4).alias("logw"))
    )


def dsir_sample(spark, sf_dir, k: int = 50, target_lang: str = "en") -> DataFrame:
    """q: DSIR Gumbel-top-k resample -> (rank, doc_id, logw), k docs sampled
    without replacement with probability proportional to exp(logw).

    The Gumbel-max trick (key = logw + Gumbel(0,1), take the k largest) is
    the paper's resampling step made deterministic: u is derived from
    md5(doc_id || ':g') quantized to 1/65536, so the sample is reproducible
    across engines and cluster sizes with no RNG state.  Top-k rides
    distributed_topk (per-partition heads + k-row merge — never a global
    sort)."""
    feats = dsir_features(spark, sf_dir)
    llr = _dsir_llr(spark, feats, target_lang)
    w = (
        feats.join(F.broadcast(llr), "bucket")
        .groupBy("doc_id")
        .agg(F.sum(F.col("c") * F.col("llr")).alias("lw"))
    )
    u = (
        F.conv(
            F.substring(
                F.md5(F.concat(F.col("doc_id").cast("string"), F.lit(":g"))), 1, 4
            ),
            16, 10,
        ).cast("double")
        + 0.5
    ) / 65536.0
    keyed = w.select(
        "doc_id",
        F.round("lw", 4).alias("logw"),
        (F.col("lw") - F.log(-F.log(u))).alias("gkey"),
    )
    top = distributed_topk(keyed, k, [("gkey", False), ("doc_id", True)])
    return _ranked(top, [("gkey", False), ("doc_id", True)], ["doc_id", "logw"])
