"""Shard split + distributed sharded search (shards.py).

Contract: split_index partitions the corpus into standalone shard indexes,
and sharded_search with ExactStatsCache global stats reproduces the unsplit
index's top-k BIT-EXACTLY (ranks, doc ids, float32 scores) — the
distributed-IDF guarantee (ExactStatsCache.java:40-80).  Also proves the
inverse: per-shard LOCAL stats drift the scores (why the stats round
exists at all).
"""

import shutil

import pytest

from voyagr_spark.indexer import Index
from voyagr_spark.search import search
from voyagr_spark.shards import (
    GlobalStats,
    sharded_count,
    sharded_search,
    split_index,
)

QUERIES = [
    "file",
    "ident0099",
    "file AND ident0099",
    "open OR merge OR segment",
    "open OR missingterm000",
    '"parse query tree"',
    "iden*",
    "-file open",
]


@pytest.fixture(scope="module")
def shard_pair(spark, built_index, tmp_path_factory):
    base = tmp_path_factory.mktemp("shards")
    dirs = [str(base / "s0"), str(base / "s1")]
    shards = split_index(built_index, dirs)
    yield shards
    for d in dirs:
        shutil.rmtree(d, ignore_errors=True)


def _rows(df):
    return [(r["doc_id"], float(r["score"]))
            for r in df.orderBy("doc_id").collect()]


def test_split_partitions_docmap(built_index, shard_pair):
    full = {r["doc_id"] for r in built_index.docmap().select("doc_id").collect()}
    parts = [
        {r["doc_id"] for r in s.docmap().select("doc_id").collect()}
        for s in shard_pair
    ]
    assert parts[0] & parts[1] == set()
    assert parts[0] | parts[1] == full
    # round-robin routing: shard s owns exactly the ids == s (mod 2)
    for s, ids in enumerate(parts):
        assert all(i % 2 == s for i in ids)


def test_split_stats_sum_to_full(built_index, shard_pair):
    assert sum(s.max_doc for s in shard_pair) == built_index.max_doc
    assert (
        sum(s.sum_total_term_freq for s in shard_pair)
        == built_index.sum_total_term_freq
    )
    terms = ["file", "ident0099", "open", "segment"]
    full = built_index.term_dfs(terms)
    view = GlobalStats(shard_pair[0], shard_pair)
    assert view.term_dfs(terms) == full
    assert view.term_ttfs(terms) == built_index.term_ttfs(terms)


@pytest.mark.parametrize("q", QUERIES)
def test_sharded_search_bit_exact(built_index, shard_pair, q):
    want = _rows(search(built_index, q, k=10))
    got = _rows(sharded_search(shard_pair, q, k=10))
    assert got == want


def test_local_stats_would_drift(built_index, shard_pair):
    """The negative control: scoring one shard with its LOCAL stats gives
    different float32 scores than the global plan (df/N halve, idf moves) —
    the drift ExactStatsCache exists to remove."""
    full = {d: s for d, s in _rows(search(built_index, "ident0099", k=10))}
    local = _rows(search(shard_pair[0], "ident0099", k=10))
    assert local  # the rare term matches on this shard
    assert any(full.get(d) != s for d, s in local)


def test_sharded_paging(built_index, shard_pair):
    first = search(built_index, "file", k=5).collect()
    last = min(
        [(float(r["score"]), int(r["doc_id"])) for r in first],
        key=lambda t: (t[0], -t[1]),
    )
    want = _rows(search(built_index, "file", k=5, after=last))
    got = _rows(sharded_search(shard_pair, "file", k=5, after=last))
    assert got == want


def test_sharded_count(built_index, shard_pair):
    from voyagr_spark.search import count

    for q in ("file", "file AND ident0099", "open OR segment"):
        assert sharded_count(shard_pair, q) == count(built_index, q)


def test_sharded_classic_similarity(built_index, shard_pair):
    want = _rows(search(built_index, "open segment", k=10,
                        similarity="classic"))
    got = _rows(sharded_search(shard_pair, "open segment", k=10,
                               similarity="classic"))
    assert got == want


def test_split_reclaims_tombstones(spark, built_index, tmp_path):
    src = tmp_path / "del_src"
    shutil.copytree(built_index.dir, src)
    idx = Index(spark, str(src))
    victims = [r["doc_id"] for r in
               idx.docmap().select("doc_id").limit(7).collect()]
    idx.delete_docs(victims)
    dirs = [str(tmp_path / "d0"), str(tmp_path / "d1")]
    shards = split_index(idx, dirs)
    ids = set()
    for s in shards:
        ids |= {r["doc_id"] for r in s.docmap().select("doc_id").collect()}
        assert s.tombstone_ref() is None
    assert ids.isdisjoint(victims)
    assert sum(s.max_doc for s in shards) == built_index.max_doc - len(victims)
    # deleted docs are gone from postings too (CheckIndex-clean shards)
    from voyagr_spark.checkindex import check_index

    for s in shards:
        assert check_index(s) == {}


def test_shard_refuses_append(spark, shard_pair, corpus_pdf):
    from voyagr_spark.streaming import append_batch

    docs = spark.createDataFrame(corpus_pdf.head(3))
    with pytest.raises(ValueError, match="split shard"):
        append_batch(shard_pair[0], docs)


def test_split_needs_two_dirs(built_index, tmp_path):
    with pytest.raises(ValueError, match="at least 2"):
        split_index(built_index, [str(tmp_path / "only")])


def test_sharded_facet_matches_single(built_index, shard_pair):
    """Distributed facet merge == the single-index DocSet facet."""
    from voyagr_spark.search import scores
    from voyagr_spark.shards import sharded_facet_field

    ids = scores(built_index, "ident0099").select("doc_id")
    dm = built_index.docmap().select("doc_id", "lang")
    want = {
        (r["lang"], r["n"])
        for r in ids.join(dm, "doc_id").groupBy("lang").count()
        .withColumnRenamed("count", "n").collect()
    }
    got = {
        (r["lang"], r["n"])
        for r in sharded_facet_field(shard_pair, "ident0099", "lang").collect()
    }
    assert got == want and got


def test_sharded_stats_matches_single(built_index, shard_pair):
    """Distributed StatsComponent merge == single-index stats: the
    component-wise (count,min,max,sum) fold over per-shard partials is
    exact over the disjoint doc partition; mean derived post-merge."""
    from voyagr_spark.search import scores
    from voyagr_spark.shards import sharded_stats_field

    ids = scores(built_index, "file").select("doc_id")
    dm = built_index.docmap().select("doc_id", "nchars")
    j = ids.join(dm, "doc_id").collect()
    vals = [r["nchars"] for r in j]
    got = sharded_stats_field(shard_pair, "file", "nchars").collect()[0]
    assert got["n"] == len(vals)
    assert got["min_v"] == min(vals)
    assert got["max_v"] == max(vals)
    assert got["sum_v"] == sum(vals)
    assert got["mean_v"] == sum(vals) / len(vals)


def test_sharded_group_top1_matches_single(built_index, shard_pair):
    """Distributed TopGroups.merge == grouping the unsplit index: per-shard
    group heads carry GLOBAL-stats float32 scores, so a group's global best
    is the best of its per-shard bests (total order, disjoint shards)."""
    from pyspark.sql import Window

    import pyspark.sql.functions as F

    from voyagr_spark.search import scores
    from voyagr_spark.shards import sharded_group_top1

    sc = scores(built_index, "file")
    dm = built_index.docmap().select("doc_id", "lang")
    w = Window.partitionBy("lang").orderBy(F.desc("score"), F.asc("doc_id"))
    want = {
        (r["lang"], r["doc_id"], float(r["score"]))
        for r in sc.join(dm, "doc_id")
        .withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("lang", "doc_id", "score")
        .collect()
    }
    got = {
        (r["lang"], r["doc_id"], float(r["score"]))
        for r in sharded_group_top1(shard_pair, "file", "lang").collect()
    }
    assert got == want and got


def test_sharded_suggest_matches_single(built_index, shard_pair):
    """Distributed spellcheck merge: summed per-shard dfs == corpus dfs, so
    the merged (dist asc, df desc, term asc) ranking equals the unsplit
    dictionary's suggest output row for row."""
    from voyagr_spark.highlight import suggest
    from voyagr_spark.shards import sharded_suggest

    want = [(r["term"], r["df"], r["dist"])
            for r in suggest(built_index, "fiel", max_edits=2, top=5).collect()]
    got = [(r["term"], r["df"], r["dist"])
           for r in sharded_suggest(shard_pair, "fiel", max_edits=2,
                                    top=5).collect()]
    assert got == want and got


def test_random_sharded_sweep_3_shards(
    spark, built_index, oracle_index, tmp_path
):
    """Randomized differential sweep at n=3: sharded scatter-gather must be
    bit-identical to the single index on every generated query form (terms,
    AND/NOT, OR fans, phrases incl. slop, prefix) — seed=29, failures
    reproduce exactly."""
    import numpy as np

    dirs = [str(tmp_path / f"t{i}") for i in range(3)]
    shards = split_index(built_index, dirs)
    rng = np.random.default_rng(29)
    terms = sorted(oracle_index.postings,
                   key=lambda t: -len(oracle_index.postings[t]))
    head = terms[:40]
    tail = [t for t in terms
            if 2 <= len(oracle_index.postings[t]) <= 5][:200] or head

    def pick(pool):
        return pool[int(rng.integers(0, len(pool)))]

    queries = []
    for _ in range(30):
        kind = int(rng.integers(0, 6))
        if kind == 0:
            queries.append(pick(head + tail))
        elif kind == 1:
            queries.append(f"{pick(head)} AND {pick(tail)}")
        elif kind == 2:
            queries.append(" OR ".join(
                pick(head + tail) for _ in range(int(rng.integers(2, 5)))))
        elif kind == 3:
            queries.append(f"{pick(head)} AND NOT {pick(head)}")
        elif kind == 4:
            a, b = pick(head), pick(head)
            queries.append(f'"{a} {b}"~{int(rng.integers(0, 4))}')
        else:
            t = pick(head)
            queries.append(t[: max(2, len(t) - 2)] + "*")
    failures = []
    for q in queries:
        want = _rows(search(built_index, q, k=10))
        got = _rows(sharded_search(shards, q, k=10))
        if got != want:
            failures.append((q, got[:3], want[:3]))
    assert not failures, failures[:5]


def test_sharded_terms_enum_equals_unsplit(spark, shard_pair, built_index):
    from pyspark.sql import functions as F

    from voyagr_spark.shards import sharded_terms_enum

    got = [(r.term, r.df) for r in sharded_terms_enum(
        shard_pair, lower="a", upper="z", mincount=2, limit=25).collect()]
    st = (built_index.term_stats()
          .filter("term >= 'a' AND term <= 'z'")
          .groupBy("term").agg(F.sum("df").alias("df"))
          .filter("df >= 2"))
    want = [(r.term, r.df) for r in st.orderBy(
        F.desc("df"), F.asc("term")).limit(25).collect()]
    assert got == want
