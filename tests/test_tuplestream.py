"""TupleStream family (solr/solrj/src/java/org/apache/solr/client/solrj/io):
CloudSolrStream / Unique / Rank / Merge / Reducer / ParallelStream as
contract-validated DataFrame combinators."""

import pytest
from pyspark.sql import functions as F

from voyagr_spark import tuplestream as ts


@pytest.fixture(scope="module")
def stream(built_index):
    return ts.search_stream(
        built_index, "open", sort=[("lang", True), ("doc_id", True)],
        fl=["doc_id", "lang", "doclen"],
    )


@pytest.fixture(scope="module")
def match_pdf(stream):
    return stream.df.toPandas()


def test_to_df_contract_order(stream):
    rows = [(r["lang"], r["doc_id"]) for r in stream.to_df().collect()]
    assert rows == sorted(rows)


def test_search_stream_requires_doc_id(built_index):
    with pytest.raises(ValueError, match="doc_id"):
        ts.search_stream(built_index, "open", sort=[("lang", True)],
                         fl=["lang"])


def test_unique_first_per_run(stream, match_pdf):
    got = sorted(
        (r["lang"], r["doc_id"])
        for r in ts.unique(stream, ["lang"]).to_df().collect()
    )
    want = sorted(
        (lang, int(g["doc_id"].min()))
        for lang, g in match_pdf.groupby("lang")
    )
    assert got == want


def test_unique_contract_violation_raises(built_index):
    s = ts.search_stream(built_index, "open",
                         sort=[("doc_id", True)], fl=["doc_id", "lang"])
    with pytest.raises(ValueError, match="sorted by"):
        ts.unique(s, ["lang"])


def test_rank_topn(stream, match_pdf):
    ranked = ts.rank(stream, 5, comp=[("doclen", False)])
    got = [(r["doc_id"], r["doclen"]) for r in ranked.to_df().collect()]
    want = (
        match_pdf.sort_values(["doclen", "doc_id"],
                              ascending=[False, True])
        .head(5)[["doc_id", "doclen"]]
        .to_records(index=False)
        .tolist()
    )
    assert got == [tuple(map(int, w)) for w in want]


def test_rank_plan_is_take_ordered(stream):
    plan = ts.rank(stream, 5, comp=[("doclen", False)]).to_df()
    s = plan._sc._jvm.PythonSQLUtils.explainString(
        plan._jdf.queryExecution(), "formatted"
    )
    assert "TakeOrderedAndProject" in s


def test_merge_keeps_duplicates(built_index):
    a = ts.search_stream(built_index, "open",
                         sort=[("doc_id", True)], fl=["doc_id"])
    b = ts.search_stream(built_index, "file",
                         sort=[("doc_id", True)], fl=["doc_id"])
    m = ts.merge(a, b)
    na, nb = a.df.count(), b.df.count()
    assert m.df.count() == na + nb  # union of streams, not set union
    ids = [r["doc_id"] for r in m.to_df().collect()]
    assert ids == sorted(ids)


def test_merge_sort_mismatch_raises(built_index):
    a = ts.search_stream(built_index, "open",
                         sort=[("doc_id", True)], fl=["doc_id"])
    b = ts.search_stream(built_index, "file",
                         sort=[("doc_id", False)], fl=["doc_id"])
    with pytest.raises(ValueError, match="identically-sorted"):
        ts.merge(a, b)


def test_reducer_group_head_and_members(stream, match_pdf):
    red = ts.reducer(stream, ["lang"]).to_df().collect()
    by_lang = {r["lang"]: r for r in red}
    for lang, g in match_pdf.groupby("lang"):
        r = by_lang[lang]
        assert r["group_size"] == len(g)
        assert r["doc_id"] == int(g["doc_id"].min())  # group head
        member_ids = [m["doc_id"] for m in r["group"]]
        assert member_ids == sorted(g["doc_id"].tolist())  # stream order


def test_parallel_is_one_exchange_and_same_result(spark, stream, match_pdf):
    """ParallelStream == a declared hash shuffle: unique over the
    parallelized stream reuses the repartition (exactly one Exchange on
    the partition keys) and returns the same tuples."""
    base = spark.createDataFrame(match_pdf)
    s = ts.TStream(base, (("lang", True), ("doc_id", True)))
    par = ts.parallel(s, 3, ["lang"])
    uniq = ts.unique(par, ["lang"]).to_df()
    plan = uniq._sc._jvm.PythonSQLUtils.explainString(
        uniq._jdf.queryExecution(), "formatted"
    )
    # the repartition's exchange is the ONLY hash exchange: the window's
    # clustering requirement is satisfied by it (no second shuffle; the
    # remaining exchange is to_df's presentation sort, a rangepartitioning)
    assert plan.count("hashpartitioning") == 1
    got = sorted((r["lang"], r["doc_id"]) for r in uniq.collect())
    want = sorted(
        (lang, int(g["doc_id"].min()))
        for lang, g in match_pdf.groupby("lang")
    )
    assert got == want


def test_parallel_validates(stream):
    with pytest.raises(ValueError, match="workers"):
        ts.parallel(stream, 0, ["lang"])
    with pytest.raises(ValueError, match="partition keys"):
        ts.parallel(stream, 2, ["nope"])
