"""DataImportHandler analog (solr/contrib/dataimporthandler)."""

import sys
from pathlib import Path

import pytest

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

from voyagr_spark.dih import Entity, Field, delta_import, full_import

SF_DIR = "/root/testdata/sf0.001"

ORDER_ENTITY = Entity(
    name="order_docs",
    table="orders",
    pk="o_orderkey",
    delta_column="o_orderdate",
    fields=(
        Field(name="id", column="o_orderkey"),
        Field(name="content",
              template="order ${order_docs.o_orderpriority} "
                       "status ${order_docs.o_orderstatus}"),
        Field(name="urgency", column="o_orderpriority",
              regex=r"^(\d+)-", group=1, cast="int"),
        Field(name="placed", column="o_orderdate", date_fmt="yyyy-MM-dd"),
        Field(name="total_cents", column="o_totalprice", cast="bigint"),
    ),
)


def test_full_import_mapping(spark):
    out = full_import(spark, SF_DIR, ORDER_ENTITY)
    assert out.columns == ["id", "content", "urgency", "placed",
                           "total_cents"]
    rows = {r.id: r for r in out.collect()}
    src = {r.o_orderkey: r for r in
           spark.read.parquet(f"{SF_DIR}/orders.parquet").collect()}
    assert set(rows) == set(src)
    for k, s in src.items():
        r = rows[k]
        assert r.content == (
            f"order {s.o_orderpriority} status {s.o_orderstatus}")
        assert r.urgency == int(s.o_orderpriority.split("-")[0])
        assert r.placed == s.o_orderdate.strftime("%Y-%m-%d")
        assert r.total_cents == int(s.o_totalprice)


def test_delta_import_filters_by_stamp(spark):
    from datetime import datetime

    last = "1997-06-01"
    out = delta_import(spark, SF_DIR, ORDER_ENTITY, last).collect()
    src = spark.read.parquet(f"{SF_DIR}/orders.parquet").collect()
    expect = {r.o_orderkey for r in src
              if r.o_orderdate > datetime(1997, 6, 1)}
    assert {r.id for r in out} == expect
    assert 0 < len(out) < len(src)


def test_delta_requires_stamp_column(spark):
    ent = Entity(name="e", table="orders",
                 fields=(Field(name="id", column="o_orderkey"),))
    with pytest.raises(ValueError, match="deltaQuery"):
        delta_import(spark, SF_DIR, ent, "1997-01-01")


def test_entity_validation():
    with pytest.raises(ValueError, match="maps no fields"):
        Entity(name="e", table="orders")
    with pytest.raises(ValueError, match="twice"):
        Entity(name="e", table="orders",
               fields=(Field(name="x", column="o_orderkey"),
                       Field(name="x", column="o_custkey")))
    with pytest.raises(ValueError, match="source column"):
        Field(name="x").expr()


def test_regex_replace_and_where(spark):
    ent = Entity(
        name="e", table="orders", where="o_orderstatus = 'P'",
        fields=(
            Field(name="id", column="o_orderkey"),
            Field(name="pri", column="o_orderpriority",
                  regex=r"\d+-", replace_with=""),
        ),
    )
    rows = full_import(spark, SF_DIR, ent).collect()
    assert rows and all("-" not in r.pri for r in rows)
    src = spark.read.parquet(f"{SF_DIR}/orders.parquet")
    assert len(rows) == src.filter("o_orderstatus = 'P'").count()


def test_import_feeds_index_build(spark, tmp_path):
    """The DIH output is a legal build_index input (the DIHWriter step)."""
    from voyagr_spark.indexer import build_index
    from voyagr_spark.search import search

    ent = Entity(
        name="e", table="orders", where="o_orderkey < 50",
        fields=(
            Field(name="repo", template="orders"),
            Field(name="path", column="o_orderkey", cast="string"),
            Field(name="commit", template="c0"),
            Field(name="lang", template="en"),
            Field(name="content",
                  template="priority ${e.o_orderpriority} "
                           "status ${e.o_orderstatus}"),
        ),
    )
    docs = full_import(spark, SF_DIR, ent)
    idx = build_index(spark, docs, str(tmp_path / "dihx"), num_segments=1)
    hits = search(idx, "status", k=60).collect()
    assert len(hits) == docs.count()
