"""JSON Facet API (solr/core search/facet FacetModule).

Oracle: pandas groupbys with the reference defaults (limit 10, mincount 1,
count desc + value-asc tie-break, avg = double sum/count)."""

import sys
from pathlib import Path

import pandas as pd
import pytest

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

from voyagr_spark.jsonfacet import json_facet, json_facet_flat

ROWS = [
    # (lang, source, n)
    ("en", "a", 10), ("en", "a", 20), ("en", "b", 30), ("en", "b", 40),
    ("en", "c", 50),
    ("de", "a", 60), ("de", "b", 70), ("de", "b", 80),
    ("fr", "c", 90), ("fr", "c", 100), ("fr", "a", 110),
    ("es", "a", 120),
]


@pytest.fixture(scope="module")
def domain(spark):
    return spark.createDataFrame(ROWS, "lang string, source string, n long")


def test_flat_two_levels(domain):
    spec = {"langs": {"type": "terms", "field": "lang", "limit": 3,
                      "facet": {"avg_n": "avg(n)",
                                "srcs": {"type": "terms", "field": "source",
                                         "limit": 2}}}}
    rows = {(r.lang, r.source): (r.langs_count, r.avg_n, r.srcs_count)
            for r in json_facet_flat(domain, spec).collect()}
    # top-3 langs by count desc, val asc tie-break: en(5), de(3), fr(3)
    # -> de before fr on the value tie-break;  es(1) cut by limit
    langs = {k[0] for k in rows}
    assert langs == {"en", "de", "fr"}
    # en: top-2 sources by count desc, val asc: a(2) and b(2)
    assert rows[("en", "a")] == (5, 30.0, 2)
    assert rows[("en", "b")][2] == 2
    assert ("en", "c") not in rows
    # fr: c(2), a(1)
    assert rows[("fr", "c")] == (3, 100.0, 2)
    assert rows[("fr", "a")][2] == 1


def test_nested_response(domain):
    spec = {"tot_n": "sum(n)",
            "langs": {"type": "terms", "field": "lang", "limit": 2,
                      "facet": {"avg_n": "avg(n)", "u_src": "unique(source)",
                                "srcs": {"type": "terms", "field": "source",
                                         "limit": 1}}}}
    resp = json_facet(domain, spec)
    assert resp["count"] == 12 and resp["tot_n"] == sum(n for *_, n in ROWS)
    buckets = resp["langs"]["buckets"]
    assert [b["val"] for b in buckets] == ["en", "de"]  # count desc, val asc
    en = buckets[0]
    assert en["count"] == 5 and en["avg_n"] == 30.0 and en["u_src"] == 3
    assert en["srcs"]["buckets"] == [{"val": "a", "count": 2}]
    de = buckets[1]
    assert de["srcs"]["buckets"] == [{"val": "b", "count": 2}]


def test_sort_by_metric_and_mincount(domain):
    spec = {"langs": {"type": "terms", "field": "lang", "limit": 2,
                      "sort": "avg_n desc", "mincount": 2,
                      "facet": {"avg_n": "avg(n)"}}}
    resp = json_facet(domain, spec)
    # es (avg 120) is cut by mincount=2; fr avg=100, de avg=70
    assert [b["val"] for b in resp["langs"]["buckets"]] == ["fr", "de"]


def test_sibling_facets(domain):
    spec = {"langs": {"type": "terms", "field": "lang", "limit": 1},
            "srcs": {"type": "terms", "field": "source", "limit": 1}}
    resp = json_facet(domain, spec)
    assert resp["langs"]["buckets"][0]["val"] == "en"
    assert resp["srcs"]["buckets"][0]["val"] == "a"  # a=5,b=4,c=3


def test_contract_errors(domain):
    with pytest.raises(ValueError, match="metric"):
        json_facet(domain, {"x": "median(n)"})
    with pytest.raises(ValueError, match="facet type"):
        json_facet(domain, {"r": {"type": "range", "field": "n"}})
    with pytest.raises(ValueError, match="ONE terms facet"):
        json_facet_flat(domain, {
            "a": {"type": "terms", "field": "lang"},
            "b": {"type": "terms", "field": "source"}})
    with pytest.raises(ValueError, match="no terms facet"):
        json_facet_flat(domain, {"x": "sum(n)"})