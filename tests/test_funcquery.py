"""Solr function-query syntax (FunctionQParser / ValueSourceParser) —
parse goldens, SQL-render parity shapes, and the func_rank runner."""

import sys
from pathlib import Path

import pytest

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

from voyagr_spark.expressions import ExpressionError
from voyagr_spark.funcquery import _scale_sql, parse_func

SF_DIR = "/root/testdata/sf0.001"


def _val(func: str, **binds):
    """Evaluate a parsed function via DuckDB over scalar bindings."""
    import duckdb

    fq = parse_func(func)
    sql = fq.expr.sql({k: str(v) for k, v in binds.items()})
    return duckdb.sql(f"SELECT {sql} AS v").fetchone()[0]


# ValueSourceParser semantics goldens
@pytest.mark.parametrize("func,binds,expect", [
    ("sum(1,2,3)", {}, 6.0),                       # n-ary left fold
    ("sub(5,2)", {}, 3.0),
    ("product(2,3,4)", {}, 24.0),
    ("div(1,2)", {}, 0.5),                         # double division
    ("pow(2,10)", {}, 1024.0),
    ("abs(sub(2,5))", {}, 3.0),
    ("log(100)", {}, 2.0),                         # Solr log = base 10
    ("ln(1)", {}, 0.0),
    ("sqrt(16)", {}, 4.0),
    ("min(3,1,2)", {}, 1.0),
    ("max(3,1,2)", {}, 3.0),
    ("recip(50,1,100,100)", {}, 100.0 / 150.0),    # a/(m*x+b)
    ("linear(5,2,1)", {}, 11.0),                   # m*x+c
    ("map(5,0,10,1)", {}, 1.0),                    # in range -> target
    ("map(15,0,10,1)", {}, 15.0),                  # out of range -> x
    ("map(15,0,10,1,0)", {}, 0.0),                 # 5-arg default
    ("if(1,10,20)", {}, 10.0),
    ("if(0,10,20)", {}, 20.0),
    ("not(0)", {}, 1.0),
    ("and(1,0)", {}, 0.0),
    ("or(1,0)", {}, 1.0),
    ("sum(x,1)", {"x": 41}, 42.0),                 # bare field reference
])
def test_function_goldens(func, binds, expect):
    assert _val(func, **binds) == pytest.approx(expect, abs=1e-12)


def test_termfreq_docfreq_become_bound_vars():
    fq = parse_func("sum(termfreq(content,'dup'), docfreq(content,batch))")
    assert fq.tf_refs == ["termfreq(content,dup)"]
    assert fq.df_refs == ["docfreq(content,batch)"]
    assert fq.field_vars() == []


def test_scale_extraction_and_sql():
    fq = parse_func("sum(scale(tf,0,1), 1)")
    assert fq.scale is not None
    inner, lo, hi = fq.scale
    assert (lo, hi) == (0.0, 1.0)
    assert inner.sql({"tf": "tf"}) == "(tf)"
    # ScaleFloatFunction: (x-mn)*(hi-lo)/(mx-mn)+lo
    s = _scale_sql("(tf)", 0.0, 1.0, 2.0, 6.0)
    assert "0.25" in s  # factor (1-0)/(6-2)
    # degenerate source maps everything to lo
    assert _scale_sql("(tf)", 0.5, 1.0, 3.0, 3.0) == "CAST(0.5 AS DOUBLE)"


@pytest.mark.parametrize("bad", [
    "nope(1)",
    "sum(1)",
    "recip(1,2,3)",
    "map(1,2,3)",
    "scale(tf,doclen,1)",        # targets must be constants
    "sum(scale(a,0,1), scale(b,0,1))",  # one scale per function
    "recip(1,2,3,4) extra",
    "'bare string'",
    "sum(1,)",
])
def test_malformed_raises(bad):
    with pytest.raises(ExpressionError):
        parse_func(bad)


def test_func_rank_runner(spark):
    """termfreq/docfreq joins + scale two-pass against a hand recompute."""
    from voyagr_spark.funcquery import func_rank
    from voyagr_spark.relational import _scored

    func = ("sum(product(2,termfreq(content,'dup')), "
            "recip(doclen,1,100,100), scale(tf,0,1))")
    got = func_rank(spark, SF_DIR, "batch", func, 10).collect()
    assert len(got) == 10

    import pandas as pd

    base = _scored(spark, SF_DIR).toPandas()
    m = base[base.term == "batch"].set_index("doc_id")
    tfd = base[base.term == "dup"].set_index("doc_id").tf
    mn, mx = float(m.tf.min()), float(m.tf.max())
    vals = (
        2.0 * tfd.reindex(m.index).fillna(0)
        + 100.0 / (1.0 * m.doclen + 100.0)
        + (m.tf - mn) * ((1.0 - 0.0) / (mx - mn))
    ).round(4)
    want = sorted(
        ((v, i) for i, v in vals.items()),
        key=lambda p: (-p[0], p[1]),
    )[:10]
    assert [(r.func4, r.doc_id) for r in got] == [
        (pytest.approx(v, abs=1e-9), i) for v, i in want
    ]


def test_docfreq_constant(spark):
    from voyagr_spark.funcquery import func_rank

    got = func_rank(spark, SF_DIR, "dup",
                    "docfreq(content,'nosuchterm')", 3).collect()
    assert all(r.func4 == 0.0 for r in got)
    got = func_rank(spark, SF_DIR, "dup",
                    "if(docfreq(content,'dup'),1,0)", 3).collect()
    assert all(r.func4 == 1.0 for r in got)


# ---------------------------------------------------------------------------
# CustomScoreQuery (lucene/queries CustomScoreQuery.java)
# ---------------------------------------------------------------------------


def test_custom_score_sql_chain():
    from voyagr_spark.funcquery import custom_score_sql

    one = custom_score_sql(["recip(doclen,1,1000,1000)"], {"doclen": "dl"})
    assert one.startswith("CAST((CAST(score AS FLOAT)) * CAST(")
    assert one.count("AS FLOAT)") >= 3
    two = custom_score_sql(["abs(doclen)", "sqrt(doclen)"], {"doclen": "dl"})
    assert two.count("* CAST(") == 2  # one multiply per value source


def test_custom_score_sql_rejects_tf_scale():
    from voyagr_spark.funcquery import custom_score_sql

    for bad in ["termfreq(text,'x')", "docfreq(text,'x')",
                "scale(doclen,0,1)"]:
        with pytest.raises(ExpressionError, match="custom_score"):
            custom_score_sql([bad], {})


def test_custom_score_engine(built_index):
    """score == fl(fl(sub * fl(v1)) * fl(v2)) against the plain scorer."""
    import numpy as np

    from voyagr_spark.funcquery import custom_score
    from voyagr_spark.search import scores

    funcs = ["recip(doclen,1,100,100)", "linear(nchars,0.001,1)"]
    got = {r["doc_id"]: np.float32(r["score"])
           for r in custom_score(built_index, "file", funcs, k=10**6).collect()}
    sub = {r["doc_id"]: np.float32(r["score"])
           for r in scores(built_index, "file").collect()}
    dm = {r["doc_id"]: (r["doclen"], r["nchars"])
          for r in built_index.docmap().select(
              "doc_id", "doclen", "nchars").collect()}
    assert set(got) == set(sub)
    for d, s in sub.items():
        dl, nc = dm[d]
        v1 = np.float32(100.0 / (1.0 * dl + 100.0))
        v2 = np.float32(0.001 * nc + 1.0)
        want = np.float32(np.float32(s * v1) * v2)
        assert got[d] == want, (d, got[d], want)


def test_custom_score_identity_without_funcs(built_index):
    import numpy as np

    from voyagr_spark.funcquery import custom_score
    from voyagr_spark.search import search

    got = custom_score(built_index, "file", [], k=10).collect()
    want = search(built_index, "file", k=10).collect()
    assert [(r["doc_id"], np.float32(r["score"])) for r in got] == \
        [(r["doc_id"], np.float32(r["score"])) for r in want]
