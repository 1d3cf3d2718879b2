"""Expressions module (lucene/expressions analog): compiler semantics,
JS double rules, rescore correctness."""

import math
import sys
from pathlib import Path

import duckdb
import numpy as np
import pytest

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

from voyagr_spark.expressions import (
    ExpressionError,
    compile_expr,
    expr_rank,
    rescore,
)


def _eval(src: str, **vars_):
    """Evaluate a compiled expression through DuckDB (the oracle renderer
    and the Spark renderer emit the same text, so one engine suffices for
    the semantics tests; Spark-side execution is covered by the gates)."""
    e = compile_expr(src)
    bindings = {k: repr(float(v)) for k, v in vars_.items()}
    return duckdb.sql(f"SELECT {e.sql(bindings)} AS v").fetchone()[0]


@pytest.mark.parametrize("src,vars_,want", [
    ("1 + 2 * 3", {}, 7.0),
    ("(1 + 2) * 3", {}, 9.0),
    ("1 / 2", {}, 0.5),                      # JS double division
    ("10 % 3", {}, 1.0),
    ("-x + 4", {"x": 1.5}, 2.5),
    ("2 > 1", {}, 1.0),                      # comparisons are 1.0/0.0
    ("(3 > 2) + (2 > 3)", {}, 1.0),
    ("x == 2 ? 10 : 20", {"x": 2}, 10.0),
    ("0 ? 10 : 20", {}, 20.0),               # ?: tests != 0
    ("2 ? 10 : 20", {}, 10.0),
    ("!0", {}, 1.0),
    ("!3", {}, 0.0),
    ("(1 && 2) + (1 && 0)", {}, 1.0),
    ("(0 || 2) + (0 || 0)", {}, 1.0),
    ("min(3, 5) + max(3, 5)", {}, 8.0),
    ("pow(2, 10)", {}, 1024.0),
    ("abs(-4) + floor(1.9) + ceil(0.1)", {}, 6.0),
])
def test_js_semantics(src, vars_, want):
    assert _eval(src, **vars_) == want


def test_math_functions():
    assert _eval("ln(x)", x=math.e) == pytest.approx(1.0)
    assert _eval("log10(1000)") == pytest.approx(3.0)
    assert _eval("log2(8)") == pytest.approx(3.0)
    assert _eval("sqrt(x)", x=9) == 3.0
    assert _eval("exp(0)") == 1.0
    assert _eval("atan2(0, 1)") == 0.0


@pytest.mark.parametrize("src,err", [
    ("foo(1)", "unknown function"),
    ("min(1)", "takes 2 args"),
    ("1 +", "unexpected token"),
    ("1 2", "trailing input"),
    ("a @ b", "bad character"),
])
def test_parse_errors(src, err):
    with pytest.raises(ExpressionError, match=err):
        compile_expr(src).sql({"a": "a", "b": "b"})


def test_unbound_variable_raises():
    e = compile_expr("_score + boost")
    with pytest.raises(ExpressionError, match="unbound"):
        e.sql({"_score": "score"})


def test_variables_in_first_use_order():
    e = compile_expr("b + a * ln(1 + c) + a")
    assert e.variables() == ["b", "a", "c"]


def test_rescore_matches_numpy(spark, built_index):
    from voyagr_spark.search import search

    first = search(built_index, "file", k=30)
    got = rescore(built_index, first, "_score / sqrt(doclen + 1)", k=10)
    rows = got.collect()

    fp = {r["doc_id"]: r["score"] for r in first.collect()}
    dl = {
        r["doc_id"]: r["doclen"]
        for r in built_index.docstats().select("doc_id", "doclen").collect()
        if r["doc_id"] in fp
    }
    want = sorted(
        ((d, s, s / math.sqrt(dl[d] + 1.0)) for d, s in fp.items()),
        key=lambda t: (-t[2], t[0]),
    )[:10]
    assert [(r["doc_id"], r["score"]) for r in rows] == [
        (d, s) for d, s, _ in want
    ]
    np.testing.assert_allclose(
        [r["expr_score"] for r in rows], [e for _, _, e in want], rtol=1e-12
    )


def test_rescore_score_only_expression_needs_no_join(spark, built_index):
    from voyagr_spark.search import search

    first = search(built_index, "file", k=20)
    got = rescore(built_index, first, "-_score", k=5).collect()
    fp = sorted(
        ((r["doc_id"], r["score"]) for r in first.collect()),
        key=lambda t: (t[1], t[0]),  # -score DESC == score ASC
    )[:5]
    assert [(r["doc_id"], r["score"]) for r in got] == fp


def test_expr_rank_reduces_to_score_rank(spark):
    """expr '_score' must reproduce plain BM25 ranking."""
    from voyagr_spark.relational import bm25_term

    sf = "/root/testdata/sf0.001"
    top = expr_rank(spark, sf, "batch", "_score", 10).collect()
    plain = sorted(
        ((r["doc_id"], r["score4"]) for r in bm25_term(spark, sf, "batch").collect()),
        key=lambda t: (-t[1], t[0]),
    )[:10]
    assert [(r["doc_id"], r["expr4"]) for r in top] == plain
