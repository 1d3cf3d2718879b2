"""Solr function-query syntax (FunctionQParser / ValueSourceParser).

The reference registers a table of named value sources
(solr/core/src/java/org/apache/solr/search/ValueSourceParser.java:85-400;
grammar in FunctionQParser.parseValueSource) — ``sum``, ``product``,
``div``, ``recip``, ``linear``, ``map``, ``scale``, ``termfreq``,
``docfreq`` etc. over field values and constants.  This module parses
that syntax into the SAME AST the ranking-expression compiler renders
(expressions.py), so a Solr function runs exactly like a JS expression:
ONE SQL scalar evaluated JVM-side by ``F.expr`` (whole-stage codegen, no
Python), and the identical text evaluated by the DuckDB oracle — parity
by construction.

Function table (ValueSourceParser standard registrations):

* arithmetic: ``sum``/``sub``/``product``/``div``/``pow``/``abs``/
  ``sqrt``/``exp``/``ln``; ``log`` is base 10 (Solr's Log10 semantics);
  ``min``/``max`` fold n-ary to nested least/greatest.
* ``recip(x,m,a,b)`` = a/(m*x+b) (ReciprocalFloatFunction.java:41).
* ``linear(x,m,c)`` = m*x+c (LinearFloatFunction.java:36).
* ``map(x,min,max,target[,default])`` (RangeMapFloatFunction.java:45):
  target when min<=x<=max, else x (or the 5th-arg default).
* ``if(test,a,b)`` / ``not``/``and``/``or`` — boolean = "!= 0".
* ``termfreq(field,'t')`` / ``docfreq(field,'t')``
  (TFValueSource/DocFreqValueSource) — resolved by the runner as a tf
  join (absent -> 0) / a constant from the stats table.
* ``scale(x,minTarget,maxTarget)`` (ScaleFloatFunction.java:39-90) —
  two-pass: min/max of x first, then the linear rescale.  DIVERGENCE
  (documented): the reference computes min/max over EVERY document in
  the index (ScaleFloatFunction.createWeight full scan); this runner
  scales over the query's candidate set — at the target scale a
  per-query full-index scan is the wrong plan, and within the candidate
  set the semantics are otherwise identical.

Bare identifiers are field references (SimpleBindings-style validation
happens at render time); bare numbers are constants.
"""

from __future__ import annotations

import re

from .expressions import Expression, ExpressionError

# n-ary -> nested binary folds
_VARIADIC = {"sum": "+", "product": "*"}
_BINARY = {"sub": "-", "div": "/"}
# direct passthrough to the shared FUNCTIONS table (expressions.py)
_DIRECT = {"abs": "abs", "sqrt": "sqrt", "exp": "exp", "ln": "ln",
           "log": "log10", "pow": "pow"}

_TOKEN = re.compile(
    r"\s*(?:(?P<num>-?(?:\d+\.\d*|\.\d+|\d+))"
    r"|(?P<ident>[A-Za-z_][A-Za-z0-9_.]*)"
    r"|(?P<str>'[^']*'|\"[^\"]*\")"
    r"|(?P<op>[(),]))"
)


def _lex(src: str) -> list[tuple[str, str]]:
    out, i = [], 0
    while i < len(src):
        m = _TOKEN.match(src, i)
        if m is None:
            raise ExpressionError(f"bad function syntax at: {src[i:]!r}")
        i = m.end()
        for kind in ("num", "ident", "str", "op"):
            v = m.group(kind)
            if v is not None:
                out.append((kind, v))
                break
    return out


class _FuncParser:
    def __init__(self, tokens):
        self.toks = tokens
        self.i = 0

    def peek(self):
        return self.toks[self.i] if self.i < len(self.toks) else ("eof", "")

    def take(self, val=None):
        kind, v = self.peek()
        if kind == "eof" or (val is not None and v != val):
            raise ExpressionError(f"expected {val or 'more input'}, got {v!r}")
        self.i += 1
        return kind, v

    def parse(self):
        node = self.value()
        if self.peek()[0] != "eof":
            raise ExpressionError(f"trailing input: {self.peek()[1]!r}")
        return node

    def args(self) -> list:
        self.take("(")
        out = [self.value()]
        while self.peek() == ("op", ","):
            self.take(",")
            out.append(self.value())
        self.take(")")
        return out

    def _string_arg(self) -> str:
        kind, v = self.take()
        if kind == "str":
            return v[1:-1]
        if kind in ("ident", "num"):
            return v
        raise ExpressionError(f"expected a term, got {v!r}")

    def value(self):
        kind, v = self.peek()
        if kind == "num":
            self.take()
            return ("num", v)
        if kind == "str":
            raise ExpressionError(f"unexpected string literal {v!r}")
        if kind != "ident":
            raise ExpressionError(f"unexpected {v!r}")
        self.take()
        if self.peek() != ("op", "("):
            return ("var", v)  # bare field reference
        name = v
        if name in ("termfreq", "docfreq"):
            self.take("(")
            field = self._string_arg()
            self.take(",")
            term = self._string_arg()
            self.take(")")
            # resolved by the runner: a synthetic bound variable
            return ("var", f"{name}({field},{term})")
        a = self.args()
        return self._build(name, a)

    def _build(self, name: str, a: list):
        def need(n):
            if len(a) != n:
                raise ExpressionError(f"{name} takes {n} args, got {len(a)}")

        if name in _VARIADIC:
            if len(a) < 2:
                raise ExpressionError(f"{name} takes >=2 args")
            node = a[0]
            for x in a[1:]:
                node = ("bin", _VARIADIC[name], node, x)
            return node
        if name in _BINARY:
            need(2)
            return ("bin", _BINARY[name], a[0], a[1])
        if name in _DIRECT:
            need(2 if name == "pow" else 1)
            return ("call", _DIRECT[name] if name != "log" else "log10", a)
        if name in ("min", "max"):
            if len(a) < 2:
                raise ExpressionError(f"{name} takes >=2 args")
            node = a[0]
            for x in a[1:]:
                node = ("call", name, [node, x])
            return node
        if name == "recip":
            need(4)  # a/(m*x+b), ReciprocalFloatFunction.java:41
            x, m, aa, b = a
            return ("bin", "/", aa, ("bin", "+", ("bin", "*", m, x), b))
        if name == "linear":
            need(3)  # m*x+c, LinearFloatFunction.java:36
            x, m, c = a
            return ("bin", "+", ("bin", "*", m, x), c)
        if name == "map":
            if len(a) not in (4, 5):
                raise ExpressionError("map takes 4 or 5 args")
            x, lo, hi, target = a[:4]
            default = a[4] if len(a) == 5 else x
            in_range = ("bool", "&&", ("cmp", ">=", x, lo),
                        ("cmp", "<=", x, hi))
            return ("if", in_range, target, default)
        if name == "if":
            need(3)
            return ("if", a[0], a[1], a[2])
        if name == "not":
            need(1)
            return ("not", a[0])
        if name in ("and", "or"):
            need(2)
            return ("bool", "&&" if name == "and" else "||", a[0], a[1])
        if name == "scale":
            need(3)
            for c in a[1:]:
                if c[0] != "num":
                    raise ExpressionError("scale targets must be constants")
            return ("scale", a[0], float(a[1][1]), float(a[2][1]))
        raise ExpressionError(f"unknown function '{name}' "
                              "(ValueSourceParser has no such parser)")


class FuncQuery:
    """A parsed Solr function.  ``.expr`` is an expressions.Expression
    over the same AST (scale nodes replaced lazily — see ``bind_scale``);
    ``.tf_refs``/``.df_refs`` list the termfreq/docfreq terms the runner
    must bind; ``.scale`` is the (inner Expression, lo, hi) triple when a
    top-level or nested scale is present (at most one supported)."""

    def __init__(self, source: str):
        self.source = source
        ast = _FuncParser(_lex(source)).parse()
        self.scale: tuple[Expression, float, float] | None = None
        ast = self._extract_scale(ast)
        self.expr = Expression(source, _ast=ast)
        self.tf_refs = [v for v in self.expr.variables()
                        if v.startswith("termfreq(")]
        self.df_refs = [v for v in self.expr.variables()
                        if v.startswith("docfreq(")]

    def _extract_scale(self, node):
        if not isinstance(node, tuple):
            return node
        if node[0] == "scale":
            if self.scale is not None:
                raise ExpressionError("only one scale() per function")
            inner = self._extract_scale(node[1])
            self.scale = (Expression("<scale-inner>", _ast=inner),
                          node[2], node[3])
            return ("var", "__scaled__")
        if node[0] == "call":
            return (node[0], node[1],
                    [self._extract_scale(a) for a in node[2]])
        return tuple(
            self._extract_scale(c) if isinstance(c, tuple) else c
            for c in node
        )

    def field_vars(self) -> list[str]:
        skip = {"__scaled__"}
        out = [v for v in self.expr.variables()
               if v not in skip and not v.startswith(("termfreq(",
                                                      "docfreq("))]
        if self.scale is not None:
            out += [v for v in self.scale[0].variables() if v not in out]
        return [v for v in dict.fromkeys(out)
                if not v.startswith(("termfreq(", "docfreq("))]


def parse_func(source: str) -> FuncQuery:
    return FuncQuery(source)


def _scale_sql(inner_sql: str, lo: float, hi: float,
               mn: float, mx: float) -> str:
    """ScaleFloatFunction.java:75-90: (x-min)*(hi-lo)/(max-min)+lo; a
    degenerate (max == min) source maps every value to lo."""
    if mx == mn:
        return f"CAST({lo} AS DOUBLE)"
    return (f"((({inner_sql}) - CAST({mn} AS DOUBLE)) * "
            f"CAST({(hi - lo) / (mx - mn)} AS DOUBLE) + "
            f"CAST({lo} AS DOUBLE))")


def custom_score_sql(funcs: list[str], bindings: dict[str, str],
                     sub_col: str = "score") -> str:
    """Render the CustomScoreQuery default score chain as ONE SQL scalar:
    fl(...fl(fl(sub * fl(v1)) * fl(v2))...) — subQueryScore times each
    FunctionQuery value, every multiply rounded to float32
    (CustomScoreProvider.java:75-111 default customScore: the product
    fold over valSrcScores; CustomScorer.java:294-308 applies them as
    float multiplies).  Each value source is computed in double and cast
    once to float (FunctionValues.floatVal).  The SAME text runs on the
    Spark side (F.expr) and in the DuckDB oracle — parity by
    construction, the expressions.py discipline."""
    expr = f"CAST({sub_col} AS FLOAT)"
    for src in funcs:
        fq = parse_func(src)
        if fq.tf_refs or fq.df_refs or fq.scale is not None:
            raise ExpressionError(
                "custom_score value sources cover field/constant functions;"
                " termfreq/docfreq/scale ride func_rank's relational flow")
        vsql = fq.expr.sql(bindings)
        expr = f"CAST(({expr}) * CAST(({vsql}) AS FLOAT) AS FLOAT)"
    return expr


def custom_score(index, qtext: str, funcs: list[str], k: int = 10):
    """CustomScoreQuery (lucene/queries/src/java/org/apache/lucene/queries/
    CustomScoreQuery.java): wrap a scoring subquery and multiply its score
    by one or more FunctionQuery values — the default
    ``ModifiedScore = subQueryScore * prod(valSrcScores)`` provider
    (CustomScoreProvider.java:100-111).

    Spark shape: the subquery's full match set (search.scores — the same
    scorers as search, float32 contract) joins the docmap ONCE, the whole
    product chain evaluates as one JVM-side F.expr scalar (whole-stage
    codegen, zero Python), and the k-cut is orderBy().limit — Catalyst's
    TakeOrderedAndProject per-partition top-k + driver merge.  Value
    sources may reference any numeric docmap field; termfreq/docfreq
    value sources are served by the relational func_rank flow."""
    from pyspark.sql import functions as F

    from .search import scores

    sub = scores(index, qtext)
    fields: list[str] = []
    for src in funcs:
        for v in parse_func(src).field_vars():
            if v not in fields:
                fields.append(v)
    joined = sub.join(index.docmap().select("doc_id", *fields), "doc_id") \
        if fields else sub
    expr = custom_score_sql(funcs, {v: v for v in fields})
    return (
        joined.select("doc_id", F.expr(expr).alias("score"))
        .orderBy(F.desc("score"), F.asc("doc_id")).limit(k)
    )


def func_rank(spark, sf_dir: str, term: str, func: str, k: int):
    """Relational twin of sort-by-function (Solr ``sort=func() desc``):
    rank one term's matches by a Solr function over doc stats
    (``doclen``/``tf``/``df``/``_score``/documents columns) plus
    termfreq/docfreq value sources.  All evaluation is JVM-side; the
    top-k rides the shared per-partition top-k + k-row merge."""
    from pyspark.sql import functions as F

    from .relational import _ranked, _scored, distributed_topk, documents

    fq = parse_func(func)
    base = _scored(spark, sf_dir).filter(F.col("term") == term)
    builtin = {"_score": "score", "doclen": "doclen", "tf": "tf", "df": "df"}
    extra = [v for v in fq.field_vars() if v not in builtin]
    if extra:
        base = base.join(documents(spark, sf_dir).select("doc_id", *extra),
                         "doc_id")
    bindings = {**builtin, **{v: v for v in extra}}

    # termfreq(field,t): per-doc tf of t, 0 when absent (TFValueSource)
    full = _scored(spark, sf_dir)
    for i, ref in enumerate(fq.tf_refs):
        t = ref.split(",", 1)[1][:-1]
        col = f"__tf{i}"
        side = (full.filter(F.col("term") == t)
                .select("doc_id", F.col("tf").alias(col)))
        base = base.join(side, "doc_id", "left").fillna({col: 0})
        bindings[ref] = col
    # docfreq(field,t): one constant per query (DocFreqValueSource)
    for i, ref in enumerate(fq.df_refs):
        t = ref.split(",", 1)[1][:-1]
        col = f"__df{i}"
        side = (full.filter(F.col("term") == t)
                .groupBy().agg(F.max("df").alias(col)))
        base = base.crossJoin(F.broadcast(side)).fillna({col: 0})
        bindings[ref] = col

    if fq.scale is not None:
        inner, lo, hi = fq.scale
        inner_sql = inner.sql(bindings)
        row = base.agg(
            F.min(F.expr(inner_sql)).alias("mn"),
            F.max(F.expr(inner_sql)).alias("mx"),
        ).collect()[0]
        bindings["__scaled__"] = _scale_sql(
            inner_sql, lo, hi, float(row.mn), float(row.mx))

    df = base.withColumn("func4", F.round(F.expr(fq.expr.sql(bindings)), 4))
    by = [("func4", False), ("doc_id", True)]
    top = distributed_topk(df.select("doc_id", "func4"), k, by)
    return _ranked(top, by, ["doc_id", "func4"])
