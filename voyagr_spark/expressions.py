"""Ranking expressions, Spark-first (reference module `lucene/expressions`).

Reference semantics re-expressed:

* `expressions/js/JavascriptCompiler.java:88-120` — compiles a
  JavaScript-like arithmetic expression (`_score`, field variables,
  `+ - * / %`, comparisons, `?:`, `&& || !`, math functions) into a
  double-valued program; **everything is a double** — comparisons yield
  1.0/0.0 and a ternary/boolean condition is "!= 0"
  (`JavascriptParser.jj` COND/BOOL productions).
* `expressions/SimpleBindings.java:40-80` — variables resolve to doc
  values or the query score; an unbound variable is an error.
* `expressions/ExpressionSortField.java:30-60` /
  `ExpressionRescorer.java:40-90` — the compiled expression drives hit
  sorting or a second-pass rescoring of a first-pass top-N.

Spark-first shape: the expression compiles ONCE into an AST and renders
to a **SQL scalar expression** consumable by `F.expr` — so the ranking
expression runs JVM-side inside whole-stage codegen, never in Python.
The same AST renders to DuckDB SQL for the correctness oracle: engine
and oracle evaluate literally the same tree (parity by construction;
only libm rounding could differ, handled by the usual round-to-4
output discipline).  Functions map to the built-ins both engines share
(ln/log10/exp/sqrt/abs/ceil/floor/trig, min->least, max->greatest,
pow); integer literals render as DOUBLE casts to keep JS double
division semantics (1/2 == 0.5).
"""

from __future__ import annotations

import re

#: JavascriptCompiler.java:465-500 default function table (the subset both
#: Spark SQL and DuckDB evaluate natively), name -> (sql_name, arity)
FUNCTIONS: dict[str, tuple[str, int]] = {
    "abs": ("abs", 1), "ceil": ("ceil", 1), "floor": ("floor", 1),
    "exp": ("exp", 1), "ln": ("ln", 1), "log10": ("log10", 1),
    "log2": ("log2", 1), "sqrt": ("sqrt", 1), "pow": ("pow", 2),
    "min": ("least", 2), "max": ("greatest", 2),
    "sin": ("sin", 1), "cos": ("cos", 1), "tan": ("tan", 1),
    "asin": ("asin", 1), "acos": ("acos", 1), "atan": ("atan", 1),
    "atan2": ("atan2", 2), "sinh": ("sinh", 1), "cosh": ("cosh", 1),
    "tanh": ("tanh", 1),
}

_TOKEN = re.compile(
    r"\s*(?:(?P<num>\d+\.\d*|\.\d+|\d+)"
    r"|(?P<ident>[A-Za-z_][A-Za-z0-9_.]*)"
    r"|(?P<op><=|>=|==|!=|&&|\|\||[-+*/%()<>?:,!]))"
)


class ExpressionError(ValueError):
    pass


def _lex(src: str) -> list[tuple[str, str]]:
    out, i = [], 0
    while i < len(src):
        m = _TOKEN.match(src, i)
        if not m:
            if src[i:].strip() == "":
                break
            raise ExpressionError(f"bad character at {i}: {src[i:i + 10]!r}")
        i = m.end()
        for kind in ("num", "ident", "op"):
            v = m.group(kind)
            if v is not None:
                out.append((kind, v))
                break
    out.append(("eof", ""))
    return out


class _Parser:
    """Recursive descent over the JavascriptParser.jj precedence ladder
    (ternary < or < and < equality < relational < additive <
    multiplicative < unary < primary)."""

    def __init__(self, tokens: list[tuple[str, str]]):
        self.toks = tokens
        self.i = 0

    def peek(self) -> tuple[str, str]:
        return self.toks[self.i]

    def take(self, val: str | None = None) -> tuple[str, str]:
        kind, v = self.toks[self.i]
        if val is not None and v != val:
            raise ExpressionError(f"expected {val!r}, got {v!r}")
        self.i += 1
        return kind, v

    def parse(self):
        node = self.ternary()
        if self.peek()[0] != "eof":
            raise ExpressionError(f"trailing input: {self.peek()[1]!r}")
        return node

    def ternary(self):
        cond = self.logic_or()
        if self.peek()[1] == "?":
            self.take("?")
            a = self.ternary()
            self.take(":")
            b = self.ternary()
            return ("if", cond, a, b)
        return cond

    def _binchain(self, sub, ops, tag=None):
        node = sub()
        while self.peek()[1] in ops:
            op = self.take()[1]
            node = (tag or "bin", op, node, sub())
        return node

    def logic_or(self):
        return self._binchain(self.logic_and, {"||"}, "bool")

    def logic_and(self):
        return self._binchain(self.equality, {"&&"}, "bool")

    def equality(self):
        return self._binchain(self.relational, {"==", "!="}, "cmp")

    def relational(self):
        return self._binchain(self.additive, {"<", "<=", ">", ">="}, "cmp")

    def additive(self):
        return self._binchain(self.multiplicative, {"+", "-"})

    def multiplicative(self):
        return self._binchain(self.unary, {"*", "/", "%"})

    def unary(self):
        if self.peek()[1] == "-":
            self.take()
            return ("neg", self.unary())
        if self.peek()[1] == "!":
            self.take()
            return ("not", self.unary())
        return self.primary()

    def primary(self):
        kind, v = self.peek()
        if v == "(":
            self.take("(")
            node = self.ternary()
            self.take(")")
            return node
        if kind == "num":
            self.take()
            return ("num", v)
        if kind == "ident":
            self.take()
            if self.peek()[1] == "(":
                if v not in FUNCTIONS:
                    raise ExpressionError(f"unknown function {v!r}")
                self.take("(")
                args = []
                if self.peek()[1] != ")":
                    args.append(self.ternary())
                    while self.peek()[1] == ",":
                        self.take(",")
                        args.append(self.ternary())
                self.take(")")
                if len(args) != FUNCTIONS[v][1]:
                    raise ExpressionError(
                        f"{v} takes {FUNCTIONS[v][1]} args, got {len(args)}"
                    )
                return ("call", v, args)
            return ("var", v)
        raise ExpressionError(f"unexpected token {v!r}")


class Expression:
    """A compiled expression (JavascriptCompiler.compile analog)."""

    def __init__(self, source: str, _ast=None):
        self.source = source
        # _ast lets other front-ends (funcquery.py's Solr function syntax)
        # reuse this renderer over a pre-built tree
        self.ast = _ast if _ast is not None else _Parser(_lex(source)).parse()

    def variables(self) -> list[str]:
        """Unbound variable names, in first-use order (Bindings surface)."""
        seen: list[str] = []

        def walk(n):
            tag = n[0]
            if tag == "var" and n[1] not in seen:
                seen.append(n[1])
            elif tag == "call":
                for a in n[2]:
                    walk(a)
            elif tag in ("bin", "cmp", "bool"):
                walk(n[2]); walk(n[3])
            elif tag in ("neg", "not"):
                walk(n[1])
            elif tag == "if":
                walk(n[1]); walk(n[2]); walk(n[3])

        walk(self.ast)
        return seen

    def sql(self, bindings: dict[str, str]) -> str:
        """Render to a SQL scalar (identical text for Spark SQL and DuckDB).

        `bindings` maps each variable to a SQL fragment (SimpleBindings:
        a doc-value column or the score column); an unbound variable
        raises, as SimpleBindings.validate does."""
        missing = [v for v in self.variables() if v not in bindings]
        if missing:
            raise ExpressionError(f"unbound variables: {missing}")

        def render(n) -> str:
            tag = n[0]
            if tag == "num":
                # JS arithmetic is double: 1/2 == 0.5, so integer literals
                # are cast (a bare literal is DECIMAL/INT in SQL)
                return f"CAST({n[1]} AS DOUBLE)"
            if tag == "var":
                return f"({bindings[n[1]]})"
            if tag == "call":
                fn = FUNCTIONS[n[1]][0]
                return f"{fn}({', '.join(render(a) for a in n[2])})"
            if tag == "bin":
                return f"({render(n[2])} {n[1]} {render(n[3])})"
            if tag == "cmp":
                # comparisons yield 1.0/0.0 — everything is a double
                op = {"==": "=", "!=": "<>"}.get(n[1], n[1])
                return (f"(CASE WHEN {render(n[2])} {op} {render(n[3])} "
                        "THEN 1.0 ELSE 0.0 END)")
            if tag == "bool":
                op = "AND" if n[1] == "&&" else "OR"
                return (f"(CASE WHEN {render(n[2])} <> 0 {op} "
                        f"{render(n[3])} <> 0 THEN 1.0 ELSE 0.0 END)")
            if tag == "neg":
                return f"(- {render(n[1])})"
            if tag == "not":
                return f"(CASE WHEN {render(n[1])} = 0 THEN 1.0 ELSE 0.0 END)"
            if tag == "if":
                return (f"(CASE WHEN {render(n[1])} <> 0 THEN {render(n[2])} "
                        f"ELSE {render(n[3])} END)")
            raise AssertionError(tag)

        return render(self.ast)


def compile_expr(source: str) -> Expression:
    return Expression(source)


def expr_rank(spark, sf_dir: str, term: str, expr: str, k: int):
    """Relational twin of ExpressionSortField: rank one term's matches by
    an arbitrary expression over the double-precision BM25 score and doc
    fields (`doclen`, `tf`, `df`, plus any documents-table column).  The
    expression evaluates JVM-side (F.expr), ranking rides the shared
    per-partition top-k + k-row merge."""
    from pyspark.sql import functions as F

    from .relational import _ranked, _scored, distributed_topk, documents

    e = compile_expr(expr)
    base = _scored(spark, sf_dir).filter(F.col("term") == term)
    builtin = {"_score": "score", "doclen": "doclen", "tf": "tf", "df": "df"}
    extra = [v for v in e.variables() if v not in builtin]
    if extra:
        base = base.join(documents(spark, sf_dir).select("doc_id", *extra),
                         "doc_id")
    bindings = {**builtin, **{v: v for v in extra}}
    df = base.withColumn("expr4", F.round(F.expr(e.sql(bindings)), 4))
    by = [("expr4", False), ("doc_id", True)]
    top = distributed_topk(df.select("doc_id", "expr4"), k, by)
    return _ranked(top, by, ["doc_id", "expr4"])


def expr_frange(spark, sf_dir: str, term: str, expr: str,
                lo: float, hi: float):
    """Solr {!frange} / FunctionRangeQuery (queries/function/
    FunctionRangeQuery.java; Solr FunctionRangeQParserPlugin): keep the
    term's matches whose expression value lands in [lo, hi].  The
    expression compiles to ONE JVM-side SQL scalar (whole-stage codegen,
    no Python), so the filter fuses into the scan like any predicate.
    -> (doc_id, expr4) ordered by doc_id."""
    from pyspark.sql import functions as F

    from .relational import _scored, documents

    e = compile_expr(expr)
    base = _scored(spark, sf_dir).filter(F.col("term") == term)
    builtin = {"_score": "score", "doclen": "doclen", "tf": "tf", "df": "df"}
    extra = [v for v in e.variables() if v not in builtin]
    if extra:
        base = base.join(documents(spark, sf_dir).select("doc_id", *extra),
                         "doc_id")
    bindings = {**builtin, **{v: v for v in extra}}
    val = F.round(F.expr(e.sql(bindings)), 4)
    return (
        base.withColumn("expr4", val)
        .filter((F.col("expr4") >= lo) & (F.col("expr4") <= hi))
        .select("doc_id", "expr4")
        .orderBy("doc_id")
    )


def rescore(index, first_pass, expr: str, k: int,
            extra_bindings: dict[str, str] | None = None):
    """Second-pass rescoring (ExpressionRescorer.java:40-90): reorder a
    first-pass hit DataFrame (doc_id, score) by the expression.

    Bindings: `_score` = the first-pass (float32) score; any doc stat
    column (`doclen`, ...) joins in from the index's kind=doc rows.  The
    first pass is already top-N sized, so the join broadcasts the hits
    and the expression evaluates JVM-side; the final sort is N rows."""
    from pyspark.sql import functions as F

    e = compile_expr(expr)
    bindings = {"_score": "score"}
    if extra_bindings:
        bindings.update(extra_bindings)
    need_doc = [v for v in e.variables()
                if v != "_score" and v not in bindings]
    df = first_pass
    if need_doc:
        # hits are top-N sized: broadcast them against the big doc-stats
        # side so the stats scan filters by the tiny id set (no shuffle)
        stats = index.docstats().select("doc_id", *need_doc)
        df = stats.join(F.broadcast(df), "doc_id")
        for v in need_doc:
            bindings[v] = v
    df = df.withColumn("expr_score", F.expr(e.sql(bindings)))
    return (
        df.orderBy(F.desc("expr_score"), F.asc("doc_id"))
        .limit(k)
        .select("doc_id", "score", "expr_score")
    )
