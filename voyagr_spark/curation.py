"""Training-data curation ops: the full Gopher quality/repetition rule set.

The document-level filters a 100 TB pretraining pipeline runs before
tokenization, re-expressed as single-scan Spark plans — Rae et al. 2021
(Gopher, arXiv:2112.11446, Appendix A1.1/A1.2).  `relational.gopher_quality`
covers the word-level A1.1 signals over the raw single-line corpus; this
module adds the LINE-structured half the paper actually specifies —
bullet/ellipsis line fractions (A1.1) and the repetition family (A1.2:
duplicate-line fractions, top-{2,3,4}-gram character shares, duplicated
5-gram character coverage).

Every signal is a JVM higher-order-function expression over the per-doc
token/line arrays (split -> transform/filter/aggregate): ZERO shuffles,
zero Python — the plan is one whole-stage-codegen scan, so at 100 TB the
filter runs at parquet-read speed and partitions never exchange.  The
per-doc work is O(L^2) in document length for the n-gram counts, which is
the right trade at scale: L is bounded (docs are chunked upstream), and an
O(L) alternative would need a per-doc groupBy, i.e. a corpus-wide shuffle.

The corpus text is single-line (TESTDATA.md), so the `*_table` gate
surfaces synthesize deterministic line structure the same way
`relational.dedup_lines_table` does: fixed-width token lines plus bullet/
ellipsis markup derived from doc_id arithmetic — identical expressions on
the Spark and DuckDB sides, no RNG anywhere.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .relational import documents


def _r4(c):
    """4-decimal rounding as pure IEEE-double math: floor(x*1e4 + 0.5)/1e4.

    Deliberately NOT F.round: Spark rounds the shortest-decimal repr via
    BigDecimal HALF_UP while DuckDB rounds in double space, and the two can
    disagree on exact binary fractions these count/count signals produce
    (e.g. 1/32 = 0.03125).  The same double-space formula on both engines
    is bit-reproducible."""
    return F.floor(c * 10000 + F.lit(0.5)) / F.lit(10000.0)


# Gopher A1.1 word-quality thresholds (Rae et al. 2021, Table A1).
GOPHER_REQUIRED_WORDS = ("the", "be", "to", "of", "and", "that", "have", "with")


# ---------------------------------------------------------------------------
# deterministic synthetic structure for the gate surfaces
# ---------------------------------------------------------------------------

def _lined_text(line_tokens: int, bullets: bool):
    """Column expr: the single-line corpus text re-laid as newline-joined
    `line_tokens`-token lines; with bullets=True, line i of doc d gets a
    '- ' prefix iff (d+i) % 3 == 0 and a ' ...' suffix iff
    (d+i) % (2 + d%3) == 0 — doc-dependent rates so the bullet/ellipsis
    fractions actually straddle the Gopher thresholds."""
    toks = F.split(F.col("text"), " ")
    n_lines = F.ceil(F.size(toks) / F.lit(line_tokens)).cast("int")

    def line(i):
        base = F.array_join(F.slice(toks, i * line_tokens + 1, line_tokens), " ")
        if not bullets:
            return base
        d = F.col("doc_id")
        pre = F.when((d + i) % 3 == 0, F.lit("- ")).otherwise(F.lit(""))
        suf = F.when((d + i) % (F.lit(2) + d % 3) == 0, F.lit(" ...")).otherwise(
            F.lit("")
        )
        return F.concat(pre, base, suf)

    return F.array_join(F.transform(F.sequence(F.lit(0), n_lines - 1), line), "\n")


def lined_documents(
    spark: SparkSession, sf_dir: str, line_tokens: int, bullets: bool
) -> DataFrame:
    return documents(spark, sf_dir).select(
        "doc_id", _lined_text(line_tokens, bullets).alias("text")
    )


# ---------------------------------------------------------------------------
# Gopher quality (A1.1) — the line-structured signals
# ---------------------------------------------------------------------------

def gopher_quality(
    docs: DataFrame,
    *,
    min_words: int = 50,
    max_words: int = 100_000,
    min_mean_len: float = 3.0,
    max_mean_len: float = 10.0,
    max_symbol_ratio: float = 0.1,
    max_bullet_frac: float = 0.9,
    max_ellipsis_frac: float = 0.3,
    min_alpha_frac: float = 0.8,
    required_words: tuple = GOPHER_REQUIRED_WORDS,
    min_required: int = 2,
) -> DataFrame:
    """Gopher word-quality signals + keep flag (Rae et al. 2021 A1.1).

    Signals per doc: word count bounds, mean word length bounds, symbol-to-
    word ratio ('#' chars + '...' occurrences over words), fraction of lines
    starting with a bullet ('- ', '* ', '• '), fraction of lines ending
    with an ellipsis, fraction of words containing an alphabetic char, and
    presence of >= min_required of the required stop words.  keep=1 iff all
    thresholds pass.  Comparisons run on the raw ratios; the emitted columns
    are rounded to 4 for the oracle compare.

    One scan, zero shuffles: every signal is a higher-order array expression.
    The token/line arrays are STAGED as real columns first — a lambda that
    captures an inline expression tree makes Catalyst re-evaluate that tree
    per element (split-per-element turns O(L) signals into O(L^2) string
    work and blows up codegen); a column reference inside the lambda is a
    bound attribute, evaluated once per row.
    """
    staged = docs.select(
        "doc_id",
        F.col("text"),
        F.split(F.col("text"), r"\s+").alias("_toks"),
        F.split(F.col("text"), "\n").alias("_lines"),
    )
    toks = F.col("_toks")
    lines = F.col("_lines")
    nw = F.size(toks)
    wchars = F.aggregate(toks, F.lit(0), lambda a, w: a + F.length(w))
    mean_len = wchars / nw
    alpha_frac = F.size(F.filter(toks, lambda w: w.rlike("[A-Za-z]"))) / nw
    n_hash = F.length("text") - F.length(F.translate("text", "#", ""))
    n_ell = F.size(F.regexp_extract_all(F.col("text"), F.lit(r"\.\.\."), F.lit(0)))
    symbol_ratio = (n_hash + n_ell) / nw
    nl = F.size(lines)
    bullet_frac = (
        F.size(F.filter(lines, lambda l: l.rlike(r"^(-|\*|•) "))) / nl
    )
    ellipsis_frac = (
        F.size(F.filter(lines, lambda l: l.rlike(r"(\.\.\.|…)$"))) / nl
    )
    def has(word):
        return F.exists(toks, lambda t: t == F.lit(word)).cast("int")

    n_req = None
    for w in required_words:
        e = has(w)
        n_req = e if n_req is None else n_req + e
    keep = (
        (nw >= min_words)
        & (nw <= max_words)
        & (mean_len >= min_mean_len)
        & (mean_len <= max_mean_len)
        & (symbol_ratio <= max_symbol_ratio)
        & (bullet_frac <= max_bullet_frac)
        & (ellipsis_frac <= max_ellipsis_frac)
        & (alpha_frac >= min_alpha_frac)
        & (n_req >= min_required)
    )
    return staged.select(
        "doc_id",
        nw.cast("long").alias("n_words"),
        _r4(mean_len).alias("mean_word_len"),
        _r4(alpha_frac).alias("frac_alpha_words"),
        _r4(symbol_ratio).alias("symbol_ratio"),
        _r4(bullet_frac).alias("frac_bullet_lines"),
        _r4(ellipsis_frac).alias("frac_ellipsis_lines"),
        n_req.cast("long").alias("n_required_words"),
        keep.cast("long").alias("keep"),
    )


def gopher_lined_quality_table(spark: SparkSession, sf_dir: str) -> DataFrame:
    """q: gopher_quality over the documents table with deterministic 6-token
    lines + bullet/ellipsis markup; required words adapted to the corpus
    vocabulary (the paper's English stop set barely intersects it)."""
    lined = lined_documents(spark, sf_dir, line_tokens=6, bullets=True)
    return gopher_quality(
        lined,
        min_words=40,
        required_words=("the", "a", "data", "value"),
        min_required=2,
    ).orderBy("doc_id")


# ---------------------------------------------------------------------------
# Gopher repetition (A1.2)
# ---------------------------------------------------------------------------

def _grams(toks, nw, n):
    """Word n-grams as space-joined strings; empty when nw < n (guarded:
    Spark's sequence() would run DESCENDING on a negative end)."""
    return F.when(
        nw >= n,
        F.transform(
            F.sequence(F.lit(0), nw - n),
            lambda i: F.array_join(F.slice(toks, i + 1, n), " "),
        ),
    ).otherwise(F.array().cast("array<string>"))


def _top_gram_frac(grams, nw, wchars, n):
    """Fraction of word characters covered by the most frequent n-gram:
    count(top) * nonspace_chars(top) / total_word_chars, argmax tie broken
    by lexicographically smallest gram.  `grams` must be a SORTED staged
    column (see gopher_repetition for why staging matters)."""
    zero = F.struct(
        F.lit("").alias("cur"),
        F.lit(0).alias("curc"),
        F.lit("").alias("bestg"),
        F.lit(0).alias("bestc"),
    )

    def step(acc, g):
        newc = F.when(g == acc.cur, acc.curc + 1).otherwise(F.lit(1))
        better = newc > acc.bestc
        return F.struct(
            g.alias("cur"),
            newc.alias("curc"),
            F.when(better, g).otherwise(acc.bestg).alias("bestg"),
            F.when(better, newc).otherwise(acc.bestc).alias("bestc"),
        )

    # ONE linear run-length fold over the SORTED gram array; strict `>`
    # means the first (lexicographically smallest) max-count run wins ties.
    # The naive counts-per-distinct-gram form is avoided deliberately:
    # Catalyst re-evaluates captured argument expressions per lambda
    # element, which turns filter-inside-transform into O(L^3) per doc.
    best = F.aggregate(grams, zero, step)
    frac = best.bestc * F.length(F.translate(best.bestg, " ", "")) / wchars
    return F.when(nw >= n, _r4(frac)).otherwise(F.lit(0.0))


def _dup_gram_cover_frac(toks, grams, nw, wchars, n):
    """Fraction of word characters at positions covered by any occurrence of
    an n-gram that appears >= 2 times in the doc — the paper's 'duplicate
    n-gram character fraction', counting covered characters once.  `grams`
    must be a staged POSITIONAL (unsorted) gram column.

    Shape: duplicated start positions via one O(L^2) filter-in-filter over
    the staged gram column, then coverage = distinct(flatten(start ->
    [s, s+n))) — each covered token counted once, all linear from there.
    """
    dup_starts = F.filter(
        F.sequence(F.lit(0), nw - n),
        lambda s: F.size(F.filter(grams, lambda x: x == F.element_at(grams, s + 1)))
        >= 2,
    )
    covered = F.array_distinct(
        F.flatten(F.transform(dup_starts, lambda s: F.sequence(s, s + n - 1)))
    )
    covchars = F.aggregate(
        covered, F.lit(0), lambda a, p: a + F.length(F.element_at(toks, p + 1))
    )
    return F.when(nw >= n, _r4(covchars / wchars)).otherwise(F.lit(0.0))


def gopher_repetition(
    docs: DataFrame,
    *,
    max_dup_line_frac: float = 0.30,
    max_dup_line_char_frac: float = 0.20,
    max_top2_frac: float = 0.20,
    max_top3_frac: float = 0.18,
    max_top4_frac: float = 0.16,
    max_dup5_frac: float = 0.15,
) -> DataFrame:
    """Gopher repetition signals + keep flag (Rae et al. 2021 A1.2).

    dup_line_frac = fraction of lines whose exact content occurs >= 2 times;
    dup_line_char_frac = their character share; top_{2,3,4}gram_char_frac =
    character share of the single most frequent word n-gram;
    dup_5gram_char_frac = character share of positions covered by any
    duplicated 5-gram (each character counted once — the paper's accounting).
    Paragraph signals are omitted: the corpus is single-line, so paragraphs
    degenerate to whole docs (documented divergence).

    One scan, zero shuffles; per-doc O(L^2) array expressions (see module
    docstring for why that beats a corpus-wide shuffle at 100 TB).  All
    arrays the lambdas capture are STAGED columns: a captured inline
    expression tree is re-evaluated per lambda element by Catalyst
    (re-splitting the doc per compared line/gram), which turns these
    signals O(L^3) and stalls codegen; a staged column is a bound
    attribute, evaluated once per row.
    """
    t0 = F.split(F.col("text"), r"\s+")
    staged = docs.select(
        "doc_id",
        t0.alias("_toks"),
        F.split(F.col("text"), "\n").alias("_lines"),
        F.array_sort(_grams(t0, F.size(t0), 2)).alias("_g2s"),
        F.array_sort(_grams(t0, F.size(t0), 3)).alias("_g3s"),
        F.array_sort(_grams(t0, F.size(t0), 4)).alias("_g4s"),
        _grams(t0, F.size(t0), 5).alias("_g5"),
    )
    toks = F.col("_toks")
    lines = F.col("_lines")
    nw = F.size(toks)
    wchars = F.aggregate(toks, F.lit(0), lambda a, w: a + F.length(w))
    nl = F.size(lines)
    lchars = F.aggregate(lines, F.lit(0), lambda a, l: a + F.length(l))
    dup_lines = F.filter(
        lines, lambda l: F.size(F.filter(lines, lambda x: x == l)) >= 2
    )
    dup_line_frac = F.size(dup_lines) / nl
    dup_line_chars = F.aggregate(dup_lines, F.lit(0), lambda a, l: a + F.length(l))
    dup_line_char_frac = dup_line_chars / lchars
    top2 = _top_gram_frac(F.col("_g2s"), nw, wchars, 2)
    top3 = _top_gram_frac(F.col("_g3s"), nw, wchars, 3)
    top4 = _top_gram_frac(F.col("_g4s"), nw, wchars, 4)
    dup5 = _dup_gram_cover_frac(toks, F.col("_g5"), nw, wchars, 5)
    keep = (
        (dup_line_frac <= max_dup_line_frac)
        & (dup_line_char_frac <= max_dup_line_char_frac)
        & (top2 <= max_top2_frac)
        & (top3 <= max_top3_frac)
        & (top4 <= max_top4_frac)
        & (dup5 <= max_dup5_frac)
    )
    return staged.select(
        "doc_id",
        _r4(dup_line_frac).alias("dup_line_frac"),
        _r4(dup_line_char_frac).alias("dup_line_char_frac"),
        top2.alias("top_2gram_char_frac"),
        top3.alias("top_3gram_char_frac"),
        top4.alias("top_4gram_char_frac"),
        dup5.alias("dup_5gram_char_frac"),
        keep.cast("long").alias("keep"),
    )


def gopher_repetition_table(spark: SparkSession, sf_dir: str) -> DataFrame:
    """q: gopher_repetition over the documents table with deterministic
    3-token lines (short lines so exact line duplicates actually occur in
    the 31-word-vocabulary corpus)."""
    lined = lined_documents(spark, sf_dir, line_tokens=3, bullets=False)
    return gopher_repetition(lined).orderBy("doc_id")
