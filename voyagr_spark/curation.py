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


# ---------------------------------------------------------------------------
# C4 heuristic filters (Raffel et al. 2020, arXiv:1910.10683 section 2.2)
# ---------------------------------------------------------------------------

def c4_lined_text(line_tokens: int = 5):
    """Column expr: deterministic C4-shaped line structure for the gate
    surface.  Line i of doc d: 'javascript ' prefix iff (d+i) % 11 == 0,
    terminal suffix by (d+i) % 4 (0 -> '.', 1 -> '?', 2 -> '!', 3 -> none);
    page extras: a curly-brace line iff d % 13 == 0, a 'Lorem ipsum' line
    iff d % 17 == 0, a planted bad-word line iff d % 19 == 0.  The same
    arithmetic renders in the DuckDB oracle, so the synthetic page is
    byte-identical on both engines."""
    toks = F.split(F.col("text"), " ")
    n_lines = F.ceil(F.size(toks) / F.lit(line_tokens)).cast("int")
    d = F.col("doc_id")

    def line(i):
        base = F.array_join(F.slice(toks, i * line_tokens + 1, line_tokens), " ")
        pre = F.when((d + i) % 11 == 0, F.lit("javascript ")).otherwise(F.lit(""))
        m = (d + i) % 4
        suf = (
            F.when(m == 0, F.lit("."))
            .when(m == 1, F.lit("?"))
            .when(m == 2, F.lit("!"))
            .otherwise(F.lit(""))
        )
        return F.concat(pre, base, suf)

    body = F.array_join(F.transform(F.sequence(F.lit(0), n_lines - 1), line), "\n")
    curly = F.when(d % 13 == 0, F.lit("\ncurly { brace.")).otherwise(F.lit(""))
    lorem = F.when(d % 17 == 0, F.lit("\nLorem ipsum dolor sit.")).otherwise(
        F.lit("")
    )
    bad = F.when(d % 19 == 0, F.lit("\nbadword here today.")).otherwise(F.lit(""))
    return F.concat(body, curly, lorem, bad)


def c4_filters(
    docs: DataFrame,
    *,
    min_words_per_line: int = 3,
    min_sentences: int = 5,
    bad_words: tuple = (),
) -> DataFrame:
    """The C4 cleaning rules (Raffel et al. 2020 section 2.2) as one scan.

    Line level: keep a line iff it ends in terminal punctuation (. ! ? \"),
    has >= min_words_per_line words, and does not contain the word
    'javascript' (case-insensitive).  Page level: drop the page when the
    cleaned text has < min_sentences sentence enders, when the RAW page
    contains a curly bracket or the phrase 'lorem ipsum' (case-insensitive),
    or when any `bad_words` entry appears as a word (the paper's
    'Dirty/Naughty/Obscene' list, parameterized).  The paper's remaining
    rule — drop repeated three-sentence spans corpus-wide — is the
    cross-doc dedup already provided by `relational.dedup_lines` /
    `substring_dup_spans` and is deliberately not re-implemented here.

    Sentence counting is the deterministic proxy `count of [.!?]` over the
    cleaned text (the paper used a sentence splitter; any monotone proxy
    orders pages identically on this corpus and is bit-reproducible in SQL).

    Zero shuffles: every signal is a JVM higher-order array expression over
    the staged line array, so at 100 TB the filter runs at parquet scan
    speed with no exchange.  -> (doc_id, n_lines, n_kept_lines,
    n_sentences, clean_nchars, clean_md5, has_curly, has_lorem,
    has_badword, keep).
    """
    staged = docs.select(
        "doc_id", "text", F.split(F.col("text"), "\n").alias("_lines")
    )
    lines = F.col("_lines")

    def line_kept(l):
        return (
            l.rlike(r'[.!?"]$')
            & (F.size(F.split(l, " ")) >= min_words_per_line)
            & ~l.rlike(r"(?i)\bjavascript\b")
        )

    kept = F.filter(lines, line_kept)
    clean = F.array_join(kept, "\n")
    n_sent = F.size(F.regexp_extract_all(clean, F.lit(r"[.!?]"), F.lit(0)))
    has_curly = F.col("text").contains("{")
    has_lorem = F.lower(F.col("text")).contains("lorem ipsum")
    if bad_words:
        import re as _re

        pat = r"(?i)\b(" + "|".join(_re.escape(w) for w in bad_words) + r")\b"
        has_bad = F.col("text").rlike(pat)
    else:
        has_bad = F.lit(False)
    keep = (
        (n_sent >= min_sentences) & ~has_curly & ~has_lorem & ~has_bad
    )
    return staged.select(
        "doc_id",
        F.size(lines).cast("long").alias("n_lines"),
        F.size(kept).cast("long").alias("n_kept_lines"),
        n_sent.cast("long").alias("n_sentences"),
        F.length(clean).cast("long").alias("clean_nchars"),
        F.md5(clean.cast("binary")).alias("clean_md5"),
        has_curly.cast("long").alias("has_curly"),
        has_lorem.cast("long").alias("has_lorem"),
        has_bad.cast("long").alias("has_badword"),
        keep.cast("long").alias("keep"),
    )


def c4_filters_table(spark: SparkSession, sf_dir: str) -> DataFrame:
    """q: c4_filters over the documents table re-laid as deterministic
    5-token lines with planted javascript/short/punctuation-free lines and
    curly/lorem/bad-word pages (c4_lined_text)."""
    docs = documents(spark, sf_dir).select(
        "doc_id", c4_lined_text(5).alias("text")
    )
    return c4_filters(docs, bad_words=("badword",)).orderBy("doc_id")


# ---------------------------------------------------------------------------
# PII redaction (the Dolma/FineWeb pre-tokenization masking pass)
# ---------------------------------------------------------------------------

# RE2-safe patterns (no backrefs/lookaround) so the identical regex runs in
# Spark (java.util.regex) and the DuckDB oracle (RE2).
EMAIL_RE = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
IPV4_RE = r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b"
PHONE_RE = r"\b\d{3}-\d{4}\b"


def pii_redact(docs: DataFrame) -> DataFrame:
    """Deterministic PII masking (the Dolma/FineWeb recipe: regex-mask
    emails, IPv4 addresses, and phone numbers before tokenization).

    Counts come from the RAW text; replacements apply in a fixed order
    (email first — its pattern can span dots that IPv4 would otherwise
    claim — then IP, then phone) with the Dolma mask tokens.  One scan,
    zero shuffles, all JVM regexp expressions.  -> (doc_id, n_emails,
    n_ips, n_phones, redacted_nchars, redacted_md5).
    """
    text = F.col("text")

    def n(pat):
        return F.size(F.regexp_extract_all(text, F.lit(pat), F.lit(0)))

    red = F.regexp_replace(text, EMAIL_RE, "|||EMAIL_ADDRESS|||")
    red = F.regexp_replace(red, IPV4_RE, "|||IP_ADDRESS|||")
    red = F.regexp_replace(red, PHONE_RE, "|||PHONE_NUMBER|||")
    return docs.select(
        "doc_id",
        n(EMAIL_RE).cast("long").alias("n_emails"),
        n(IPV4_RE).cast("long").alias("n_ips"),
        n(PHONE_RE).cast("long").alias("n_phones"),
        F.length(red).cast("long").alias("redacted_nchars"),
        F.md5(red.cast("binary")).alias("redacted_md5"),
    )


def pii_text():
    """Column expr: corpus text with deterministically planted PII —
    ' u{d}@example.com' iff d % 7 == 0, ' 10.0.{d%256}.{d%100}' iff
    d % 9 == 0, ' 555-{1000 + d%9000}' iff d % 6 == 0; arithmetic
    identical in the SQL oracle."""
    d = F.col("doc_id")
    email = F.when(
        d % 7 == 0,
        F.concat(F.lit(" u"), d.cast("string"), F.lit("@example.com")),
    ).otherwise(F.lit(""))
    ip = F.when(
        d % 9 == 0,
        F.concat(
            F.lit(" 10.0."),
            (d % 256).cast("string"),
            F.lit("."),
            (d % 100).cast("string"),
        ),
    ).otherwise(F.lit(""))
    phone = F.when(
        d % 6 == 0,
        F.concat(F.lit(" call 555-"), (d % 9000 + 1000).cast("string")),
    ).otherwise(F.lit(""))
    return F.concat(F.col("text"), email, ip, phone)


def pii_redact_table(spark: SparkSession, sf_dir: str) -> DataFrame:
    """q: pii_redact over the documents table with deterministically
    planted emails/IPs/phone numbers (pii_text)."""
    docs = documents(spark, sf_dir).select("doc_id", pii_text().alias("text"))
    return pii_redact(docs).orderBy("doc_id")
