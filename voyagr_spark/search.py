"""Query execution: per-segment vectorized scoring + global top-k merge.

Spark shape (SURVEY.md §3.2-3.3): the driver plays IndexSearcher steps 1-3
(rewrite, bind *global* stats, precompute idf + the 256-entry norm cache —
IndexSearcher.java:624-635, BM25Similarity.java:207-210); executors run the
per-leaf scorers as one vectorized applyInPandas over the query's posting rows
grouped by segment (bulkScorer at IndexSearcher.java:560); the global merge is
`ORDER BY score DESC, doc_id ASC LIMIT k` over the tiny per-segment top-k
union — the same priority-queue semantics as TopScoreDocCollector/HitQueue
(ties broken by lower doc id, HitQueue.java:76-81) and Solr's shard merge
(QueryComponent.java:1060-1087).

Physical operators (all numpy set algebra on decoded posting arrays):
* term           — TermScorer.java:69-72
* AND            — leapfrog intersection, rarest list leads; non-lead lists
                   are decoded *only in blocks that can contain candidates*
                   via the block directory (ConjunctionDISI.java:65-121 +
                   skip lists MultiLevelSkipListWriter.java:68-81)
* OR             — union + per-doc score sum (DisjunctionSumScorer), with
                   MaxScore pruning: non-essential lists (cumulative upper
                   bound < current kth score) only probed for candidates
                   (rank-neutral; SURVEY §2.7 K9)
* NOT            — required-side anti-membership (ReqExclScorer)
* MUST+SHOULD    — optional scores added to required matches (ReqOptSumScorer)
* minShouldMatch — match-count filter (MinShouldMatchSumScorer)
* phrase         — doc-level intersection first, positions decoded only for
                   survivors (TwoPhaseIterator), phraseFreq = |∩(pos_i - i)|
                   (ExactPhraseScorer.java:127-160)
"""

from __future__ import annotations

import re
from dataclasses import dataclass

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from . import bm25
from .analysis import REVERSE_MARKER, should_reverse
from .smallfloat import NORM_TABLE
from .complexphrase import (
    ComplexPhraseQuery,
    EngineResolver,
    rewrite_complex_phrase,
)
from .parser import (
    MUST,
    MUST_NOT,
    SHOULD,
    BooleanQuery,
    BoostingQuery,
    CommonTermsQuery,
    ConstScoreMulti,
    ConstScoreTerms,
    DisjunctionMaxQuery,
    FuzzyQuery,
    MatchNoDocsQuery,
    MultiPhraseQuery,
    PhraseQuery,
    PrefixQuery,
    RegexpQuery,
    TermQuery,
    TermRangeQuery,
    WildcardQuery,
    parse,
)

RESULT_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("score", T.FloatType()),
    ]
)


@dataclass
class QueryPlan:
    """Driver-frozen global stats (the Weight; IndexSearcher.java:624-635)."""

    query: object
    k: int
    idf: dict[str, np.float32]  # per-term idf (float32)
    cache: np.ndarray  # 256 float32 norm cache
    avgdl: np.float32
    prune: bool = True
    after: tuple[float, int] | None = None  # searchAfter cursor (K4)
    # (deletes_dir, epoch) or None — tombstones are loaded EXECUTOR-side per
    # segment doc range (indexer.load_tombstones), never shipped in the plan
    tombstones: tuple[str, int] | None = None
    k1: np.float32 = bm25.K1  # custom similarity (BM25Similarity.java:46-58)
    b: np.float32 = bm25.B
    # pluggable Similarity (IndexSearcher.setSimilarity): "bm25" (default)
    # or "classic" (TF-IDF, classic.py); classic_value holds the per-term
    # post-queryNorm weight chain (TFIDFSimilarity.IDFStats.value)
    sim: str = "bm25"
    classic_value: dict | None = None
    # LM similarities (lm.py): term -> (collectionProbability, totalBoost,
    # mu-or-lambda), frozen on the driver like classic_value
    lm_values: dict | None = None


def query_terms(q) -> set[str]:
    if isinstance(q, TermQuery):
        return {q.term}
    if isinstance(q, (PhraseQuery, ConstScoreTerms)):
        return set(q.terms)
    if isinstance(q, MultiPhraseQuery):
        return {t for members in q.termsets for t in members}
    if isinstance(q, BoostingQuery):
        return query_terms(q.match) | query_terms(q.context)
    if isinstance(q, BooleanQuery):
        out: set[str] = set()
        for _, sub in q.clauses:
            out |= query_terms(sub)
        return out
    if isinstance(q, DisjunctionMaxQuery):
        out = set()
        for sub in q.disjuncts:
            out |= query_terms(sub)
        return out
    if hasattr(q, "all_terms"):  # span family (spans.SpanQuery)
        return q.all_terms()
    if hasattr(q, "any_step"):  # TermAutomatonQuery
        return set(q.terms)
    return set()


def query_multis(q) -> list[ConstScoreMulti]:
    """All rewritten multi-term predicates in the query tree."""
    if isinstance(q, ConstScoreMulti):
        return [q]
    if isinstance(q, BooleanQuery):
        return [m for _, sub in q.clauses for m in query_multis(sub)]
    if isinstance(q, DisjunctionMaxQuery):
        return [m for sub in q.disjuncts for m in query_multis(sub)]
    if isinstance(q, BoostingQuery):
        return query_multis(q.match) + query_multis(q.context)
    return []


_MAX_CODEPOINT = chr(0x10FFFF)


def _prefix_upper(prefix: str) -> str | None:
    """Smallest string greater than every string with this prefix (exclusive
    range end).  UTF-8 byte order == code-point order, so the predicate is
    identical under Spark's UTF8String comparison and Python str."""
    for i in range(len(prefix) - 1, -1, -1):
        c = ord(prefix[i])
        if c < 0x10FFFF:
            return prefix[:i] + chr(c + 1)
    return None  # prefix is all U+10FFFF: unbounded above


_REGEX_META = set(".?*+(){}[]|\\^$")


def _wildcard_regex(pattern: str) -> str:
    out = []
    for ch in pattern:
        if ch == "*":
            out.append(".*")
        elif ch == "?":
            out.append(".")
        else:
            out.append(re.escape(ch))
    return "".join(out)


def _literal_prefix(pattern: str, wildcard: bool) -> str:
    """Leading literal run of a wildcard/regex pattern — the automaton
    common-prefix that bounds the term-dictionary range scan.

    For wildcard patterns the run is always a mandatory prefix (`*`/`?` are
    the only metas).  For regexps it is mandatory only if (a) the pattern has
    no alternation anywhere — `cat|dog` matches terms far outside [cat, cau)
    — and (b) the char ending the run is not optional: a quantifier
    (`?`, `*`, `{`) after the last literal makes it repeatable/droppable, so
    that char is excluded (the conservative analog of Lucene's
    Operations.getCommonPrefix over the compiled automaton)."""
    if wildcard:
        metas = {"*", "?"}
    else:
        if "|" in pattern:
            return ""  # alternation: no mandatory common prefix
        metas = _REGEX_META
    lit = []
    for ch in pattern:
        if ch in metas:
            if not wildcard and lit and ch in "?*{":
                lit.pop()  # quantifier makes the previous literal optional
            break
        lit.append(ch)
    return "".join(lit)


def rewrite(q, index):
    """Plan-time rewrite of multi-term queries (SURVEY §2.5 P5,
    MultiTermQuery.java:65).

    Prefix/Wildcard/Regexp/TermRange rewrite to CONSTANT_SCORE predicates
    evaluated executor-side: a term range pushed into the parquet scan (the
    FST/term-index analog; plan-pushdown-tested) plus an optional regex
    refined inside the segment UDF — the dictionary is never enumerated to
    the driver.  Fuzzy is the one scoring rewrite: a bounded expansion
    (<= max_expansions, FuzzyQuery.defaultMaxExpansions) into a
    boost-weighted disjunction, mirroring TopTermsBlendedFreqScoringRewrite's
    cap with per-term FuzzyTermsEnum boosts."""
    _rw = getattr(getattr(index, "analyzer", None), "reverse_wildcards", False)
    if isinstance(q, PrefixQuery):
        if not q.prefix:
            # `*`: every term — but skip the reversed twins when the
            # ReversedWildcardFilter indexed them (marker terms sort first)
            return ConstScoreMulti(
                lower=_prefix_upper(REVERSE_MARKER) if _rw else None,
                boost=q.boost,
            )
        return ConstScoreMulti(
            lower=q.prefix, upper=_prefix_upper(q.prefix),
            include_lower=True, include_upper=False, boost=q.boost,
        )
    if isinstance(q, WildcardQuery):
        lit = _literal_prefix(q.pattern, wildcard=True)
        if lit == q.pattern:  # no wildcard chars: plain term
            return TermQuery(lit, boost=q.boost)
        if _rw and should_reverse(q.pattern):
            # ReversedWildcardFilter query side (SolrQueryParserBase.java:
            # 786-800): run the reversed pattern against the marker+reversed
            # twins — a leading wildcard becomes a BOUNDED prefix range scan.
            # term t matches p iff reverse(t) matches reverse(p): `*` and `?`
            # are direction-agnostic atoms, so char-reversing the pattern is
            # exactly Operations.reverse of the wildcard automaton.
            rpat = REVERSE_MARKER + q.pattern[::-1]
            rlit = _literal_prefix(rpat, wildcard=True)  # >= the marker char
            return ConstScoreMulti(
                lower=rlit, upper=_prefix_upper(rlit),
                include_lower=True, include_upper=False,
                regex=_wildcard_regex(rpat), boost=q.boost,
            )
        return ConstScoreMulti(
            # not reversed but the filter is active: keep the marker twins
            # out of an unbounded-below scan (the Operations.minus false-
            # positive subtraction, SolrQueryParserBase.java:797-804)
            lower=lit or (_prefix_upper(REVERSE_MARKER) if _rw else None),
            upper=_prefix_upper(lit) if lit else None,
            include_lower=True, include_upper=False,
            regex=_wildcard_regex(q.pattern), boost=q.boost,
        )
    if isinstance(q, RegexpQuery):
        lit = _literal_prefix(q.pattern, wildcard=False)
        return ConstScoreMulti(
            lower=lit or None, upper=_prefix_upper(lit) if lit else None,
            include_lower=True, include_upper=False,
            regex=q.pattern, boost=q.boost,
        )
    if isinstance(q, TermRangeQuery):
        return ConstScoreMulti(
            lower=q.lower, upper=q.upper,
            include_lower=q.include_lower, include_upper=q.include_upper,
            boost=q.boost,
        )
    if isinstance(q, FuzzyQuery):
        return _rewrite_fuzzy(q, index)
    if isinstance(q, CommonTermsQuery):
        return _rewrite_common_terms(q, index)
    if isinstance(q, ComplexPhraseQuery):  # complexphrase pass 2
        return rewrite_complex_phrase(
            q, EngineResolver(index),
            analyzer=getattr(index, "analyzer", None),
        )
    if isinstance(q, BooleanQuery):
        return BooleanQuery(
            tuple((o, rewrite(s, index)) for o, s in q.clauses),
            q.min_should_match, q.boost,
        )
    if isinstance(q, DisjunctionMaxQuery):
        return DisjunctionMaxQuery(
            tuple(rewrite(s, index) for s in q.disjuncts), q.tie, q.boost
        )
    if isinstance(q, BoostingQuery):
        return BoostingQuery(
            rewrite(q.match, index), rewrite(q.context, index),
            q.demote, q.boost,
        )
    return q


def _ctq_msm(value: float, num_optional: int) -> int:
    """CommonTermsQuery.minNrShouldMatch (CommonTermsQuery.java:175-180):
    >=1 or ==0 -> the integer itself, a fraction -> Math.round(f * n)."""
    if value >= 1.0 or value == 0.0:
        return int(value)
    return int(np.floor(value * num_optional + 0.5))  # Java Math.round


def _rewrite_common_terms(q: CommonTermsQuery, index) -> object:
    """CommonTermsQuery.rewrite + buildQuery (CommonTermsQuery.java:151-233).

    One driver-side df lookup (the collectTermContext analog — the same
    broadcast-sized term_dfs join every plan already does) classifies
    terms; the result is a plain BooleanQuery tree executed by the
    existing scorers, so high-frequency terms ride the ReqOptSum path:
    scored only for docs a low-frequency MUST already matched."""
    if not q.terms:
        return MatchNoDocsQuery("empty CommonTermsQuery")
    if len(q.terms) == 1:
        return TermQuery(q.terms[0], boost=q.boost)
    dfs = index.term_dfs(list(set(q.terms)))
    max_doc = index.max_doc
    cutoff = int(np.ceil(np.float32(q.max_term_frequency) * np.float32(max_doc)))
    low: list[tuple[str, object]] = []
    high: list[tuple[str, object]] = []
    for t in q.terms:
        df = dfs.get(t, 0)
        if df == 0:
            low.append((q.low_freq_occur, TermQuery(t)))  # null termContext
        elif (q.max_term_frequency >= 1.0 and df > q.max_term_frequency) or (
            df > cutoff
        ):
            high.append((q.high_freq_occur, TermQuery(t)))
        else:
            low.append((q.low_freq_occur, TermQuery(t)))
    low_msm = (
        _ctq_msm(q.low_freq_msm, len(low))
        if q.low_freq_occur == SHOULD and low
        else 0
    )
    high_msm = (
        _ctq_msm(q.high_freq_msm, len(high))
        if q.high_freq_occur == SHOULD and high
        else 0
    )

    def _side(clauses, msm, boost):
        # BooleanQuery.rewrite single-clause collapse (BooleanQuery.java:188-199)
        if len(clauses) == 1 and msm <= 1:
            from dataclasses import replace

            inner = clauses[0][1]
            return replace(inner, boost=inner.boost * boost)
        return BooleanQuery(tuple(clauses), msm, boost)

    if not low:
        # all high-frequency: rewrite to a conjunction to prevent slow
        # queries (CommonTermsQuery.java:211-222)
        if high_msm == 0 and q.high_freq_occur != MUST:
            high = [(MUST, sub) for _, sub in high]
            high_msm = 0
        return _side(high, high_msm, q.boost)
    if not high:
        return _side(low, low_msm, q.boost)
    return BooleanQuery(
        (
            (SHOULD, _side(high, high_msm, 1.0)),
            (MUST, _side(low, low_msm, 1.0)),
        ),
        0,
        q.boost,
    )


def _rewrite_fuzzy(q: FuzzyQuery, index) -> object:
    """FuzzyQuery.java:54-56 expansion: dictionary terms within max_edits,
    per-term boost = 1 - edits/min(|term|, |query|) (FuzzyTermsEnum), top
    max_expansions by (boost desc, term asc) — a bounded TakeOrdered job,
    never an unbounded collect."""
    t = q.term
    n = len(t)
    cand = index.term_stats().select("term")
    if q.prefix_length > 0:
        p = t[: q.prefix_length]
        up = _prefix_upper(p)
        cand = cand.filter(F.col("term") >= p)
        if up is not None:
            cand = cand.filter(F.col("term") < up)
    rows = (
        cand.filter(
            (F.length("term") >= n - q.max_edits)
            & (F.length("term") <= n + q.max_edits)
        )
        .withColumn("dist", F.levenshtein(F.col("term"), F.lit(t)))
        .filter(F.col("dist") <= q.max_edits)
        .withColumn(
            "sim",
            F.when(F.col("dist") == 0, F.lit(1.0)).otherwise(
                1.0 - F.col("dist") / F.least(F.length("term"), F.lit(n))
            ),
        )
        .orderBy(F.desc("sim"), F.asc("term"))
        .limit(q.max_expansions)
        .collect()
    )
    if not rows:
        return MatchNoDocsQuery(f"no terms within {q.max_edits} of {t!r}")
    # clause order = term asc: deterministic float32 accumulation order
    rows = sorted(rows, key=lambda r: r["term"])
    clauses = tuple(
        (SHOULD, TermQuery(r["term"], boost=float(r["sim"]) * q.boost))
        for r in rows
    )
    if len(clauses) == 1:
        return clauses[0][1]
    return BooleanQuery(clauses)


# ---------------------------------------------------------------------------
# posting-row access with block-directory skipping
# ---------------------------------------------------------------------------


def _decode_part_blocks(p, blks: np.ndarray, want_tfs: bool = True):
    """Batch-decode a sorted subset of one posting row's 128-doc blocks.

    One width-grouped `decode_blocks` pass per stream instead of a per-block
    Python `decode_block` loop (VERDICT r2 "What's wrong #2").  Returns
    (absolute doc ids, tfs or None, global posting indices); doc ids are
    reconstructed with a segmented cumsum restarted at each block's base
    (= previous block's max doc from the block directory)."""
    from .codec import BLOCK_SIZE, decode_blocks

    bmax = np.asarray(p.row["block_max_doc"], dtype=np.int64)
    dboff = np.asarray(p.row["block_doc_boff"], dtype=np.int64)
    counts = np.minimum(p.df - blks * BLOCK_SIZE, BLOCK_SIZE)
    deltas, starts = decode_blocks(p.row["docs_blob"], dboff, blks, counts)
    d = deltas.astype(np.int64)
    bases = np.where(blks > 0, bmax[np.maximum(blks - 1, 0)], 0)
    d[starts[:-1]] += bases
    csum = np.cumsum(d)
    prev = np.concatenate(([0], csum[starts[1:-1] - 1]))
    docs = csum - np.repeat(prev, counts)
    pidx = np.repeat(blks * BLOCK_SIZE, counts) + (
        np.arange(docs.size, dtype=np.int64) - np.repeat(starts[:-1], counts)
    )
    tfs = None
    if want_tfs:
        tboff = np.asarray(p.row["block_tf_boff"], dtype=np.int64)
        tfs, _ = decode_blocks(p.row["tfs_blob"], tboff, blks, counts)
        tfs = tfs.astype(np.int64)
    return docs, tfs, pidx


class PostingRow:
    """One (term, segment) posting row with lazy, block-sliced decoding."""

    __slots__ = ("row", "_docs", "_tfs", "df")

    def __init__(self, row):
        self.row = row
        self._docs = None
        self._tfs = None
        self.df = int(row["df"])

    def docs(self) -> np.ndarray:
        if self._docs is None:
            from .codec import decode_stream

            deltas = decode_stream(
                self.row["docs_blob"],
                np.asarray(self.row["block_doc_boff"], dtype=np.int64),
                self.df,
            )
            self._docs = np.cumsum(deltas.astype(np.int64))
        return self._docs

    def tfs(self) -> np.ndarray:
        if self._tfs is None:
            from .codec import decode_stream

            self._tfs = decode_stream(
                self.row["tfs_blob"],
                np.asarray(self.row["block_tf_boff"], dtype=np.int64),
                self.df,
            ).astype(np.int64)
        return self._tfs

    def norms(self) -> np.ndarray:
        return np.frombuffer(self.row["norms_blob"], dtype=np.uint8)

    def lookup(self, candidates: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
        """Return (mask over candidates, posting index of hits).

        Decodes only the 128-doc blocks that may contain a candidate, using
        the block directory + byte offsets (the skip-list analog).
        """
        bmax = np.asarray(self.row["block_max_doc"], dtype=np.int64)
        nblocks = bmax.size
        need = np.unique(np.searchsorted(bmax, candidates, side="left"))
        need = need[need < nblocks]
        if need.size == 0:
            return np.zeros(candidates.size, dtype=bool), np.zeros(0, dtype=np.int64)
        # break-even ~25%: a gathered subset decode costs ~4.5x per value vs
        # the whole-stream reshape fast path (BENCH/CODEC_MICRO.md §3)
        if self._docs is not None or need.size > nblocks * 0.25 or nblocks <= 2:
            docs = self.docs()
            idx = np.searchsorted(docs, candidates)
            idx_c = np.minimum(idx, docs.size - 1)
            mask = docs[idx_c] == candidates
            return mask, idx_c[mask]
        # batch-decode only the needed blocks in one width-grouped pass;
        # blocks hold disjoint ascending doc ranges, so the concatenation is
        # globally sorted and one searchsorted resolves every candidate
        docs_sub, _, pidx_flat = _decode_part_blocks(self, need, want_tfs=False)
        ii = np.searchsorted(docs_sub, candidates)
        ii_c = np.minimum(ii, docs_sub.size - 1)
        mask = docs_sub[ii_c] == candidates
        return mask, pidx_flat[ii_c[mask]]


class TermPostings:
    """All posting rows of one term in one segment.

    A freshly-built segment has one row per term; a merged segment may carry
    several *posting-block rows* per term (per-term posting-block splitting
    for skewed/stopword-like terms, north_rule) with disjoint ascending doc
    ranges.  This wrapper presents them as one logical posting list.
    """

    __slots__ = ("parts", "df", "_offsets")

    def __init__(self, rows: list):
        rows = sorted(rows, key=lambda r: r["first_doc"])
        self.parts = [PostingRow(r) for r in rows]
        dfs = [p.df for p in self.parts]
        self.df = int(sum(dfs))
        self._offsets = np.concatenate(([0], np.cumsum(dfs)))

    @property
    def row(self):  # term-level stats for upper bounds
        if len(self.parts) == 1:
            return self.parts[0].row
        return {
            "max_tf": max(p.row["max_tf"] for p in self.parts),
            "min_len": min(p.row["min_len"] for p in self.parts),
        }

    def docs(self) -> np.ndarray:
        if len(self.parts) == 1:
            return self.parts[0].docs()
        return np.concatenate([p.docs() for p in self.parts])

    def tfs(self) -> np.ndarray:
        if len(self.parts) == 1:
            return self.parts[0].tfs()
        return np.concatenate([p.tfs() for p in self.parts])

    def norms(self) -> np.ndarray:
        if len(self.parts) == 1:
            return self.parts[0].norms()
        return np.concatenate([p.norms() for p in self.parts])

    def positions_flat(self) -> tuple[np.ndarray, np.ndarray]:
        """(flat absolute positions, posting index per position) across parts."""
        from .codec import decode_positions_flat

        flats, idxs = [], []
        for off, p in zip(self._offsets[:-1], self.parts):
            f, di = decode_positions_flat(p.row["pos_blob"], p.tfs())
            flats.append(f)
            idxs.append(di + off)
        return np.concatenate(flats), np.concatenate(idxs)

    def lookup(self, candidates: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
        if len(self.parts) == 1:
            return self.parts[0].lookup(candidates)
        mask = np.zeros(candidates.size, dtype=bool)
        pidx = np.zeros(candidates.size, dtype=np.int64)
        for off, p in zip(self._offsets[:-1], self.parts):
            m, pi = p.lookup(candidates)
            pidx[m] = pi + off
            mask |= m
        return mask, pidx[mask]


# ---------------------------------------------------------------------------
# per-segment clause scorers
# ---------------------------------------------------------------------------


def _term_weight(plan: QueryPlan, term: str, boost: float = 1.0) -> np.float32:
    return bm25.weight_value(
        plan.idf.get(term, np.float32(0.0)), boost=boost, k1=plan.k1
    )


def _score_posting(
    pr: PostingRow, idx: np.ndarray, wv: np.float32, plan: QueryPlan,
    term: str | None = None,
) -> np.ndarray:
    tfs = pr.tfs()[idx]
    norms = pr.norms()[idx]
    if plan.sim == "classic":
        from . import classic

        return classic.score_term(tfs, norms, plan.classic_value[term])
    if plan.sim.startswith("sweetspot"):
        from . import sweetspot

        return sweetspot.score_term(
            tfs, norms, plan.classic_value[term], plan.sim)
    if plan.sim in ("lmdirichlet", "lmjm"):
        from . import lm

        return lm.score_term(tfs, norms, plan.lm_values[term], plan.sim)
    if plan.sim.startswith(("dfr", "ib")):
        from . import dfr

        return dfr.score_term(tfs, norms, plan.lm_values[term], plan.sim)
    return bm25.score(tfs, norms, plan.cache, wv)


def _clause_scorer(
    q, rows: dict[str, PostingRow], plan: QueryPlan, boost: float = 1.0
) -> tuple[np.ndarray, np.ndarray]:
    """Return (sorted doc_ids, float32 scores) for one clause in one segment.

    `boost` is the product of boosts on the path from the query root — the
    normalize(topLevelBoost) propagation (Similarity.java:139-141): it folds
    into each leaf's weight BEFORE scoring, never as a post-hoc scale."""
    if isinstance(q, TermQuery):
        pr = rows.get(q.term)
        if pr is None:
            return _EMPTY
        docs = pr.docs()
        scores = _score_posting(
            pr, np.arange(docs.size),
            _term_weight(plan, q.term, boost * q.boost), plan, term=q.term,
        )
        return docs, scores
    if isinstance(q, PhraseQuery):
        return _phrase_scorer(q, rows, plan, boost * q.boost)
    if isinstance(q, MultiPhraseQuery):
        return _multiphrase_scorer(q, rows, plan, boost * q.boost)
    if isinstance(q, BooleanQuery):
        return _bool_scorer(q, rows, plan, boost * q.boost)
    if isinstance(q, ConstScoreTerms):
        parts = [rows[t].docs() for t in q.terms if t in rows]
        if not parts:
            return _EMPTY
        docs = np.unique(np.concatenate(parts))
        return docs, np.full(docs.size, np.float32(boost * q.boost), dtype=np.float32)
    if isinstance(q, ConstScoreMulti):
        parts = [pr.docs() for t, pr in rows.items() if q.matches(t)]
        if not parts:
            return _EMPTY
        docs = np.unique(np.concatenate(parts))
        return docs, np.full(docs.size, np.float32(boost * q.boost), dtype=np.float32)
    if isinstance(q, DisjunctionMaxQuery):
        return _dismax_scorer(q, rows, plan, boost * q.boost)
    if isinstance(q, BoostingQuery):
        # BoostingQuery.java coord: match-only -> 1.0, match+context -> demote
        d, s = _clause_scorer(q.match, rows, plan, boost * q.boost)
        if d.size == 0:
            return _EMPTY
        dc, _ = _clause_scorer(q.context, rows, plan, boost)
        if dc.size:
            in_ctx = np.isin(d, dc, assume_unique=True)
            s = s.copy()
            s[in_ctx] = (s[in_ctx] * np.float32(q.demote)).astype(np.float32)
        return d, s
    if isinstance(q, MatchNoDocsQuery):
        return _EMPTY
    if hasattr(q, "doc_spans"):  # span family: SpanScorer bridge
        from .spans import span_scorer

        return span_scorer(q, rows, plan, boost * q.boost)
    if hasattr(q, "any_step"):  # TermAutomatonQuery: position-DFA scorer
        from .termautomaton import taq_scorer

        return taq_scorer(q, rows, plan, boost)
    raise TypeError(f"unsupported query {type(q)}")


def _dismax_scorer(q: DisjunctionMaxQuery, rows, plan, boost: float = 1.0):
    """score = max + tie*(sum - max), all float32 (DisjunctionMaxScorer)."""
    parts = []
    for sub in q.disjuncts:
        d, s = _clause_scorer(sub, rows, plan, boost)
        if d.size:
            parts.append((d, s))
    if not parts:
        return _EMPTY
    docs = np.unique(np.concatenate([d for d, _ in parts]))
    smax = np.zeros(docs.size, dtype=np.float32)
    ssum = np.zeros(docs.size, dtype=np.float32)
    for d, s in parts:
        pos = np.searchsorted(docs, d)
        np.maximum.at(smax, pos, s)
        ssum[pos] = (ssum[pos] + s).astype(np.float32)
    tie = np.float32(q.tie)
    return docs, (smax + tie * (ssum - smax)).astype(np.float32)


_EMPTY = (np.zeros(0, dtype=np.int64), np.zeros(0, dtype=np.float32))


def _intersect_candidates(
    terms: list[str], rows: dict[str, PostingRow]
) -> tuple[np.ndarray, dict[str, np.ndarray]] | None:
    """Leapfrog: rarest list fully decoded, others probed block-wise.

    Returns (docs present in ALL lists, per-term posting index of each doc).
    """
    prs = []
    for t in set(terms):
        pr = rows.get(t)
        if pr is None:
            return None
        prs.append((t, pr))
    prs.sort(key=lambda tp: tp[1].df)  # cost order: rarest leads (E2)
    lead_t, lead = prs[0]
    cand = lead.docs()
    idxmap: dict[str, np.ndarray] = {lead_t: np.arange(cand.size)}
    for t, pr in prs[1:]:
        if cand.size == 0:
            return None
        mask, pidx = pr.lookup(cand)
        cand = cand[mask]
        for tt in idxmap:
            idxmap[tt] = idxmap[tt][mask]
        idxmap[t] = pidx
    if cand.size == 0:
        return None
    return cand, idxmap


def _bool_scorer(
    q: BooleanQuery, rows, plan, boost: float = 1.0
) -> tuple[np.ndarray, np.ndarray]:
    must = [sub for occ, sub in q.clauses if occ == MUST]
    should = [sub for occ, sub in q.clauses if occ == SHOULD]
    must_not = [sub for occ, sub in q.clauses if occ == MUST_NOT]

    # BooleanWeight.java:299-304: fewer optional clauses than
    # minNrShouldMatch -> no scorer, the query matches NOTHING (this also
    # covers required-only queries carrying msm > 0)
    msm = int(q.min_should_match or 0)
    if msm > len(should):
        return _EMPTY

    if must:
        simple = all(isinstance(m, TermQuery) for m in must)
        if simple:
            hit = _intersect_candidates([m.term for m in must], rows)
            if hit is None:
                return _EMPTY
            docs, idxmap = hit
            scores = np.zeros(docs.size, dtype=np.float32)
            for m in must:
                scores += _score_posting(
                    rows[m.term], idxmap[m.term],
                    _term_weight(plan, m.term, boost * m.boost), plan,
                    term=m.term,
                )
            scores = scores.astype(np.float32)
            # Classic coord(m, maxCoord) == 1 for a pure conjunction
        else:
            docs, scores = None, None
            for m in must:
                d, s = _clause_scorer(m, rows, plan, boost)
                if docs is None:
                    docs, scores = d, s
                else:
                    keep = np.isin(docs, d, assume_unique=True)
                    docs, scores = docs[keep], scores[keep]
                    add = s[np.isin(d, docs, assume_unique=True)]
                    scores = (scores + add).astype(np.float32)
                if docs.size == 0:
                    return _EMPTY
        # msm == 0: ReqOptSumScorer — optional scores added where aligned
        # (E7).  msm > 0: ConjunctionScorer(req, opt) with opt =
        # MinShouldMatchSumScorer (BooleanWeight.java:326-342) — the doc
        # must ALSO match >= msm optional clauses; matching optional
        # scores still sum in clause order
        cnt = np.zeros(docs.size, dtype=np.int64) if msm > 0 else None
        for sh in should:
            d, s = _clause_scorer(sh, rows, plan, boost)
            if d.size:
                pos = np.searchsorted(d, docs)
                pos_c = np.minimum(pos, d.size - 1)
                m = d[pos_c] == docs
                scores[m] = (scores[m] + s[pos_c[m]]).astype(np.float32)
                if cnt is not None:
                    cnt[m] += 1
        if cnt is not None:
            keep = cnt >= msm
            docs, scores = docs[keep], scores[keep]
            if docs.size == 0:
                return _EMPTY
    else:
        # pure disjunction (E3), MaxScore-pruned when plan.prune
        docs, scores = _union_scorer(should, rows, plan, q.min_should_match, boost)
        if docs is None:
            return _EMPTY

    # MUST_NOT: ReqExclScorer (E6)
    for mn in must_not:
        d, _ = _clause_scorer(mn, rows, plan, boost)
        if d.size:
            keep = ~np.isin(docs, d)
            docs, scores = docs[keep], scores[keep]
    if docs.size == 0:
        return _EMPTY
    return docs, scores


def _union_scorer(should, rows, plan, min_should_match: int, boost: float = 1.0):
    """Disjunction with per-doc score sum; optional match-count filter."""
    parts = []
    for sh in should:
        d, s = _clause_scorer(sh, rows, plan, boost)
        if d.size:
            parts.append((d, s))
    if not parts:
        return None, None
    docs = np.unique(np.concatenate([d for d, _ in parts]))
    # float32 sum parity: subscorer scores accumulated in clause order, each
    # addition rounded to float32 (DisjunctionSumScorer sums Java floats)
    scores32 = np.zeros(docs.size, dtype=np.float32)
    counts = np.zeros(docs.size, dtype=np.int64)
    for d, s in parts:
        pos = np.searchsorted(docs, d)
        scores32[pos] = (scores32[pos] + s).astype(np.float32)
        counts[pos] += 1
    if plan.sim == "classic" or plan.sim.startswith("sweetspot"):
        # coord factor: fl(sum) * fl(overlap / maxOverlap), maxOverlap =
        # clause count (DisjunctionSumScorer.java:49, coords table built
        # over maxCoord in BooleanWeight.java:64-78); SweetSpot extends
        # DefaultSimilarity, so it inherits the same real coord
        from . import classic

        scores32 = (scores32 * classic.coord(counts, len(should))).astype(
            np.float32
        )
    if min_should_match > 1:
        keep = counts >= min_should_match
        docs, scores32 = docs[keep], scores32[keep]
    return docs, scores32


def _phrase_scorer(
    q: PhraseQuery, rows, plan, boost: float = 1.0
) -> tuple[np.ndarray, np.ndarray]:
    """Exact phrase: doc intersection, then position alignment (E9/E11)."""
    hit = _intersect_candidates(list(q.terms), rows)
    if hit is None:
        return _EMPTY
    docs, idxmap = hit
    if getattr(q, "slop", 0) > 0:
        return _sloppy_scorer(q, rows, plan, docs, idxmap, boost)
    # two-phase: decode positions only now, only for survivor docs
    keys = None
    for term, qpos in zip(q.terms, q.positions):
        pr = rows[term]
        idx = idxmap[term]
        flat, doc_idx = pr.positions_flat()
        tfs_all = pr.tfs()
        # select positions belonging to survivor postings
        sel = np.isin(doc_idx, idx)
        p = flat[sel] - qpos  # adjusted start position; must be >= 0
        d = doc_idx[sel]
        ok = p >= 0
        p, d = p[ok], d[ok]
        # map posting index -> dense survivor ordinal; key = (ordinal, start)
        # (positions < 2^22 per doc: Arrow batch docs are far smaller)
        ord_of = np.full(tfs_all.size, -1, dtype=np.int64)
        ord_of[idx] = np.arange(idx.size)
        kk = ord_of[d] * (1 << 22) + p
        keys = kk if keys is None else np.intersect1d(keys, kk, assume_unique=True)
        if keys.size == 0:
            return _EMPTY
    survivor_ord = keys >> 22
    freq = np.bincount(survivor_ord, minlength=docs.size)
    m = freq > 0
    wv = bm25.weight_value(_sum_idfs(plan, q.terms), boost=boost, k1=plan.k1)
    # score(doc, phraseFreq): ExactPhraseScorer.java:108-110
    norms = rows[q.terms[0]].norms()[idxmap[q.terms[0]]]
    scores = bm25.score(freq[m].astype(np.float32), norms[m], plan.cache, wv)
    return docs[m], scores


def _sloppy_scorer(
    q: PhraseQuery, rows, plan, docs: np.ndarray,
    idxmap: dict[str, np.ndarray], boost: float = 1.0,
) -> tuple[np.ndarray, np.ndarray]:
    """Sloppy phrase (E10): two-phase like the exact path — doc-level
    conjunction first, then the greedy SloppyPhraseScorer walk per survivor
    (sloppy.sloppy_phrase_freq), score = BM25(doc, sloppyFreq) with the
    phrase's summed idf (SloppyPhraseScorer.java:92-128)."""
    from .sloppy import sloppy_phrase_freq

    term_pos: dict[str, tuple[np.ndarray, np.ndarray]] = {}
    for t in set(q.terms):
        pr = rows[t]
        flat, _doc_idx = pr.positions_flat()
        off = np.concatenate(([0], np.cumsum(pr.tfs())))
        term_pos[t] = (flat, off)
    freqs = np.zeros(docs.size, dtype=np.float32)
    for s in range(docs.size):
        plists = []
        for t in q.terms:
            flat, off = term_pos[t]
            i = int(idxmap[t][s])
            plists.append(flat[off[i]: off[i + 1]])
        freqs[s] = sloppy_phrase_freq(q.terms, q.positions, plists, q.slop)
    m = freqs > 0
    if not m.any():
        return _EMPTY
    wv = bm25.weight_value(_sum_idfs(plan, q.terms), boost=boost, k1=plan.k1)
    norms = rows[q.terms[0]].norms()[idxmap[q.terms[0]]]
    scores = bm25.score(freqs[m], norms[m], plan.cache, wv)
    return docs[m], scores


def _multiphrase_scorer(
    q: MultiPhraseQuery, rows, plan, boost: float = 1.0
) -> tuple[np.ndarray, np.ndarray]:
    """MultiPhraseQuery (MultiPhraseQuery.java:270-350): per slot the
    member terms' postings UNION into one pseudo-term (UnionPostingsEnum —
    doc set = union, positions = deduped union), then exact alignment or
    the sloppy walk run unchanged.  idf folds over every member of every
    slot in declaration order (MultiPhraseWeight allTermStats)."""
    slots: list[list] = []
    for members in q.termsets:
        prs = [rows[t] for t in members if t in rows]
        if not prs:
            return _EMPTY  # a slot with no present member matches nothing
        slots.append(prs)
    # doc-level two-phase: intersect per-slot union doc sets, smallest first
    slot_docs = [
        prs[0].docs() if len(prs) == 1
        else np.unique(np.concatenate([pr.docs() for pr in prs]))
        for prs in slots
    ]
    order = np.argsort([d.size for d in slot_docs], kind="stable")
    cand = slot_docs[order[0]]
    for j in order[1:]:
        cand = np.intersect1d(cand, slot_docs[j], assume_unique=True)
        if cand.size == 0:
            return _EMPTY
    # per-slot (candidate-ordinal, position) pairs, union-deduped
    slot_keys: list[np.ndarray] = []
    for i, prs in enumerate(slots):
        parts_d, parts_p = [], []
        for pr in prs:
            mask, pidx = pr.lookup(cand)
            if not mask.any():
                continue
            flat, doc_idx = pr.positions_flat()
            sel = np.isin(doc_idx, pidx)
            parts_d.append(pr.docs()[doc_idx[sel]])
            parts_p.append(flat[sel])
        if not parts_d:
            return _EMPTY
        d = np.concatenate(parts_d)
        p = np.concatenate(parts_p)
        kk = np.unique(np.searchsorted(cand, d) * (1 << 22) + p)
        slot_keys.append(kk)
    if q.slop > 0:
        freqs = _multiphrase_sloppy(q, cand, slot_keys)
    else:
        keys = None
        for i, kk in enumerate(slot_keys):
            adj = kk - q.positions[i]  # shift start; ordinal bits unharmed
            adj = adj[(kk & ((1 << 22) - 1)) >= q.positions[i]]
            keys = adj if keys is None else np.intersect1d(
                keys, adj, assume_unique=True)
            if keys.size == 0:
                return _EMPTY
        freqs = np.bincount(keys >> 22, minlength=cand.size).astype(np.float32)
    m = freqs > 0
    if not m.any():
        return _EMPTY
    all_terms = [t for members in q.termsets for t in members]
    wv = bm25.weight_value(_sum_idfs(plan, all_terms), boost=boost, k1=plan.k1)
    norms = _norms_for(cand, slots[0])
    scores = bm25.score(freqs[m].astype(np.float32), norms[m], plan.cache, wv)
    return cand[m], scores


def _norms_for(cand: np.ndarray, prs: list) -> np.ndarray:
    """Per-candidate-doc norm bytes, filled from any member posting that
    holds the doc (the norm is a doc property, identical across terms)."""
    first = prs[0].norms()
    out = np.zeros(cand.size, dtype=first.dtype)
    filled = np.zeros(cand.size, dtype=bool)
    for pr in prs:
        mask, pidx = pr.lookup(cand)
        idxs = np.flatnonzero(mask)
        need = ~filled[idxs]
        out[idxs[need]] = pr.norms()[pidx[need]]
        filled[idxs[need]] = True
        if filled.all():
            break
    return out


def _multiphrase_sloppy(
    q: MultiPhraseQuery, cand: np.ndarray, slot_keys: list[np.ndarray]
) -> np.ndarray:
    """Sloppy MultiPhrase: per doc, each slot's deduped union position list
    feeds the greedy SloppyPhraseScorer walk; slots are distinct
    pseudo-terms (no repeats interaction across slots)."""
    from .sloppy import sloppy_phrase_freq

    labels = [f"__slot{i}" for i in range(len(slot_keys))]
    freqs = np.zeros(cand.size, dtype=np.float32)
    slot_ords = [kk >> 22 for kk in slot_keys]
    slot_pos = [kk & ((1 << 22) - 1) for kk in slot_keys]
    for s in range(cand.size):
        plists = []
        empty = False
        for i in range(len(slot_keys)):
            lo = np.searchsorted(slot_ords[i], s)
            hi = np.searchsorted(slot_ords[i], s, side="right")
            if lo == hi:
                empty = True
                break
            plists.append(slot_pos[i][lo:hi])
        if empty:
            continue
        freqs[s] = sloppy_phrase_freq(labels, q.positions, plists, q.slop)
    return freqs


def _sum_idfs(plan: QueryPlan, terms) -> np.float32:
    """Phrase idf = per-term idfs accumulated in float (BM25Similarity:187-198)."""
    acc = np.float32(0.0)
    for t in terms:
        acc = np.float32(acc + plan.idf.get(t, np.float32(0.0)))
    return acc


# ---------------------------------------------------------------------------
# block-max pruning for single-term top-k (rank-neutral)
# ---------------------------------------------------------------------------


def _score_blocks(tp: TermPostings, part_of, blk_of, sel, wv, plan):
    """Batch-score the selected (part, block) pairs: one width-grouped
    decode per part/stream, vectorized BM25 over the concatenation."""
    docs_l, scores_l = [], []
    for pi in np.unique(part_of[sel]):
        p = tp.parts[int(pi)]
        blks = np.sort(blk_of[sel[part_of[sel] == pi]])
        docs, tfs, pidx = _decode_part_blocks(p, blks)
        norms = np.frombuffer(p.row["norms_blob"], dtype=np.uint8)[pidx]
        docs_l.append(docs)
        scores_l.append(bm25.score(tfs, norms, plan.cache, wv))
    return docs_l, scores_l


def _term_blockmax_topk(tp: TermPostings, wv: np.float32, plan: QueryPlan):
    """Block-max WAND for one term (K9), two-phase batched form: decode the
    highest-upper-bound blocks covering >= k postings, set tau = running kth
    score, then batch-decode every remaining block whose bound is NOT
    strictly below tau.  Rank-neutral: the survivor set is a superset of the
    blocks the one-at-a-time walk would decode (tau only rises), and each
    phase is ONE width-grouped decode per stream instead of a per-block
    Python loop (VERDICT r2 "What's wrong #2").

    Per-block upper bound from the block directory (block_max_tf +
    block_min_len): score <= wv*bmtf/(bmtf + k1*((1-b)+b*bminlen/avgdl)) —
    every op is monotone under float32 rounding, so the bound is sound.
    """
    from .codec import BLOCK_SIZE

    ubs_parts = []
    for p in tp.parts:
        bmtf = np.asarray(p.row["block_max_tf"], dtype=np.float32)
        bminl = np.asarray(p.row["block_min_len"], dtype=np.float32)
        c = plan.k1 * ((np.float32(1) - plan.b) + plan.b * bminl / plan.avgdl)
        ubs_parts.append((wv * bmtf / (bmtf + c)).astype(np.float32))
    all_ub = np.concatenate(ubs_parts)
    part_of = np.repeat(
        np.arange(len(tp.parts), dtype=np.int64),
        [u.size for u in ubs_parts],
    )
    blk_of = np.concatenate(
        [np.arange(u.size, dtype=np.int64) for u in ubs_parts]
    )
    dfs = np.array([p.df for p in tp.parts], dtype=np.int64)
    counts = np.minimum(dfs[part_of] - blk_of * BLOCK_SIZE, BLOCK_SIZE)
    def _score_all():
        # whole-stream decode is ONE reshape per stream (RAW8 fast path) —
        # cheaper than a gathered subset once the survivor fraction is high
        # (BENCH/CODEC_MICRO.md §3); still rank-neutral (candidate superset)
        docs = tp.docs()
        scores = bm25.score(tp.tfs(), tp.norms(), plan.cache, wv)
        return docs, scores

    nblocks = all_ub.size
    if nblocks <= 4 or plan.k >= tp.df:
        return _score_all()
    order = np.argsort(-all_ub, kind="stable")
    # phase 1: the smallest ub-desc prefix covering >= k postings
    cum = np.cumsum(counts[order])
    m1 = int(np.searchsorted(cum, plan.k)) + 1
    phase1 = order[:m1]
    docs_l, scores_l = _score_blocks(tp, part_of, blk_of, phase1, wv, plan)
    allsc = np.concatenate(scores_l) if scores_l else np.zeros(0, np.float32)
    if allsc.size >= plan.k:
        tau = np.partition(allsc, allsc.size - plan.k)[allsc.size - plan.k]
        # phase 2: every remaining block that could still beat the kth score
        # (strict <, so boundary ties survive — same rule as the serial walk)
        rest = order[m1:]
        phase2 = rest[~(all_ub[rest] < tau)]
    else:
        phase2 = order[m1:]  # fewer than k postings seen: decode the rest
    if m1 + phase2.size > nblocks // 2:
        return _score_all()  # pruning didn't bite: bulk decode wins
    if phase2.size:
        d2, s2 = _score_blocks(tp, part_of, blk_of, phase2, wv, plan)
        docs_l += d2
        scores_l += s2
    if not docs_l:
        return _EMPTY
    return np.concatenate(docs_l), np.concatenate(scores_l)


# ---------------------------------------------------------------------------
# MaxScore pruning for pure disjunctions (rank-neutral)
# ---------------------------------------------------------------------------


def _term_upper_bound(row, wv: np.float32, plan: QueryPlan) -> np.float32:
    """score <= wv * max_tf / (max_tf + cache(min_len)) — monotone-rounded."""
    max_tf = np.float32(row["max_tf"])
    min_len = np.float32(row["min_len"])
    c = plan.k1 * ((np.float32(1) - plan.b) + plan.b * min_len / plan.avgdl)
    return np.float32(wv * max_tf / (max_tf + np.float32(c)))


def _or_maxscore(q: BooleanQuery, rows, plan) -> tuple[np.ndarray, np.ndarray]:
    """MaxScore over term-only disjunctions: essential lists scored fully,
    non-essential lists only probed for candidate docs. Exact top-k."""
    tb = [
        (sub.term, q.boost * sub.boost)
        for _, sub in q.clauses
        if isinstance(sub, TermQuery)
    ]
    prs = [(t, b, rows[t]) for t, b in tb if t in rows]
    if not prs:
        return _EMPTY
    ubs = np.array(
        [_term_upper_bound(p.row, _term_weight(plan, t, b), plan) for t, b, p in prs],
        dtype=np.float32,
    )
    order = np.argsort(-ubs, kind="stable")
    prs = [prs[i] for i in order]
    ubs = ubs[order]

    # threshold from the highest-ub list's own top-k
    t0, b0, p0 = prs[0]
    s0 = _score_posting(p0, np.arange(p0.df), _term_weight(plan, t0, b0), plan)
    if s0.size >= plan.k:
        tau = np.partition(s0, s0.size - plan.k)[s0.size - plan.k]
    else:
        tau = np.float32(-1.0)
    # suffix sums of ubs: lists from index j onward can contribute at most suf[j]
    suf = np.cumsum(ubs[::-1])[::-1]
    n_essential = 1
    for j in range(1, len(prs)):
        if suf[j] < tau:
            break
        n_essential = j + 1

    essential = {t for t, _, _ in prs[:n_essential]}
    cand = np.unique(np.concatenate([p.docs() for t, _, p in prs if t in essential]))
    # accumulate in ORIGINAL clause order so float32 sums are bit-identical
    # to the unpruned path / oracle (float addition is not associative)
    scores = np.zeros(cand.size, dtype=np.float32)
    for t, b in tb:
        p = rows.get(t)
        if p is None:
            continue
        if t in essential:
            d = p.docs()
            pos = np.searchsorted(cand, d)
            # the top-ub list was already fully scored for tau — reuse it
            # (same clause, same weight -> bit-identical values)
            s = s0 if t == t0 and b == b0 else _score_posting(
                p, np.arange(d.size), _term_weight(plan, t, b), plan)
            scores[pos] = (scores[pos] + s).astype(np.float32)
        else:
            mask, pidx = p.lookup(cand)
            if mask.any():
                s = _score_posting(p, pidx, _term_weight(plan, t, b), plan)
                scores[mask] = (scores[mask] + s).astype(np.float32)
    return cand, scores


# ---------------------------------------------------------------------------
# top level
# ---------------------------------------------------------------------------


def make_plan(
    index, query, k: int = 10, prune: bool = True,
    after: tuple[float, int] | None = None,
    k1: float = None, b: float = None,
    similarity: str = "bm25", sim_param: float = None,
    df_overrides: dict[str, int] | None = None,
) -> QueryPlan:
    """Bind global stats on the driver (createNormalizedWeight analog).

    k1/b override the BM25 constants per query — the custom-similarity
    surface (BM25Similarity.java:46-58 constructor args); defaults keep the
    reference's 1.2/0.75 and bit parity.  similarity="classic" swaps in
    the TF-IDF chain (classic.py) on the flat term/boolean subset —
    pruning is BM25-shaped, so classic plans run unpruned."""
    query = rewrite(query, index)
    terms = sorted(query_terms(query))
    stats = index.term_dfs(terms) if terms else {}
    if df_overrides:
        # artificial TermContext stats (FuzzyLikeThisQuery.newTermQuery:
        # a df the caller dictates instead of the index's) — only terms
        # that exist keep matching; absent terms stay absent
        stats = {**stats,
                 **{t: v for t, v in df_overrides.items() if t in stats}}
    max_doc = index.max_doc
    idf = {t: bm25.idf(stats[t], max_doc) for t in stats}
    avgdl = bm25.avg_field_length(index.sum_total_term_freq, max_doc)
    tombs = index.tombstone_ref() if hasattr(index, "tombstone_ref") else None
    k1f = bm25.K1 if k1 is None else np.float32(k1)
    bf = bm25.B if b is None else np.float32(b)
    sim, cvalues, lmv = "bm25", None, None
    if similarity == "classic":
        from . import classic

        clause_terms, boosts = _classic_flat_terms(query)
        cvalues = classic.term_values(clause_terms, stats, max_doc, boosts)
        sim, prune = "classic", False
    elif similarity.startswith("sweetspot"):
        # SweetSpotSimilarity (sweetspot.py): a DefaultSimilarity subclass —
        # the weight chain (idf, queryNorm, coord) IS classic.py's; only
        # tf and the length norm differ (SweetSpotSimilarity.java:104-229)
        from . import classic, sweetspot

        sweetspot.parse_config(similarity)  # raise early on bad config
        clause_terms, boosts = _classic_flat_terms(query)
        cvalues = classic.term_values(clause_terms, stats, max_doc, boosts)
        sim, prune = similarity, False
    elif similarity in ("lmdirichlet", "lmjm"):
        # LM chain (lm.py): same flat term/boolean subset as Classic;
        # coord is the Similarity.java:122 default 1.0, so boolean
        # composition is the engine's plain clause-ordered float32 sum.
        from . import lm

        clause_terms, boosts = _classic_flat_terms(query)
        ttfs = index.term_ttfs(clause_terms)
        nft = index.sum_total_term_freq
        param = (
            np.float32(sim_param) if sim_param is not None
            else (lm.DEFAULT_MU if similarity == "lmdirichlet"
                  else lm.DEFAULT_LAMBDA)
        )
        lmv = {
            t: (lm.collection_probability(ttfs[t], nft),
                np.float32(boosts.get(t, 1.0)), param)
            for t in clause_terms if t in ttfs
        }
        sim, prune = similarity, False
    elif similarity.startswith(("dfr", "ib")):
        # DFR / IB families (dfr.py): validated config, same flat subset
        from . import dfr as dfrmod

        dfrmod.parse_config(similarity)  # raise early on bad config
        clause_terms, boosts = _classic_flat_terms(query)
        ttfs = index.term_ttfs(clause_terms)
        nft = index.sum_total_term_freq
        # fillBasicStats: avgFieldLength = (float) nft / numberOfDocuments
        # (float / long promotes the long to float first)
        avgfl = np.float32(np.float32(nft) / np.float32(max_doc))
        lmv = {
            t: (stats[t], ttfs[t], max_doc, nft, avgfl,
                np.float32(boosts.get(t, 1.0)),
                None if sim_param is None else float(sim_param))
            for t in clause_terms if t in ttfs
        }
        sim, prune = similarity, False
    elif similarity != "bm25":
        raise ValueError(f"unknown similarity {similarity!r}")
    return QueryPlan(
        query=query, k=k, idf=idf, cache=bm25.norm_cache(avgdl, k1f, bf),
        avgdl=avgdl, prune=prune, after=after, tombstones=tombs, k1=k1f, b=bf,
        sim=sim, classic_value=cvalues, lm_values=lmv,
    )


def _classic_flat_terms(q) -> tuple[list[str], dict[str, float]]:
    """The Classic-similarity query subset: TermQuery, or a flat
    BooleanQuery over TermQuery leaves that is pure-SHOULD or pure-MUST
    (+ MUST_NOT).  Returns scoring terms in CLAUSE order (the
    sumOfSquaredWeights accumulation order, BooleanWeight.java:94-107)
    with per-term boosts; anything else raises."""
    if isinstance(q, TermQuery):
        return [q.term], {q.term: q.boost}
    if isinstance(q, BooleanQuery):
        scoring = [(o, s) for o, s in q.clauses if o != MUST_NOT]
        occurs = {o for o, _ in scoring}
        if (
            len(occurs) == 1
            and all(isinstance(s, TermQuery) for _, s in scoring)
            and all(isinstance(s, TermQuery)
                    for o, s in q.clauses if o == MUST_NOT)
        ):
            terms = [s.term for _, s in scoring]
            return terms, {s.term: s.boost for _, s in scoring}
    raise ValueError(
        "classic similarity covers TermQuery and flat pure-SHOULD/pure-MUST "
        "boolean queries over terms (see classic.py docstring)"
    )


def _posting_filter(terms: list[str], multis: list[ConstScoreMulti]):
    """Catalyst predicate selecting the query's posting rows.

    Exact terms -> `term IN (...)`; each multi-term predicate -> its term
    RANGE (regex refinement stays in the UDF).  Both shapes push to the
    parquet scan and prune row groups via the sorted-term min/max stats —
    executor-side expansion, no driver enumeration (VERDICT r1 #1)."""
    pred = None
    if terms:
        pred = F.col("term").isin(terms)
    for m in multis:
        p = None
        if m.lower is not None:
            p = F.col("term") >= m.lower if m.include_lower else F.col("term") > m.lower
        if m.upper is not None:
            p2 = F.col("term") <= m.upper if m.include_upper else F.col("term") < m.upper
            p = p2 if p is None else (p & p2)
        if p is None:
            p = F.lit(True)  # unbounded (`*`): every term row
        pred = p if pred is None else (pred | p)
    return pred


def _group_rows(pdf: pd.DataFrame) -> dict[str, TermPostings]:
    by_term: dict[str, list] = {}
    for _, r in pdf.iterrows():
        by_term.setdefault(r["term"], []).append(r)
    return {t: TermPostings(rs) for t, rs in by_term.items()}


def _apply_live_docs(docs: np.ndarray, scores: np.ndarray, plan: QueryPlan):
    """E14: push tombstones into every scorer (acceptDocs analog).

    The tombstone set is loaded executor-side for exactly this result's doc
    range — each segment task reads only its own delete buckets."""
    if plan.tombstones is None or docs.size == 0:
        return docs, scores
    from .indexer import load_tombstones

    deleted = load_tombstones(
        plan.tombstones[0], plan.tombstones[1], int(docs[0]), int(docs[-1])
    )
    if deleted.size == 0:
        return docs, scores
    idx = np.searchsorted(deleted, docs)
    idx_c = np.minimum(idx, deleted.size - 1)
    dead = deleted[idx_c] == docs
    return docs[~dead], scores[~dead]


def _score_in_segment(
    rows: dict[str, TermPostings], plan: QueryPlan
) -> tuple[np.ndarray, np.ndarray]:
    """One query against one segment's decoded posting rows -> (docs, scores).

    Shared by the single-query and batched paths; picks the rank-neutral
    pruned path (block-max WAND / MaxScore) when applicable."""
    q = plan.query
    if (
        plan.prune
        and plan.tombstones is None
        and plan.after is None
        and isinstance(q, TermQuery)
        and q.term in rows
    ):
        docs, scores = _term_blockmax_topk(
            rows[q.term], _term_weight(plan, q.term, q.boost), plan
        )
    elif (
        plan.prune
        and plan.tombstones is None
        and plan.after is None  # MaxScore's tau is the UNFILTERED kth
        # score — under searchAfter the page needs exactly the below-tau
        # docs the pruning skips, so paging must take the exact path
        and isinstance(q, BooleanQuery)
        and all(o == SHOULD and isinstance(s, TermQuery) for o, s in q.clauses)
        and q.min_should_match <= 1
        and len({s.term for _, s in q.clauses}) == len(q.clauses)
    ):
        docs, scores = _or_maxscore(q, rows, plan)
    else:
        docs, scores = _clause_scorer(q, rows, plan)
        docs, scores = _apply_live_docs(docs, scores, plan)
    if plan.after is not None and docs.size:
        # K4 searchAfter: strictly after the cursor in (score desc, doc asc)
        s_after = np.float32(plan.after[0])
        d_after = int(plan.after[1])
        keep = (scores < s_after) | ((scores == s_after) & (docs > d_after))
        docs, scores = docs[keep], scores[keep]
    return docs, scores


def _segment_topk(pdf: pd.DataFrame, plan: QueryPlan) -> pd.DataFrame:
    rows = _group_rows(pdf)
    docs, scores = _score_in_segment(rows, plan)
    if docs.size == 0:
        return pd.DataFrame({"doc_id": pd.Series(dtype="int64"),
                             "score": pd.Series(dtype="float32")})
    # K2: top-k by (-score, doc_id) — equivalent to TopScoreDocCollector's
    # heap with HitQueue tie-break (reject equal when full => lowest doc ids
    # survive among equal scores)
    order = np.lexsort((docs, -scores.astype(np.float64)))[: plan.k]
    return pd.DataFrame({"doc_id": docs[order], "score": scores[order]})


def _index_version(index) -> tuple:
    """Cache-coherence key: changes whenever a commit/append/merge/delete
    publishes new state (the searcher-reopen point)."""
    meta = getattr(index, "meta", {})
    live = meta.get("live_segments")
    return (
        meta.get("built_unix"), meta.get("stream_epoch", 0),
        meta.get("delete_epoch", 0),
        tuple(meta.get("stats_dirs", (meta.get("stats_dir", "term_stats"),))),
        tuple(live) if live is not None else None, meta.get("max_doc"),
    )


# the scorer-facing posting projection (pos_blob appended only for
# position-consuming queries — _has_phrase); ONE list so every scan site
# (per-segment top-k, batched search, full scores) stays in lockstep
POSTING_COLS = (
    "seg", "term", "first_doc", "df", "max_tf", "min_len", "docs_blob",
    "tfs_blob", "norms_blob", "block_max_doc", "block_max_tf",
    "block_min_len", "block_doc_boff", "block_tf_boff",
)

_RESULT_CACHE_MAX = 1024


def per_segment_topk_df(index, plan: "QueryPlan") -> DataFrame | None:
    """The per-leaf collector stage as a DataFrame: posting rows for the
    plan's (post-rewrite) query, grouped by segment, each group scored by
    `_segment_topk`.  Returns None for a no-op query (no terms, no
    multi-term predicates, or MatchNoDocs).  Shared by `search` (single
    index: K2 per-leaf top-k) and `shards.sharded_search` (scatter phase:
    every shard contributes its per-segment rows to one global merge)."""
    q = plan.query  # post-rewrite (multi-term expansion)
    terms = sorted(query_terms(q))
    multis = query_multis(q)
    if (not terms and not multis) or isinstance(q, MatchNoDocsQuery):
        return None
    posting_cols = list(POSTING_COLS)
    if _has_phrase(q):  # covers PhraseQuery itself
        posting_cols.append("pos_blob")
    rows = (
        index.postings()
        .filter(_posting_filter(terms, multis))
        .select(*posting_cols)
    )
    if not multis:
        # bloom sidecar fast-fail (lucene/codecs/bloom): prune `seg`
        # partitions the query provably cannot match.  Query-shape-aware
        # (VERDICT r3 missing #2): conjunctions and phrases require ALL
        # their terms MAYBE per segment — an AND of a present and an
        # absent term scans zero segments — while SHOULD trees keep the
        # any-term rule and msm counts live disjuncts.  Multi-term
        # predicates bypass the filters entirely (a range can match
        # terms the bloom never saw asked).
        from .bloom import prune_segments_query

        surv = prune_segments_query(index, q)
        if surv is not None:
            rows = rows.filter(F.col("seg").isin(surv))
    return rows.groupBy("seg").applyInPandas(
        lambda pdf: _segment_topk(pdf, plan), RESULT_SCHEMA
    )


DECODED_SCHEMA = T.StructType(
    [
        T.StructField("seg", T.LongType()),
        T.StructField("term", T.StringType()),
        T.StructField("doc_id", T.LongType()),
        T.StructField("tf", T.LongType()),
        T.StructField("norm", T.IntegerType()),
        # NORM_TABLE[norm] pre-decoded (float32): lets the scorer compute
        # cache[norm] as a 4-op float expression instead of a 256-literal
        # element_at (256 py4j calls + analyzer cost PER QUERY)
        T.StructField("ntv", T.FloatType()),
        # absolute token positions per (term, doc) — lets exact phrases run
        # columnar too; the cached relation is columnar, so term/AND/OR
        # queries never read these batches (column pruning)
        T.StructField("pos", T.ArrayType(T.IntegerType())),
    ]
)

_DECODE_COLS = [
    "seg", "term", "first_doc", "df", "docs_blob", "tfs_blob", "norms_blob",
    "block_doc_boff", "block_tf_boff", "pos_blob",
]


def decode_postings_df(
    df: DataFrame, num_partitions: int, positions: bool = True
) -> DataFrame:
    """Explode posting rows to columnar (seg, term, doc_id, tf, norm, ntv
    [, pos]).

    The serving-mode decode pass behind `Index.pin(decoded=True)`: ONE
    Arrow-batched mapInPandas over the posting rows (the same PostingRow
    decode the scorers use), hash-partitioned by doc_id so per-doc score
    aggregation (`_columnar_topk`) runs exchange-free.  At cluster scale
    the decoded form costs ~6-10 bytes/posting in the columnar cache
    (delta/RLE compressed) vs ~1-2 for the blobs — the classic serving
    trade: Lucene keeps decoded-on-demand postings hot in the page cache,
    a columnar engine keeps them hot as columns.

    `positions=True` also decodes per-posting absolute position lists
    (~4 bytes/token extra in the cache) so exact phrases serve columnar
    too (`_columnar_phrase_topk`); term/AND/OR queries never read those
    batches (in-memory column pruning).  Pass False on memory-tight
    deployments — phrases then fall back to the Pandas two-phase scorer."""

    def explode(it):
        from .codec import decode_positions_flat

        for pdf in it:
            outs = []
            for r in pdf.to_dict("records"):
                pr = PostingRow(r)
                docs = pr.docs()
                norms = pr.norms()
                tfs = pr.tfs()
                cols = {
                    "seg": np.full(docs.size, int(r["seg"]),
                                   dtype=np.int64),
                    "term": np.full(docs.size, r["term"], dtype=object),
                    "doc_id": docs,
                    "tf": tfs,
                    "norm": norms.astype(np.int32),
                    "ntv": NORM_TABLE[norms],
                }
                if positions:
                    # per-posting absolute position lists: one bulk varint
                    # decode, then a boundary split (flat is
                    # posting-ordered)
                    flat, _ = decode_positions_flat(r["pos_blob"], tfs)
                    cols["pos"] = (
                        np.split(flat.astype(np.int32), np.cumsum(tfs)[:-1])
                        if docs.size
                        else []
                    )
                outs.append(pd.DataFrame(cols))
            if outs:
                yield pd.concat(outs, ignore_index=True)

    schema = DECODED_SCHEMA if positions else T.StructType(
        [f for f in DECODED_SCHEMA.fields if f.name != "pos"]
    )
    cols = _DECODE_COLS if positions else [
        c for c in _DECODE_COLS if c != "pos_blob"
    ]
    return (
        df.select(*cols)
        .mapInPandas(explode, schema)
        .repartition(num_partitions, "doc_id")
    )


def _columnar_clauses(plan: "QueryPlan"):
    """Eligibility check for the columnar (Python-free) serving path.

    Returns (mode, [(clause_boost, term), ...], must_not_terms, extra) when
    the query is a shape the declarative scorer reproduces BIT-EXACTLY —
    a TermQuery, a flat BooleanQuery of TermQuery leaves (pure-MUST,
    pure-SHOULD with minShouldMatch, or MUST+SHOULD where msm>0 FILTERS —
    >= msm optionals must also match, BooleanWeight.java:326-342; plus
    MUST_NOT), or a flat DisjunctionMaxQuery of TermQuery disjuncts —
    else None.  `extra` is msm for "or", the (MUST-count, msm) pair for
    "mix" (clauses list MUST-first, mirroring _bool_scorer's fold
    order), and the tie-break multiplier for "dismax".  Standalone exact
    phrases have their own columnar path (`_columnar_phrase_topk`);
    sloppy/multi phrases, spans, multi-term rewrites, non-BM25
    similarities, live tombstones, and non-finite norm caches (b=0's
    0*inf NaN) all route to the Pandas scorers."""
    if plan.sim != "bm25" or plan.tombstones is not None:
        return None
    # cache[0] is +inf by design (NORM_TABLE[0] = Infinity, byte 0): the
    # divide yields 0.0f identically in both engines.  Only NaN (b=0's
    # 0*inf) is excluded — SQL ordering and numpy lexsort disagree on NaN.
    if np.isnan(plan.cache).any():
        return None
    q = plan.query
    if isinstance(q, TermQuery):
        return "or", [(q.boost, q.term)], [], 0
    if isinstance(q, DisjunctionMaxQuery):
        if not q.disjuncts or not all(
            isinstance(s, TermQuery) for s in q.disjuncts
        ):
            return None
        return (
            "dismax",
            [(q.boost * s.boost, s.term) for s in q.disjuncts],
            [],
            float(q.tie),
        )
    if not isinstance(q, BooleanQuery):
        return None
    must, should, must_not = [], [], []
    for occ, sub in q.clauses:
        if not isinstance(sub, TermQuery):
            return None
        if occ == MUST:
            must.append((q.boost * sub.boost, sub.term))
        elif occ == SHOULD:
            should.append((q.boost * sub.boost, sub.term))
        elif occ == MUST_NOT:
            must_not.append(sub.term)
        else:  # FILTER and anything else: pandas path
            return None
    msm = int(q.min_should_match or 0)
    if must and should:
        # reference semantics (BooleanWeight.java:326-342): msm == 0
        # builds ReqOptSumScorer (optionals score but never filter);
        # msm > 0 builds ConjunctionScorer(req, opt) — the doc must ALSO
        # match >= msm optional clauses.  extra carries both counts
        return "mix", must + should, must_not, (len(must), msm)
    if must:
        if msm > 0:
            # required-only with msm > #optionals matches NOTHING
            # (BooleanWeight.java:299-304) — the Pandas path returns the
            # correct empty result
            return None
        return "and", must, must_not, 0
    if should:
        return "or", should, must_not, msm
    return None


def _clause_match_pred(mode: str, extra, names: list[str]):
    """Keep-predicate over per-clause max-score columns (NULL = the doc
    missed that clause): ALL present for "and"; for "mix" the MUST prefix
    complete AND — when msm > 0 — the SHOULD suffix reaching msm
    (ConjunctionScorer(req, opt), BooleanWeight.java:326-342); >= 1 for
    "dismax"; >= msm for "or".  Shared by the single-query and batched
    columnar paths so the mix/msm semantics live in exactly one place."""

    def cnt(nms):
        e = None
        for n in nms:
            c = F.col(n).isNotNull().cast("int")
            e = c if e is None else e + c
        return e

    if mode == "mix":
        n_must, msm = extra
        keep = cnt(names[:n_must]) >= F.lit(n_must)
        if msm > 0:
            keep = keep & (cnt(names[n_must:]) >= F.lit(msm))
        return keep
    if mode == "and":
        need = len(names)
    elif mode == "dismax":
        need = 1
    else:
        need = max(extra, 1)
    return cnt(names) >= F.lit(need)


def _columnar_hits(index, plan: "QueryPlan") -> DataFrame | None:
    """ALL matching (doc_id, score) rows for a columnar-eligible query as
    ONE declarative plan over the decoded cache — no Python stage, no
    exchange (the cache is pre-partitioned by doc_id).  `_columnar_topk`
    puts TakeOrderedAndProject on top; `scores` serves it uncut, which
    makes the whole /select filter-then-rank flow Python-free too.

    Float32 parity with the Pandas scorers (and therefore with Lucene):
    per-posting score = fl(wv * tf) / fl(tf + cache[norm]) — Spark FloatType
    multiply/add are JVM float ops; the divide promotes to double and casts
    back, which equals float division exactly (double's 53-bit mantissa
    > 2*24+2, Figueroa's innocuous-double-rounding bound).  Boolean scores
    fold per doc in CLAUSE ORDER with a float32 cast per addition — the
    same left fold DisjunctionSumScorer/_union_scorer run."""
    decoded = getattr(index, "decoded_postings", lambda: None)()
    if decoded is None:
        return None
    spec = _columnar_clauses(plan)
    if spec is None:
        return None
    mode, clauses, must_not, extra = spec
    terms = sorted({t for _, t in clauses})
    # cache[norm] recomputed from the pre-decoded NORM_TABLE value with
    # bm25.norm_cache's EXACT float32 op chain — ((b*nt)/avgdl + (1-b))*k1,
    # one float32 rounding per op (every literal is an exact float32, so
    # the .cast("float") is lossless; the divide promotes to double and
    # casts back, which equals float division — see _columnar_topk doc)
    tf_f = F.col("tf").cast("float")
    bf = F.lit(float(plan.b)).cast("float")
    one_minus_b = F.lit(float(np.float32(1.0) - plan.b)).cast("float")
    k1f = F.lit(float(plan.k1)).cast("float")
    avgdl_f = F.lit(float(plan.avgdl)).cast("float")
    norm_f = (
        k1f
        * (one_minus_b + ((bf * F.col("ntv")) / avgdl_f).cast("float"))
    )
    # clause weights as LITERAL case/explode expressions, never a join: a
    # per-query BroadcastExchange costs ~0.35s of pure latency (measured),
    # a literal branch costs nothing.  A term can appear in several
    # clauses, so each branch carries the (cidx, wv) list of the clauses
    # naming it and explodes — one generator row per (posting, clause).
    by_term: dict[str, list] = {}
    for i, (boost, t) in enumerate(clauses):
        by_term.setdefault(t, []).append(
            (i, float(_term_weight(plan, t, boost)))
        )
    # MUST_NOT terms ride the SAME scan as marker rows (cidx=-1, wv=0):
    # adding 0.0f is exact identity in the fold, and the doc drops on the
    # _mn flag — no per-query anti-join (a join means a BroadcastExchange,
    # ~0.35s of pure latency)
    for t in must_not:
        by_term.setdefault(t, []).append((-1, 0.0))
    all_terms = sorted(by_term)
    matched = decoded.filter(F.col("term").isin(all_terms))
    # single-disjunct dismax still needs the max(0, s) clamp (the Pandas
    # scorer's zero-initialized running max), so it skips this fast path;
    # a lone SHOULD clause with msm >= 2 matches NOTHING (the general
    # path's need > attainable count) and must not shortcut to all-matches
    if (len(clauses) == 1 and not must_not and mode != "dismax"
            and not (mode == "or" and extra > 1)):
        wv = F.lit(by_term[terms[0]][0][1]).cast("float")
        s = ((wv * tf_f) / (tf_f + norm_f)).cast("float")
        hits = matched.select("doc_id", s.alias("score"))
    else:
        if all(len(lst) == 1 for lst in by_term.values()):
            # the common case — every term belongs to exactly ONE clause:
            # cidx/wv are plain CASE expressions, no Generate node in the
            # plan (explode would also break the codegen span)
            cidx_e, wv_e = None, None
            for t, lst in by_term.items():
                i, w = lst[0]
                cond = F.col("term") == F.lit(t)
                ce = F.lit(i)
                we = F.lit(w).cast("float")
                cidx_e = F.when(cond, ce) if cidx_e is None else cidx_e.when(cond, ce)
                wv_e = F.when(cond, we) if wv_e is None else wv_e.when(cond, we)
            scored = matched.select(
                "doc_id",
                cidx_e.alias("cidx"),
                ((wv_e * tf_f) / (tf_f + norm_f)).cast("float").alias("s"),
            )
        else:
            pairs = None
            for t, lst in by_term.items():
                arr = F.array(*[
                    F.struct(
                        F.lit(i).alias("cidx"),
                        F.lit(w).cast("float").alias("wv"),
                    )
                    for i, w in lst
                ])
                cond = F.col("term") == F.lit(t)
                pairs = F.when(cond, arr) if pairs is None else pairs.when(cond, arr)
            scored = matched.select(
                "doc_id", tf_f.alias("_tf"), norm_f.alias("_nf"),
                F.explode(pairs).alias("_cw"),
            ).select(
                "doc_id",
                F.col("_cw.cidx").alias("cidx"),
                ((F.col("_cw.wv") * F.col("_tf"))
                 / (F.col("_tf") + F.col("_nf"))).cast("float").alias("s"),
            )
        # one conditional-max aggregate per clause (primitive agg buffers,
        # cheaper than a collect_list+sort+fold), then the clause-order
        # float32 left fold over the per-clause score array — coalescing a
        # missing clause to +0.0f is an exact identity add, so the fold
        # equals _union_scorer's "accumulate present parts in clause
        # order" bit for bit
        n_cl = len(clauses)
        aggs = [
            F.max(F.when(F.col("cidx") == i, F.col("s"))).alias(f"_s{i}")
            for i in range(n_cl)
        ]
        aggs.append(F.max((F.col("cidx") < 0).cast("int")).alias("_mn"))
        grouped = scored.groupBy("doc_id").agg(*aggs)
        # clause-order float32 left fold as a PLAIN add chain (a
        # higher-order F.aggregate falls out of whole-stage codegen):
        # float+float is one JVM float op per step, and coalescing a
        # missing clause to +0.0f is an exact identity add
        zero_f = F.lit(0.0).cast("float")
        score = None
        for i in range(n_cl):
            e = F.coalesce(F.col(f"_s{i}"), zero_f)
            score = e if score is None else score + e
        if mode == "dismax":
            # DisjunctionMaxScorer: fl(max + tie*(sum - max)); the running
            # max is zero-initialized in the Pandas scorer, hence the 0.0f
            # floor; `score` above IS the clause-order ssum fold
            smax = F.greatest(
                zero_f,
                *[F.coalesce(F.col(f"_s{i}"), zero_f) for i in range(n_cl)],
            )
            tie_f = F.lit(float(np.float32(extra))).cast("float")
            score = smax + tie_f * (score - smax)
        # match predicate: shared mix/msm-aware clause counting
        # (_clause_match_pred; clauses are MUST-first for "mix")
        keep = _clause_match_pred(
            mode, extra, [f"_s{i}" for i in range(n_cl)])
        hits = grouped.filter(
            keep & (F.coalesce(F.col("_mn"), F.lit(0)) == 0)
        ).select("doc_id", score.alias("score"))
    return hits


def _after_cut(hits: DataFrame, plan: "QueryPlan") -> DataFrame:
    """searchAfter cursor predicate + the (score desc, doc asc) k-cut —
    the paging-correctness contract shared by every columnar top-k path
    (one definition so the float32-cast literal stays bit-identical)."""
    if plan.after is not None:
        s_after = F.lit(float(np.float32(plan.after[0]))).cast("float")
        hits = hits.filter(
            (F.col("score") < s_after)
            | ((F.col("score") == s_after)
               & (F.col("doc_id") > int(plan.after[1])))
        )
    return hits.orderBy(F.desc("score"), F.asc("doc_id")).limit(plan.k)


def _columnar_topk(index, plan: "QueryPlan") -> DataFrame | None:
    """K1/K2/K3 over `_columnar_hits`: one task wave +
    TakeOrderedAndProject — the pinned serving path's top-k form."""
    hits = _columnar_hits(index, plan)
    if hits is None:
        return None
    return _after_cut(hits, plan)


def _columnar_const_topk(index, plan: "QueryPlan") -> DataFrame | None:
    """Constant-score multi-term top-k (prefix / wildcard-as-prefix / term
    range / explicit term sets) as ONE declarative stage over the decoded
    cache: term predicate (pruned by the in-memory batch min/max stats,
    the FST/term-index analog) -> distinct doc_id (zero exchange — the
    cache is doc_id-partitioned) -> constant float32 score ->
    TakeOrderedAndProject.  Regex-refined ConstScoreMulti stays on the
    Pandas path: Java `rlike` and Python `re.fullmatch` semantics differ
    at the edges, and bit-parity with the engine's own scorer is the
    contract here."""
    q = plan.query
    if plan.tombstones is not None:
        return None
    if isinstance(q, ConstScoreTerms):
        pred = F.col("term").isin(list(q.terms))
    elif isinstance(q, ConstScoreMulti) and q.regex is None:
        pred = F.lit(True)
        if q.lower is not None:
            pred = pred & (
                F.col("term") >= q.lower
                if q.include_lower
                else F.col("term") > q.lower
            )
        if q.upper is not None:
            pred = pred & (
                F.col("term") <= q.upper
                if q.include_upper
                else F.col("term") < q.upper
            )
    else:
        return None
    decoded = getattr(index, "decoded_postings", lambda: None)()
    if decoded is None:
        return None
    score = F.lit(float(np.float32(q.boost))).cast("float")
    hits = (
        decoded.filter(pred)
        .groupBy("doc_id")
        .agg(F.lit(1).alias("_m"))
        .select("doc_id", score.alias("score"))
    )
    return _after_cut(hits, plan)


def _columnar_phrase_topk(index, plan: "QueryPlan") -> DataFrame | None:
    """Exact-phrase top-k as ONE declarative stage over the decoded cache.

    Eligibility: a standalone slop-0 PhraseQuery under BM25 with no live
    tombstones and a finite norm cache (same gates as `_columnar_clauses`);
    MultiPhrase, sloppy, and phrase-in-boolean stay on the Pandas path.

    Shape: the cache's (term, doc, pos[]) rows for the phrase terms pivot
    per doc via conditional-first aggregates (the cache is pre-partitioned
    by doc_id — zero exchange), then phraseFreq is a JVM array expression:
    count of starts p in the first term's position list with
    p - qpos0 + qpos_i present in term_i's list for every i (the same
    |∩(pos_i - i)| the Pandas `_phrase_scorer` computes).  freq is an
    exact small integer, so the float32 score chain is bit-identical to
    `bm25.score` (see `_columnar_topk` on the divide-via-double bound)."""
    decoded = getattr(index, "decoded_postings", lambda: None)()
    if decoded is None:
        return None
    hits = _columnar_phrase_hits(decoded, plan)
    if hits is None:
        return None
    return _after_cut(hits, plan)


def _columnar_phrase_hits(decoded, plan: "QueryPlan") -> DataFrame | None:
    """(doc_id, score) hits for an eligible standalone exact phrase over
    the decoded cache (see `_columnar_phrase_topk`); None if ineligible."""
    q = plan.query
    if (
        not isinstance(q, PhraseQuery)
        or getattr(q, "slop", 0) > 0
        or plan.sim != "bm25"
        or plan.tombstones is not None
        or np.isnan(plan.cache).any()
    ):
        return None
    if "pos" not in decoded.columns:
        return None
    terms = list(dict.fromkeys(q.terms))  # distinct, first-seen order
    t2j = {t: j for j, t in enumerate(terms)}
    matched = decoded.filter(F.col("term").isin(terms))
    # pivot: one position-array column per distinct term.  first() with
    # ignorenulls is deterministic here — a (term, doc) pair occurs on
    # exactly one cache row
    aggs = [
        F.first(F.when(F.col("term") == t, F.col("pos")), ignorenulls=True)
        .alias(f"_p{j}")
        for t, j in t2j.items()
    ]
    aggs.append(F.first("ntv", ignorenulls=True).alias("ntv"))
    g = matched.groupBy("doc_id").agg(*aggs)
    present = None
    for j in range(len(terms)):
        e = F.col(f"_p{j}").isNotNull()
        present = e if present is None else present & e
    g = g.filter(present)
    q0 = int(q.positions[0])
    base = F.col(f"_p{t2j[q.terms[0]]}")

    def aligned(p):
        cond = (p >= q0) if q0 else F.lit(True)
        for t, qp in list(zip(q.terms, q.positions))[1:]:
            cond = cond & F.array_contains(
                F.col(f"_p{t2j[t]}"), p - q0 + int(qp)
            )
        return cond

    pf = F.size(F.filter(base, aligned))
    wv = bm25.weight_value(
        _sum_idfs(plan, q.terms), boost=q.boost, k1=plan.k1
    )
    pf_f = pf.cast("float")
    bf = F.lit(float(plan.b)).cast("float")
    one_minus_b = F.lit(float(np.float32(1.0) - plan.b)).cast("float")
    k1f = F.lit(float(plan.k1)).cast("float")
    avgdl_f = F.lit(float(plan.avgdl)).cast("float")
    norm_f = (
        k1f * (one_minus_b + ((bf * F.col("ntv")) / avgdl_f).cast("float"))
    )
    score = (
        (F.lit(float(wv)).cast("float") * pf_f) / (pf_f + norm_f)
    ).cast("float")
    return g.filter(pf > 0).select("doc_id", score.alias("score"))


def search(
    index, query_or_text, k: int = 10, prune: bool = True,
    after: tuple[float, int] | None = None,
    k1: float = None, b: float = None,
    use_cache: bool = False,
    similarity: str = "bm25", sim_param: float = None,
    df_overrides: dict[str, int] | None = None,
) -> DataFrame:
    """Top-k search -> DataFrame(doc_id, score), Lucene-rank-identical.

    `after=(score, doc_id)` pages past a previous hit (searchAfter, K4:
    IndexSearcher.java:315-325).

    `use_cache=True` consults the per-index query-RESULT cache (K7: Solr's
    queryResultCache, SolrIndexSearcher.java:128-129): a hit rebuilds the
    k-row DataFrame from cached rows with ZERO Spark jobs.  Entries are
    keyed by the parsed query + paging/similarity params AND the index
    version (commit epoch / live segments / deletes), so any reopen-worthy
    state change invalidates naturally — same lifecycle as Lucene's
    per-reader LRUQueryCache.  Off by default: the engine's plans are
    already zero-job to construct, so caching only pays on repeated
    identical queries."""
    q = (parse(query_or_text, analyzer=getattr(index, "analyzer", None))
         if isinstance(query_or_text, str) else query_or_text)
    cache_key = None
    if use_cache:
        cache = getattr(index, "_result_cache", None)
        if cache is None:
            from collections import OrderedDict

            cache = index._result_cache = OrderedDict()
        cache_key = (
            repr(q), k, prune, after, k1, b, similarity, sim_param,
            None if df_overrides is None else tuple(sorted(df_overrides.items())),
            _index_version(index),
        )
        hit = cache.get(cache_key)
        if hit is not None:
            cache.move_to_end(cache_key)  # LRU touch (LRUQueryCache.java)
            return index.spark.createDataFrame(hit, RESULT_SCHEMA)
    plan = make_plan(index, q, k, prune, after, k1=k1, b=b,
                     similarity=similarity, sim_param=sim_param,
                     df_overrides=df_overrides)
    # columnar serving fast path (pinned decoded cache, eligible shapes):
    # same top-k, bit-identical scores, zero Python stages
    out = _columnar_topk(index, plan)
    if out is None:
        out = _columnar_phrase_topk(index, plan)
    if out is None:
        out = _columnar_const_topk(index, plan)
    if out is None:
        per_seg = per_segment_topk_df(index, plan)
        if per_seg is None:
            return index.spark.createDataFrame([], RESULT_SCHEMA)
        # K3 global merge: identical tie-break (score desc, doc_id asc)
        out = per_seg.orderBy(F.desc("score"), F.asc("doc_id")).limit(k)
    if cache_key is not None:
        rows_out = [(int(r["doc_id"]), float(r["score"])) for r in out.collect()]
        cache = index._result_cache
        if len(cache) >= _RESULT_CACHE_MAX:
            cache.popitem(last=False)  # evict least-recently-USED head
        cache[cache_key] = rows_out
        return index.spark.createDataFrame(rows_out, RESULT_SCHEMA)
    return out


MANY_SCHEMA = T.StructType(
    [
        T.StructField("query_id", T.StringType()),
        T.StructField("doc_id", T.LongType()),
        T.StructField("score", T.FloatType()),
    ]
)


def _columnar_search_many(index, plans: dict, k: int) -> DataFrame | None:
    """Batched top-k with ZERO Python stages when every query in the batch
    is columnar-eligible (term/AND/OR/mix/dismax — plus standalone exact
    phrases when the cache carries positions — over the pinned decoded
    cache).

    One scan of the cache filtered to the union of all query terms; per
    (query, clause) a conditional-max aggregate column over the SAME
    groupBy("doc_id") (zero exchange — the cache is doc_id-partitioned);
    per-query score folds and match predicates exactly as `_columnar_topk`
    (same float32 op chains, bit-identical scores); results explode to
    (query_id, doc_id, score) and the per-query k-cut is the same
    row_number window the Pandas batch path uses — the only exchange in
    the whole job, over candidate hits only.  Falls back (None) if ANY
    query is ineligible, so mixed batches keep the one-scan Pandas path."""
    decoded = getattr(index, "decoded_postings", lambda: None)()
    if decoded is None or not plans:
        return None
    specs = []
    phrase_hits = []  # standalone exact phrases ride their own pivots
    kb = None
    for qid, plan in plans.items():
        spec = _columnar_clauses(plan)
        if spec is None:
            ph = _columnar_phrase_hits(decoded, plan)
            if ph is None:
                return None
            phrase_hits.append(
                ph.select(
                    F.lit(qid).alias("query_id"), "doc_id", "score"
                )
            )
            continue
        if kb is None:
            kb = (plan.k1, plan.b, plan.avgdl)
        elif kb != (plan.k1, plan.b, plan.avgdl):
            return None  # shared tf/norm subexpressions assume one sim config
        specs.append((qid, plan, spec))
    parts = list(phrase_hits)
    if specs:
        parts.append(_columnar_many_clause_hits(decoded, specs))
    hits = parts[0]
    for p in parts[1:]:
        hits = hits.unionByName(p)
    from pyspark.sql import Window

    w = Window.partitionBy("query_id").orderBy(
        F.desc("score"), F.asc("doc_id")
    )
    return (
        hits.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= k)
        .drop("rn")
    )


def _columnar_many_clause_hits(decoded, specs: list) -> DataFrame:
    """(query_id, doc_id, score) candidate hits for the clause-eligible
    queries of a batch: one scan, one zero-exchange groupBy("doc_id") with
    per-(query, clause) conditional-max aggregates, per-query folds."""
    plan0 = specs[0][1]
    tf_f = F.col("tf").cast("float")
    bf = F.lit(float(plan0.b)).cast("float")
    one_minus_b = F.lit(float(np.float32(1.0) - plan0.b)).cast("float")
    k1f = F.lit(float(plan0.k1)).cast("float")
    avgdl_f = F.lit(float(plan0.avgdl)).cast("float")
    norm_f = (
        k1f
        * (one_minus_b + ((bf * F.col("ntv")) / avgdl_f).cast("float"))
    )
    all_terms: set[str] = set()
    aggs: list = []
    per_query: list = []  # (qid, mode, extra, clause col names, mn col)
    j = 0
    for qid, plan, (mode, clauses, must_not, extra) in specs:
        names = []
        for boost, t in clauses:
            w = float(_term_weight(plan, t, boost))
            s = (
                (F.lit(w).cast("float") * tf_f) / (tf_f + norm_f)
            ).cast("float")
            name = f"_s{j}"
            aggs.append(
                F.max(F.when(F.col("term") == F.lit(t), s)).alias(name)
            )
            names.append(name)
            all_terms.add(t)
            j += 1
        mn_name = None
        if must_not:
            mn_name = f"_mn{j}"
            aggs.append(
                F.max(
                    F.when(F.col("term").isin(list(must_not)), F.lit(1))
                ).alias(mn_name)
            )
            all_terms.update(must_not)
            j += 1
        per_query.append((qid, mode, extra, names, mn_name))

    matched = decoded.filter(F.col("term").isin(sorted(all_terms)))
    grouped = matched.groupBy("doc_id").agg(*aggs)

    zero_f = F.lit(0.0).cast("float")
    structs = []
    for qid, mode, extra, names, mn_name in per_query:
        score = None
        for name in names:  # clause-order float32 left fold
            e = F.coalesce(F.col(name), zero_f)
            score = e if score is None else score + e
        if mode == "dismax":
            smax = F.greatest(
                zero_f, *[F.coalesce(F.col(n), zero_f) for n in names]
            )
            tie_f = F.lit(float(np.float32(extra))).cast("float")
            score = smax + tie_f * (score - smax)
        keep = _clause_match_pred(mode, extra, names)
        if mn_name is not None:
            keep = keep & (F.coalesce(F.col(mn_name), F.lit(0)) == 0)
        structs.append(
            F.struct(
                F.lit(qid).alias("query_id"),
                score.alias("score"),
                keep.alias("keep"),
            )
        )
    ex = grouped.select("doc_id", F.explode(F.array(*structs)).alias("r"))
    return ex.filter(F.col("r.keep")).select(
        F.col("r.query_id").alias("query_id"),
        "doc_id",
        F.col("r.score").alias("score"),
    )


def search_many(
    index, queries: dict[str, object], k: int = 10, prune: bool = True,
    columnar: bool = False,
) -> DataFrame:
    """Batched top-k: many queries in ONE distributed job.

    -> DataFrame(query_id, doc_id, score), rank-identical per query to
    `search(index, q, k)`.

    The offline-evaluation shape (the reference's benchmark module replays a
    query log the same way — lucene/benchmark SearchTask over a fixed query
    set): one posting scan covers the union of all query terms, each segment
    decodes every posting list ONCE and scores all queries against it
    (PostingRow caches decoded arrays), and scheduling overhead amortizes
    across the whole batch — per-query cost approaches pure scoring work, so
    batch throughput scales with cores unlike single-query latency, which is
    floored by per-job overhead.  Global per-query top-k is a window
    row_number over (score desc, doc_id asc) — the same HitQueue tie-break
    as the single-query path (HitQueue.java:76-81).
    """
    _an = getattr(index, "analyzer", None)
    parsed = {
        qid: parse(q, analyzer=_an) if isinstance(q, str) else q
        for qid, q in queries.items()
    }
    parsed = {qid: rewrite(q, index) for qid, q in parsed.items()}
    all_terms: set[str] = set()
    all_multis: list[ConstScoreMulti] = []
    for q in parsed.values():
        all_terms |= query_terms(q)
        all_multis.extend(query_multis(q))
    all_terms_l = sorted(all_terms)
    if not all_terms_l and not all_multis:
        return index.spark.createDataFrame([], MANY_SCHEMA)

    # one cached stats fetch for the whole batch (Index.term_dfs)
    stats = index.term_dfs(all_terms_l)
    max_doc = index.max_doc
    avgdl = bm25.avg_field_length(index.sum_total_term_freq, max_doc)
    cache = bm25.norm_cache(avgdl)
    tombs = index.tombstone_ref() if hasattr(index, "tombstone_ref") else None
    plans = {
        qid: QueryPlan(
            query=q, k=k,
            idf={t: bm25.idf(stats[t], max_doc) for t in query_terms(q) & stats.keys()},
            cache=cache, avgdl=avgdl, prune=prune, tombstones=tombs,
        )
        for qid, q in parsed.items()
        if not isinstance(q, MatchNoDocsQuery)
    }
    if not plans:
        return index.spark.createDataFrame([], MANY_SCHEMA)

    # columnar batch path: OPT-IN, unlike the single-query fast path.
    # Measured (bench corpus, min-of-3): the one-stage Pandas batch
    # amortizes job+Python overhead across the whole batch and wins at
    # both sf0.001 local[8] (0.35s vs 0.72s) and sf0.1 local[32] (0.36s
    # vs 0.81s) — the columnar form pays 3-4 AQE stage waves (agg,
    # explode, window shuffle, phrase pivots) per batch where Pandas
    # pays one.  The flag exists for deployments where Python workers
    # are the scarce resource; results are bit-identical either way
    # (tested), so flipping it is purely a physical-plan choice.
    if columnar:
        out = _columnar_search_many(index, plans, k)
        if out is not None:
            return out

    posting_cols = list(POSTING_COLS)
    if any(_has_phrase(q) for q in parsed.values()):
        posting_cols.append("pos_blob")

    def _seg_many(pdf: pd.DataFrame) -> pd.DataFrame:
        rows = _group_rows(pdf)
        qids: list[str] = []
        docs_l: list[np.ndarray] = []
        scores_l: list[np.ndarray] = []
        for qid, plan in plans.items():
            docs, scores = _score_in_segment(rows, plan)
            if docs.size == 0:
                continue
            order = np.lexsort((docs, -scores.astype(np.float64)))[: plan.k]
            qids.extend([qid] * order.size)
            docs_l.append(docs[order])
            scores_l.append(scores[order])
        if not docs_l:
            return pd.DataFrame(
                {"query_id": pd.Series(dtype="object"),
                 "doc_id": pd.Series(dtype="int64"),
                 "score": pd.Series(dtype="float32")}
            )
        return pd.DataFrame(
            {"query_id": qids,
             "doc_id": np.concatenate(docs_l),
             "score": np.concatenate(scores_l)}
        )

    rows_df = (
        index.postings()
        .filter(_posting_filter(all_terms_l, all_multis))
        .select(*posting_cols)
    )
    per_seg = rows_df.groupBy("seg").applyInPandas(_seg_many, MANY_SCHEMA)
    from pyspark.sql import Window

    w = Window.partitionBy("query_id").orderBy(F.desc("score"), F.asc("doc_id"))
    return (
        per_seg.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= k)
        .drop("rn")
    )


def scores(index, query_or_text) -> DataFrame:
    """ALL matching (doc_id, score) rows — no top-k cut.

    The full-scores surface behind joins, filter-then-rank flows
    (solr_api.solr_select applies fq filters on this before ordering), and
    function-query composition.  Same scorers as search(), same float32
    contract; always unpruned — every match must be emitted, so rank-cut
    pruning (WAND/MaxScore) can never apply here.
    """
    q = (parse(query_or_text, analyzer=getattr(index, "analyzer", None))
         if isinstance(query_or_text, str) else query_or_text)
    plan = make_plan(index, q, k=1, prune=False)
    q = plan.query
    terms = sorted(query_terms(q))
    multis = query_multis(q)
    if (not terms and not multis) or isinstance(q, MatchNoDocsQuery):
        return index.spark.createDataFrame([], RESULT_SCHEMA)
    # columnar serving fast path: the full match set (same float32 op
    # chains as the Pandas scorers) with zero Python stages — the
    # filter-then-rank consumers (/select fq, joins, function queries)
    # stay whole-stage-codegen end to end
    hits = _columnar_hits(index, plan)
    if hits is not None:
        return hits
    posting_cols = list(POSTING_COLS)
    if _has_phrase(q):
        posting_cols.append("pos_blob")
    rows = (
        index.postings()
        .filter(_posting_filter(terms, multis))
        .select(*posting_cols)
    )

    def _seg_all(pdf: pd.DataFrame) -> pd.DataFrame:
        prs = _group_rows(pdf)
        docs, sc = _clause_scorer(plan.query, prs, plan)
        docs, sc = _apply_live_docs(docs, sc, plan)
        return pd.DataFrame({"doc_id": docs, "score": sc})

    return rows.groupBy("seg").applyInPandas(_seg_all, RESULT_SCHEMA)


def search_by_field(
    index, query_or_text, field: str, ascending: bool = False, k: int = 10,
    fq=None, fl=None,
) -> DataFrame:
    """Sort-by-field top-k on the engine surface — the TopFieldCollector
    analog (K5, IndexSearcher.java:432-460): rank matches by a stored/doc-
    values field instead of relevance, doc_id as the final tie-break.

    Delegates to the Solr /select flow (all-matches scorer -> docmap join ->
    fq filters -> orderBy().limit, which Spark executes as
    TakeOrderedAndProject: per-partition top-k + driver merge, no global
    sort).  Numeric/term range filtering rides the same fq syntax
    (`doclen:[10 TO 200]`) — native Catalyst predicates (E15)."""
    from .solr_api import solr_select

    direction = "asc" if ascending else "desc"
    return solr_select(
        index, query_or_text, fq=fq, fl=fl, sort=f"{field} {direction}", rows=k
    )


def query_rescore(index, first_pass: DataFrame, query_or_text,
                  weight: float = 1.0, top_n: int = 10) -> DataFrame:
    """QueryRescorer (lucene/core/src/java/org/apache/lucene/search/
    QueryRescorer.java:167-178, the linear-combine sugar): re-rank a
    first-pass hit set by `first + weight * second` where `second` is a
    second query's score for hits it matches (non-matches keep the first
    score, :101-105).  The += runs in double and narrows to float once —
    fl(first + weight * second) — reproduced exactly.

    Spark shape: the first pass is top-N sized, so it broadcasts against
    the second query's match scores (the reference iterates the second
    Weight only over the first-pass docs — here Catalyst's broadcast join
    does the same pruning); re-sort + cut is N rows."""
    second = scores(index, query_or_text).withColumnRenamed("score", "s2")
    joined = second.join(F.broadcast(first_pass), "doc_id", "right")
    combined = F.when(
        F.col("s2").isNotNull(),
        (F.col("score").cast("double")
         + F.lit(float(weight)) * F.col("s2").cast("double")).cast("float"),
    ).otherwise(F.col("score"))
    return (
        joined.select("doc_id", combined.alias("score"))
        .orderBy(F.desc("score"), F.asc("doc_id"))
        .limit(top_n)
    )


def sort_rescore(index, first_pass: DataFrame, field: str,
                 ascending: bool = True, top_n: int = 10) -> DataFrame:
    """SortRescorer (lucene/core/src/java/org/apache/lucene/search/
    SortRescorer.java): re-order the first-pass top-N by a field sort
    instead of relevance (the TopFieldCollector replay over the hit set,
    :43-100); scores are carried through unchanged (trackScores=true).

    Spark shape: the N-row hit set broadcasts against the docmap, sort +
    cut are N rows; doc_id is the deterministic tie-break (the reference
    falls to docID via the collector's tie rules)."""
    joined = index.docmap().select("doc_id", field).join(
        F.broadcast(first_pass), "doc_id")
    key = F.asc(field) if ascending else F.desc(field)
    return (
        joined.orderBy(key, F.asc("doc_id"))
        .limit(top_n)
        .select("doc_id", F.col(field).alias("sort_value"), "score")
    )


def count_df(index, query_or_text) -> DataFrame:
    """TotalHitCountCollector analog as a 1-row DataFrame `(n_hits)` — the
    distributed form of `count` (P3/K5): per-segment match counts summed by
    a partial-aggregate, never a per-doc row transferred."""
    q = (parse(query_or_text, analyzer=getattr(index, "analyzer", None))
         if isinstance(query_or_text, str) else query_or_text)
    plan = make_plan(index, q, k=1, prune=False)
    terms = sorted(query_terms(plan.query))
    multis = query_multis(plan.query)
    if not terms and not multis:
        return index.spark.range(1).select(F.lit(0).cast("long").alias("n_hits"))
    # columnar serving fast path: eligible shapes count declaratively from
    # the decoded cache (scores never computed — TotalHitCountCollector
    # skips them in the reference too)
    decoded = getattr(index, "decoded_postings", lambda: None)()
    spec = _columnar_clauses(plan) if decoded is not None else None
    if spec is not None:
        mode, clauses, must_not, extra = spec
        # matching clauses: for "mix" (MUST+SHOULD) the MUST prefix must
        # be complete, and with msm > 0 the SHOULD suffix must reach msm
        # too (mix filters — BooleanWeight.java:326-342; with msm == 0
        # the optionals score but never filter, so they don't count).
        # "and"/"or"/"dismax" count every clause.
        if mode == "mix":
            n_must, msm = extra
            match_clauses = clauses[:n_must]
            should_clauses = clauses[n_must:] if msm > 0 else []
        else:
            match_clauses, should_clauses = clauses, []
        n_by_term: dict[str, int] = {}
        for _, t in match_clauses:
            n_by_term[t] = n_by_term.get(t, 0) + 1
        ns_by_term: dict[str, int] = {}
        for _, t in should_clauses:
            ns_by_term[t] = ns_by_term.get(t, 0) + 1
        all_terms = sorted(set(n_by_term) | set(ns_by_term) | set(must_not))
        ncl_e, nsh_e, mn_e = None, None, None
        for t in all_terms:
            cond = F.col("term") == F.lit(t)
            ce = F.lit(n_by_term.get(t, 0))
            se = F.lit(ns_by_term.get(t, 0))
            me = F.lit(1 if t in must_not else 0)
            ncl_e = F.when(cond, ce) if ncl_e is None else ncl_e.when(cond, ce)
            nsh_e = F.when(cond, se) if nsh_e is None else nsh_e.when(cond, se)
            mn_e = F.when(cond, me) if mn_e is None else mn_e.when(cond, me)
        if mode in ("and", "mix"):
            need = len(match_clauses)
        elif mode == "dismax":
            need = 1
        else:  # "or": msm-many optionals must match
            need = max(int(extra), 1)
        aggs = [F.sum(ncl_e).alias("_nm"), F.max(mn_e).alias("_mn")]
        pred = (F.col("_nm") >= F.lit(need)) & (F.col("_mn") == 0)
        if should_clauses:
            aggs.append(F.sum(nsh_e).alias("_ns"))
            pred = pred & (F.col("_ns") >= F.lit(extra[1]))
        grouped = (
            decoded.filter(F.col("term").isin(all_terms))
            .groupBy("doc_id")
            .agg(*aggs)
            .filter(pred)
        )
        return grouped.agg(F.count("*").cast("long").alias("n_hits"))
    rows = index.postings().filter(_posting_filter(terms, multis))
    schema = T.StructType([T.StructField("n", T.LongType())])

    def _cnt(pdf: pd.DataFrame) -> pd.DataFrame:
        prs = _group_rows(pdf)
        docs, scores = _clause_scorer(plan.query, prs, plan)
        docs, _ = _apply_live_docs(docs, scores, plan)
        return pd.DataFrame({"n": [int(docs.size)]})

    return (
        rows.groupBy("seg").applyInPandas(_cnt, schema)
        .agg(F.coalesce(F.sum("n"), F.lit(0)).cast("long").alias("n_hits"))
    )


def count(index, query_or_text) -> int:
    """TotalHitCountCollector analog: match count, no scores (P3/K5)."""
    return int(count_df(index, query_or_text).collect()[0][0])


def matches_first_by_docid(index, query_or_text, n: int) -> DataFrame:
    """EarlyTerminatingSortingCollector analog (lucene/core/src/java/org/
    apache/lucene/search/EarlyTerminatingSortingCollector.java:30-60, now
    folded into TopFieldCollector.canEarlyTerminate): on an index built
    with index_sort, doc-id order IS the sort order, so the top-n by the
    sort field are simply the FIRST n matching doc ids.

    Scale shape: each segment emits at most n ids (collect n per leaf,
    then terminate — the collector's throw-CollectionTerminatedException
    discipline re-expressed as a per-group cut), the global merge is
    TakeOrderedAndProject over #segments * n tiny rows, scores are never
    computed (trackScores=false), and the docmap is never joined before
    the cut.  Returns a 1-column (doc_id) DataFrame of <= n rows."""
    q = (parse(query_or_text, analyzer=getattr(index, "analyzer", None))
         if isinstance(query_or_text, str) else query_or_text)
    plan = make_plan(index, q, k=n, prune=False)
    terms = sorted(query_terms(plan.query))
    multis = query_multis(plan.query)
    if not terms and not multis:
        return index.spark.createDataFrame([], "doc_id long")
    rows = index.postings().filter(_posting_filter(terms, multis))
    n = int(n)

    def _first_n(pdf: pd.DataFrame) -> pd.DataFrame:
        prs = _group_rows(pdf)
        docs, scores = _clause_scorer(plan.query, prs, plan)
        docs, _ = _apply_live_docs(docs, scores, plan)
        return pd.DataFrame({"doc_id": docs[:n]})  # ascending already

    per_seg = rows.groupBy("seg").applyInPandas(_first_n, "doc_id long")
    return per_seg.orderBy(F.asc("doc_id")).limit(n)


def explain(index, query_or_text, doc_id: int,
            similarity: str = "bm25") -> dict:
    """K6: Explanation tree for one (query, doc) — IndexSearcher.explain
    (IndexSearcher.java:669-684) + BM25Similarity.explainScore
    (BM25Similarity.java:266-287) analog.

    Returns a nested dict {match, value, description, details:[...]}.  The
    top-level `value` is bit-identical (float32) to the score `search` gives
    this doc: it is produced by the same scorer path over the doc's segment,
    not recomputed from the printed factors (Lucene's own explain text can
    drift in the last ulp from the scorer; ours never does).
    """
    q = (parse(query_or_text, analyzer=getattr(index, "analyzer", None))
         if isinstance(query_or_text, str) else query_or_text)
    plan = make_plan(index, q, k=1, prune=False, similarity=similarity)
    q = plan.query
    terms = sorted(query_terms(q))
    multis = query_multis(q)
    no = {"match": False, "value": 0.0, "description": "no match", "details": []}
    if (not terms and not multis) or isinstance(q, MatchNoDocsQuery):
        return no
    seg_rows = (
        index.docstats().filter(F.col("doc_id") == int(doc_id))
        .select("seg", "doclen", "norm_byte").collect()
    )
    if not seg_rows:
        return {**no, "description": f"doc {doc_id} not in index"}
    seg = seg_rows[0]["seg"]
    pdf = (
        index.postings()
        .filter((F.col("seg") == seg) & _posting_filter(terms, multis))
        .toPandas()
    )
    rows = _group_rows(pdf)
    docs, scores = _clause_scorer(q, rows, plan)
    docs, scores = _apply_live_docs(docs, scores, plan)
    pos = np.searchsorted(docs, int(doc_id))
    if pos >= docs.size or docs[pos] != int(doc_id):
        return {**no, "description": "doc does not match query"}
    value = float(scores[pos])
    return {
        "match": True,
        "value": value,
        "description": _describe(q),
        "details": _explain_details(q, rows, plan, int(doc_id)),
    }


def _describe(q) -> str:
    if isinstance(q, TermQuery):
        return f"weight(content:{q.term}) [BM25, k1=1.2, b=0.75]"
    if isinstance(q, PhraseQuery):
        kind = f'~{q.slop}' if getattr(q, "slop", 0) else ""
        return f"weight(content:\"{' '.join(q.terms)}\"{kind}) [BM25]"
    if isinstance(q, BooleanQuery):
        return "sum of:"
    if isinstance(q, DisjunctionMaxQuery):
        return f"max plus {q.tie} times others of:"
    if isinstance(q, ConstScoreTerms):
        return f"ConstantScore({len(q.terms)} terms)"
    return type(q).__name__


def _explain_details(q, rows, plan: QueryPlan, doc: int) -> list[dict]:
    if isinstance(q, TermQuery):
        tp = rows.get(q.term)
        if tp is None:
            return []
        mask, pidx = tp.lookup(np.array([doc], dtype=np.int64))
        if not mask.any():
            return []
        i = int(pidx[0])
        freq = float(tp.tfs()[i])
        nb = int(tp.norms()[i])
        idf = float(plan.idf.get(q.term, np.float32(0.0)))
        c = float(plan.cache[nb])
        return [
            {"value": freq, "description": f"freq, occurrences of {q.term!r}"},
            {"value": idf,
             "description": "idf, computed as log(1 + (maxDoc - df + 0.5) / (df + 0.5))"},
            {"value": float(NORM_TABLE_LEN(nb)),
             "description": "fieldLength (decoded norm byte)"},
            {"value": (freq * 2.2) / (freq + c),
             "description": "tfNorm, computed as (freq*(k1+1)) / (freq + k1*(1-b+b*fieldLength/avgFieldLength))"},
        ]
    if isinstance(q, PhraseQuery):
        hit = _intersect_candidates(list(q.terms), rows)
        if hit is None:
            return []
        docs, idxmap = hit
        s = np.searchsorted(docs, doc)
        if s >= docs.size or docs[s] != doc:
            return []
        plists = []
        for t in q.terms:
            pr = rows[t]
            flat, _di = pr.positions_flat()
            off = np.concatenate(([0], np.cumsum(pr.tfs())))
            i = int(idxmap[t][s])
            plists.append(flat[off[i]: off[i + 1]])
        if getattr(q, "slop", 0) > 0:
            from .sloppy import sloppy_phrase_freq

            freq = float(sloppy_phrase_freq(q.terms, q.positions, plists, q.slop))
            fdesc = f"phraseFreq, sloppy (slop={q.slop}), sum of 1/(distance+1)"
        else:
            starts = set(int(p) for p in plists[0])
            for pl, qpos in zip(plists[1:], q.positions[1:]):
                starts &= {int(p) - qpos for p in pl}
            freq = float(len(starts))
            fdesc = "phraseFreq, exact alignments"
        idf = float(_sum_idfs(plan, q.terms))
        return [
            {"value": freq, "description": fdesc},
            {"value": idf, "description": "idf, sum of per-term idfs"},
        ]
    if isinstance(q, BooleanQuery):
        out = []
        for occ, sub in q.clauses:
            d, s = _clause_scorer(sub, rows, plan)
            p = np.searchsorted(d, doc) if d.size else 0
            matched = d.size and p < d.size and d[p] == doc
            if occ == MUST_NOT:
                out.append({"match": not matched, "value": 0.0,
                            "description": f"MUST_NOT {_describe(sub)}"})
                continue
            out.append({
                "match": bool(matched),
                "value": float(s[p]) if matched else 0.0,
                "description": f"{occ} {_describe(sub)}",
                "details": _explain_details(sub, rows, plan, doc) if matched else [],
            })
        return out
    if isinstance(q, DisjunctionMaxQuery):
        out = []
        for sub in q.disjuncts:
            d, s = _clause_scorer(sub, rows, plan)
            p = np.searchsorted(d, doc) if d.size else 0
            matched = d.size and p < d.size and d[p] == doc
            out.append({
                "match": bool(matched),
                "value": float(s[p]) if matched else 0.0,
                "description": _describe(sub),
            })
        return out
    if hasattr(q, "doc_spans"):  # span family: produced spans + freq fold
        data: dict[str, tuple | None] = {}
        for t in q.all_terms():
            pr = rows.get(t)
            if pr is None:
                data[t] = None
            else:
                flat, _di = pr.positions_flat()
                off = np.concatenate(([0], np.cumsum(pr.tfs())))
                data[t] = (pr.docs(), flat, off, pr.norms())
        spans_list = q.doc_spans(doc, data)
        f = np.float32(0.0)
        for s_, e_ in spans_list:
            f = np.float32(f + np.float32(1.0) / np.float32(e_ - s_ + 1))
        return [
            {"value": float(len(spans_list)),
             "description": f"numMatches, spans {spans_list[:8]!r}"},
            {"value": float(f),
             "description": "sloppyFreq, sum of 1/(width+1) per span"},
            {"value": float(_sum_idfs(plan, sorted(q.scoring_terms()))),
             "description": "idf, sum over scoring terms"},
        ]
    return []


def NORM_TABLE_LEN(nb: int) -> float:
    from .bm25 import NORM_TABLE

    return float(NORM_TABLE[nb])


def _has_phrase(q) -> bool:
    """True when executing q needs the pos_blob column (E11 two-phase)."""
    if isinstance(q, (PhraseQuery, MultiPhraseQuery)):
        return True
    if hasattr(q, "any_step"):  # TermAutomatonQuery runs the position DFA
        return True
    if hasattr(q, "doc_spans"):  # span family consumes positions
        return True
    if isinstance(q, BooleanQuery):
        return any(_has_phrase(s) for _, s in q.clauses)
    if isinstance(q, DisjunctionMaxQuery):
        return any(_has_phrase(s) for s in q.disjuncts)
    if isinstance(q, BoostingQuery):
        return _has_phrase(q.match) or _has_phrase(q.context)
    return False
