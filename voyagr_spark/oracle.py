"""Pure-Python reference engine: the golden oracle for rank-identical top-k.

Stands in for the reference JVM (SURVEY.md §5): a dict-of-arrays in-memory
index + straight-line float32 scoring implementing exactly the cited contract
(BM25Similarity.java:66-99,207-238; SmallFloat.java:78-98; tie-break
HitQueue.java:76-81).  Deliberately *independent* of the Spark machinery —
no segments, no codec, no partitioning — so engine bugs in those layers
cannot cancel out.  Shares only the analysis chain and the SmallFloat bit
twiddle, both of which have their own Java-derived golden tests.
"""

from __future__ import annotations

import numpy as np
import pandas as pd

from . import bm25
from .analysis import analyze_text
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
from .complexphrase import (
    ComplexPhraseQuery,
    Resolver as _CPResolver,
    rewrite_complex_phrase,
)
from .parser import MAX_CLAUSE_COUNT, TooManyClauses
from .smallfloat import encode_norm


class _OracleResolver(_CPResolver):
    """ComplexPhrase pass-2 resolution against the in-memory dictionary:
    same rewrite shapes as the engine (search.rewrite on an analyzer shim),
    expansion = a full-dictionary predicate scan."""

    def __init__(self, oracle):
        self.oracle = oracle

    def rewrite_multi(self, q):
        from .search import rewrite

        class _Shim:
            analyzer = self.oracle.analyzer

        return rewrite(q, _Shim())

    def expand(self, cs):
        got = sorted(t for t in self.oracle.postings if cs.matches(t))
        if len(got) > MAX_CLAUSE_COUNT:
            raise TooManyClauses(
                f"phrase-embedded expansion exceeds {MAX_CLAUSE_COUNT}"
            )
        return got

    def fuzzy(self, fq):
        from .complexphrase import _boolean_to_terms

        return _boolean_to_terms(self.oracle._fuzzy_rewrite(fq))


def _levenshtein(a: str, b: str, cap: int) -> int:
    """Plain DP edit distance with an early-out cap (oracle-side twin of
    F.levenshtein; independent of the Spark implementation)."""
    if a == b:
        return 0
    la, lb = len(a), len(b)
    if abs(la - lb) > cap:
        return cap + 1
    prev = list(range(lb + 1))
    for i in range(1, la + 1):
        cur = [i] + [0] * lb
        best = i
        for j in range(1, lb + 1):
            cur[j] = min(
                prev[j] + 1, cur[j - 1] + 1, prev[j - 1] + (a[i - 1] != b[j - 1])
            )
            best = min(best, cur[j])
        if best > cap:
            return cap + 1
        prev = cur
    return prev[lb]


class OracleIndex:
    def __init__(self, docs: pd.DataFrame, sort: bool = True, analyzer=None):
        """docs: (repo, path, commit, content); doc ids = dense rank over key
        (sort=True, the batch-build contract) or arrival order (sort=False,
        the streaming-append contract).  `analyzer` = analysis.Analyzer for
        a custom chain (None = standard)."""
        self.analyzer = analyzer
        if sort:
            docs = docs.sort_values(["repo", "path", "commit"]).reset_index(drop=True)
        else:
            docs = docs.reset_index(drop=True)
        self.doc_ids = np.arange(len(docs), dtype=np.int64)
        self.postings: dict[str, dict[int, list[int]]] = {}
        doclens = np.zeros(len(docs), dtype=np.int64)
        for i, content in enumerate(docs["content"]):
            terms, positions = (
                analyzer.analyze_text(content) if analyzer is not None
                else analyze_text(content)
            )
            # distinct positions = tokens minus posinc-0 overlaps (injected
            # synonyms): matches the engine's discountOverlaps doclen, which
            # also feeds avgdl (documented divergence: Lucene's
            # sumTotalTermFreq counts overlaps; the engine's avgdl does not)
            doclens[i] = len(set(positions))
            for t, p in zip(terms, positions):
                self.postings.setdefault(t, {}).setdefault(i, []).append(p)
        self.doclens = doclens
        self.norm_bytes = encode_norm(doclens)
        self.max_doc = len(docs)
        self.sum_ttf = int(doclens.sum())
        self.deleted: set[int] = set()

    def delete(self, doc_ids) -> None:
        """Live-docs semantics: docs vanish from matches, stats stay stale."""
        self.deleted.update(int(d) for d in doc_ids)

    # -- scoring ------------------------------------------------------------

    def _cache(self) -> np.ndarray:
        avgdl = bm25.avg_field_length(self.sum_ttf, self.max_doc)
        return bm25.norm_cache(avgdl)

    def _idf(self, term: str) -> np.float32:
        df = len(self.postings.get(term, {}))
        return bm25.idf(df, self.max_doc) if df else np.float32(0.0)

    def _score_doc(self, doc: int, freq: float, wv: np.float32, cache) -> np.float32:
        f = np.float32(freq)
        norm = cache[int(self.norm_bytes[doc])]
        return np.float32(np.float32(wv * f) / np.float32(f + norm))

    def _term_matches(self, term: str) -> dict[int, int]:
        return {d: len(ps) for d, ps in self.postings.get(term, {}).items()}

    def _clause(self, q, cache, boost: float = 1.0) -> dict[int, np.float32]:
        if isinstance(q, TermQuery):
            wv = bm25.weight_value(self._idf(q.term), boost=boost * q.boost)
            return {
                d: self._score_doc(d, tf, wv, cache)
                for d, tf in self._term_matches(q.term).items()
            }
        if isinstance(q, PhraseQuery):
            return self._phrase(q, cache, boost * q.boost)
        if isinstance(q, BooleanQuery):
            return self._bool(q, cache, boost * q.boost)
        if isinstance(q, PrefixQuery):
            return self._multi(
                lambda t: t.startswith(q.prefix), boost * q.boost)
        if isinstance(q, WildcardQuery):
            import re as _re

            pat = "".join(
                ".*" if c == "*" else "." if c == "?" else _re.escape(c)
                for c in q.pattern
            )
            return self._multi(
                lambda t: _re.fullmatch(pat, t) is not None, boost * q.boost)
        if isinstance(q, RegexpQuery):
            import re as _re

            return self._multi(
                lambda t: _re.fullmatch(q.pattern, t) is not None,
                boost * q.boost)
        if isinstance(q, TermRangeQuery):
            def in_range(t: str) -> bool:
                if q.lower is not None and (
                    t < q.lower if q.include_lower else t <= q.lower
                ):
                    return False
                if q.upper is not None and (
                    t > q.upper if q.include_upper else t >= q.upper
                ):
                    return False
                return True

            return self._multi(in_range, boost * q.boost)
        if isinstance(q, ConstScoreMulti):
            return self._multi(q.matches, boost * q.boost)
        if isinstance(q, FuzzyQuery):
            return self._bool(self._fuzzy_rewrite(q), cache, boost)
        if hasattr(q, "doc_spans"):  # span family (spans.SpanQuery)
            return self._spans(q, cache, boost * getattr(q, "boost", 1.0))
        if isinstance(q, ComplexPhraseQuery):  # complexphrase pass 2
            resolved = rewrite_complex_phrase(
                q, _OracleResolver(self), analyzer=self.analyzer
            )
            return self._clause(resolved, cache, boost)
        if isinstance(q, ConstScoreTerms):
            out: dict[int, np.float32] = {}
            for t in q.terms:
                for d in self.postings.get(t, {}):
                    out[d] = np.float32(boost * q.boost)
            return out
        if isinstance(q, DisjunctionMaxQuery):
            smax: dict[int, np.float32] = {}
            ssum: dict[int, np.float32] = {}
            for sub in q.disjuncts:
                for d, s in self._clause(sub, cache, boost * q.boost).items():
                    smax[d] = max(smax.get(d, np.float32(-np.inf)), s)
                    ssum[d] = np.float32(ssum.get(d, np.float32(0.0)) + s)
            tie = np.float32(q.tie)
            return {
                d: np.float32(smax[d] + tie * np.float32(ssum[d] - smax[d]))
                for d in smax
            }
        if isinstance(q, MatchNoDocsQuery):
            return {}
        if isinstance(q, CommonTermsQuery):
            return self._clause(self._common_terms_rewrite(q), cache, boost)
        if isinstance(q, MultiPhraseQuery):
            return self._multi_phrase(q, cache, boost * q.boost)
        if isinstance(q, BoostingQuery):
            res = self._clause(q.match, cache, boost * q.boost)
            ctx = self._clause(q.context, cache, boost)
            demote = np.float32(q.demote)
            return {
                d: (np.float32(s * demote) if d in ctx else s)
                for d, s in res.items()
            }
        raise TypeError(type(q))

    def _multi_phrase(
        self, q: MultiPhraseQuery, cache, boost: float = 1.0
    ) -> dict[int, np.float32]:
        """MultiPhraseQuery from the oracle's own postings: per slot the
        union of member positions acts as one pseudo-term; exact alignment
        or the sloppy walk; idf folds over every member in order."""
        from .sloppy import sloppy_phrase_freq

        # per-doc, per-slot union position sets
        slot_pos: list[dict[int, set]] = []
        for members in q.termsets:
            acc: dict[int, set] = {}
            for t in members:
                for d, ps in self.postings.get(t, {}).items():
                    acc.setdefault(d, set()).update(ps)
            if not acc:
                return {}
            slot_pos.append(acc)
        docs = set(slot_pos[0])
        for sp in slot_pos[1:]:
            docs &= set(sp)
        idf = np.float32(0.0)
        for members in q.termsets:
            for t in members:
                idf = np.float32(idf + self._idf(t))
        wv = bm25.weight_value(idf, boost=boost)
        out: dict[int, np.float32] = {}
        labels = [f"__slot{i}" for i in range(len(q.termsets))]
        for d in docs:
            if q.slop > 0:
                plists = [np.array(sorted(sp[d]), dtype=np.int64)
                          for sp in slot_pos]
                freq = sloppy_phrase_freq(labels, q.positions, plists, q.slop)
            else:
                starts = None
                for i, sp in enumerate(slot_pos):
                    st = {p - q.positions[i] for p in sp[d]
                          if p >= q.positions[i]}
                    starts = st if starts is None else (starts & st)
                    if not starts:
                        break
                freq = len(starts or ())
            if freq > 0:
                out[d] = self._score_doc(d, freq, wv, cache)
        return out

    def _common_terms_rewrite(self, q: CommonTermsQuery):
        """Independent CommonTermsQuery.buildQuery (CommonTermsQuery.java:
        185-233) over the oracle's OWN document frequencies."""
        if not q.terms:
            return MatchNoDocsQuery("empty CommonTermsQuery")
        if len(q.terms) == 1:
            return TermQuery(q.terms[0], boost=q.boost)
        cutoff = int(
            np.ceil(np.float32(q.max_term_frequency) * np.float32(self.max_doc))
        )

        def _msm(value: float, n: int) -> int:
            if value >= 1.0 or value == 0.0:
                return int(value)
            return int(np.floor(value * n + 0.5))

        low, high = [], []
        for t in q.terms:
            df = len(self.postings.get(t, {}))
            is_high = df > 0 and (
                (q.max_term_frequency >= 1.0 and df > q.max_term_frequency)
                or df > cutoff
            )
            (high if is_high else low).append(t)
        low_cl = [(q.low_freq_occur, TermQuery(t)) for t in low]
        high_cl = [(q.high_freq_occur, TermQuery(t)) for t in high]
        low_msm = (
            _msm(q.low_freq_msm, len(low_cl))
            if q.low_freq_occur == SHOULD and low_cl else 0
        )
        high_msm = (
            _msm(q.high_freq_msm, len(high_cl))
            if q.high_freq_occur == SHOULD and high_cl else 0
        )

        def side(cl, msm, boost):
            if len(cl) == 1 and msm <= 1:
                t = cl[0][1]
                return TermQuery(t.term, boost=t.boost * boost)
            return BooleanQuery(tuple(cl), msm, boost)

        if not low_cl:
            if high_msm == 0 and q.high_freq_occur != MUST:
                high_cl = [(MUST, s) for _, s in high_cl]
            return side(high_cl, high_msm, q.boost)
        if not high_cl:
            return side(low_cl, low_msm, q.boost)
        return BooleanQuery(
            ((SHOULD, side(high_cl, high_msm, 1.0)),
             (MUST, side(low_cl, low_msm, 1.0))),
            0, q.boost,
        )

    def _multi(self, pred, boost: float) -> dict[int, np.float32]:
        """Constant-score union of all dictionary terms matching `pred`."""
        out: dict[int, np.float32] = {}
        for t, plist in self.postings.items():
            if pred(t):
                for d in plist:
                    out[d] = np.float32(boost)
        return out

    def _fuzzy_rewrite(self, q: FuzzyQuery):
        """Independent fuzzy expansion: pure-Python edit distance, same
        contract as search._rewrite_fuzzy (FuzzyTermsEnum boost, top
        max_expansions by (sim desc, term asc), clause order term asc)."""
        cands = []
        n = len(q.term)
        for t in self.postings:
            if abs(len(t) - n) > q.max_edits:
                continue
            if q.prefix_length and not t.startswith(q.term[: q.prefix_length]):
                continue
            dist = _levenshtein(t, q.term, q.max_edits)
            if dist > q.max_edits:
                continue
            sim = 1.0 if dist == 0 else 1.0 - dist / min(len(t), n)
            cands.append((t, sim))
        cands.sort(key=lambda ts: (-ts[1], ts[0]))
        cands = sorted(cands[: q.max_expansions])
        if not cands:
            return BooleanQuery(())
        return BooleanQuery(
            tuple(
                (SHOULD, TermQuery(t, boost=sim * q.boost)) for t, sim in cands
            )
        )

    def _bool(
        self, q: BooleanQuery, cache, boost: float = 1.0
    ) -> dict[int, np.float32]:
        must = [s for o, s in q.clauses if o == MUST]
        should = [s for o, s in q.clauses if o == SHOULD]
        must_not = [s for o, s in q.clauses if o == MUST_NOT]
        msm = int(q.min_should_match or 0)
        # BooleanWeight.java:299-304: fewer optionals than msm -> no match
        if msm > len(should):
            return {}
        if must:
            res: dict[int, np.float32] | None = None
            for m in must:
                part = self._clause(m, cache, boost)
                if res is None:
                    res = dict(part)
                else:
                    res = {
                        d: np.float32(s + part[d]) for d, s in res.items() if d in part
                    }
            assert res is not None
            # msm == 0: ReqOptSum (optionals score, never filter);
            # msm > 0: ConjunctionScorer(req, opt) — >= msm optionals must
            # also match (BooleanWeight.java:326-342)
            counts_m: dict[int, int] = {}
            for sh in should:
                part = self._clause(sh, cache, boost)
                for d in res:
                    if d in part:
                        res[d] = np.float32(res[d] + part[d])
                        counts_m[d] = counts_m.get(d, 0) + 1
            if msm > 0:
                res = {d: s for d, s in res.items()
                       if counts_m.get(d, 0) >= msm}
        else:
            res = {}
            counts: dict[int, int] = {}
            for sh in should:
                for d, s in self._clause(sh, cache, boost).items():
                    res[d] = np.float32(res.get(d, np.float32(0.0)) + s)
                    counts[d] = counts.get(d, 0) + 1
            if q.min_should_match > 1:
                res = {d: s for d, s in res.items() if counts[d] >= q.min_should_match}
        for mn in must_not:
            for d in self._clause(mn, cache, boost):
                res.pop(d, None)
        return res

    def _spans(self, q, cache, boost: float = 1.0) -> dict[int, np.float32]:
        """SpanScorer semantics from the oracle's OWN postings: freq =
        float32 fold of 1/(width+1) per produced span, BM25 with the
        summed idf of the sorted scoring terms.  The span-match algebra is
        shared with the engine (spans.py — golden-tested against the
        reference algorithms); the position data and score chain here are
        oracle-native, so the differential still exercises the engine's
        full decode path."""
        data: dict[str, tuple | None] = {}
        for t in q.all_terms():
            per_doc = self.postings.get(t)
            if not per_doc:
                data[t] = None
                continue
            docs = np.array(sorted(per_doc), dtype=np.int64)
            flat = np.concatenate(
                [np.asarray(per_doc[int(d)], dtype=np.int64) for d in docs]
            )
            off = np.concatenate(
                ([0], np.cumsum([len(per_doc[int(d)]) for d in docs]))
            )
            data[t] = (docs, flat, off, None)
        idf = np.float32(0.0)
        for t in sorted(q.scoring_terms()):
            idf = np.float32(idf + self._idf(t))
        wv = bm25.weight_value(idf, boost=boost)
        out: dict[int, np.float32] = {}
        one = np.float32(1.0)
        for d in q.candidates(data):
            f = np.float32(0.0)
            for s, e in q.doc_spans(int(d), data):
                f = np.float32(f + one / np.float32(e - s + 1))
            if f > 0:
                out[int(d)] = self._score_doc(int(d), f, wv, cache)
        return out

    def _phrase(
        self, q: PhraseQuery, cache, boost: float = 1.0
    ) -> dict[int, np.float32]:
        idf = np.float32(0.0)
        for t in q.terms:
            idf = np.float32(idf + self._idf(t))
        wv = bm25.weight_value(idf, boost=boost)
        plists = [self.postings.get(t, {}) for t in q.terms]
        if any(not p for p in plists):
            return {}
        cand = set(plists[0])
        for p in plists[1:]:
            cand &= set(p)
        out: dict[int, np.float32] = {}
        if getattr(q, "slop", 0) > 0:
            from .sloppy import sloppy_phrase_freq

            for d in cand:
                freq = sloppy_phrase_freq(
                    q.terms, q.positions,
                    [np.asarray(pl[d], dtype=np.int64) for pl in plists],
                    q.slop,
                )
                if freq > 0:
                    out[d] = self._score_doc(d, float(freq), wv, cache)
            return out
        for d in cand:
            starts = set(plists[0][d])
            for p, qpos in zip(plists[1:], q.positions[1:]):
                starts &= {x - qpos for x in p[d]}
                if not starts:
                    break
            if starts:
                out[d] = self._score_doc(d, float(len(starts)), wv, cache)
        return out

    # -- top level ------------------------------------------------------------

    def search(
        self, query_or_text, k: int = 10, after: tuple[float, int] | None = None
    ) -> list[tuple[int, float]]:
        q = (parse(query_or_text, analyzer=self.analyzer)
             if isinstance(query_or_text, str) else query_or_text)
        cache = self._cache()
        res = self._clause(q, cache)
        if self.deleted:
            res = {d: s for d, s in res.items() if d not in self.deleted}
        ranked = sorted(res.items(), key=lambda kv: (-float(kv[1]), kv[0]))
        if after is not None:
            sa, da = np.float32(after[0]), int(after[1])
            ranked = [
                (d, s) for d, s in ranked if s < sa or (s == sa and d > da)
            ]
        # TopScoreDocCollector order: score desc, then doc id asc
        return [(d, np.float32(s)) for d, s in ranked[:k]]

    def count(self, query_or_text) -> int:
        q = (parse(query_or_text, analyzer=self.analyzer)
             if isinstance(query_or_text, str) else query_or_text)
        res = self._clause(q, self._cache())
        if self.deleted:
            res = {d: s for d, s in res.items() if d not in self.deleted}
        return len(res)
