"""Seeded randomized differential test: generated queries, engine vs oracle.

The fixed reference query set (test_end_to_end) covers each operator once;
this sweep composes ~120 random queries from the corpus vocabulary —
term / AND / OR / NOT / minShouldMatch / phrase / sloppy-phrase / prefix
mixes, including absent terms and stopwords — and requires rank-identical
top-10 (ids AND float32 scores) against the oracle for every one.
Deterministic (seed=7): failures reproduce exactly.
"""

import numpy as np
import pytest


def _vocab(oracle_index, rng, hot=40):
    terms = sorted(oracle_index.postings, key=lambda t: -len(oracle_index.postings[t]))
    head = terms[:hot]
    tail = [t for t in terms if 2 <= len(oracle_index.postings[t]) <= 5][:200]
    return head, tail or head


def _gen_queries(oracle_index, n=120, seed=7):
    rng = np.random.default_rng(seed)
    head, tail = _vocab(oracle_index, rng)
    absent = ["zzqx", "notaterm9"]

    def pick(pool):
        return pool[int(rng.integers(0, len(pool)))]

    out = []
    for i in range(n):
        kind = int(rng.integers(0, 8))
        if kind == 0:
            out.append(pick(head + tail + absent))
        elif kind == 1:
            out.append(f"{pick(head)} AND {pick(tail)}")
        elif kind == 2:
            out.append(" OR ".join(pick(head + tail) for _ in range(int(rng.integers(2, 5)))))
        elif kind == 3:
            out.append(f"{pick(head)} AND NOT {pick(head)}")
        elif kind == 4:
            a, b = pick(head), pick(head)
            out.append(f'"{a} {b}"')
        elif kind == 5:
            a, b = pick(head), pick(head)
            out.append(f'"{a} {b}"~{int(rng.integers(1, 6))}')
        elif kind == 6:
            t = pick(head)
            out.append(t[: max(2, len(t) - 2)] + "*")
        else:
            out.append(f"{pick(head)} {pick(tail)} {pick(absent)}")
    return out


def _gen_queries_r2(oracle_index, n=80, seed=11):
    """Round-2 surface: boosts, grouping, wildcard/fuzzy/regexp/range mixes."""
    rng = np.random.default_rng(seed)
    head, tail = _vocab(oracle_index, rng)

    def pick(pool):
        return pool[int(rng.integers(0, len(pool)))]

    out = []
    for i in range(n):
        kind = int(rng.integers(0, 7))
        if kind == 0:  # leaf boost in a disjunction
            b = [1, 2, 3, 0.5][int(rng.integers(0, 4))]
            out.append(f"{pick(head)}^{b} OR {pick(tail)}")
        elif kind == 1:  # grouping under AND
            out.append(f"({pick(head)} OR {pick(tail)}) AND {pick(head)}")
        elif kind == 2:  # group boost
            out.append(f"({pick(head)} OR {pick(head)})^2 AND {pick(tail)}")
        elif kind == 3:  # wildcard
            t = pick(head)
            if len(t) >= 4:
                out.append(t[:2] + "?" + t[3:])
            else:
                out.append(t + "*")
        elif kind == 4:  # fuzzy (mutate one char)
            t = pick(head)
            j = int(rng.integers(0, len(t)))
            out.append(t[:j] + "q" + t[j + 1:] + "~1")
        elif kind == 5:  # term range AND scoring term
            a, b = sorted((pick(head), pick(tail)))
            out.append(f"[{a} TO {b}] AND {pick(head)}")
        else:  # regexp
            t = pick(head)
            out.append("/" + t[: max(1, len(t) - 2)] + ".*/")
    return out


def test_random_query_sweep_r2_surface(built_index, oracle_index):
    from voyagr_spark.search import search

    queries = _gen_queries_r2(oracle_index)
    failures = []
    for q in queries:
        got = [
            (r["doc_id"], np.float32(r["score"]))
            for r in search(built_index, q, k=10).collect()
        ]
        want = [(d, s) for d, s in oracle_index.search(q, 10)]
        if got != want:
            failures.append((q, got[:3], want[:3]))
    assert not failures, failures[:5]


def test_random_query_sweep_rank_identical(built_index, oracle_index):
    from voyagr_spark.search import search

    queries = _gen_queries(oracle_index)
    failures = []
    for q in queries:
        got = [
            (r["doc_id"], np.float32(r["score"]))
            for r in search(built_index, q, k=10).collect()
        ]
        want = [(d, s) for d, s in oracle_index.search(q, 10)]
        if got != want:
            failures.append((q, got[:3], want[:3]))
    assert not failures, failures[:5]


def _gen_queries_r3(oracle_index, n=60, seed=13):
    """Round-3 surface: regexp alternation / optional quantifiers (the
    ADVICE r2 bug class: literal prefixes that are NOT mandatory), plus
    minShouldMatch-free disjunction mixes used by the paging/count checks."""
    rng = np.random.default_rng(seed)
    head, tail = _vocab(oracle_index, rng)

    def pick(pool):
        return pool[int(rng.integers(0, len(pool)))]

    out = []
    for i in range(n):
        kind = int(rng.integers(0, 4))
        if kind == 0:  # top-level alternation: no mandatory prefix at all
            out.append(f"/{pick(head)}|{pick(tail)}/")
        elif kind == 1:  # optional quantifier right after the literal run
            t = pick(head)
            if len(t) >= 3:
                out.append("/" + t[:-1] + t[-1] + "?/")
            else:
                out.append(f"/{t}|{pick(tail)}/")
        elif kind == 2:  # grouped alternation with a shared literal prefix
            t = pick(head)
            cut = max(1, len(t) // 2)
            out.append("/" + t[:cut] + "(" + t[cut:] + "|zzz)/")
        else:  # alternation under boolean composition
            out.append(f"/{pick(head)}|{pick(head)}/ AND {pick(head)}")
    return out


def test_random_regexp_sweep_r3(built_index, oracle_index):
    from voyagr_spark.search import search

    failures = []
    for q in _gen_queries_r3(oracle_index):
        got = [
            (r["doc_id"], np.float32(r["score"]))
            for r in search(built_index, q, k=10).collect()
        ]
        want = [(d, s) for d, s in oracle_index.search(q, 10)]
        if got != want:
            failures.append((q, got[:3], want[:3]))
    assert not failures, failures[:5]


def test_random_paging_and_count_parity(built_index, oracle_index):
    """searchAfter page 2 == oracle ranks 11..20; count == oracle count,
    over randomized disjunctions (seed=17)."""
    from voyagr_spark.search import count, search

    rng = np.random.default_rng(17)
    head, tail = _vocab(oracle_index, rng)

    def pick(pool):
        return pool[int(rng.integers(0, len(pool)))]

    failures = []
    for _ in range(15):
        q = " OR ".join(pick(head) for _ in range(int(rng.integers(2, 4))))
        want_all = oracle_index.search(q, 20)
        got1 = search(built_index, q, k=10).collect()
        if len(got1) == 10 and len(want_all) > 10:
            last = got1[-1]
            got2 = [
                (r["doc_id"], np.float32(r["score"]))
                for r in search(
                    built_index, q, k=10,
                    after=(float(last["score"]), int(last["doc_id"])),
                ).collect()
            ]
            want2 = [(d, s) for d, s in want_all[10:20]]
            if got2 != want2:
                failures.append(("page2", q, got2[:3], want2[:3]))
        if count(built_index, q) != oracle_index.count(q):
            failures.append(("count", q))
    assert not failures, failures[:5]


def _gen_span_queries(oracle_index, n=60, seed=23):
    """Random span trees: term / or / near(ordered|unordered, slop 0-5) /
    not(pre,post) / first — depth <= 2, drawn from hot+tail vocabulary."""
    from voyagr_spark.spans import (
        SpanFirstQuery,
        SpanNearQuery,
        SpanNotQuery,
        SpanOrQuery,
        SpanTermQuery,
    )

    rng = np.random.default_rng(seed)
    head, tail = _vocab(oracle_index, rng)
    pool = head + tail + ["zzqx"]

    def pick():
        return pool[int(rng.integers(0, len(pool)))]

    def leaf():
        if rng.random() < 0.25:
            return SpanOrQuery(SpanTermQuery(pick()), SpanTermQuery(pick()))
        return SpanTermQuery(pick())

    out = []
    for _ in range(n):
        kind = int(rng.integers(0, 5))
        if kind == 0:
            out.append(leaf())
        elif kind == 1:
            nclauses = int(rng.integers(2, 4))
            out.append(SpanNearQuery(
                [leaf() for _ in range(nclauses)],
                slop=int(rng.integers(0, 6)),
                in_order=bool(rng.integers(0, 2)),
            ))
        elif kind == 2:
            out.append(SpanNotQuery(
                leaf(), SpanTermQuery(pick()),
                pre=int(rng.integers(0, 3)), post=int(rng.integers(0, 3)),
            ))
        elif kind == 3:
            out.append(SpanFirstQuery(leaf(), int(rng.integers(3, 40))))
        else:
            out.append(SpanNearQuery(
                [SpanNearQuery([leaf(), leaf()], slop=int(rng.integers(0, 3)),
                               in_order=True), leaf()],
                slop=int(rng.integers(0, 4)), in_order=bool(rng.integers(0, 2)),
            ))
    return out


def test_random_span_sweep_rank_identical(built_index, oracle_index):
    """r3 span family: 60 generated span trees, engine vs oracle — ids AND
    float32 scores rank-identical (the engine side exercises the full
    posting/position decode path; the oracle scores from raw postings)."""
    from voyagr_spark.search import search

    for q in _gen_span_queries(oracle_index):
        got = [(r["doc_id"], np.float32(r["score"]))
               for r in search(built_index, q, k=10).collect()]
        want = [(d, s) for d, s in oracle_index.search(q, 10)]
        assert got == want, repr(q)


def test_random_mix_msm_rank_identical(built_index, oracle_index):
    """MUST+SHOULD with minShouldMatch>0 (r5 semantics fix: msm FILTERS
    in a mix — ConjunctionScorer(req, opt), BooleanWeight.java:326-342):
    random programmatic mixes, engine vs the pure-Python oracle, ids AND
    float32 scores rank-identical; includes msm == #optionals (all
    required) and msm > #optionals (matches nothing)."""
    from voyagr_spark.parser import MUST, SHOULD, BooleanQuery, TermQuery
    from voyagr_spark.search import count, search

    rng = np.random.default_rng(13)
    head, tail = _vocab(oracle_index, rng)

    def pick(pool):
        return pool[int(rng.integers(0, len(pool)))]

    failures = []
    for i in range(40):
        n_must = int(rng.integers(1, 3))
        n_should = int(rng.integers(1, 4))
        msm = int(rng.integers(0, n_should + 2))  # includes > n_should
        clauses = tuple((MUST, TermQuery(pick(head))) for _ in range(n_must))
        clauses += tuple(
            (SHOULD, TermQuery(pick(head + tail))) for _ in range(n_should))
        q = BooleanQuery(clauses, min_should_match=msm)
        got = [(r["doc_id"], np.float32(r["score"]))
               for r in search(built_index, q, k=10).collect()]
        want = [(d, s) for d, s in oracle_index.search(q, 10)]
        if got != want:
            failures.append((i, msm, got[:3], want[:3]))
        n = count(built_index, q)
        n_want = len(oracle_index.search(q, 10**9))
        if n != n_want:
            failures.append((i, msm, "count", n, n_want))
    assert not failures, failures[:5]
