"""Randomized pruning-parity property: for ANY query tree, search results
with a bloom sidecar active are bit-identical to the unpruned scorer.

This is the one-sided contract `prune_segments_query` must keep
(FuzzySet.java: false positives allowed, false negatives never): a
segment may only be skipped when the query PROVABLY cannot match there.
The r4 review found exactly this class of bug (msm counted against
optional clauses the scorer never gates on), so the generator leans on
the adversarial shapes: MUST+SHOULD with msm, absent terms in every
clause position, phrases with absent words, nested booleans, DisMax.
"""

import numpy as np
import pytest

from voyagr_spark.bloom import build_bloom_sidecar, prune_segments_query
from voyagr_spark.corpus import generate_corpus
from voyagr_spark.indexer import build_index
from voyagr_spark.parser import (
    MUST,
    MUST_NOT,
    SHOULD,
    BooleanQuery,
    DisjunctionMaxQuery,
    PhraseQuery,
    TermQuery,
)
from voyagr_spark.search import search

PRESENT = ["file", "handle", "parse", "tree", "node", "query", "index",
           "open", "merge", "segment"]
ABSENT = ["zzqa", "zzqb", "zzqc"]


@pytest.fixture(scope="module")
def pruned_index(spark, tmp_path_factory):
    d = tmp_path_factory.mktemp("prune_rand_idx")
    docs = spark.createDataFrame(generate_corpus(160, seed=13)).repartition(4)
    idx = build_index(spark, docs, str(d), num_segments=4)
    return idx


def _rand_tree(rng, depth=0):
    pool = PRESENT + ABSENT
    pick = lambda p: p[int(rng.integers(0, len(p)))]
    kind = int(rng.integers(0, 8 if depth < 2 else 3))
    if kind <= 1:
        return TermQuery(pick(pool))
    if kind == 2:
        n = int(rng.integers(2, 4))
        return PhraseQuery(
            terms=tuple(pick(pool) for _ in range(n)),
            positions=tuple(range(n)),
        )
    if kind == 3:
        return DisjunctionMaxQuery(
            disjuncts=tuple(_rand_tree(rng, depth + 1)
                            for _ in range(int(rng.integers(2, 4)))),
            tie=float(rng.choice([0.0, 0.5])),
        )
    # boolean: random occurs + msm
    n = int(rng.integers(2, 5))
    occs = [("MUST", "SHOULD", "MUST_NOT")[int(rng.integers(0, 3))]
            for _ in range(n)]
    if all(o == "MUST_NOT" for o in occs):
        occs[0] = "MUST"  # at least one positive clause
    clauses = tuple(
        ({"MUST": MUST, "SHOULD": SHOULD, "MUST_NOT": MUST_NOT}[o],
         _rand_tree(rng, depth + 1))
        for o in occs
    )
    n_should = sum(1 for o in occs if o == "SHOULD")
    msm = int(rng.integers(0, n_should + 2)) if n_should else 0
    return BooleanQuery(clauses=clauses, min_should_match=msm)


def _rows(df):
    return [(int(r["doc_id"]), np.float32(r["score"]).tobytes())
            for r in df.collect()]


def test_random_trees_pruning_parity(pruned_index):
    rng = np.random.default_rng(29)
    queries = [_rand_tree(rng) for _ in range(40)]
    cold = [_rows(search(pruned_index, q, k=10)) for q in queries]
    assert any(cold)  # the generator produces real matches
    n = build_bloom_sidecar(pruned_index)
    assert n >= 1
    pruned_any = 0
    for q, want in zip(queries, cold):
        got = _rows(search(pruned_index, q, k=10))
        assert got == want, repr(q)
        if prune_segments_query(pruned_index, q) is not None:
            pruned_any += 1
    # the property is vacuous if nothing ever pruned
    assert pruned_any > 0
