"""Regressions from the round-4 deep review of the serving hot path.

Each test pins a specific verified finding:
* MaxScore OR pruning must not run under searchAfter (page 2+ needs the
  below-tau docs the pruning skips).
* A position-consuming disjunct under DisjunctionMaxQuery must select
  pos_blob (crash: KeyError('pos_blob') executor-side).
* The single-clause columnar shortcut must not bypass an unsatisfiable
  min_should_match (1 SHOULD clause, msm=2 -> zero matches).
* decode_positions_flat must handle zero-tf docs (latent: starts[i]-1
  wrapped to csum[-1]).
"""

import numpy as np

from voyagr_spark.parser import (
    MUST_NOT,
    SHOULD,
    BooleanQuery,
    DisjunctionMaxQuery,
    PhraseQuery,
    TermQuery,
    parse,
)
from voyagr_spark.search import search


def _rows(df):
    return [(int(r["doc_id"]), np.float32(r["score"]).tobytes())
            for r in df.collect()]


def test_or_paging_prunes_exactly(built_index):
    """Every page of a pure-OR query under prune=True equals the unpruned
    pages — MaxScore must step aside once a cursor is in play."""
    q = "file OR handle OR parse"
    built_index.unpin()  # the cold path is where _or_maxscore runs
    try:
        after = None
        for _ in range(4):  # walk 4 pages deep
            pruned = search(built_index, q, k=5, prune=True, after=after)
            exact = search(built_index, q, k=5, prune=False, after=after)
            rp, re_ = _rows(pruned), _rows(exact)
            assert rp == re_, (after, rp, re_)
            if not rp:
                break
            last = pruned.collect()[-1]
            after = (float(last["score"]), int(last["doc_id"]))
    finally:
        built_index.pin()


def test_dismax_with_phrase_disjunct(built_index):
    """DisMax over (phrase, term): pos_blob must reach the scorer; with
    tie=0 and a lone phrase disjunct, scores equal the bare phrase."""
    ph = parse('"file handle"')
    assert isinstance(ph, PhraseQuery)
    lone = DisjunctionMaxQuery(disjuncts=(ph,), tie=0.0)
    want = _rows(search(built_index, ph, k=10))
    got = _rows(search(built_index, lone, k=10))
    assert got == want and got
    # a mixed (phrase | term) dismax must simply not crash and must
    # contain the term-only matches' doc set when the phrase is absent
    mixed = DisjunctionMaxQuery(
        disjuncts=(PhraseQuery(terms=("file", "zzqxabsent"),
                               positions=(0, 1)),
                   TermQuery("handle")),
        tie=0.0,
    )
    got2 = _rows(search(built_index, mixed, k=10))
    want2 = _rows(search(built_index, TermQuery("handle"), k=10))
    assert got2 == want2 and got2


def test_single_should_msm_unsatisfiable_columnar(built_index):
    """1 SHOULD clause with msm=2 matches nothing, pinned or cold."""
    q = BooleanQuery(clauses=((SHOULD, TermQuery("file")),),
                     min_should_match=2)
    built_index.unpin()
    try:
        cold = _rows(search(built_index, q, k=10))
    finally:
        built_index.pin()
    warm = _rows(search(built_index, q, k=10))
    assert cold == [] and warm == []
    # sanity: msm=1 matches normally on both paths
    q1 = BooleanQuery(clauses=((SHOULD, TermQuery("file")),),
                      min_should_match=1)
    assert _rows(search(built_index, q1, k=10))


def test_decode_positions_flat_zero_tf():
    from voyagr_spark.codec import (
        decode_positions_flat,
        encode_positions_flat,
    )

    # docs: [] , [3, 7], [], [2], [0, 1, 5]
    tfs = np.array([0, 2, 0, 1, 3], dtype=np.int64)
    flat = np.array([3, 7, 2, 0, 1, 5], dtype=np.int64)
    blob = encode_positions_flat(flat, tfs)
    abs_pos, doc_idx = decode_positions_flat(blob, tfs)
    assert abs_pos.tolist() == [3, 7, 2, 0, 1, 5]
    assert doc_idx.tolist() == [1, 1, 3, 4, 4, 4]
    # zero-tf FIRST doc (the wrapped-index case)
    tfs0 = np.array([0, 2], dtype=np.int64)
    flat0 = np.array([4, 9], dtype=np.int64)
    blob0 = encode_positions_flat(flat0, tfs0)
    abs0, idx0 = decode_positions_flat(blob0, tfs0)
    assert abs0.tolist() == [4, 9] and idx0.tolist() == [1, 1]
