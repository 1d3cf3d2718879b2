"""Seeded randomized differential sweep: block join + payload scoring.

30 random child boolean queries x random ScoreModes through
ToParentBlockJoin vs the combined-corpus OracleIndex grouped in numpy,
and 12 random terms x random PayloadFunctions vs a float32 Python fold —
rank-identical top-10 (ids AND float32 scores) for every case.
Deterministic (seed=23)."""

import sys
from pathlib import Path

import numpy as np
import pytest

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

from voyagr_spark.blockjoin import to_parent_topk
from voyagr_spark.payloads import payload_score_topk

from test_blockjoin import (  # noqa: E402 — shared fixtures/oracle
    _oracle_to_parent,
    block_index,
    block_oracle,
    combined_pdf,
)
from test_payloads import (  # noqa: E402
    _oracle_payload,
    ordered_pdf,
    pay_analyzer,
    pay_index,
    plain_oracle,
)


def _vocab(oi, min_df=2):
    return sorted(t for t, p in oi.postings.items() if len(p) >= min_df)


def test_random_block_join_sweep(block_index, block_oracle):
    oi, _, parents = block_oracle
    rng = np.random.default_rng(23)
    vocab = _vocab(oi)
    vocab = [t for t in vocab if t != "parentdoc"]
    modes = ["max", "min", "total", "avg"]
    for _ in range(30):
        k = int(rng.integers(1, 4))
        terms = [vocab[int(rng.integers(0, len(vocab)))] for _ in range(k)]
        op = [" OR ", " AND "][int(rng.integers(0, 2))]
        q = op.join(terms)
        mode = modes[int(rng.integers(0, len(modes)))]
        got = [(r.doc_id, np.float32(r.score))
               for r in to_parent_topk(block_index, q, k=10,
                                       score_mode=mode).collect()]
        want = _oracle_to_parent(block_oracle, q, mode)
        assert got == want, (q, mode)


def test_random_payload_sweep(pay_index, ordered_pdf, plain_oracle):
    rng = np.random.default_rng(23)
    vocab = _vocab(plain_oracle, min_df=3)
    funcs = ["max", "min", "sum", "avg"]
    for _ in range(12):
        t = vocab[int(rng.integers(0, len(vocab)))]
        func = funcs[int(rng.integers(0, len(funcs)))]
        span = bool(rng.integers(0, 2))
        got = [(r.doc_id, np.float32(r.score))
               for r in payload_score_topk(pay_index, t, func=func,
                                           include_span_score=span,
                                           k=10).collect()]
        want = _oracle_payload(ordered_pdf, plain_oracle, t, func,
                               include_span_score=span)
        assert got == want, (t, func, span)
