"""Block join (lucene/join ToParentBlockJoinQuery / ToChildBlockJoinQuery).

Oracle: OracleIndex over the SAME combined corpus (children + one parent
row per repo, parent path = 0x7f so it sorts last in its block), child
scores grouped per parent in pure numpy with the reference's ScoreMode
arithmetic (double accumulation in doc-id order, float cast)."""

import sys
from pathlib import Path

import numpy as np
import pandas as pd
import pytest

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

from voyagr_spark.blockjoin import (
    BLOCK_PARENT_PATH,
    PARENT_TOKEN,
    blockmap,
    build_block_index,
    to_child_topk,
    to_parent_topk,
)
from voyagr_spark.oracle import OracleIndex


@pytest.fixture(scope="module")
def combined_pdf(corpus_pdf):
    import hashlib

    parents = pd.DataFrame(
        {
            "repo": sorted(corpus_pdf["repo"].unique()),
            "path": BLOCK_PARENT_PATH,
            "commit": hashlib.md5(PARENT_TOKEN.encode()).hexdigest(),
            "lang": "__parent__",
            "content": PARENT_TOKEN,
        }
    )
    cols = ["repo", "path", "commit", "lang", "content"]
    return pd.concat([corpus_pdf[cols], parents], ignore_index=True)


@pytest.fixture(scope="module")
def block_index(spark, corpus_pdf, tmp_path_factory):
    d = tmp_path_factory.mktemp("blockidx")
    children = spark.createDataFrame(corpus_pdf).repartition(6)
    return build_block_index(spark, children, str(d), num_segments=4)


@pytest.fixture(scope="module")
def block_oracle(combined_pdf):
    """OracleIndex over the combined corpus + the parent/child id maps."""
    ordered = combined_pdf.sort_values(["repo", "path", "commit"]).reset_index(
        drop=True
    )
    oi = OracleIndex(combined_pdf)
    is_parent = (ordered["path"] == BLOCK_PARENT_PATH).to_numpy()
    parent_ids = np.flatnonzero(is_parent)
    # each child's parent = the next parent id above it (block adjacency)
    parent_of = {}
    for did in np.flatnonzero(~is_parent):
        parent_of[did] = int(parent_ids[np.searchsorted(parent_ids, did)])
    return oi, parent_of, set(int(p) for p in parent_ids)


def _oracle_to_parent(block_oracle, qtext, mode, k=10):
    oi, parent_of, parents = block_oracle
    hits = oi.search(qtext, k=oi.max_doc)
    groups = {}
    for d, s in hits:
        assert d not in parents, "child query must not match parent docs"
        groups.setdefault(parent_of[d], []).append((d, np.float32(s)))
    out = []
    for p, ds in groups.items():
        ds.sort()  # doc-id order accumulation (BlockJoinScorer)
        vals = [s for _, s in ds]
        if mode == "max":
            sc = np.float32(max(vals))
        elif mode == "min":
            sc = np.float32(min(vals))
        elif mode == "none":
            sc = np.float32(0.0)
        else:
            tot = np.float64(0.0)
            for v in vals:
                tot += np.float64(v)
            sc = np.float32(tot / len(vals)) if mode == "avg" else np.float32(tot)
        out.append((p, sc))
    out.sort(key=lambda t: (-float(t[1]), t[0]))
    return out[:k]


@pytest.mark.parametrize("mode", ["max", "total", "avg", "min", "none"])
def test_to_parent_modes(block_index, block_oracle, mode):
    got = [
        (r.doc_id, np.float32(r.score))
        for r in to_parent_topk(block_index, "open", k=10,
                                score_mode=mode).collect()
    ]
    want = _oracle_to_parent(block_oracle, "open", mode)
    if mode == "none":  # score-free: rank is by doc id only
        assert sorted(d for d, _ in got) == sorted(d for d, _ in want)
        assert all(s == np.float32(0.0) for _, s in got)
    else:
        assert got == want


def test_to_parent_boolean_child_query(block_index, block_oracle):
    q = "open AND file"
    got = [
        (r.doc_id, np.float32(r.score))
        for r in to_parent_topk(block_index, q, k=10,
                                score_mode="total").collect()
    ]
    assert got == _oracle_to_parent(block_oracle, q, "total")


def test_to_child(block_index, block_oracle):
    oi, parent_of, parents = block_oracle
    phits = dict(oi.search(PARENT_TOKEN, k=oi.max_doc))
    assert set(phits) == parents  # which-term matches exactly the parents
    want = sorted(
        ((d, np.float32(phits[p])) for d, p in parent_of.items()),
        key=lambda t: (-float(t[1]), t[0]),
    )[:10]
    got = [
        (r.doc_id, np.float32(r.score))
        for r in to_child_topk(block_index, PARENT_TOKEN, k=10).collect()
    ]
    assert got == want


def test_block_layout(block_index, block_oracle):
    """Parents land LAST in their block: every child id maps to the next
    parent id above it, exactly the addDocuments adjacency contract."""
    _, parent_of, parents = block_oracle
    bm = {r.doc_id: r.parent_doc for r in blockmap(block_index).collect()}
    assert bm == parent_of
    assert set(bm.values()) <= parents
    dm = block_index.docmap().select("doc_id", "path").collect()
    got_parents = {r.doc_id for r in dm if r.path == BLOCK_PARENT_PATH}
    assert got_parents == parents


def test_contract_errors(block_index, built_index):
    with pytest.raises(ValueError, match="score_mode"):
        to_parent_topk(block_index, "open", score_mode="bogus").collect()
    with pytest.raises(ValueError, match="build_block_index"):
        blockmap(built_index)


def test_append_blocks(spark, corpus_pdf, tmp_path):
    """Streaming addDocuments: appended complete blocks extend the
    blockmap; raw appends are refused; layout invariants stay clean."""
    import pandas as pd

    from voyagr_spark.blockjoin import append_blocks, build_block_index
    from voyagr_spark.checkindex import check_index
    from voyagr_spark.streaming import append_batch

    d = tmp_path / "blkapp"
    children = spark.createDataFrame(corpus_pdf.head(60)).repartition(3)
    idx = build_block_index(spark, children, str(d), num_segments=2)
    base = idx.max_doc

    with pytest.raises(ValueError, match="append_blocks"):
        append_batch(idx, spark.createDataFrame(corpus_pdf.head(2)))

    batch = pd.DataFrame({
        "repo": ["zzrepo/new"] * 3,
        "path": [f"doc/n{i}" for i in range(3)],
        "commit": [f"c{i}" for i in range(3)],
        "lang": ["py"] * 3,
        "content": ["zzunique alpha beta"] * 3,
    })
    append_blocks(idx, spark.createDataFrame(batch))
    from voyagr_spark.indexer import Index
    idx = Index(spark, str(d))

    bm = {r.doc_id: r.parent_doc for r in blockmap(idx).collect()}
    new_children = {i for i in bm if i >= base}
    assert len(new_children) == 3
    new_parent = {bm[i] for i in new_children}
    assert len(new_parent) == 1
    (np_id,) = new_parent
    assert np_id == base + 3          # children first, parent LAST
    assert all(i < np_id for i in new_children)

    hits = to_parent_topk(idx, "zzunique", k=10, score_mode="max").collect()
    assert [r.doc_id for r in hits] == [np_id]
    assert check_index(idx) == {}


def test_block_index_merge_and_addindexes_guard(spark, corpus_pdf, tmp_path):
    """Posting merges never touch the blockmap (ids are global); addIndexes
    refuses block indexes (the sidecar would need re-basing)."""
    from voyagr_spark.blockjoin import build_block_index
    from voyagr_spark.indexer import Index
    from voyagr_spark.merge import add_indexes, merge_segments

    d = tmp_path / "blkmerge"
    idx = build_block_index(
        spark, spark.createDataFrame(corpus_pdf.head(60)).repartition(3),
        str(d), num_segments=2)
    before = [(r.doc_id, r.score)
              for r in to_parent_topk(idx, "open", k=5).collect()]
    live = idx.live_segments or sorted(
        r.seg for r in idx.postings().select("seg").distinct().collect())
    merge_segments(idx, list(live), max(live) + 1)
    idx = Index(spark, str(d))
    after = [(r.doc_id, r.score)
             for r in to_parent_topk(idx, "open", k=5).collect()]
    assert after == before
    with pytest.raises(ValueError, match="blockmap"):
        add_indexes(idx, idx)


def test_replicated_block_index(spark, block_index, block_oracle, tmp_path):
    """replicator.sync carries the blocks sidecar: the replica serves
    block joins bit-identically."""
    from voyagr_spark.indexer import Index
    from voyagr_spark.replicator import sync

    dst = tmp_path / "blkreplica"
    sync(str(block_index.dir), str(dst))
    replica = Index(spark, str(dst))
    got = [(r.doc_id, np.float32(r.score))
           for r in to_parent_topk(replica, "open", k=10,
                                   score_mode="total").collect()]
    assert got == _oracle_to_parent(block_oracle, "open", "total")
