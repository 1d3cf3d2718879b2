"""Bloom term sidecars (voyagr_spark.bloom — lucene/codecs/bloom).

Contract: MurmurHash2/FuzzySet semantics are ported bit-for-bit (the
scalar Python port is the oracle for the vectorized build path); the
filter NEVER false-negatives (before or after downsize, and across
serialization); the sidecar only ever PRUNES segments that definitely
lack every query term, so search results are identical with and
without it, and an absent term fast-fails with every segment pruned.
"""

import random

import numpy as np
import pytest

from voyagr_spark.bloom import (
    USABLE_SIZES,
    FuzzySet,
    build_bloom_sidecar,
    load_blooms,
    murmur2_np,
    murmur2_py,
    nearest_set_size_quality,
    prune_segments,
    term_exists,
)


def _rand_bytes(rng, n):
    return bytes(rng.randrange(256) for _ in range(n))


def test_murmur_vectorized_matches_scalar_port():
    rng = random.Random(7)
    terms = [
        _rand_bytes(rng, n) for n in list(range(20)) * 30
    ] + [b"", b"a", "héllo".encode(), "日本語テキスト".encode()]
    rng.shuffle(terms)
    vec = murmur2_np(terms)
    for t, h in zip(terms, vec.tolist()):
        assert h == murmur2_py(t), t


def test_usable_sizes_are_all_ones():
    for s in USABLE_SIZES:
        assert (s & (s + 1)) == 0 and s >= 3  # binary all-ones
    assert USABLE_SIZES[-1] == 2**31 - 1


def test_quality_sizing_monotone():
    sizes = [nearest_set_size_quality(n) for n in (10, 1000, 100_000)]
    assert sizes == sorted(sizes)
    assert all(s in USABLE_SIZES for s in sizes)


def test_no_false_negatives_incl_downsize_and_serde():
    rng = random.Random(11)
    terms = [_rand_bytes(rng, rng.randrange(1, 24)) for _ in range(500)]
    # oversized accumulator so downsize() actually re-projects
    fs = FuzzySet.create_by_quality(200_000)
    fs.add_terms(terms)
    assert all(fs.may_contain(t) for t in terms)
    small = fs.downsize()
    assert small is not None and small.bloom_size < fs.bloom_size
    assert all(small.may_contain(t) for t in terms)
    back = FuzzySet.deserialize(small.serialize())
    assert back.bloom_size == small.bloom_size
    assert all(back.may_contain(t) for t in terms)
    # definite-NO actually fires for most absent keys at low saturation
    absent = [_rand_bytes(rng, 16) for _ in range(200)]
    hits = sum(back.may_contain(t) for t in absent)
    assert hits < 60  # ~10% saturation -> ~10% false-positive rate


def test_saturation_retire_threshold():
    fs = FuzzySet(USABLE_SIZES[0])  # 3 bits of space
    fs.add_terms([b"a", b"b", b"c", b"d", b"e", b"f"])
    assert fs.saturation() > 0.9


@pytest.fixture(scope="module")
def bloom_index(spark, tmp_path_factory):
    from voyagr_spark.corpus import generate_corpus
    from voyagr_spark.indexer import build_index

    d = tmp_path_factory.mktemp("bloom_index")
    docs = spark.createDataFrame(generate_corpus(200, seed=5)).repartition(4)
    idx = build_index(spark, docs, str(d), num_segments=4)
    return idx


def test_sidecar_search_parity_and_fast_fail(bloom_index):
    from voyagr_spark.search import search

    idx = bloom_index
    queries = ("file", "file AND handle", "file OR zzqxabsent",
               '"file handle"', "handle AND NOT file")
    before = {
        q: [(int(r["doc_id"]), np.float32(r["score"]).tobytes())
            for r in search(idx, q, k=10).collect()]
        for q in queries
    }
    n = build_bloom_sidecar(idx)
    assert n >= 1
    for q in queries:
        after = [(int(r["doc_id"]), np.float32(r["score"]).tobytes())
                 for r in search(idx, q, k=10).collect()]
        assert after == before[q], q
    # absent term: every segment answers definitely-NO
    assert prune_segments(idx, ["zzqxabsentterm"]) == []
    assert search(idx, "zzqxabsentterm", k=10).collect() == []
    assert term_exists(idx, "file") is True
    assert term_exists(idx, "zzqxabsentterm") is False


def test_pruning_is_conservative(bloom_index):
    """Every segment that actually holds the term survives pruning, and
    segments without a filter row (staleness) are always kept."""
    from pyspark.sql import functions as F

    idx = bloom_index
    load_blooms(idx)
    actual = {
        int(r["seg"])
        for r in idx.postings().filter(F.col("term") == "file")
        .select("seg").distinct().collect()
    }
    surv = prune_segments(idx, ["file"])
    survivors = set(surv) if surv is not None else actual
    assert actual <= survivors
    # simulate a post-sidecar appended segment: no filter row -> kept
    blooms = dict(idx._blooms)
    dropped = next(iter(blooms))
    idx._blooms = {s: f for s, f in blooms.items() if s != dropped}
    surv2 = prune_segments(idx, ["zzqxabsentterm"])
    assert surv2 is not None and dropped in surv2
    idx._blooms = blooms


def test_conjunction_pruning_is_all_terms(bloom_index):
    """Query-shape-aware pruning: an AND of a present + an absent term
    scans ZERO segments (any-term would keep every segment the present
    term lives in), while the same pair under OR keeps them all — and
    results stay identical to the unpruned scorer either way."""
    from voyagr_spark.bloom import prune_segments_query
    from voyagr_spark.parser import parse
    from voyagr_spark.search import search

    idx = bloom_index
    load_blooms(idx)
    q_and = parse("file AND zzqxabsentterm")
    assert prune_segments_query(idx, q_and) == []
    assert search(idx, "file AND zzqxabsentterm", k=10).collect() == []
    q_or = parse("file OR zzqxabsentterm")
    surv_or = prune_segments_query(idx, q_or)
    any_term = prune_segments(idx, ["file", "zzqxabsentterm"])
    assert surv_or == any_term  # SHOULD trees keep the any-term rule
    # phrases require every term: one absent word kills the segment
    assert prune_segments_query(idx, parse('"file zzqxabsentterm"')) == []
    # MUST_NOT contributes nothing (pruning on it would LOSE matches)
    q_not = parse("file AND NOT zzqxabsentterm")
    surv_not = prune_segments_query(idx, q_not)
    file_surv = prune_segments(idx, ["file"])
    assert surv_not == file_surv
    # msm counts live disjuncts: 2 required, only 1 can exist
    from voyagr_spark.parser import SHOULD, BooleanQuery, TermQuery

    q_msm = BooleanQuery(
        clauses=((SHOULD, TermQuery("file")),
                 (SHOULD, TermQuery("zzqxabsentterm"))),
        min_should_match=2,
    )
    assert prune_segments_query(idx, q_msm) == []
    # MUST+SHOULD with msm == 0: optionals never gate matching (ReqOptSum)
    # — '+file zzqxabsent' keeps every segment 'file' keeps, and search
    # still returns file's hits with file's scores
    from voyagr_spark.parser import MUST
    from voyagr_spark.search import search as _search

    q_opt = BooleanQuery(
        clauses=((MUST, TermQuery("file")),
                 (SHOULD, TermQuery("zzqxabsentterm"))),
        min_should_match=0,
    )
    assert prune_segments_query(idx, q_opt) == file_surv
    got = [(int(r["doc_id"]), np.float32(r["score"]).tobytes())
           for r in _search(idx, q_opt, k=10).collect()]
    want = [(int(r["doc_id"]), np.float32(r["score"]).tobytes())
            for r in _search(idx, "file", k=10).collect()]
    assert got == want and got
    # MUST+SHOULD with msm > 0 FILTERS (ConjunctionScorer(req, opt),
    # BooleanWeight.java:326-342): >= msm optionals must also match, so an
    # absent-only optional side prunes every segment and matches nothing
    q_mix = BooleanQuery(
        clauses=((MUST, TermQuery("file")),
                 (SHOULD, TermQuery("zzqxabsentterm"))),
        min_should_match=1,
    )
    assert prune_segments_query(idx, q_mix) == []
    assert _search(idx, q_mix, k=10).collect() == []


def test_driver_budget_skips_oversized_sidecar(bloom_index):
    """Past the driver-memory budget the sidecar is ignored (no pruning,
    full scan) — conservative, identical results, no driver OOM at
    10^4-segment scale."""
    from voyagr_spark.search import search

    idx = bloom_index
    build_bloom_sidecar(idx)
    baseline = [(int(r["doc_id"]), float(r["score"]))
                for r in search(idx, "file", k=10).collect()]
    idx._blooms = None
    idx._bloom_budget_bytes = 1  # force the budget fallback
    try:
        assert load_blooms(idx) == {}
        assert prune_segments(idx, ["zzqxabsentterm"]) is None  # no fast-fail
        got = [(int(r["doc_id"]), float(r["score"]))
               for r in search(idx, "file", k=10).collect()]
        assert got == baseline
    finally:
        idx._bloom_budget_bytes = None
        idx._blooms = None
    assert len(load_blooms(idx)) >= 1  # budget restored -> filters load


def test_may_contain_many_matches_scalar():
    rng = random.Random(11)
    fs = FuzzySet.create_by_quality(500)
    terms = [f"t{rng.randrange(10**6)}".encode() for _ in range(400)]
    fs.add_terms(terms[:200])
    probe = terms + [f"x{i}".encode() for i in range(100)]
    got = fs.may_contain_many(probe)
    want = np.array([fs.may_contain(t) for t in probe])
    assert (got == want).all()


def test_checkindex_validates_sidecar(bloom_index, spark):
    """check_sidecar: 0 on a healthy index; a corrupted blob (bits
    cleared) surfaces as false negatives through check_index."""
    import pyarrow as pa
    import pyarrow.parquet as pq
    from pathlib import Path

    from voyagr_spark.bloom import check_sidecar
    from voyagr_spark.checkindex import CorruptIndexError, check_index

    idx = bloom_index
    build_bloom_sidecar(idx)
    assert check_sidecar(idx) == 0
    check_index(idx)  # healthy: no raise
    # corrupt one filter: keep the seg row but zero its bitset
    bdir = Path(idx.dir) / "bloom"
    f = sorted(bdir.glob("*.parquet"))[0]
    tbl = pq.read_table(f)
    segs = tbl["seg"].to_pylist()
    blobs = [bytes(b) for b in tbl["blob"].to_pylist()]
    orig0 = blobs[0]
    fs = FuzzySet.deserialize(blobs[0])
    fs.bits[:] = 0
    blobs[0] = fs.serialize()
    pq.write_table(pa.table({"seg": segs, "blob": blobs}), f)
    idx._blooms = None
    try:
        assert check_sidecar(idx) > 0
        with pytest.raises(CorruptIndexError, match="bloom"):
            check_index(idx)
    finally:
        # restore the healthy sidecar for any later fixture users
        blobs[0] = orig0
        pq.write_table(pa.table({"seg": segs, "blob": blobs}), f)
        idx._blooms = None
    assert check_sidecar(idx) == 0
