"""Full StatsComponent surface: sumOfSquares / stddev / calcdistinct.

Contract (solr/core/src/java/org/apache/solr/handler/component/
StatsValuesFactory.java): sumOfSquares accumulates value*value (:432),
stddev = sqrt((n*sumSq - sum^2)/(n*(n-1))) with 0.0 when n <= 1 (:524),
calcdistinct counts the distinct value set (:130-145); the distributed
merge adds sumOfSquares (:415) and unions the distinct sets (:182).
relational.stats_field(full=True) must match a literal numpy recompute,
and shards.sharded_stats_field(full=True) must equal the unsplit stats.
"""

import math

import numpy as np
import pytest

from voyagr_spark.shards import sharded_stats_field, split_index

SF = "/root/testdata/sf0.001"


def _reference_stats(vals):
    vals = np.asarray(vals, dtype=np.int64)
    n = len(vals)
    s = int(vals.sum())
    sq = int((vals * vals).sum())
    if n <= 1:
        sd = 0.0
    else:
        sd = math.sqrt((n * float(sq) - float(s) * float(s)) / (n * (n - 1.0)))
    return {
        "n": n, "min_v": int(vals.min()), "max_v": int(vals.max()),
        "sum_v": s, "mean_v": float(s) / n, "sumsq_v": sq,
        "stddev_v": sd, "distinct_v": len(set(vals.tolist())),
    }


def test_stats_full_matches_numpy(spark):
    from voyagr_spark import relational as R

    row = R.stats_field(spark, SF, "batch", "n_chars", full=True).collect()[0]
    m = R.terms_tf(spark, SF).filter("term = 'batch'").select("doc_id")
    d = R.documents(spark, SF).select("doc_id", "n_chars")
    vals = [r.n_chars for r in m.join(d, "doc_id").collect()]
    ref = _reference_stats(vals)
    for k, v in ref.items():
        got = getattr(row, k)
        if isinstance(v, float):
            assert got == pytest.approx(v, abs=0, rel=0), (k, got, v)
        else:
            assert got == v, (k, got, v)


def test_stats_full_single_doc_stddev_zero(
    spark, built_index, oracle_index, tmp_path_factory
):
    """n == 1 -> stddev 0.0, the reference's count<=1 guard (exercised
    through the sharded merge, whose stddev derives post-merge from a
    single surviving partial)."""
    # find a df=1 term from the fixture corpus via the python oracle
    term = sorted(
        t for t, plist in oracle_index.postings.items() if len(plist) == 1
    )[0]
    base = tmp_path_factory.mktemp("stats_one")
    shards = split_index(built_index, [str(base / "a"), str(base / "b")])
    row = sharded_stats_field(shards, term, "nchars", full=True).collect()[0]
    assert row.n == 1
    assert row.stddev_v == 0.0
    assert row.distinct_v == 1
    assert row.sumsq_v == row.sum_v * row.sum_v


def test_sharded_stats_full_equals_unsplit(spark, built_index, tmp_path_factory):
    """Distributed merge == unsplit stats: sumOfSquares adds, stddev
    derives post-merge, calcdistinct is the union-set size."""
    base = tmp_path_factory.mktemp("stats_shards")
    shards = split_index(built_index, [str(base / "a"), str(base / "b")])
    got = sharded_stats_field(shards, "file", "nchars", full=True).collect()[0]

    # unsplit reference: same match set on the source index
    from voyagr_spark.search import scores

    ids = scores(built_index, "file").select("doc_id")
    dm = built_index.docmap().select("doc_id", "nchars")
    vals = [r.nchars for r in ids.join(dm, "doc_id").collect()]
    ref = _reference_stats(vals)
    for k, v in ref.items():
        assert getattr(got, k) == pytest.approx(v, abs=0, rel=0), (k, getattr(got, k), v)
