"""IVFADC (IVF coarse pruning + PQ ADC — Jegou et al., TPAMI 2011,
non-residual variant): layout coverage, full-probe degradation to exact
PQ, pruning actually prunes, recall sanity vs brute cosine."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from voyagr_spark.pipeline import (
    _l2_normalize,
    ivf_assign,
    ivf_kmeans,
    ivf_train_centroids,
    ivfpq_encode,
    ivfpq_topk,
    pq_topk,
    pq_train_codebooks,
)

SF = "/root/testdata/sf0.01"
NC = 8


@pytest.fixture(scope="module")
def emb(spark):
    return spark.read.parquet(f"{SF}/embeddings.parquet").persist()


@pytest.fixture(scope="module")
def ivfpq(spark, emb):
    cents = ivf_train_centroids(emb, n_centroids=NC, iters=5, seed=42)
    books = pq_train_codebooks(emb, m=8, ksub=64, iters=5, seed=42)
    index_df = ivfpq_encode(ivf_assign(emb, cents), books).persist()
    index_df.count()
    return cents, books, index_df


def _q(emb, vec_id=0):
    row = emb.filter(emb.vec_id == vec_id).collect()[0]
    return np.array(row["embedding"], dtype=np.float64)


def test_layout_covers_all_vectors(emb, ivfpq):
    cents, books, idx = ivfpq
    n = emb.count()
    assert idx.count() == n
    assert idx.select("vec_id").distinct().count() == n
    cells = {r["cell"] for r in idx.select("cell").distinct().collect()}
    assert cells <= set(range(NC))
    m = books.shape[0]
    assert idx.select(F.size("code").alias("s")).filter(
        F.col("s") != m).count() == 0


def test_full_probe_equals_exact_pq(emb, ivfpq):
    """nprobe = n_centroids degrades IVFADC to exact PQ over every code
    — the correctness anchor."""
    cents, books, idx = ivfpq
    q = _q(emb)
    want = [(r["vec_id"], r["adc4"]) for r in
            pq_topk(idx.select("vec_id", "code"), books, q, k=20,
                    exclude_vec_id=0).collect()]
    got = [(r["vec_id"], r["adc4"]) for r in
           ivfpq_topk(idx, books, cents, q, k=20, nprobe=NC,
                      exclude_vec_id=0).collect()]
    assert got == want


def test_probe_prunes_candidates(emb, ivfpq):
    """nprobe=2 scans only the probed cells' codes — strictly fewer
    candidates than the corpus (the partition-pruning contract)."""
    cents, books, idx = ivfpq
    q = _q(emb)
    qn = q / np.linalg.norm(q)
    probe = np.argsort(-(_l2_normalize(cents) @ qn))[:2].tolist()
    n_probed = idx.filter(F.col("cell").isin(probe)).count()
    assert 0 < n_probed < idx.count()
    res = ivfpq_topk(idx, books, cents, q, k=10, nprobe=2,
                     exclude_vec_id=0).collect()
    assert len(res) == min(10, n_probed - 1)
    probed_ids = {r["vec_id"] for r in
                  idx.filter(F.col("cell").isin(probe)).collect()}
    assert {r["vec_id"] for r in res} <= probed_ids


def test_recall_vs_brute_cosine(spark, emb, ivfpq):
    """IVFADC top-20 at nprobe=4 recovers most of the exact cosine
    top-10 — same protocol/threshold as test_pq's recall test; measured:
    pruning at nprobe=4 costs ~nothing beyond the PQ quantization
    ceiling (0.6 here on the near-uniform synthetic vectors, equal to
    the full-probe recall)."""
    cents, books, idx = ivfpq
    q = _q(emb)
    pdf = emb.toPandas()
    x = _l2_normalize(np.array(pdf["embedding"].tolist(),
                               dtype=np.float64))
    qn = q / np.linalg.norm(q)
    cos = x @ qn
    ids = pdf["vec_id"].to_numpy()
    mask = ids != 0
    exact10 = set(ids[mask][np.argsort(-cos[mask])[:10]].tolist())
    got = [r["vec_id"] for r in
           ivfpq_topk(idx, books, cents, q, k=20, nprobe=4,
                      exclude_vec_id=0).collect()]
    assert len(exact10 & set(got)) / 10.0 >= 0.5


def test_ivf_kmeans_matches_train_loop(emb):
    """ivf_train_centroids == ivf_kmeans over the same sample (the
    factored loop is the same algorithm)."""
    cents = ivf_train_centroids(emb, n_centroids=NC, iters=5, seed=42)
    pdf = emb.select("embedding").orderBy(F.rand(42)).limit(20_000) \
        .toPandas()
    x = _l2_normalize(np.array(pdf["embedding"].tolist(),
                               dtype=np.float64))
    again = ivf_kmeans(x, n_centroids=NC, iters=5, seed=42)
    assert np.array_equal(cents, again)
