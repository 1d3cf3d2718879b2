"""Product quantization (PQ): codebook shape, the ADC identity, recall
vs exact brute force, determinism (Jegou et al., TPAMI 2011)."""

import numpy as np
import pytest

from voyagr_spark.pipeline import (
    _l2_normalize,
    pq_adc_table,
    pq_encode,
    pq_reconstruct,
    pq_topk,
    pq_train_codebooks,
)

SF = "/root/testdata/sf0.01"
M, KSUB = 8, 64


@pytest.fixture(scope="module")
def emb(spark):
    return spark.read.parquet(f"{SF}/embeddings.parquet").persist()


@pytest.fixture(scope="module")
def pq(spark, emb):
    books = pq_train_codebooks(emb, m=M, ksub=KSUB, iters=5, seed=42)
    codes = pq_encode(emb, books).persist()
    codes.count()
    return books, codes


def _query_vec(emb, vec_id=0):
    row = emb.filter(emb.vec_id == vec_id).collect()[0]
    return np.array(row["embedding"], dtype=np.float64)


def test_codebook_shape_and_determinism(emb):
    b1 = pq_train_codebooks(emb, m=M, ksub=KSUB, iters=3, seed=42)
    b2 = pq_train_codebooks(emb, m=M, ksub=KSUB, iters=3, seed=42)
    dim = len(emb.first()["embedding"])
    assert b1.shape == (M, KSUB, dim // M)
    np.testing.assert_array_equal(b1, b2)


def test_codes_cover_all_vectors(emb, pq):
    books, codes = pq
    assert codes.count() == emb.count()
    rows = codes.limit(50).collect()
    for r in rows:
        assert len(r["code"]) == M
        assert all(0 <= c < KSUB for c in r["code"])


def test_adc_identity(emb, pq):
    """adc(q, code) == dot(q_norm, reconstruct(code)) — exactly."""
    books, codes = pq
    q = _query_vec(emb, 0)
    qn = q / np.linalg.norm(q)
    lut = pq_adc_table(books, q)
    for r in codes.limit(20).collect():
        code = np.array(r["code"])
        adc = sum(lut[j][code[j]] for j in range(M))
        recon = pq_reconstruct(books, code)
        assert adc == pytest.approx(float(qn @ recon), abs=1e-12)


def test_encode_picks_nearest_centroid(emb, pq):
    books, codes = pq
    got = {r["vec_id"]: np.array(r["code"])
           for r in codes.limit(10).collect()}
    vecs = {r["vec_id"]: np.array(r["embedding"], dtype=np.float64)
            for r in emb.filter(emb.vec_id.isin(list(got))).collect()}
    dsub = books.shape[2]
    for vid, code in got.items():
        x = _l2_normalize(vecs[vid][None, :])[0]
        for j in range(M):
            sub = x[j * dsub:(j + 1) * dsub]
            d2 = ((books[j] - sub) ** 2).sum(axis=1)
            assert code[j] == int(np.argmin(d2))


def test_recall_vs_exact(emb, pq):
    """PQ top-20 must recover most of the exact cosine top-10."""
    books, codes = pq
    q = _query_vec(emb, 0)
    got = [r["vec_id"] for r in
           pq_topk(codes, books, q, k=20, exclude_vec_id=0).collect()]
    pdf = emb.toPandas()
    x = _l2_normalize(np.array(pdf["embedding"].tolist(), dtype=np.float64))
    qn = q / np.linalg.norm(q)
    cos = x @ qn
    ids = pdf["vec_id"].to_numpy()
    mask = ids != 0
    order = np.argsort(-cos[mask])
    exact10 = set(ids[mask][order[:10]].tolist())
    recall = len(exact10 & set(got)) / 10.0
    assert recall >= 0.5, (recall, got[:10], sorted(exact10))


def test_dim_not_divisible_raises(emb):
    with pytest.raises(ValueError, match="not divisible"):
        pq_train_codebooks(emb, m=5, ksub=4, iters=1)
