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


def test_gate_margins():
    """The ann_pq_topk gate compares engine floats against a DuckDB oracle
    that recomputes L2-normalize + per-subspace argmin + the LUT fold with
    its own summation order.  That compare is only stable if (a) every
    argmin winner beats its runner-up by far more than an ulp and (b) no
    ADC value sits on a round(.,4) boundary.  Pin both margins on the gate
    corpus at the driver's gate scale."""
    import pyarrow.parquet as papq

    import __spark_entry__ as E
    from voyagr_spark.pipeline import pq_adc_table

    t = papq.read_table(f"{SF}/embeddings.parquet",
                        columns=["vec_id", "embedding"]).sort_by("vec_id")
    ids = np.asarray(t.column("vec_id"))
    x = np.array(t.column("embedding").to_pylist(), dtype=np.float64)
    xn = _l2_normalize(x)
    books = E._pq_gate_books(xn)
    m, ksub, dsub = books.shape

    min_gap = np.inf
    codes = np.empty((xn.shape[0], m), dtype=np.int64)
    for j in range(m):
        sub = xn[:, j * dsub:(j + 1) * dsub]
        d = -2.0 * (sub @ books[j].T) + (books[j] ** 2).sum(axis=1)
        srt = np.sort(d, axis=1)
        min_gap = min(min_gap, float((srt[:, 1] - srt[:, 0]).min()))
        codes[:, j] = np.argmin(d, axis=1)
    # winner-vs-runner-up distance gap dwarfs summation-order ulp noise
    assert min_gap > 1e-9, min_gap

    q = x[int(np.flatnonzero(ids == 0)[0])]
    lut = pq_adc_table(books, q)
    adc = np.zeros(xn.shape[0])
    for j in range(m):
        adc += lut[j][codes[:, j]]
    # distance of every ADC value from the nearest .00005 rounding
    # boundary: np.round vs SQL round can only disagree within an ulp of it
    frac = np.abs((adc * 1e4) - np.floor(adc * 1e4) - 0.5)
    assert float(frac.min()) > 1e-6, float(frac.min())
