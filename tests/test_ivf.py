"""IVF ANN: exactness at nprobe=all, recall sanity at small nprobe."""

import numpy as np
import pytest

from voyagr_spark.pipeline import ivf_assign, ivf_topk, ivf_train_centroids

SF = "/root/testdata/sf0.01"
NC = 8


@pytest.fixture(scope="module")
def emb(spark):
    return spark.read.parquet(f"{SF}/embeddings.parquet").persist()


@pytest.fixture(scope="module")
def ivf(spark, emb):
    cents = ivf_train_centroids(emb, n_centroids=NC, iters=5, seed=42)
    assigned = ivf_assign(emb, cents).persist()
    assigned.count()
    return cents, assigned


def _query_vec(emb, vec_id=0):
    row = emb.filter(emb.vec_id == vec_id).collect()[0]
    return np.array(row["embedding"], dtype=np.float64)


def test_assign_covers_all_vectors(emb, ivf):
    cents, assigned = ivf
    assert assigned.count() == emb.count()
    cells = {r["cell"] for r in assigned.select("cell").distinct().collect()}
    assert cells <= set(range(NC)) and len(cells) > 1


def test_full_probe_equals_brute_force(spark, emb, ivf):
    from voyagr_spark.relational import ann_topk

    cents, assigned = ivf
    q = _query_vec(emb)
    got = ivf_topk(assigned, cents, q, k=10, nprobe=NC,
                   exclude_vec_id=0).collect()
    want = ann_topk(spark, SF, 0, 10).collect()
    assert [(r["rank"], r["vec_id"]) for r in got] == [
        (r["rank"], r["vec_id"]) for r in want
    ]
    for g, w in zip(got, want):
        assert abs(g["cos4"] - w["cos4"]) < 1e-9


def test_small_probe_recall(spark, emb, ivf):
    from voyagr_spark.relational import ann_topk

    cents, assigned = ivf
    q = _query_vec(emb)
    truth = {r["vec_id"] for r in ann_topk(spark, SF, 0, 10).collect()}
    got = {r["vec_id"]
           for r in ivf_topk(assigned, cents, q, k=10, nprobe=4,
                             exclude_vec_id=0).collect()}
    # seeded + deterministic: half the cells probed must keep most of top-10
    assert len(got & truth) >= 5


def test_train_deterministic(emb):
    a = ivf_train_centroids(emb, n_centroids=NC, iters=3, seed=42)
    b = ivf_train_centroids(emb, n_centroids=NC, iters=3, seed=42)
    assert np.allclose(a, b)


def test_sq8_quantized_recall_vs_exact(spark):
    """SQ8 first pass: quantized top-10 recalls most of the exact cosine
    top-10 (64-dim unit vectors, int8 -> worst-case quantization error per
    dim ~0.004).  Deterministic data -> pinned floor."""
    from voyagr_spark.relational import ann_topk, sq8_ann_topk

    sf = "/root/testdata/sf0.001"
    exact = [r["vec_id"] for r in ann_topk(spark, sf, 0, 10).collect()]
    sq8 = [r["vec_id"] for r in sq8_ann_topk(spark, sf, 0, 10).collect()]
    recall = len(set(exact) & set(sq8)) / 10.0
    assert recall >= 0.8, (recall, exact, sq8)


def test_sq8_signature_range(spark):
    import numpy as np

    from voyagr_spark.relational import sq8_signatures

    rows = sq8_signatures(spark, "/root/testdata/sf0.001").collect()
    qs = np.array([r["q"] for r in rows])
    assert qs.min() >= -127 and qs.max() <= 127
    # unit-normalized: the quantized norm is close to 127
    norms = np.sqrt((qs.astype(np.float64) ** 2).sum(axis=1))
    assert abs(norms - 127).max() < 2.0
