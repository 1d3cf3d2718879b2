"""Engine-native top-k vs the DuckDB float32/quantized-norm oracle.

Replicates the driver's CORRECTNESS gate for the five engine entries
(`engine_topk_*`, `engine_batch_topk`): the oracle SQL in __spark_entry__
reproduces the engine's float32 + SmallFloat-quantized-norm BM25 pipeline
with per-operation CAST(... AS FLOAT) (double-rounding at binary64 is
innocuous for binary32 + - * /), so (rank, doc_id, score) must match
BIT-EXACTLY — not just to 4 decimals.  Because both sides produce the same
float32 bits, rank flips between the engines are impossible by construction
(no score-separation assumption needed).
"""

import duckdb
import numpy as np
import pytest

SF_DIR = "/root/testdata/sf0.001"

ENGINE_ENTRIES = [
    "engine_topk_hot",
    "engine_topk_and",
    "engine_topk_or",
    "engine_topk_phrase",
    "engine_topk_grouped",
    "engine_topk_boost",
    "engine_prefix",
    "engine_batch_topk",
]


@pytest.fixture(scope="module")
def entry_mod():
    import __spark_entry__ as m

    return m


@pytest.fixture(scope="module")
def duck():
    con = duckdb.connect()
    for t in ("documents", "embeddings"):
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{SF_DIR}/{t}.parquet'")
    return con


@pytest.mark.parametrize("name", ENGINE_ENTRIES)
def test_engine_entry_bitexact_vs_duckdb(spark, entry_mod, duck, name):
    sdf = entry_mod.queries()[name](spark, SF_DIR).toPandas()
    odf = duck.sql(entry_mod.oracle_sql()[name]).df()
    scols, ocols = sorted(sdf.columns), sorted(odf.columns)
    assert scols == ocols
    s = sdf[scols].sort_values(scols).reset_index(drop=True)
    o = odf[ocols].sort_values(ocols).reset_index(drop=True)
    assert s.shape == o.shape
    for c in scols:
        sv, ov = s[c].to_numpy(), o[c].to_numpy()
        if sv.dtype.kind == "f":
            # bit-exact float32, not approx
            assert np.array_equal(
                sv.astype(np.float32).view(np.int32),
                ov.astype(np.float32).view(np.int32),
            ), c
        else:
            assert (sv == ov).all(), c


def test_qlen_table_covers_and_matches_smallfloat(entry_mod):
    # the inlined (lo, hi, qlen) table must agree with encode_norm/NORM_TABLE
    # on every doclen it covers (spot grid + all boundaries)
    from voyagr_spark.smallfloat import NORM_TABLE, encode_norm

    con = duckdb.connect()
    rows = con.sql(
        f"SELECT lo, hi, CAST(qlen AS FLOAT) FROM (VALUES {entry_mod._qlen_rows()})"
        " t(lo, hi, qlen) ORDER BY lo"
    ).fetchall()
    # contiguous cover from 1
    assert rows[0][0] == 1
    for (l1, h1, _), (l2, _, _) in zip(rows, rows[1:]):
        assert l2 == h1 + 1
    for lo, hi, q in rows[:80]:  # boundary probes (large hi bisection is slow)
        for n in {lo, hi}:
            b = int(encode_norm(np.array([n], dtype=np.int64))[0])
            assert np.float32(q).view(np.int32) == NORM_TABLE[b].view(np.int32)
