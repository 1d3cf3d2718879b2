"""CheckIndex (index/CheckIndex.java analog): a clean index reports no
violations; seeded corruptions of each storage invariant are detected."""

import shutil

import numpy as np
import pytest

from voyagr_spark.checkindex import CorruptIndexError, check_index


def test_clean_index_passes(built_index):
    assert check_index(built_index) == {}


def test_clean_after_delete_and_append(spark, corpus_pdf, tmp_path_factory):
    """Tombstones + NRT appends + merges keep every storage invariant."""
    import pandas as pd

    from voyagr_spark.indexer import build_index
    from voyagr_spark.merge import merge_segments
    from voyagr_spark.streaming import append_batch

    d = tmp_path_factory.mktemp("ci_mut")
    idx = build_index(
        spark, spark.createDataFrame(corpus_pdf), str(d), num_segments=3
    )
    idx.delete_docs(range(5))
    assert check_index(idx) == {}
    extra = corpus_pdf.head(3).copy()
    extra["path"] = extra["path"] + ".appended"
    append_batch(idx, spark.createDataFrame(extra))
    assert check_index(idx) == {}
    segs = [r["seg"]
            for r in idx.postings().select("seg").distinct().collect()]
    merge_segments(idx, segs, new_seg=max(segs) + 1)
    assert check_index(idx) == {}
    shutil.rmtree(d, ignore_errors=True)


@pytest.fixture()
def corrupt_dir(spark, corpus_pdf, tmp_path_factory):
    from voyagr_spark.indexer import build_index

    d = tmp_path_factory.mktemp("ci_corrupt")
    build_index(spark, spark.createDataFrame(corpus_pdf), str(d),
                num_segments=2)
    yield str(d)
    shutil.rmtree(d, ignore_errors=True)


def _rewrite_postings(spark, idx_dir, mutate):
    """Load kind=posting rows, apply `mutate` to the pandas frame, and
    rewrite the dataset in place (simulating on-disk corruption)."""
    import pandas as pd

    from voyagr_spark.indexer import Index

    idx = Index(spark, idx_dir)
    df = idx.postings()
    schema = df.schema
    pdf = mutate(df.toPandas())
    # NaN (pandas' null for the unused doc-row columns) -> None so Spark's
    # Long/Binary fields accept the round-trip
    clean = pdf.astype(object).where(pdf.notna(), None)
    p = f"{idx_dir}/segments/kind=posting"
    shutil.rmtree(p)
    spark.createDataFrame(clean.values.tolist(), schema).write.parquet(p)
    return Index(spark, idx_dir)


def test_detects_stats_drift(spark, corrupt_dir):
    def mutate(pdf):
        pdf.loc[pdf.index[0], "df"] = pdf.loc[pdf.index[0], "df"] + 1
        return pdf

    idx = _rewrite_postings(spark, corrupt_dir, mutate)
    with pytest.raises(CorruptIndexError):
        check_index(idx)
    report = check_index(idx, raise_on_failure=False)
    assert "df" in report or "term_stats" in report


def test_detects_directory_mismatch(spark, corrupt_dir):
    def mutate(pdf):
        i = pdf["block_max_doc"].map(len).idxmax()
        bmd = list(pdf.at[i, "block_max_doc"])
        bmd[0] = bmd[0] + 1
        pdf.at[i, "block_max_doc"] = bmd
        return pdf

    idx = _rewrite_postings(spark, corrupt_dir, mutate)
    report = check_index(idx, raise_on_failure=False)
    assert report.get("block_max_doc", 0) >= 1


def test_detects_blob_corruption(spark, corrupt_dir):
    def mutate(pdf):
        i = pdf["df"].idxmax()
        blob = bytearray(pdf.at[i, "docs_blob"])
        blob[len(blob) // 2] ^= 0xFF
        pdf.at[i, "docs_blob"] = bytes(blob)
        return pdf

    idx = _rewrite_postings(spark, corrupt_dir, mutate)
    report = check_index(idx, raise_on_failure=False)
    assert report  # some invariant must fire (decode/df/ascending/first_doc)


def test_detects_norm_byte_corruption(spark, corrupt_dir):
    import pandas as pd

    from voyagr_spark.indexer import Index

    idx = Index(spark, corrupt_dir)
    pdf = idx.docstats().toPandas()
    pdf.loc[pdf.index[0], "norm_byte"] = (
        int(pdf.loc[pdf.index[0], "norm_byte"]) + 1) % 256
    p = f"{corrupt_dir}/segments/kind=doc"
    schema = idx.docstats().schema
    shutil.rmtree(p)
    clean = pdf.astype(object).where(pdf.notna(), None)
    spark.createDataFrame(clean.values.tolist(), schema).write.parquet(p)
    idx2 = Index(spark, corrupt_dir)
    report = check_index(idx2, raise_on_failure=False)
    assert report.get("norm_byte", 0) == 1
