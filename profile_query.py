"""Attribute per-query latency to its pipeline stages.

Builds the bench corpus index once (same protocol as bench.py), then times:
  a) floor        - spark.range(1).collect()  (pure job-scheduling floor)
  b) scan_count   - postings scan with the term IN pushdown, count only
  c) scan_collect - same scan, blobs collected (Arrow transfer, no python UDF)
  d) noop_apply   - scan -> groupBy(seg).applyInPandas(no-op)  (adds the
                    Exchange + python-worker round trip)
  e) full_search  - the real search() path
  f) full_noAQE   - search() with spark.sql.adaptive.enabled=false

Each timed min-of-N after warmup, printed as one JSON line.
"""
from __future__ import annotations

import json
import os
import sys
import tempfile
import time

import pandas as pd
from pyspark.sql import functions as F

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from bench import bench_corpus, build_session  # noqa: E402


def timed(fn, n=7, warm=2):
    for _ in range(warm):
        fn()
    vals = []
    for _ in range(n):
        t = time.time()
        fn()
        vals.append(time.time() - t)
    return round(min(vals), 4), round(sorted(vals)[len(vals) // 2], 4)


def main():
    from voyagr_spark.indexer import build_index
    from voyagr_spark.search import RESULT_SCHEMA, search

    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    spark = build_session(cpus)
    corpus, n_files = bench_corpus(spark, sf_dir, cpus)
    corpus = corpus.persist()
    corpus.count()
    idx_dir = tempfile.mkdtemp(prefix="voyagr_prof_idx_")
    import shutil

    shutil.rmtree(idx_dir, ignore_errors=True)
    idx = build_index(spark, corpus, idx_dir, num_segments=max(cpus, 8))
    corpus.unpersist()

    out = {"n_files": n_files}
    out["floor"] = timed(lambda: spark.range(1).collect())

    terms = ["batch"]
    posting_cols = [
        "seg", "term", "first_doc", "df", "max_tf", "min_len", "docs_blob",
        "tfs_blob", "norms_blob", "block_max_doc", "block_max_tf",
        "block_min_len", "block_doc_boff", "block_tf_boff",
    ]

    def rows():
        return (
            idx.postings()
            .filter(F.col("term").isin(terms))
            .select(*posting_cols)
        )

    out["scan_count"] = timed(lambda: rows().count())
    out["scan_collect"] = timed(lambda: rows().collect())

    def _noop(pdf: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame(
            {"doc_id": pd.Series(dtype="int64"), "score": pd.Series(dtype="float32")}
        )

    out["noop_apply"] = timed(
        lambda: rows().groupBy("seg").applyInPandas(_noop, RESULT_SCHEMA).collect()
    )
    out["full_search"] = timed(lambda: search(idx, "batch", k=10).collect())
    out["full_noprune"] = timed(
        lambda: search(idx, "batch", k=10, prune=False).collect()
    )
    out["rare_search"] = timed(lambda: search(idx, "dup", k=10).collect())
    out["rare_noprune"] = timed(
        lambda: search(idx, "dup", k=10, prune=False).collect()
    )

    spark.conf.set("spark.sql.adaptive.enabled", "false")
    out["full_noAQE"] = timed(lambda: search(idx, "batch", k=10).collect())
    out["noop_apply_noAQE"] = timed(
        lambda: rows().groupBy("seg").applyInPandas(_noop, RESULT_SCHEMA).collect()
    )
    out["scan_collect_noAQE"] = timed(lambda: rows().collect())
    spark.conf.set("spark.sql.adaptive.enabled", "true")

    # boolean and phrase classes for the same attribution
    out["bool_and"] = timed(lambda: search(idx, "batch AND dup", k=10).collect())
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    out["bool_and_noAQE"] = timed(lambda: search(idx, "batch AND dup", k=10).collect())
    spark.conf.set("spark.sql.adaptive.enabled", "true")

    print(json.dumps(out))
    shutil.rmtree(idx_dir, ignore_errors=True)
    spark.stop()


if __name__ == "__main__":
    main()
