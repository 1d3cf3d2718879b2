"""Disambiguate query-class slowness from time-correlated host noise.

Interleaves the bench query classes round-robin for several minutes and
prints (wall_ts, loadavg, class, latency) per run — if slowness clusters by
TIME rather than by CLASS, it's external noise, not a code regression.
"""
from __future__ import annotations

import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from bench import QUERY_CLASSES, bench_corpus, build_session  # noqa: E402


def main():
    from voyagr_spark.indexer import build_index
    from voyagr_spark.search import search

    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    rounds = int(os.environ.get("PROBE_ROUNDS", "12"))
    spark = build_session(cpus)
    corpus, _ = bench_corpus(spark, sf_dir, cpus)
    corpus = corpus.persist()
    corpus.count()
    idx_dir = tempfile.mkdtemp(prefix="voyagr_probe_idx_")
    shutil.rmtree(idx_dir, ignore_errors=True)
    idx = build_index(spark, corpus, idx_dir, num_segments=max(cpus, 8))
    corpus.unpersist()

    for name, q in QUERY_CLASSES.items():
        search(idx, q, k=10).collect()  # one warmup each

    t_start = time.time()
    for r in range(rounds):
        for name, q in QUERY_CLASSES.items():
            load = open("/proc/loadavg").read().split()[0]
            t = time.time()
            search(idx, q, k=10).collect()
            dt = time.time() - t
            print(
                f"{time.time() - t_start:8.1f}s load={load:>6} {name:<10} {dt:.3f}",
                flush=True,
            )
    shutil.rmtree(idx_dir, ignore_errors=True)
    spark.stop()


if __name__ == "__main__":
    main()
