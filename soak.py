"""10x soak (VERDICT r3 next #7): build + the five bench query classes +
one dedup-pipeline pass at ~250k docs — 10x the sf0.1 bench corpus —
to convert the 100x-readiness argument from plans to measurement.

Writes BENCH/SOAK_{N}K.md with per-unit rates next to the sf0.1 bench
record so sub/super-linear drift is visible at a glance.

Env: VOYAGR_SOAK_DOCS (default 250000), SPARK_GRAFT_CPUS (default 32),
     VOYAGR_SOAK_RUNS (default 5 per query class).
"""

from __future__ import annotations

import os
import shutil
import statistics
import sys
import tempfile
import time
from pathlib import Path

from pyspark.sql import SparkSession
from pyspark.sql import functions as F

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from bench import QUERY_CLASSES, build_session  # same protocol as bench.py

N_DOCS = int(os.environ.get("VOYAGR_SOAK_DOCS", "250000"))
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
RUNS = int(os.environ.get("VOYAGR_SOAK_RUNS", "5"))


def main() -> None:
    from voyagr_spark.corpus import corpus_spark
    from voyagr_spark.indexer import build_index
    from voyagr_spark.relational import dedup_pipeline
    from voyagr_spark.search import search, search_many

    spark = build_session(CPUS)
    spark.sparkContext.setLogLevel("ERROR")
    lines = [f"# 10x soak: {N_DOCS:,} docs, local[{CPUS}]", ""]
    try:
        corpus = corpus_spark(spark, N_DOCS, seed=42, partitions=CPUS).persist()
        n = corpus.count()

        # ---- build (best-of-2, sync+settle like bench.py) ----
        idx_dir = tempfile.mkdtemp(prefix="voyagr_soak_idx_")
        build_s = float("inf")
        for _ in range(2):
            shutil.rmtree(idx_dir, ignore_errors=True)
            os.sync()
            time.sleep(1.0)
            t0 = time.time()
            idx = build_index(spark, corpus, idx_dir, num_segments=CPUS)
            build_s = min(build_s, time.time() - t0)
        lines += [
            f"Build: {n:,} files in {build_s:.2f}s best-of-2 = "
            f"**{n / build_s:,.0f} files/s**",
            "",
        ]
        print(lines[-2], flush=True)

        # ---- serving: five classes, interleaved, p50/p95 ----
        idx.pin()
        for q in QUERY_CLASSES.values():
            for _ in range(3):
                search(idx, q, k=10).collect()
        lat: dict[str, list[float]] = {k: [] for k in QUERY_CLASSES}
        for _ in range(RUNS):
            for name, q in QUERY_CLASSES.items():
                t = time.time()
                search(idx, q, k=10).collect()
                lat[name].append(time.time() - t)
        lines += ["| class | p50 (s) | p95 (s) |", "|---|---|---|"]
        for name, ls in lat.items():
            ls = sorted(ls)
            p95 = ls[min(len(ls) - 1, int(0.95 * len(ls)))]
            lines.append(
                f"| {name} | {statistics.median(ls):.3f} | {p95:.3f} |")
            print(lines[-1], flush=True)
        search_many(idx, dict(QUERY_CLASSES), k=10).collect()
        bs = float("inf")
        for _ in range(3):
            t = time.time()
            search_many(idx, dict(QUERY_CLASSES), k=10).collect()
            bs = min(bs, time.time() - t)
        lines += ["", f"Batched QPS (search_many, min-of-3): "
                      f"**{len(QUERY_CLASSES) / bs:.2f}**", ""]

        # ---- dedup pipeline over a 250k-doc documents table ----
        doc_dir = tempfile.mkdtemp(prefix="voyagr_soak_docs_")
        docs = corpus.select(
            F.monotonically_increasing_id().alias("_m"),
            F.col("content").alias("text"),
            "lang",
            F.col("repo").alias("source"),
        )
        from pyspark.sql import Window

        docs = docs.withColumn(
            "doc_id", F.row_number().over(Window.orderBy("_m")) - 1
        ).select(
            "doc_id", "text", "lang", "source",
            F.length("text").alias("n_chars"),
        )
        docs.repartition(CPUS).write.mode("overwrite").parquet(
            f"{doc_dir}/documents.parquet")
        t0 = time.time()
        kept = (
            dedup_pipeline(spark, doc_dir, bucket_cap=64)
            .agg(F.sum(F.col("keep").cast("long")).alias("k"),
                 F.count(F.lit(1)).alias("n"))
            .collect()[0]
        )
        dd_s = time.time() - t0
        lines += [
            f"Dedup pipeline (MinHash->LSH->Jaccard->retention, "
            f"bucket_cap=64): {dd_s:.1f}s over {kept['n']:,} docs = "
            f"**{kept['n'] / dd_s:,.0f} docs/s**, kept {kept['k']:,} "
            f"({100.0 * kept['k'] / kept['n']:.1f}%)",
            "",
        ]
        print(lines[-2], flush=True)

        # ---- linearity readout vs the sf0.1 bench record ----
        lines += [
            "Linearity: compare files/s and per-class p50 against the",
            "current sf0.1 driver bench record (BENCH_r0{N}.json — 25k",
            "files).  At 10x corpus size, build files/s should hold",
            "roughly flat (scan-dominated, fixed per-task overheads",
            "amortize) and query p50s should grow sub-linearly (top-k",
            "over a pinned columnar cache: one task wave + k-row merge).",
            "",
        ]
        out = (Path(__file__).parent / "BENCH"
               / f"SOAK_{N_DOCS // 1000}K.md")
        out.write_text("\n".join(lines))
        print(f"wrote {out}")
        shutil.rmtree(idx_dir, ignore_errors=True)
        shutil.rmtree(doc_dir, ignore_errors=True)
    finally:
        spark.stop()


if __name__ == "__main__":
    main()
