"""Pinned-serving-path profile (VERDICT r4 next #3, #7, #8).

One quiet-window run over the sf0.1 bench corpus produces:

* **#8 — where a term query's ~0.1s goes**: job floor, driver-side plan
  build (parse -> make_plan -> DataFrame construction, zero jobs),
  re-collect of a prebuilt DataFrame (Catalyst + scheduling + the task
  wave), and the full search() round trip — the difference attributes
  latency to driver Python vs Spark planning/scheduling vs execution.
* **#3 — batch QPS attribution**: search_many driver-side planning time
  (function call, zero jobs) vs end-to-end wall for the 5-query bench
  batch and a 20-query batch — is per-query planning or the job the
  bottleneck?
* **#7 — positions-less pinning**: phrase p50/p95 served from
  pin(positions=True) vs pin(positions=False) (the memory-saving mode:
  13.2 vs 44.9 bytes/posting, BENCH/PINNED_CACHE.md) — what the smaller
  pin costs on phrase queries.

Writes BENCH/SERVING_PROFILE.md and prints one JSON line.
Env: SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1), SPARK_GRAFT_CPUS.
"""

from __future__ import annotations

import json
import os
import shutil
import statistics
import sys
import tempfile
import time
from pathlib import Path

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from bench import QUERY_CLASSES, bench_corpus, build_session  # noqa: E402


def timed(fn, n=9, warm=2):
    for _ in range(warm):
        fn()
    vals = []
    for _ in range(n):
        t = time.time()
        fn()
        vals.append(time.time() - t)
    return min(vals), statistics.median(vals), sorted(vals)[
        min(len(vals) - 1, int(0.95 * len(vals)))]


def main() -> None:
    from voyagr_spark.parser import parse
    from voyagr_spark.search import make_plan, search, search_many

    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    spark = build_session(cpus)
    spark.sparkContext.setLogLevel("ERROR")
    from voyagr_spark.indexer import build_index

    corpus, n_files = bench_corpus(spark, sf_dir, cpus)
    corpus = corpus.persist()
    corpus.count()
    idx_dir = tempfile.mkdtemp(prefix="voyagr_profserve_")
    shutil.rmtree(idx_dir, ignore_errors=True)
    idx = build_index(spark, corpus, idx_dir, num_segments=max(cpus, 8))
    corpus.unpersist()
    out: dict = {"n_files": n_files, "cpus": cpus}
    lines = [f"# Serving-path profile: {n_files:,} files, local[{cpus}]", ""]
    try:
        idx.pin()
        for q in QUERY_CLASSES.values():
            search(idx, q, k=10).collect()

        # ---- #8: single-query latency attribution ----------------------
        out["floor"] = timed(lambda: spark.range(1).collect())
        an = getattr(idx, "analyzer", None)

        def plan_only():
            make_plan(idx, parse("batch", analyzer=an), k=10)

        out["plan_build"] = timed(plan_only, n=30)

        def df_build():
            search(idx, "batch", k=10)

        out["df_build"] = timed(df_build, n=30)
        prebuilt = search(idx, "batch", k=10)
        out["prebuilt_collect"] = timed(lambda: prebuilt.collect())
        out["full_search"] = timed(lambda: search(idx, "batch", k=10).collect())
        lines += [
            "## #8 Where a pinned term query's latency goes (min / p50 / "
            "p95 s, term_hot)",
            "",
            "| stage | min | p50 | p95 |",
            "|---|---|---|---|",
        ]
        for key, label in [
            ("floor", "job floor (`spark.range(1).collect`)"),
            ("plan_build", "driver plan build (parse+make_plan, 0 jobs)"),
            ("df_build", "DataFrame build (search() w/o collect, 0 jobs)"),
            ("prebuilt_collect",
             "prebuilt DF collect (Catalyst+schedule+1 task wave)"),
            ("full_search", "full search().collect()"),
        ]:
            mn, p50, p95 = out[key]
            lines.append(f"| {label} | {mn:.4f} | {p50:.4f} | {p95:.4f} |")
        mn_f, _, _ = out["full_search"]
        mn_c, _, _ = out["prebuilt_collect"]
        mn_b, _, _ = out["df_build"]
        mn_fl, _, _ = out["floor"]
        lines += [
            "",
            f"Attribution at min: driver Python (plan+DF build) "
            f"{1000 * mn_b:.0f}ms, Catalyst+scheduling+execution "
            f"{1000 * mn_c:.0f}ms (of which job floor {1000 * mn_fl:.0f}ms); "
            f"full path {1000 * mn_f:.0f}ms.",
            "",
        ]

        # ---- #3: batch QPS attribution ---------------------------------
        batch5 = dict(QUERY_CLASSES)
        batch20 = {f"q{i}_{name}": q for i in range(4)
                   for name, q in QUERY_CLASSES.items()}
        out["batch5_plan"] = timed(lambda: search_many(idx, batch5, k=10),
                                   n=15)
        out["batch5_full"] = timed(
            lambda: search_many(idx, batch5, k=10).collect())
        out["batch20_full"] = timed(
            lambda: search_many(idx, batch20, k=10).collect())
        b5 = out["batch5_full"][0]
        b20 = out["batch20_full"][0]
        lines += [
            "## #3 Batch QPS attribution (search_many)",
            "",
            f"| measure | min | p50 | p95 |",
            f"|---|---|---|---|",
        ]
        for key, label in [
            ("batch5_plan", "5-query driver planning only (0 jobs)"),
            ("batch5_full", "5-query batch end-to-end"),
            ("batch20_full", "20-query batch end-to-end"),
        ]:
            mn, p50, p95 = out[key]
            lines.append(f"| {label} | {mn:.4f} | {p50:.4f} | {p95:.4f} |")
        lines += [
            "",
            f"QPS: 5-query batch {5 / b5:.1f}, 20-query batch "
            f"{20 / b20:.1f} — planning is "
            f"{1000 * out['batch5_plan'][0]:.0f}ms of the "
            f"{1000 * b5:.0f}ms batch (driver share "
            f"{100 * out['batch5_plan'][0] / b5:.0f}%).",
            "",
        ]
        out["batch_qps_5"] = round(5 / b5, 2)
        out["batch_qps_20"] = round(20 / b20, 2)

        # ---- #7: positions-less pin phrase cost ------------------------
        def phrase_lat():
            ls = []
            for _ in range(2):
                search(idx, '"fast key"', k=10).collect()
            for _ in range(9):
                t = time.time()
                search(idx, '"fast key"', k=10).collect()
                ls.append(time.time() - t)
            ls.sort()
            return (statistics.median(ls),
                    ls[min(len(ls) - 1, int(0.95 * len(ls)))])

        p50_pos, p95_pos = phrase_lat()
        idx.unpin()
        idx.pin(positions=False)
        p50_nopos, p95_nopos = phrase_lat()
        idx.unpin()
        out["phrase_pos"] = [round(p50_pos, 4), round(p95_pos, 4)]
        out["phrase_nopos"] = [round(p50_nopos, 4), round(p95_nopos, 4)]
        lines += [
            "## #7 Phrase latency by pin mode "
            "(44.9 vs 13.2 bytes/posting, BENCH/PINNED_CACHE.md)",
            "",
            "| pin mode | phrase p50 | phrase p95 |",
            "|---|---|---|",
            f"| positions=True (full pin) | {p50_pos:.3f} | {p95_pos:.3f} |",
            f"| positions=False (slim pin, pos from parquet) "
            f"| {p50_nopos:.3f} | {p95_nopos:.3f} |",
            "",
            f"The slim pin costs {p50_nopos / max(p50_pos, 1e-9):.2f}x "
            "phrase p50 for a 3.4x smaller cache — term/boolean classes "
            "are unaffected (they never touch pos_blob).",
            "",
        ]

        Path(__file__).parent.joinpath("BENCH", "SERVING_PROFILE.md").write_text(
            "\n".join(lines))
        print(json.dumps({k: v for k, v in out.items()}))
        print("wrote BENCH/SERVING_PROFILE.md")
    finally:
        shutil.rmtree(idx_dir, ignore_errors=True)
        spark.stop()


if __name__ == "__main__":
    main()
