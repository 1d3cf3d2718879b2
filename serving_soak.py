"""Serving-surface soak at 250k docs (VERDICT r4 next #5 + #6):

* filterCache economics under a realistic faceted-browse workload —
  repeated (q, fq) requests through /select: hit rate, wall time with the
  cache vs `{!cache=false}` bypass, and eviction churn when the distinct
  fq pool exceeds FILTER_CACHE_MAX;
* sharded scatter-gather overhead — the five bench query classes against
  the unsplit pinned index vs split_index(2) and split_index(4) shards
  (pinned, exact global IDF), p50/p95 per class.

Writes BENCH/SERVING_SOAK.md.  Env: VOYAGR_SOAK_DOCS (default 250000),
SPARK_GRAFT_CPUS (default 32), VOYAGR_SOAK_RUNS (default 5).
"""

from __future__ import annotations

import os
import shutil
import statistics
import sys
import tempfile
import time
from pathlib import Path

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from bench import QUERY_CLASSES, build_session  # same protocol as bench.py

N_DOCS = int(os.environ.get("VOYAGR_SOAK_DOCS", "250000"))
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
RUNS = int(os.environ.get("VOYAGR_SOAK_RUNS", "5"))

#: 4 repeating fqs x 20 q terms = the browse workload (hit-heavy: after
#: the first pass every fq is cached until a commit).  Two fq families
#: measured separately: docmap-field predicates (recompute = a pushed
#: scan predicate) vs QUERY fqs (recompute = a scoring pass — the DocSet
#: shape the filterCache exists for)
FQS_PRED = ["lang:python", "lang:java", "doclen:[50 TO 200]", "lang:go"]
FQS_QUERY = ["fast AND key", "batch OR merge", '"fast key"',
             "scan AND row"]
QTERMS = ["batch", "dup", "fast", "key", "vector", "merge", "scan",
          "join", "sort", "group", "table", "row", "column", "query",
          "stream", "window", "filter", "value", "data", "spark"]


def pct(ls, p):
    """True median for p=0.5; nearest-rank over len-1 otherwise (the old
    int(p*len) form returned the MAX of a 2-sample as its 'median')."""
    ls = sorted(ls)
    if p == 0.5:
        return statistics.median(ls)
    return ls[min(len(ls) - 1, max(0, round(p * (len(ls) - 1))))]


def main() -> None:
    from voyagr_spark.corpus import corpus_spark
    from voyagr_spark.indexer import build_index
    from voyagr_spark.search import search
    from voyagr_spark.shards import sharded_search, split_index
    from voyagr_spark.solr_api import (FILTER_CACHE_MAX, clear_filter_cache,
                                       solr_select)

    spark = build_session(CPUS)
    spark.sparkContext.setLogLevel("ERROR")
    lines = [f"# Serving soak: {N_DOCS:,} docs, local[{CPUS}]", ""]
    tmp = tempfile.mkdtemp(prefix="voyagr_serving_soak_")
    try:
        corpus = corpus_spark(spark, N_DOCS, seed=42,
                              partitions=CPUS).persist()
        corpus.count()
        idx = build_index(spark, corpus, f"{tmp}/idx", num_segments=CPUS)
        idx.pin()
        for q in QUERY_CLASSES.values():  # warm JVM + pinned cache
            search(idx, q, k=10).collect()

        # ---- A. filterCache: browse workload, cache vs bypass ----------
        def browse(fqs, prefix: str) -> float:
            t0 = time.time()
            for qt in QTERMS:
                for f_ in fqs:
                    solr_select(idx, qt, fq=prefix + f_, rows=10).collect()
            return time.time() - t0

        lines += [
            "## filterCache under a browse workload "
            f"({len(QTERMS)} q x 4 fq = {len(QTERMS) * 4} requests/pass, "
            "min of 3 post-warm passes)",
            "",
            "| fq family | cached wall/pass | bypass wall/pass | speedup "
            "| hit rate |",
            "|---|---|---|---|---|",
        ]
        for fam, fqs in (("docmap predicates", FQS_PRED),
                         ("QUERY fqs", FQS_QUERY)):
            _zero = {"hits": 0, "misses": 0, "evictions": 0}
            clear_filter_cache(idx)
            browse(fqs, "")  # warm pass: populates the cache (all misses)
            stats0 = dict(getattr(idx, "_fq_cache_stats", _zero))
            t_cached = min(browse(fqs, "") for _ in range(3))
            stats1 = dict(getattr(idx, "_fq_cache_stats", _zero))
            t_bypass = min(browse(fqs, "{!cache=false}") for _ in range(3))
            reqs = len(QTERMS) * len(fqs)
            hits = stats1["hits"] - stats0["hits"]
            misses = stats1["misses"] - stats0["misses"]
            lines.append(
                f"| {fam} | {t_cached:.2f}s "
                f"({1000 * t_cached / reqs:.0f}ms/req) | {t_bypass:.2f}s "
                f"({1000 * t_bypass / reqs:.0f}ms/req) "
                f"| {t_bypass / t_cached:.2f}x "
                + ("| n/a (predicates never cache) |"
                   if hits + misses == 0 else
                   f"| {100 * hits / (hits + misses):.1f}% |"))
            print(lines[-1], flush=True)
        lines.append("")

        # ---- A2. eviction churn: distinct QUERY fqs > FILTER_CACHE_MAX
        # (field predicates never cache since r5, so churn is a
        # query-fq-only phenomenon)
        churn_fqs = [f"{a} OR {b}" for a in QTERMS[:12]
                     for b in QTERMS[12:20]][:96]
        clear_filter_cache(idx)
        t0 = time.time()
        for _ in range(2):  # 2 cycles: second cycle re-misses evicted fqs
            for f_ in churn_fqs:
                solr_select(idx, "batch", fq=f_, rows=10).collect()
        t_churn = time.time() - t0
        st = dict(getattr(idx, "_fq_cache_stats",
                          {"hits": 0, "misses": 0, "evictions": 0}))
        lines += [
            f"## Eviction churn ({len(churn_fqs)} distinct fqs > "
            f"FILTER_CACHE_MAX={FILTER_CACHE_MAX}, 2 cycles)",
            "",
            f"{st['hits']} hits / {st['misses']} misses / "
            f"{st['evictions']} evictions over {2 * len(churn_fqs)} "
            f"requests, {t_churn:.1f}s total "
            f"({1000 * t_churn / (2 * len(churn_fqs)):.0f}ms/request — "
            "every request past the cap pays the miss cost: an LRU cap "
            "under a cycling workload larger than itself never hits).",
            "",
        ]
        print(lines[-2], flush=True)

        # ---- B. sharded scatter-gather vs unsplit ----------------------
        lat: dict[str, dict[str, list[float]]] = {
            name: {} for name in QUERY_CLASSES}
        for name, q in QUERY_CLASSES.items():
            for _ in range(2):
                search(idx, q, k=10).collect()
            ls = []
            for _ in range(RUNS):
                t = time.time()
                search(idx, q, k=10).collect()
                ls.append(time.time() - t)
            lat[name]["unsplit"] = ls
        for n_sh in (2, 4):
            shards = split_index(
                idx, [f"{tmp}/sh{n_sh}_{i}" for i in range(n_sh)])
            for s in shards:
                s.pin()
            for name, q in QUERY_CLASSES.items():
                for _ in range(2):
                    sharded_search(shards, q, k=10).collect()
                ls = []
                for _ in range(RUNS):
                    t = time.time()
                    sharded_search(shards, q, k=10).collect()
                    ls.append(time.time() - t)
                lat[name][f"{n_sh}sh"] = ls
            for s in shards:
                s.unpin()
        lines += [
            "## Sharded scatter-gather (pinned shards, exact global IDF) "
            f"vs unsplit pinned, p50/p95 over {RUNS} runs",
            "",
            "| class | unsplit p50 | 2-shard p50 | 4-shard p50 "
            "| unsplit p95 | 2-shard p95 | 4-shard p95 |",
            "|---|---|---|---|---|---|---|",
        ]
        for name, d in lat.items():
            row = f"| {name} "
            for p in (0.5, 0.95):
                for cfg in ("unsplit", "2sh", "4sh"):
                    row += f"| {pct(d[cfg], p):.3f} "
            lines.append(row + "|")
            print(lines[-1], flush=True)
        lines.append("")

        out = Path(__file__).parent / "BENCH" / "SERVING_SOAK.md"
        out.write_text("\n".join(lines))
        print(f"wrote {out}")
    finally:
        shutil.rmtree(tmp, ignore_errors=True)
        spark.stop()


if __name__ == "__main__":
    main()
