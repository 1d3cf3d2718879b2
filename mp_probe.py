"""No-Spark scaling probe of the invert kernel (cited by BENCH/BASELINE.md).

Runs invert_flush (analyze -> invert -> encode, the executor hot loop) in N
independent OS processes on the same 1000-doc block and reports aggregate
docs/sec.  Isolates the kernel's parallel scalability from everything
Spark adds (JVM, shuffle, parquet): on this box it shows ~0.87 efficiency
1->8 processes and ~0.65 at 8->32, locating the high-core-count ceiling in
the machine's memory bus rather than the engine.

Usage: python mp_probe.py [N ...]   (default: 1 8 32)
"""

from __future__ import annotations

import sys
import time
from multiprocessing import Process, Queue

REPS = 3


def work(q: Queue, reps: int) -> None:
    import numpy as np

    from voyagr_spark.corpus import generate_corpus
    from voyagr_spark.indexer import invert_flush

    pdf = generate_corpus(1000, seed=42)
    pdf["content_sha256"] = "x"
    doc_ids = np.arange(len(pdf), dtype=np.int64)
    t0 = time.time()
    for i in range(reps):
        invert_flush(i, doc_ids, pdf["content"], pdf)
    q.put(time.time() - t0)


def run(n: int) -> float:
    q: Queue = Queue()
    ps = [Process(target=work, args=(q, REPS)) for _ in range(n)]
    t0 = time.time()
    for p in ps:
        p.start()
    for p in ps:
        p.join()
    wall = time.time() - t0
    per = sorted(q.get() for _ in ps)
    rate = n * REPS * 1000 / wall
    print(f"n={n:3d}  wall={wall:6.2f}s  per-proc[min..max]="
          f"{per[0]:.2f}..{per[-1]:.2f}s  docs/sec={rate:,.0f}")
    return rate


def main() -> None:
    levels = [int(a) for a in sys.argv[1:]] or [1, 8, 32]
    rates = {n: run(n) for n in levels}
    for lo, hi in zip(levels, levels[1:]):
        eff = rates[hi] / (hi / lo * rates[lo])
        print(f"efficiency {lo}->{hi}: {eff:.3f}")


if __name__ == "__main__":
    main()
