"""bucket_cap recall probe (VERDICT r4 "what's wrong" #2).

The production dedup config (`dedup_pipeline(shingle=3, bucket_cap=64)`)
switches hot LSH buckets (> cap members) from the quadratic within-bucket
self-join to linear candidate generation (bucket-min links + id-order
neighbor links, relational._lsh_candidates).  Pairs co-occurring ONLY in
a capped bucket and NOT adjacent to the min/neighbor chain are never
verified — this probe plants near-dup template families LARGER than the
cap and measures what drop-recall that costs against the uncapped exact
pipeline.

Corpus: `base` unique random-word docs plus `families` template families
of `fam_size` near-dups each (fam_size >> bucket_cap=64); each family
member mutates `mut` words of its 80-word template at random positions,
so members are pairwise near-dups (3-shingle Jaccard ~0.85) without
being identical.

Usage: python recall_probe.py [--fam-size 200] [--families 3] [--cap 64]
Prints one JSON line: drop sets, recall, false drops, and per-config
wall time.
"""

from __future__ import annotations

import argparse
import json
import random
import shutil
import tempfile
import time

_WORDS = [f"w{i:03d}" for i in range(400)]


def build_corpus(spark, out_dir: str, base: int = 1000, families: int = 3,
                 fam_size: int = 200, doc_len: int = 80, mut: int = 2,
                 seed: int = 5, chain: bool = False) -> None:
    rng = random.Random(seed)
    rows = []
    doc_id = 0
    for _ in range(base):
        text = " ".join(rng.choice(_WORDS) for _ in range(doc_len))
        rows.append((doc_id, text, "en", f"src{doc_id % 7}", len(text)))
        doc_id += 1
    fam_texts = []
    for f in range(families):
        template = [rng.choice(_WORDS) for _ in range(doc_len)]
        cur = list(template)
        for _ in range(fam_size):
            if chain:
                # drift chain: mutate CUMULATIVELY — adjacent members stay
                # near-dups, distant members drop below threshold; the
                # family is connected only through the chain
                for _ in range(mut):
                    cur[rng.randrange(doc_len)] = rng.choice(_WORDS)
                fam_texts.append((" ".join(cur), f"fam{f}"))
            else:
                m = list(template)
                for _ in range(mut):
                    m[rng.randrange(doc_len)] = rng.choice(_WORDS)
                fam_texts.append((" ".join(m), f"fam{f}"))
    if chain:
        # shuffle id assignment so the id-order neighbor link inside a
        # hot bucket is NOT the chain predecessor
        rng.shuffle(fam_texts)
    for text, src in fam_texts:
        rows.append((doc_id, text, "en", src, len(text)))
        doc_id += 1
    pdf = spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, n_chars long"
    )
    pdf.repartition(8).write.mode("overwrite").parquet(
        f"{out_dir}/documents.parquet")


def run(spark, sf_dir: str, cap: int | None, shingle: int = 3):
    from voyagr_spark.relational import dedup_pipeline

    t0 = time.time()
    rows = dedup_pipeline(spark, sf_dir, bucket_cap=cap,
                          shingle=shingle).collect()
    dt = time.time() - t0
    dropped = {r["doc_id"] for r in rows if not r["keep"]}
    return dropped, dt


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--base", type=int, default=1000)
    ap.add_argument("--families", type=int, default=3)
    ap.add_argument("--fam-size", type=int, default=200)
    ap.add_argument("--cap", type=int, default=64)
    ap.add_argument("--chain", action="store_true")
    ap.add_argument("--cpus", type=int, default=8)
    args = ap.parse_args()

    from pyspark.sql import SparkSession

    spark = (
        SparkSession.builder.master(f"local[{args.cpus}]")
        .config("spark.sql.shuffle.partitions", str(args.cpus * 2))
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    d = tempfile.mkdtemp(prefix="recall_probe_")
    try:
        build_corpus(spark, d, base=args.base, families=args.families,
                     fam_size=args.fam_size, chain=args.chain)
        drop_exact, t_exact = run(spark, d, cap=None)
        drop_cap, t_cap = run(spark, d, cap=args.cap)
        missed = drop_exact - drop_cap
        false = drop_cap - drop_exact
        recall = (len(drop_exact & drop_cap) / len(drop_exact)
                  if drop_exact else 1.0)
        print(json.dumps({
            "base": args.base, "families": args.families,
            "fam_size": args.fam_size, "cap": args.cap, "chain": args.chain,
            "dropped_exact": len(drop_exact), "dropped_capped": len(drop_cap),
            "missed": len(missed), "false_drops": len(false),
            "recall": round(recall, 4),
            "t_exact_s": round(t_exact, 2), "t_capped_s": round(t_cap, 2),
        }))
    finally:
        shutil.rmtree(d, ignore_errors=True)
        spark.stop()


if __name__ == "__main__":
    main()
