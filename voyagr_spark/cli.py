"""spark-submit entry point.

Cluster usage (north_rule: spark-submit --py-files on multi-executor):

    zip -r voyagr_spark.zip voyagr_spark/
    spark-submit --master <cluster> --py-files voyagr_spark.zip \
        voyagr_spark/cli.py build  --input <docs.parquet|table> --index <dir> \
                                   [--partitions N] [--docs-per-segment N] [--resume]
    spark-submit ... cli.py search --index <dir> --query 'foo AND "bar baz"' [--k 10]
    spark-submit ... cli.py count  --index <dir> --query 'foo'
    spark-submit ... cli.py merge  --index <dir> [--buckets B]

Input must have columns (repo, path, commit, lang, content) — the input_hint
shape.  All tuning (shuffle partitions, AQE, memory) is left to spark-submit
--conf flags, as a cluster job should.
"""

from __future__ import annotations

import argparse
import json
import sys
import time


def _spark():
    from pyspark.sql import SparkSession

    return SparkSession.builder.appName("voyagr-spark").getOrCreate()


def cmd_build(args) -> None:
    from voyagr_spark.indexer import build_index

    spark = _spark()
    docs = spark.read.parquet(args.input) if args.input.endswith(
        (".parquet", "/")
    ) or "/" in args.input else spark.table(args.input)
    t0 = time.time()
    idx = build_index(
        spark, docs, args.index,
        num_segments=args.partitions,
        docs_per_segment=args.docs_per_segment,
        resume=args.resume,
    )
    print(json.dumps({
        "built": args.index, "max_doc": idx.max_doc,
        "segments": idx.meta.get("num_segments"),
        "seconds": round(time.time() - t0, 2),
    }))


def cmd_search(args) -> None:
    from voyagr_spark.indexer import Index
    from voyagr_spark.search import search

    spark = _spark()
    idx = Index(spark, args.index)
    after = tuple(json.loads(args.after)) if args.after else None
    rows = search(idx, args.query, k=args.k, after=after).collect()
    for r in rows:
        print(json.dumps({"doc_id": r["doc_id"], "score": float(r["score"])}))


def cmd_count(args) -> None:
    from voyagr_spark.indexer import Index
    from voyagr_spark.search import count

    idx = Index(_spark(), args.index)
    print(json.dumps({"count": count(idx, args.query)}))


def cmd_merge(args) -> None:
    from voyagr_spark.indexer import Index
    from voyagr_spark.merge import run_tiered_merge

    idx = Index(_spark(), args.index)
    n = run_tiered_merge(idx, seg_buckets=args.buckets)
    print(json.dumps({"merges": n}))


def main(argv=None) -> None:
    p = argparse.ArgumentParser(prog="voyagr-spark")
    sub = p.add_subparsers(dest="cmd", required=True)

    b = sub.add_parser("build")
    b.add_argument("--input", required=True)
    b.add_argument("--index", required=True)
    b.add_argument("--partitions", type=int, default=None)
    b.add_argument("--docs-per-segment", type=int, default=100_000)
    b.add_argument("--resume", action="store_true")
    b.set_defaults(fn=cmd_build)

    s = sub.add_parser("search")
    s.add_argument("--index", required=True)
    s.add_argument("--query", required=True)
    s.add_argument("--k", type=int, default=10)
    s.add_argument("--after", default=None, help='JSON "[score, doc_id]" cursor')
    s.set_defaults(fn=cmd_search)

    c = sub.add_parser("count")
    c.add_argument("--index", required=True)
    c.add_argument("--query", required=True)
    c.set_defaults(fn=cmd_count)

    m = sub.add_parser("merge")
    m.add_argument("--index", required=True)
    m.add_argument("--buckets", type=int, default=1)
    m.set_defaults(fn=cmd_merge)

    args = p.parse_args(argv)
    args.fn(args)


if __name__ == "__main__":
    main()
