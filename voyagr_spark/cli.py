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
    q = args.query
    if getattr(args, "syntax", "classic") == "surround":
        from voyagr_spark.surround import parse_surround

        q = parse_surround(q)
    rows = search(idx, q, k=args.k, after=after,
                  similarity=getattr(args, "similarity", "bm25")).collect()
    for r in rows:
        print(json.dumps({"doc_id": r["doc_id"], "score": float(r["score"])}))


def cmd_count(args) -> None:
    from voyagr_spark.indexer import Index
    from voyagr_spark.search import count

    idx = Index(_spark(), args.index)
    print(json.dumps({"count": count(idx, args.query)}))


def cmd_select(args) -> None:
    from voyagr_spark.indexer import Index
    from voyagr_spark.solr_api import solr_select

    idx = Index(_spark(), args.index)
    rows = solr_select(
        idx, args.query, fq=args.fq or None, fl=args.fl, sort=args.sort,
        rows=args.rows, start=args.start,
    ).collect()
    for r in rows:
        print(json.dumps(r.asDict()))


def cmd_suggest(args) -> None:
    from voyagr_spark.highlight import suggest
    from voyagr_spark.indexer import Index

    idx = Index(_spark(), args.index)
    for r in suggest(idx, args.term, max_edits=args.max_edits,
                     top=args.top).collect():
        print(json.dumps(r.asDict()))


def cmd_batch(args) -> None:
    from voyagr_spark.indexer import Index
    from voyagr_spark.search import search_many

    idx = Index(_spark(), args.index)
    queries = json.loads(args.queries)  # {"id": "query text", ...}
    for r in search_many(idx, queries, k=args.k).collect():
        print(json.dumps({"query_id": r["query_id"], "doc_id": r["doc_id"],
                          "score": float(r["score"])}))


def cmd_explain(args) -> None:
    from voyagr_spark.indexer import Index
    from voyagr_spark.search import explain

    idx = Index(_spark(), args.index)
    print(json.dumps(explain(idx, args.query, args.doc)))


def cmd_merge(args) -> None:
    from voyagr_spark.indexer import Index
    from voyagr_spark.merge import run_tiered_merge

    idx = Index(_spark(), args.index)
    n = run_tiered_merge(idx, seg_buckets=args.buckets)
    print(json.dumps({"merges": n}))


def cmd_check(args) -> None:
    from voyagr_spark.checkindex import check_index
    from voyagr_spark.indexer import Index

    idx = Index(_spark(), args.index)
    report = check_index(idx, raise_on_failure=False)
    print(json.dumps({"clean": not report, "violations": report}))
    if report:
        raise SystemExit(1)


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
    s.add_argument("--syntax", choices=["classic", "surround"],
                   default="classic",
                   help="query language: classic parser or surround (W/N "
                        "span operators)")
    s.add_argument("--similarity", choices=["bm25", "classic"],
                   default="bm25",
                   help="scoring similarity (classic = TF-IDF)")
    s.set_defaults(fn=cmd_search)

    c = sub.add_parser("count")
    c.add_argument("--index", required=True)
    c.add_argument("--query", required=True)
    c.set_defaults(fn=cmd_count)

    m = sub.add_parser("merge")
    m.add_argument("--index", required=True)
    m.add_argument("--buckets", type=int, default=1)
    m.set_defaults(fn=cmd_merge)

    sel = sub.add_parser("select", help="Solr /select params")
    sel.add_argument("--index", required=True)
    sel.add_argument("--query", required=True)
    sel.add_argument("--fq", action="append", default=[])
    sel.add_argument("--fl", default=None)
    sel.add_argument("--sort", default=None)
    sel.add_argument("--rows", type=int, default=10)
    sel.add_argument("--start", type=int, default=0)
    sel.set_defaults(fn=cmd_select)

    sg = sub.add_parser("suggest")
    sg.add_argument("--index", required=True)
    sg.add_argument("--term", required=True)
    sg.add_argument("--max-edits", type=int, default=2)
    sg.add_argument("--top", type=int, default=5)
    sg.set_defaults(fn=cmd_suggest)

    bt = sub.add_parser("batch", help="search_many over a JSON query map")
    bt.add_argument("--index", required=True)
    bt.add_argument("--queries", required=True,
                    help='JSON object {"id": "query", ...}')
    bt.add_argument("--k", type=int, default=10)
    bt.set_defaults(fn=cmd_batch)

    ck = sub.add_parser(
        "check", help="CheckIndex: verify every storage invariant"
    )
    ck.add_argument("--index", required=True)
    ck.set_defaults(fn=cmd_check)

    ex = sub.add_parser("explain")
    ex.add_argument("--index", required=True)
    ex.add_argument("--query", required=True)
    ex.add_argument("--doc", type=int, required=True)
    ex.set_defaults(fn=cmd_explain)

    args = p.parse_args(argv)
    args.fn(args)


if __name__ == "__main__":
    main()
