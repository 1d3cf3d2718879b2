"""Stage-by-stage timing of build_index to locate serial bottlenecks.

Usage: python profile_build.py <cpus> [docs]
Replicates build_index's stages with timers; prints per-stage wall times and
per-partition row counts (skew check).
"""

import json
import shutil
import sys
import tempfile
import time

from pyspark.sql import SparkSession
from pyspark.sql import functions as F


def main(cpus: int, ndocs: int):
    from voyagr_spark.corpus import corpus_spark
    from voyagr_spark.indexer import DOC_KEY, SEGMENT_SCHEMA, make_invert_fn

    spark = (
        SparkSession.builder.master(f"local[{cpus}]")
        .appName(f"profile-{cpus}")
        .config("spark.sql.shuffle.partitions", str(max(cpus, 8)))
        .config("spark.driver.memory", "24g")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    docs = corpus_spark(spark, num_docs=ndocs, seed=42, partitions=cpus).persist()
    n = docs.count()
    import pyarrow as pa

    def passthru(bs):
        for b in bs:
            yield pa.RecordBatch.from_pydict(
                {"n": [b.num_rows]}, schema=pa.schema([pa.field("n", pa.int64())])
            )

    docs.mapInArrow(passthru, "n long").count()  # warm python worker pool
    # rough corpus size
    sz = docs.select(F.sum(F.length("content"))).collect()[0][0]
    print(f"docs={n} content_bytes={sz/1e6:.1f}MB", flush=True)

    idx_dir = tempfile.mkdtemp(prefix=f"prof_{cpus}_")
    stages = {}

    t = time.time()
    ranged = (
        docs.withColumn("content_sha256", F.sha2(F.col("content"), 256))
        .repartitionByRange(cpus, *DOC_KEY)
        .sortWithinPartitions(*DOC_KEY)
        .persist()
    )
    counts = (
        ranged.select(F.spark_partition_id().alias("pid"))
        .groupBy("pid").count().collect()
    )
    stages["1_range_shuffle_and_count"] = time.time() - t

    by_pid = sorted((r["pid"], r["count"]) for r in counts)
    cs = [c for _, c in by_pid]
    print(f"partition rows: min={min(cs)} max={max(cs)} "
          f"mean={sum(cs)/len(cs):.0f} n={len(cs)}", flush=True)
    offsets, acc = {}, 0
    for pid, cnt in by_pid:
        offsets[pid] = acc
        acc += cnt

    t = time.time()
    (
        ranged.mapInArrow(make_invert_fn(offsets, 2000), SEGMENT_SCHEMA)
        .write.mode("overwrite").partitionBy("kind")
        .parquet(f"{idx_dir}/segments")
    )
    stages["2_invert_write"] = time.time() - t
    ranged.unpersist()

    t = time.time()
    postings = spark.read.parquet(f"{idx_dir}/segments/kind=posting")
    (
        postings.groupBy("term")
        .agg(F.sum("df").alias("df"), F.sum("ttf").alias("ttf"),
             F.max("max_tf").alias("max_tf"), F.min("min_len").alias("min_len"))
        .repartitionByRange(max(1, cpus // 8), "term")
        .sortWithinPartitions("term")
        .write.mode("overwrite").parquet(f"{idx_dir}/term_stats")
    )
    stages["3_term_stats"] = time.time() - t

    t = time.time()
    docstats = spark.read.parquet(f"{idx_dir}/segments/kind=doc")
    seg_rows = (
        docstats.groupBy("seg")
        .agg(F.min("doc_id").alias("doc_base"), F.count("*").alias("num_docs"),
             F.sum("doclen").alias("sum_len"))
        .collect()
    )
    stages["4_seg_stats_collect"] = time.time() - t

    total = sum(stages.values())
    print(json.dumps({"cpus": cpus, "docs": n, "stages":
                      {k: round(v, 2) for k, v in stages.items()},
                      "total": round(total, 2)}), flush=True)
    shutil.rmtree(idx_dir, ignore_errors=True)
    spark.stop()


if __name__ == "__main__":
    main(int(sys.argv[1]), int(sys.argv[2]) if len(sys.argv) > 2 else 30000)
