"""Index splitting + distributed sharded search (SolrCloud data semantics).

The two halves of running one logical index as N physical shards — the
deployment shape a 10^12-file corpus forces — re-expressed Spark-first:

* **split_index** — `lucene/misc/src/java/org/apache/lucene/index/
  MultiPassIndexSplitter.java:40-95`: split an index into N parts, doc
  assigned by ordinal round-robin (`--seq` off), each part = the source
  with the complement deleted, then compacted.  Solr's SPLITSHARD executes
  the same thing shard-side over the live view
  (`solr/core/src/java/org/apache/solr/update/SolrIndexSplitter.java:60-120`).
  Spark-first shape: ONE mapInPandas pass over live posting rows — each row
  decodes once, its doc stream is routed `doc_id % n`, and up to n
  re-encoded rows come out tagged with a `shard` column; doc rows route
  with a native `pmod` column.  No shuffle anywhere: splitting is
  embarrassingly parallel over posting rows, so it scales with executors,
  not with index size on any single node.  Global doc ids never change
  (this engine's invariant), so the union of shard results is directly
  comparable to the unsplit index.  Source tombstones are reclaimed during
  the split (SolrIndexSplitter splits the live view) and per-shard stats
  are recomputed from the shard's own postings — each shard is a clean,
  self-describing standalone index.

* **sharded_search** — scatter-gather with **exact distributed IDF**
  (`solr/core/src/java/org/apache/solr/search/stats/ExactStatsCache.java:
  40-80`): per-shard df / collection stats are aggregated globally and
  every shard scores with the GLOBAL stats, so the merged top-k is
  bit-identical to a single combined index.  (Solr's default
  LocalStatsCache scores each shard with its local stats and the ranks
  drift — test_shards proves the drift and that ExactStatsCache removes
  it.)  The gather is the same (score desc, doc_id asc) HitQueue
  tie-break the single-index merge uses (HitQueue.java:76-81), over
  #shards x #segments x k tiny rows.

Multi-term expansion (prefix/wildcard/fuzzy/regexp) runs per shard against
that shard's dictionary — exactly Solr's distributed behavior (rewrite
happens in each shard's QueryComponent.process) — while df for every
expanded term still comes from the global aggregate.
"""

from __future__ import annotations

import json
import os
import shutil
import time
from pathlib import Path
from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, functions as F, types as T

from .codec import (
    BLOCK_SIZE,
    CODEC_VERSION,
    decode_positions_flat,
    decode_postings,
    encode_positions_flat,
    encode_postings,
)
from .indexer import SEGMENT_SCHEMA, Index, _append_manifest, load_tombstones
from .smallfloat import NORM_TABLE

_SPLIT_SCHEMA = T.StructType(
    list(SEGMENT_SCHEMA.fields) + [T.StructField("shard", T.IntegerType())]
)
_SEG_COLS = [f.name for f in SEGMENT_SCHEMA.fields]


def _split_posting_batch(
    pdf: pd.DataFrame, n: int, tombs: tuple[str, int] | None
) -> pd.DataFrame:
    """Split one batch of posting rows into per-shard rows.

    Each input row decodes ONCE; its postings are routed doc_id % n and
    re-encoded per shard with a fresh block directory (the same
    decode/mask/re-encode discipline as merge._merge_term, which is the
    MultiPassIndexSplitter "clone with complement deleted, then compact"
    step fused into one pass)."""
    out: dict[str, list] = {c: [] for c in _SEG_COLS}
    out["shard"] = []
    has_pay = "pay_blob" in pdf.columns and pdf["pay_blob"].notna().any()
    for _, r in pdf.iterrows():
        d, t = decode_postings(
            r["docs_blob"], r["tfs_blob"],
            np.asarray(r["block_doc_boff"], dtype=np.int64),
            np.asarray(r["block_tf_boff"], dtype=np.int64),
            int(r["df"]),
        )
        flat, doc_idx = decode_positions_flat(r["pos_blob"], t)
        pay = (np.frombuffer(r["pay_blob"], dtype="<f4")
               if has_pay and r["pay_blob"] is not None else None)
        nb = np.frombuffer(r["norms_blob"], dtype=np.uint8)
        # reclaim source tombstones during the split (SolrIndexSplitter
        # splits the live view; loaded executor-side per doc range)
        if tombs is not None and d.size:
            deleted = load_tombstones(
                tombs[0], tombs[1], int(d[0]), int(d[-1])
            )
            if deleted is not None and deleted.size:
                idx = np.minimum(np.searchsorted(deleted, d),
                                 deleted.size - 1)
                live = deleted[idx] != d
                if not live.all():
                    keep_pos = live[doc_idx]
                    if pay is not None:
                        pay = pay[keep_pos]
                    flat = flat[keep_pos]
                    remap = np.cumsum(live) - 1
                    doc_idx = remap[doc_idx[keep_pos]]
                    d, t, nb = d[live], t[live], nb[live]
        if d.size == 0:
            continue
        route = (d % n).astype(np.int64)
        for s in np.unique(route):
            m = route == s
            ds, ts, nbs = d[m], t[m], nb[m]
            keep_pos = m[doc_idx]
            flat_s = flat[keep_pos]
            pay_s = pay[keep_pos] if pay is not None else None
            (docs_blob, tfs_blob, bmax_doc, bmax_tf,
             dboff, tboff) = encode_postings(ds, ts)
            pos_blob = encode_positions_flat(flat_s, ts)
            lens = NORM_TABLE[nbs]
            nblocks = (ds.size + BLOCK_SIZE - 1) // BLOCK_SIZE
            pad = nblocks * BLOCK_SIZE - ds.size
            bmin_len = (
                np.pad(lens, (0, pad), constant_values=np.float32(np.inf))
                .reshape(nblocks, BLOCK_SIZE)
                .min(axis=1)
                .astype(np.float32)
            )
            row = {
                "seg": int(r["seg"]),
                "kind": "posting",
                "term": r["term"],
                "first_doc": int(ds[0]),
                "df": int(ds.size),
                "ttf": int(ts.sum()),
                "max_tf": int(ts.max()),
                "min_len": float(lens.min()),
                "docs_blob": docs_blob,
                "tfs_blob": tfs_blob,
                "pos_blob": pos_blob,
                "pay_blob": (
                    np.ascontiguousarray(pay_s, dtype="<f4").tobytes()
                    if pay_s is not None else None
                ),
                "norms_blob": nbs.tobytes(),
                "block_max_doc": bmax_doc.tolist(),
                "block_max_tf": bmax_tf.tolist(),
                "block_min_len": bmin_len.tolist(),
                "block_doc_boff": dboff.tolist(),
                "block_tf_boff": tboff.tolist(),
            }
            for c in _SEG_COLS:
                out[c].append(row.get(c))
            out["shard"].append(int(s))
    return pd.DataFrame(out, columns=_SEG_COLS + ["shard"])


def routed_rows(index: Index, n: int) -> DataFrame:
    """The one-pass routed row set `split_index` writes: every live posting
    row decodes once inside a single Arrow pass and emits up to n
    shard-tagged re-encoded rows; doc rows route with a native pmod.  This
    is the shuffle-free shape plan_audit asserts (zero Exchange before the
    partitioned write on a tombstone-free index; with tombstones, the doc
    side adds one left-anti join against the small deleted set)."""
    tombs = index.tombstone_ref()
    post = index.postings().mapInPandas(
        lambda it: _split_batches(it, n, tombs), _SPLIT_SCHEMA
    )
    docs = index.docstats().withColumn("kind", F.lit("doc"))
    if tombs is not None:
        deleted = index.spark.read.parquet(
            tombs[0]).select("doc_id").distinct()
        docs = docs.join(deleted, "doc_id", "left_anti")
    docs = docs.select(*_SEG_COLS).withColumn(
        "shard", F.pmod(F.col("doc_id"), F.lit(n)).cast("int")
    )
    return post.unionByName(docs)


def split_index(index: Index, out_dirs: list[str]) -> list[Index]:
    """Split `index` into len(out_dirs) standalone shard indexes.

    Routing is doc_id % n — MultiPassIndexSplitter's round-robin part
    assignment (MultiPassIndexSplitter.java:40-95) over this engine's
    stable global doc ids.  Tombstones are reclaimed; per-shard stats and
    meta are recomputed so each shard describes exactly its own documents
    (which is what makes ExactStatsCache sums reproduce the unsplit index
    bit-exactly).  Shard indexes are read-only serving shards: appends
    refuse (shard doc-id spaces are interleaved, so `max_doc`-based id
    assignment would collide).
    """
    n = len(out_dirs)
    if n < 2:
        raise ValueError("split needs at least 2 output dirs")
    if index.meta.get("has_blocks"):
        # parent/child blocks must never straddle a shard boundary; a
        # doc-id-routed split would tear them (SolrIndexSplitter routes
        # whole composite-id blocks together — unimplemented here)
        raise ValueError("cannot split an index with parent/child blocks")
    spark = index.spark
    t0 = time.time()
    for d in out_dirs:
        p = Path(d)
        if p.exists():
            shutil.rmtree(p)
        p.mkdir(parents=True)
    staging = Path(str(out_dirs[0]) + "_split_staging")
    if staging.exists():
        shutil.rmtree(staging)

    (
        routed_rows(index, n)
        .write.mode("overwrite")
        .partitionBy("shard", "kind")
        .option("parquet.block.size", str(4 * 1024 * 1024))
        .parquet(str(staging))
    )

    shards: list[Index] = []
    src_meta = index.meta
    for s, out in enumerate(out_dirs):
        seg_dir = Path(out) / "segments"
        seg_dir.mkdir(parents=True, exist_ok=True)
        for kind in ("posting", "doc"):
            src = staging / f"shard={s}" / f"kind={kind}"
            if src.exists():
                os.rename(src, seg_dir / f"kind={kind}")
            else:
                (seg_dir / f"kind={kind}").mkdir()
        # per-shard global stats — same pass-3 aggregation as build_index.
        # A shard can legitimately receive ZERO rows of a kind (fewer live
        # docs than shards); spark.read.parquet on a fileless dir raises
        # UNABLE_TO_INFER_SCHEMA mid-split, so empty dirs read as typed
        # empty frames and the shard comes out valid-but-empty
        def _read_kind(kind: str):
            p = seg_dir / f"kind={kind}"
            if any(p.glob("*.parquet")):
                return spark.read.parquet(str(p))
            from .indexer import SEGMENT_SCHEMA as _SS

            empty = spark.createDataFrame([], _SS)
            return empty.drop("kind")

        postings = _read_kind("posting")
        num_partitions = int(src_meta.get("num_partitions", 4))
        (
            postings.groupBy("term")
            .agg(
                F.sum("df").alias("df"),
                F.sum("ttf").alias("ttf"),
                F.max("max_tf").alias("max_tf"),
                F.min("min_len").alias("min_len"),
            )
            .repartition(max(1, num_partitions // 8), "term")
            .sortWithinPartitions("term")
            .write.mode("overwrite")
            .parquet(str(Path(out) / "term_stats"))
        )
        docstats = _read_kind("doc")
        seg_rows = (
            docstats.groupBy("seg")
            .agg(
                F.min("doc_id").alias("doc_base"),
                F.count("*").alias("num_docs"),
                F.sum("doclen").alias("sum_len"),
            )
            .collect()
        )
        _append_manifest(
            spark, Path(out) / "manifest", "split",
            [(r["seg"], r["doc_base"], r["num_docs"]) for r in seg_rows],
            time.time() - t0,
        )
        meta = {
            "max_doc": int(sum(r["num_docs"] for r in seg_rows)),
            "sum_total_term_freq": int(sum(r["sum_len"] or 0 for r in seg_rows)),
            "num_partitions": num_partitions,
            "num_segments": len(seg_rows),
            "built_unix": int(time.time()),
            "codec": CODEC_VERSION,
            "stats_dirs": ["term_stats"],
            "offsets": bool(src_meta.get("offsets")),
            # provenance + read-only marker (append_batch refuses on this)
            "shard_split": {"index": s, "of": n, "route": "mod"},
        }
        for inherit in ("analyzer", "index_sort"):
            if src_meta.get(inherit):
                meta[inherit] = src_meta[inherit]
        (Path(out) / "meta.json").write_text(json.dumps(meta))
        shards.append(Index(spark, out))
    shutil.rmtree(staging, ignore_errors=True)
    return shards


def _split_batches(
    batches: Iterator[pd.DataFrame], n: int, tombs
) -> Iterator[pd.DataFrame]:
    for pdf in batches:
        yield _split_posting_batch(pdf, n, tombs)


class GlobalStats:
    """ExactStatsCache view of one shard (ExactStatsCache.java:40-80).

    Delegates everything to the shard EXCEPT term/collection statistics,
    which aggregate across ALL shards — so `search.make_plan` binds
    weights from global df / N / sumTotalTermFreq while query rewrite
    (dictionary scans, multi-term expansion) and execution (postings,
    tombstones) stay per-shard.  df/ttf sums, N and token-count sums are
    exact because split shards partition the document set."""

    def __init__(self, shard: Index, all_shards: list[Index]):
        self._shard = shard
        self._all = list(all_shards)

    def __getattr__(self, name):
        return getattr(self._shard, name)

    def term_dfs(self, terms) -> dict[str, int]:
        out: dict[str, int] = {}
        for s in self._all:
            for t, v in s.term_dfs(terms).items():
                out[t] = out.get(t, 0) + int(v)
        return out

    def term_ttfs(self, terms) -> dict[str, int]:
        out: dict[str, int] = {}
        for s in self._all:
            for t, v in s.term_ttfs(terms).items():
                out[t] = out.get(t, 0) + int(v)
        return out

    @property
    def max_doc(self) -> int:
        return sum(s.max_doc for s in self._all)

    @property
    def sum_total_term_freq(self) -> int:
        return sum(s.sum_total_term_freq for s in self._all)


def sharded_search(
    shards: list[Index], query_or_text, k: int = 10, prune: bool = True,
    after: tuple[float, int] | None = None,
    k1: float = None, b: float = None,
    similarity: str = "bm25", sim_param: float = None,
) -> DataFrame:
    """Distributed top-k over N shards == `search` over the unsplit index.

    Scatter: each shard plans with GLOBAL stats (GlobalStats view -> the
    exact idf / norm-cache the single index would bind) and contributes
    its per-segment top-k rows.  Gather: one (score desc, doc_id asc)
    merge — the identical HitQueue tie-break.  Requires globally unique
    doc ids across shards (true for split_index output, whose id spaces
    interleave without collision)."""
    from .parser import parse
    from .search import RESULT_SCHEMA, make_plan, per_segment_topk_df

    if not shards:
        raise ValueError("no shards")
    q = (parse(query_or_text, analyzer=getattr(shards[0], "analyzer", None))
         if isinstance(query_or_text, str) else query_or_text)
    parts: list[DataFrame] = []
    for s in shards:
        view = GlobalStats(s, shards)
        plan = make_plan(view, q, k, prune, after, k1=k1, b=b,
                         similarity=similarity, sim_param=sim_param)
        df = per_segment_topk_df(s, plan)
        if df is not None:
            parts.append(df)
    if not parts:
        return shards[0].spark.createDataFrame([], RESULT_SCHEMA)
    u = parts[0]
    for p in parts[1:]:
        u = u.unionByName(p)
    return u.orderBy(F.desc("score"), F.asc("doc_id")).limit(k)


def sharded_facet_field(
    shards: list[Index], query_or_text, field: str
) -> DataFrame:
    """Distributed field facet: per-shard DocSet -> field counts, merged by
    summation — FacetComponent's distributed count merge
    (solr/core/src/java/org/apache/solr/handler/component/
    FacetComponent.java:520-600).  Exact without a refinement round (the
    reference's facet.limit shard cut needs refine because shards report
    truncated bucket lists; every shard here reports ALL its buckets, the
    same documented strengthening as jsonfacet.py), because counts are
    additive over a disjoint doc partition."""
    from .search import scores

    parts = []
    for s in shards:
        ids = scores(s, query_or_text).select("doc_id")
        dm = s.docmap().select("doc_id", field)
        parts.append(
            ids.join(dm, "doc_id").groupBy(field).agg(F.count("*").alias("n"))
        )
    u = parts[0]
    for p in parts[1:]:
        u = u.unionByName(p)
    return u.groupBy(field).agg(F.sum("n").alias("n"))


def sharded_count(shards: list[Index], query_or_text) -> int:
    """Distributed TotalHitCountCollector: per-shard counts summed on the
    driver (counts need no stats, so no ExactStatsCache round)."""
    from .search import count

    return sum(count(s, query_or_text) for s in shards)


def sharded_stats_field(
    shards: list[Index], query_or_text, field: str = "nchars",
    full: bool = False,
) -> DataFrame:
    """Distributed StatsComponent: per-shard partial stats merged exactly
    (solr/core/src/java/org/apache/solr/handler/component/StatsComponent.java
    distributedProcess/handleResponses + StatsValuesFactory's accumulate —
    every shard ships (count, min, max, sum) and the merge is component-wise:
    counts/sums add, min/max fold).  Exact over a disjoint doc partition
    because all four partials are associative integer aggregates; the mean is
    derived AFTER the merge as the one double division sum/count — the same
    determinism discipline as relational.stats_field, so the result is
    independent of shard count and partitioning.

    full=True mirrors relational.stats_field(full=True): sumOfSquares
    merges by addition (StatsValuesFactory.java:415 `sumOfSquares +=`),
    stddev derives AFTER the merge from the global (n, sum, sumSq)
    (:524), and calcdistinct merges per-shard distinct value SETS
    (:182 `distinctValues.addAll`, countDistinct = union size) — here
    the per-shard distinct frames union and count-distinct, bounded by
    value cardinality, never by doc count."""
    from .search import scores

    parts, val_parts = [], []
    for s in shards:
        ids = scores(s, query_or_text).select("doc_id")
        dm = s.docmap().select("doc_id", field)
        j = ids.join(dm, "doc_id")
        aggs = [
            F.count("*").alias("n"),
            F.min(field).alias("min_v"),
            F.max(field).alias("max_v"),
            F.sum(field).alias("sum_v"),
        ]
        if full:
            aggs.append(
                F.sum(
                    F.col(field).cast("long") * F.col(field).cast("long")
                ).alias("sumsq_v")
            )
            val_parts.append(j.select(field).distinct())
        parts.append(j.agg(*aggs))
    u = parts[0]
    for p in parts[1:]:
        u = u.unionByName(p)
    merge = [
        F.sum("n").alias("n"),
        F.min("min_v").alias("min_v"),
        F.max("max_v").alias("max_v"),
        F.sum("sum_v").alias("sum_v"),
    ]
    if not full:
        return u.agg(*merge).select(
            "n", "min_v", "max_v", "sum_v",
            (F.col("sum_v").cast("double") / F.col("n")).alias("mean_v"),
        )
    merged = u.agg(*merge, F.sum("sumsq_v").alias("sumsq_v"))
    uv = val_parts[0]
    for v in val_parts[1:]:
        uv = uv.unionByName(v)
    distinct_df = uv.agg(F.count_distinct(field).alias("distinct_v"))
    nD = F.col("n").cast("double")
    sumD = F.col("sum_v").cast("double")
    sqD = F.col("sumsq_v").cast("double")
    stddev = F.when(F.col("n") <= F.lit(1), F.lit(0.0)).otherwise(
        F.sqrt((nD * sqD - sumD * sumD) / (nD * (nD - F.lit(1.0))))
    )
    return merged.crossJoin(distinct_df).select(
        "n", "min_v", "max_v", "sum_v",
        (F.col("sum_v").cast("double") / F.col("n")).alias("mean_v"),
        "sumsq_v", stddev.alias("stddev_v"), "distinct_v",
    )


def sharded_group_top1(
    shards: list[Index], query_or_text, field: str = "lang"
) -> DataFrame:
    """Distributed grouping, two-phase merge (the reference's distributed
    grouping: each shard returns its top group heads, the coordinator merges
    per group — solr/core/src/java/org/apache/solr/search/grouping/
    distributed/shardresultserializer/TopGroupsResultTransformer.java +
    TopGroupsShardResponseProcessor.java:60-120, which delegates to
    lucene/grouping TopGroups.merge).

    Scatter: each shard scores with GLOBAL stats (the same ExactStatsCache
    view sharded_search uses, so every per-doc score is bit-identical to the
    unsplit index) and emits its own best doc per group value.  Gather: one
    (score desc, doc_id asc) fold per group over #shards x #groups tiny rows.
    Exact — a group's global best is the best of its per-shard bests because
    the hit order is a total order and shards partition the doc set."""
    from pyspark.sql import Window

    from .parser import parse
    from .search import scores

    q = (parse(query_or_text, analyzer=getattr(shards[0], "analyzer", None))
         if isinstance(query_or_text, str) else query_or_text)
    w = Window.partitionBy(field).orderBy(F.desc("score"), F.asc("doc_id"))
    parts = []
    for s in shards:
        sc = scores(GlobalStats(s, shards), q)
        dm = s.docmap().select("doc_id", field)
        parts.append(
            sc.join(dm, "doc_id")
            .withColumn("rn", F.row_number().over(w))
            .filter(F.col("rn") == 1)
            .select(field, "doc_id", "score")
        )
    u = parts[0]
    for p in parts[1:]:
        u = u.unionByName(p)
    return (
        u.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select(field, "doc_id", "score")
    )


def sharded_terms_enum(
    shards: list["Index"], lower: str | None = None,
    upper: str | None = None, mincount: int = 1, limit: int = 10,
) -> DataFrame:
    """Distributed TermsComponent (solr/core .../component/TermsComponent
    .java — the distributed path sums per-shard term statistics in
    finishStage, like the spellcheck merge): each shard contributes its
    dictionary slice under the range predicates (a pushdown-shaped scan of
    the shard's sorted term stats), identical terms merge by SUMMING df —
    exact over the disjoint doc partition — and terms.mincount applies
    AFTER the merge, so a term rare on every shard still clears the global
    threshold.  Ranking is the component's count sort (df desc, term asc),
    TakeOrdered for the limit."""
    parts = []
    for s in shards:
        st = s.term_stats().select("term", "df")
        if lower is not None:
            st = st.filter(F.col("term") >= lower)
        if upper is not None:
            st = st.filter(F.col("term") <= upper)
        parts.append(st)
    u = parts[0]
    for p in parts[1:]:
        u = u.unionByName(p)
    return (
        u.groupBy("term").agg(F.sum("df").alias("df"))
        .filter(F.col("df") >= mincount)
        .orderBy(F.desc("df"), F.asc("term"))
        .limit(limit)
    )


def sharded_suggest(
    shards: list[Index], term: str, max_edits: int = 2, top: int = 5,
    min_df: int = 1,
) -> DataFrame:
    """Distributed spellcheck: per-shard DirectSpellChecker candidates merged
    by summed document frequency (solr/core/src/java/org/apache/solr/handler/
    component/SpellCheckComponent.java:640-700 finishStage — identical
    suggestions from different shards combine by adding their frequencies).

    Documented strengthening (same as sharded_facet_field): each shard
    reports its FULL within-maxEdits candidate set — a bounded slice of the
    shard dictionary, not the corpus — instead of a truncated top list, so
    the merged ranking is exact without the reference's refinement
    approximation.  df sums are exact over a disjoint doc partition; min_df
    applies AFTER the merge (a term rare on every shard can still clear the
    global threshold).  Ranking is highlight.suggest's (dist asc, df desc,
    term asc) with dist recomputed post-merge (it depends only on the term)."""
    t = term.lower()
    n = len(t)
    parts = []
    for s in shards:
        parts.append(
            s.term_stats()
            .filter(
                (F.length("term") >= n - max_edits)
                & (F.length("term") <= n + max_edits)
                & (F.col("term") != t)
            )
            .withColumn("dist", F.levenshtein(F.col("term"), F.lit(t)))
            .filter(F.col("dist") <= max_edits)
            .select("term", "df")
        )
    u = parts[0]
    for p in parts[1:]:
        u = u.unionByName(p)
    return (
        u.groupBy("term").agg(F.sum("df").alias("df"))
        .filter(F.col("df") >= min_df)
        .withColumn("dist", F.levenshtein(F.col("term"), F.lit(t)))
        .select("term", "df", "dist")
        .orderBy(F.asc("dist"), F.desc("df"), F.asc("term"))
        .limit(top)
    )
