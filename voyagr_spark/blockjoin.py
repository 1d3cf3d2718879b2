"""Block join — nested parent/child documents (reference module lucene/join).

Reference semantics re-expressed, not ported:

* `ToParentBlockJoinQuery.java` (lucene/join/src/java/org/apache/lucene/
  search/join/ToParentBlockJoinQuery.java:210-260, BlockJoinScorer.
  setScoreAndFreq): a parent matches when any child in its block matches the
  child query; the parent score accumulates child scores in doc-id order in
  a DOUBLE, applies the ScoreMode (None=0, Total=sum, Max, Min,
  Avg=sum/freq), and casts to float at the end.
* `ToChildBlockJoinQuery.java`: every child of a matching parent matches,
  inheriting the parent's score unchanged.
* Block contract (`IndexWriter.addDocuments`): children are indexed first,
  the parent LAST, as contiguous doc ids; the parent filter
  (`QueryBitSetProducer`) recovers block boundaries at query time via
  nextSetBit over the parent bitset.

Spark-first mapping:

* This engine assigns doc ids deterministically in (repo, path, commit)
  order, so ONE parent row per block key whose `path` is
  :data:`BLOCK_PARENT_PATH` (0x7f — sorts after every printable child path)
  lands immediately after its children: the addDocuments layout falls out
  of the global sort, no special writer needed.
* The parent bitset becomes a build-time `blocks/` sidecar (child doc_id ->
  parent doc_id).  In the reference the block structure is equally frozen
  at index time — the bitset is merely how adjacency is recovered from flat
  doc ids; a doc-id-keyed table IS that information relationally, and joins
  co-partition on doc_id instead of replaying nextSetBit per query.
* Aggregation = one `groupBy(parent_doc)` (partial-agg shuffle on the
  parent key); top-k = orderBy().limit -> TakeOrderedAndProject.  Blocks
  are one addDocuments call in the reference, i.e. bounded, so the
  doc-id-ordered Total/Avg accumulation can collect the block's child
  scores into an array without a skew risk.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .indexer import DOC_KEY, Index, build_index

#: parent rows sort after every child path (0x7f > all printable ASCII)
BLOCK_PARENT_PATH = "\x7f"
#: default parent marker content — the `which=` term (type:parent idiom)
PARENT_TOKEN = "parentdoc"

SCORE_MODES = ("none", "avg", "max", "total", "min")


def block_documents(
    children: DataFrame,
    block_key: str = "repo",
    parent_content: str = PARENT_TOKEN,
) -> DataFrame:
    """The addDocuments layout as a DataFrame: children + one parent row
    per block key, the parent sorting LAST inside its block in the
    engine's (repo, path, commit) doc-id order.

    block_key must be the DOC_KEY prefix (`repo`): blocks are contiguous
    under the global id order only when the block key leads the sort."""
    if block_key != DOC_KEY[0]:
        raise ValueError(
            f"block_key must be {DOC_KEY[0]!r} — blocks are contiguous "
            "only under the (repo, path, commit) id order")
    parents = (
        children.select(block_key).distinct()
        .select(
            F.col(block_key),
            F.lit(BLOCK_PARENT_PATH).alias("path"),
            F.md5(F.lit(parent_content)).alias("commit"),
            F.lit("__parent__").alias("lang"),
            F.lit(parent_content).alias("content"),
        )
    )
    return children.select(*DOC_KEY, "lang", "content").unionByName(parents)


def build_block_index(
    spark: SparkSession,
    children: DataFrame,
    index_dir: str,
    block_key: str = "repo",
    parent_content: str = PARENT_TOKEN,
    **build_kw,
) -> Index:
    """Build an index over parent/child blocks plus the `blocks/` sidecar
    (child doc_id -> parent doc_id — the QueryBitSetProducer analog,
    computed once at write time like the reference's frozen block layout)."""
    combined = block_documents(children, block_key, parent_content)
    idx = build_index(spark, combined, index_dir, **build_kw)
    dm = idx.docmap().select("doc_id", "repo", "path")
    parents = (
        dm.filter(F.col("path") == BLOCK_PARENT_PATH)
        .select("repo", F.col("doc_id").alias("parent_doc"))
    )
    (
        dm.filter(F.col("path") != BLOCK_PARENT_PATH)
        .join(parents, "repo")
        .select("doc_id", "parent_doc")
        .write.mode("overwrite")
        .parquet(str(idx.dir / "blocks"))
    )
    idx.meta["has_blocks"] = True
    idx.meta["block_parent_content"] = parent_content
    idx._swap_meta()
    return idx


def append_blocks(
    index: Index,
    children: DataFrame,
    parent_content: str | None = None,
    **append_kw,
) -> list[int]:
    """Streaming addDocuments: append one-or-more COMPLETE blocks (each
    batch key's children plus a fresh parent row for that key).

    append_batch assigns ids in global (repo, path, commit) order within
    the batch, so the children-then-parent layout holds for appended
    blocks exactly as at build time; a key that already has blocks gains
    a NEW block (its own parent), the reference's one-block-per-
    addDocuments-call semantics.  The blockmap extends with the new id
    range only — O(batch)."""
    from .streaming import append_batch

    if not index.meta.get("has_blocks"):
        raise ValueError("index was not built with build_block_index")
    parent_content = parent_content or index.meta.get(
        "block_parent_content", PARENT_TOKEN)
    base = index.max_doc
    combined = block_documents(children, DOC_KEY[0], parent_content)
    segs = append_batch(index, combined, allow_blocks=True, **append_kw)
    dm = (
        index.docmap().filter(F.col("doc_id") >= base)
        .select("doc_id", "repo", "path")
    )
    parents = (
        dm.filter(F.col("path") == BLOCK_PARENT_PATH)
        .select("repo", F.col("doc_id").alias("parent_doc"))
    )
    (
        dm.filter(F.col("path") != BLOCK_PARENT_PATH)
        .join(parents, "repo")
        .select("doc_id", "parent_doc")
        .write.mode("append")
        .parquet(str(index.dir / "blocks"))
    )
    return segs


def blockmap(index: Index) -> DataFrame:
    """(doc_id, parent_doc) for every CHILD document."""
    if not index.meta.get("has_blocks"):
        raise ValueError("index was not built with build_block_index")
    return index.spark.read.parquet(str(index.dir / "blocks"))


def _parent_scores(joined: DataFrame, score_mode: str) -> DataFrame:
    """ScoreMode aggregation over (doc_id, score, parent_doc) child hits.

    Total/Avg reproduce BlockJoinScorer.setScoreAndFreq exactly: child
    scores accumulate in doc-id order into a double, Avg divides by the
    match count, and the result casts to float32."""
    if score_mode not in SCORE_MODES:
        raise ValueError(f"score_mode must be one of {SCORE_MODES}")
    parent = F.col("parent_doc").alias("doc_id")
    if score_mode == "max":
        return joined.groupBy(parent).agg(
            F.max("score").cast("float").alias("score"))
    if score_mode == "min":
        return joined.groupBy(parent).agg(
            F.min("score").cast("float").alias("score"))
    if score_mode == "none":  # COMPLETE_NO_SCORES: parent score is 0f
        return joined.groupBy(parent).agg(
            F.lit(0.0).cast("float").alias("score"))
    arr = F.array_sort(F.collect_list(F.struct("doc_id", "score")))
    total = F.aggregate(
        arr,
        F.lit(0.0),
        lambda acc, x: acc + x["score"].cast("double"),
    )
    val = total / F.size(arr) if score_mode == "avg" else total
    return joined.groupBy(parent).agg(val.cast("float").alias("score"))


def to_parent_topk(
    index: Index,
    child_query,
    k: int = 10,
    score_mode: str = "max",
) -> DataFrame:
    """ToParentBlockJoinQuery top-k: (doc_id, score) of the best parents.

    The child query must not match parent docs (the reference asserts the
    same contract); parent hits simply have no blockmap row here and drop
    out of the inner join."""
    from .search import scores

    hits = scores(index, child_query)
    joined = hits.join(blockmap(index), "doc_id")
    ranked = _parent_scores(joined, score_mode)
    return ranked.orderBy(F.desc("score"), F.asc("doc_id")).limit(k)


def to_child_topk(index: Index, parent_query, k: int = 10) -> DataFrame:
    """ToChildBlockJoinQuery top-k: children of matching parents, each
    inheriting its parent's score unchanged (parents themselves excluded —
    the blockmap holds child rows only)."""
    from .search import scores

    phits = scores(index, parent_query).withColumnRenamed(
        "doc_id", "parent_doc")
    joined = blockmap(index).join(phits, "parent_doc")
    return (
        joined.select("doc_id", "score")
        .orderBy(F.desc("score"), F.asc("doc_id"))
        .limit(k)
    )
