"""Streaming API — the solrj/io TupleStream family re-expressed Spark-first
(solr/solrj/src/java/org/apache/solr/client/solrj/io/: TupleStream.java,
CloudSolrStream.java, UniqueStream.java, RankStream.java, MergeStream.java,
ReducerStream.java, ParallelStream.java).

The reference models distributed relational algebra as pull-based iterators
over sorted tuple streams: every combinator declares a Comparator and
REQUIRES its input stream(s) sorted (and, under ParallelStream, partitioned)
by those fields — UniqueStream.java:29-31, ReducerStream.java:27-29,
MergeStream.java:18-20, ParallelStream's partitionKeys contract.  That
sorted/partitioned-stream discipline is exactly a declared Spark shuffle:

* a stream here is a DataFrame + its sort CONTRACT (the comparator the
  reference would carry); combinators validate contract compatibility the
  way the reference documents it, but execute as ordinary DataFrame ops —
  Catalyst plans the sorts/shuffles instead of a worker pulling tuples;
* `ParallelStream` — "decorates a TupleStream and pushes it to N workers,
  tuples partitioned by the partition keys" (ParallelStream.java:33-36) —
  IS Spark's hash shuffle: `parallel()` repartitions on the keys, and a
  downstream `unique`/`reducer` on those keys reuses that partitioning
  (ENSURE_REQUIREMENTS inserts no second exchange — plan-asserted in
  tests), so the combinator runs partition-local exactly like the
  reference's per-worker substream;
* determinism strengthening (documented divergence): where the reference
  leaves order among comparator-equal tuples to shard arrival (RankStream's
  PriorityQueue, UniqueStream's "first seen"), every combinator here
  tie-breaks on `doc_id` — same semantics when the comparator is a total
  order, reproducible always (and SQL-oracle-checkable).

Tuples are rows; EOF tuples are an iterator artifact with no relational
meaning and are not modeled.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

#: the deterministic residual tie-break every combinator appends
_TIEBREAK = "doc_id"


@dataclass(frozen=True)
class TStream:
    """A tuple stream: relation + emission-order contract.

    `sort` is the comparator the reference would pass alongside the stream
    (MultiComp of Asc/DescFieldComp — AscFieldComp.java/DescFieldComp.java):
    tuples are delivered ordered by these (field, ascending) pairs, doc_id
    as the final tie-break."""

    df: DataFrame
    sort: tuple[tuple[str, bool], ...]

    def order_cols(self):
        cols = [F.asc(f) if a else F.desc(f) for f, a in self.sort]
        if _TIEBREAK not in [f for f, _ in self.sort]:
            cols.append(F.asc(_TIEBREAK))
        return cols

    def to_df(self) -> DataFrame:
        """Materialize the stream boundary: rows in contract order."""
        return self.df.orderBy(*self.order_cols())


def _require_prefix(stream: TStream, fields: list[str], who: str) -> None:
    """The reference's sorted-input contract: the comparator fields must be
    a prefix of the stream's sort (UniqueStream.java:29-31 'The sort order
    of the underlying stream must match the Comparator')."""
    have = [f for f, _ in stream.sort]
    if have[: len(fields)] != list(fields):
        raise ValueError(
            f"{who} requires the input stream sorted by {fields}; "
            f"stream sort is {have}"
        )


def search_stream(index, q, sort: list[tuple[str, bool]],
                  fl: list[str]) -> TStream:
    """CloudSolrStream analog (CloudSolrStream.java:60-95): a /select
    across all shards, tuples merged in comparator order.  Here the shards
    are the index's segments and the merge is the plan's ordered boundary;
    fq/fl semantics ride the same docmap join solr_select uses."""
    from .search import scores

    if _TIEBREAK not in fl:
        raise ValueError("fl must include doc_id (the tuple identity)")
    matches = scores(index, q)
    dm = index.docmap()
    joined = matches.join(dm, "doc_id")
    return TStream(joined.select(*fl), tuple((f, bool(a)) for f, a in sort))


def unique(stream: TStream, over: list[str]) -> TStream:
    """UniqueStream (UniqueStream.java:27-31): emit the first tuple of each
    comparator-equal run.  'First' = least by the stream's own sort +
    doc_id tie-break (the determinism strengthening above)."""
    _require_prefix(stream, over, "unique")
    w = Window.partitionBy(*over).orderBy(*stream.order_cols())
    df = (
        stream.df.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .drop("__rn")
    )
    return TStream(df, stream.sort)


def rank(stream: TStream, size: int, comp: list[tuple[str, bool]]) -> TStream:
    """RankStream (RankStream.java:30-36): top-`size` tuples by the
    comparator — a bounded priority queue in the reference, a
    TakeOrderedAndProject here (per-partition top-k + k-row driver merge,
    never a global sort)."""
    s = TStream(stream.df, tuple((f, bool(a)) for f, a in comp))
    return TStream(s.df.orderBy(*s.order_cols()).limit(int(size)), s.sort)


def merge(a: TStream, b: TStream) -> TStream:
    """MergeStream (MergeStream.java:18-20): union of two streams sorted by
    the same comparator, order preserved.  Duplicates are kept (it is a
    union of streams, not a set union)."""
    if a.sort != b.sort:
        raise ValueError(
            f"merge requires identically-sorted streams; {a.sort} != {b.sort}"
        )
    return TStream(a.df.unionByName(b.df), a.sort)


def reducer(stream: TStream, by: list[str]) -> TStream:
    """ReducerStream (ReducerStream.java:20-30): one tuple per
    comparator-equal group; the emitted tuple is the group head (first
    tuple of the group) and carries the whole group — the reference
    attaches the member maps (Tuple.setMaps), here a `group` array of
    structs in stream order plus `group_size`."""
    _require_prefix(stream, by, "reducer")
    other = [c for c in stream.df.columns if c not in by]
    w = Window.partitionBy(*by).orderBy(*stream.order_cols())
    head = (
        stream.df.withColumn("__rn", F.row_number().over(w))
        .withColumn(
            "group",  # members in stream order (the reference's maps list)
            F.collect_list(F.struct(*[F.col(c) for c in other])).over(
                w.rowsBetween(Window.unboundedPreceding,
                              Window.unboundedFollowing)
            ),
        )
        .filter(F.col("__rn") == 1)
        .drop("__rn")
        .withColumn("group_size", F.size("group").cast("long"))
    )
    return TStream(head, stream.sort)


def parallel(stream: TStream, workers: int, partition_keys: list[str]) -> TStream:
    """ParallelStream (ParallelStream.java:33-40): push the wrapped stream
    to N workers, tuples partitioned by the partition keys.  Spark-first:
    this IS a declared hash shuffle — `repartition(workers, keys)`.  A
    downstream unique/reducer over those keys satisfies its clustering
    requirement from this exchange (no second shuffle; plan-asserted in
    tests), so the combinator work runs partition-local on each 'worker'
    exactly as the reference executes the substream per worker."""
    if workers < 1:
        raise ValueError("workers must be >= 1")
    missing = [k for k in partition_keys if k not in stream.df.columns]
    if missing:
        raise ValueError(f"partition keys not in stream: {missing}")
    return TStream(
        stream.df.repartition(int(workers), *partition_keys), stream.sort
    )
