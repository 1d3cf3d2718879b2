"""Solr /select parameter surface (SURVEY §2.8 "Solr HTTP API" row).

Maps the core Solr query params — q, fq, fl, sort, rows, start — onto the
engine + docmap, mirroring SolrIndexSearcher's flow (solr/core/src/java/org/
apache/solr/search/SolrIndexSearcher.java: QueryCommand with query, filters,
sort, offset, len; solr/core/src/java/org/apache/solr/handler/component/
QueryComponent.java builds it from the params):

* q      -> the main scored query (our parser syntax)
* fq     -> non-scoring filter queries, applied to ALL matches BEFORE
            ranking so the top-k cut is taken on the filtered set exactly
            like Solr.  Two forms: docmap metadata predicates
            (`lang:java`, `repo:foo*`, ranges, {!terms}/{!hash}/{!frange})
            compile to plain pushed-down Catalyst predicates; anything
            else parses as a FULL QUERY (Solr's fq accepts any query) and
            filters by its match set — the expensive-to-recompute DocSet
            shape the filterCache exists for
* fl     -> projection over docmap fields (+ score)
* sort   -> "score desc" (default), or "<field> asc|desc" over docmap
            fields; doc_id is always the final tiebreaker
* rows/start -> Solr paging = offset+limit on the ordered result

Filter-before-rank forces the all-matches scorer (search.scores), not the
pruned per-segment top-k: a pruned top-k computed before the filter could
evict docs that survive it.  At scale the fq predicates push into the
docmap parquet scan (partition/row-group pruning), and the join is a
broadcast when the match set is small.
"""

from __future__ import annotations

import base64
import json
import re

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .search import scores

_FQ_RE = re.compile(r"^(\w+):(.*)$")
#: Solr bracket-range value (fq=doclen:[10 TO 200]) — ONE definition
#: shared by the boolean-structure guard and the range parse below
_FQ_RANGE_RE = re.compile(r"^\[(\S+) TO (\S+)\]$")
#: boolean structure inside a field value: an operator token or a second
#: field: segment (any whitespace, so tabs cannot sneak past the guard)
_FQ_BOOL_RE = re.compile(r"\s(OR|AND|NOT)\s|\s\w+:")

_DOCMAP_FIELDS = ("repo", "path", "commit", "lang", "doclen",
                  "content_sha256", "seg", "nchars")


def elevate(index, qtext: str, elevate_ids: list[int],
            exclude_ids: list[int] = (), k: int = 10) -> DataFrame:
    """QueryElevationComponent (solr/core/src/java/org/apache/solr/handler/
    component/QueryElevationComponent.java): editorially pin documents to
    the top of a query's results and censor others.

    Reference semantics kept: elevated docs come FIRST in configuration
    order (the `_elevate_` priority comparator, prepare():
    SortField("_elevate_", comparator, true) then score), appearing even
    when they do not match the text query (the include id-query is OR'd
    into the main query); excluded ids are MUST_NOT'd out; everything else
    ranks by (score desc, doc_id asc).  Documented simplification: an
    elevated doc that does not match the text query carries score 0.0
    (Solr shows the id-clause TermQuery score there, a value with no
    ranking effect since _elevate_ sorts first).

    Scale shape: ONE engine top-(k + |elevate| + |exclude|) search plus a
    k-row driver-side splice — the elevation sets are config-sized."""
    from .search import search

    # first occurrence wins (QueryElevationComponent keeps config order;
    # a duplicate id would fan out the join and duplicate the hit row)
    seen: set = set()
    elevate_ids = [int(i) for i in elevate_ids
                   if int(i) not in seen and not seen.add(int(i))]
    exclude_set = {int(i) for i in exclude_ids}
    n_extra = len(elevate_ids) + len(exclude_set)
    base = search(index, qtext, k=k + n_extra)
    spark = index.spark
    pri = spark.createDataFrame(
        [(d, len(elevate_ids) - i) for i, d in enumerate(elevate_ids)],
        "doc_id long, pri long",
    )
    hits = base.join(pri, "doc_id", "full").select(
        F.coalesce(F.col("pri"), F.lit(0)).alias("pri"),
        "doc_id",
        F.coalesce(F.col("score"), F.lit(0.0).cast("float")).alias("score"),
    )
    if exclude_set:
        hits = hits.filter(~F.col("doc_id").isin(sorted(exclude_set)))
    # elevated docs must exist AND be live — a doc_id < max_doc check
    # alone resurrects tombstoned docs (the reference only surfaces
    # elevated ids that still exist in the index)
    hits = hits.join(
        index.live_docmap().select("doc_id"), "doc_id", "semi")
    from pyspark.sql import Window

    w = Window.orderBy(F.desc("pri"), F.desc("score"), F.asc("doc_id"))
    return (
        hits.orderBy(F.desc("pri"), F.desc("score"), F.asc("doc_id"))
        .limit(k)
        .select(
            F.row_number().over(w).cast("long").alias("rank"),
            "doc_id", "score",
        )
    )


def term_vector(index, source: DataFrame, doc_id: int) -> DataFrame:
    """TermVectorComponent (solr/core/src/java/org/apache/solr/handler/
    component/TermVectorComponent.java): one document's (term, tf) vector.

    The engine stores postings term-major with no per-doc vector files
    (Lucene's .tvd/.tvf analog), so the vector re-derives from the stored
    field through the index's own analyzer — the same O(1)-docs
    re-analysis discipline the highlighter uses; never a scan of the
    postings table."""
    from .analysis import analyze_text

    row = (
        index.docmap()
        .filter(F.col("doc_id") == int(doc_id))
        .join(source, ["repo", "path", "commit"], "left")
        .select("content")
        .collect()
    )
    if not row or row[0]["content"] is None:
        return index.spark.createDataFrame([], "term string, tf long")
    an = getattr(index, "analyzer", None)
    terms, _ = (an.analyze_text(row[0]["content"]) if an is not None
                else analyze_text(row[0]["content"]))
    from collections import Counter

    counts = sorted(Counter(terms).items())
    return index.spark.createDataFrame(
        [(t, int(c)) for t, c in counts], "term string, tf long"
    )


DOC_KEY_FIELDS = ("repo", "path", "commit")


def atomic_merge(updates: dict, to_doc: dict,
                 key_fields: tuple = DOC_KEY_FIELDS) -> dict:
    """AtomicUpdateDocumentMerger.merge (solr/core/src/java/org/apache/solr/
    update/processor/AtomicUpdateDocumentMerger.java:77-124): apply atomic
    field commands to the stored document.

    Reference semantics kept exactly:
    * a plain (non-dict) value is a `set` ("normal fields are treated as a
      set", :118);
    * `set` replaces, `add` appends (scalar existing value becomes a list),
      `remove` drops matching values, `removeregex` drops values fully
      matching the pattern(s) (Matcher.matches), `inc` adds numerically —
      absent field means `inc` sets (:136-139), and the result type follows
      the OLD value's type (:142-151);
    * an unknown op is warned and ignored (:106-109);
    * any op on the uniqueKey field raises ("Invalid update of id field",
      :112-115) — here the key is the (repo, path, commit) triple.
    """
    import warnings

    out = dict(to_doc)
    for name, val in updates.items():
        if name in key_fields:
            raise ValueError(f"Invalid update of id field: {name}")
        if not isinstance(val, dict):
            out[name] = val  # normal field == set
            continue
        for op, field_val in val.items():
            if op == "set":
                out[name] = field_val
            elif op == "add":
                cur = out.get(name)
                vals = ([] if cur is None
                        else list(cur) if isinstance(cur, list) else [cur])
                if isinstance(field_val, list):
                    vals.extend(field_val)
                else:
                    vals.append(field_val)
                out[name] = vals
            elif op == "remove":
                cur = out.get(name)
                if cur is None:
                    continue
                vals = list(cur) if isinstance(cur, list) else [cur]
                drop = field_val if isinstance(field_val, list) else [field_val]
                for d in drop:
                    if d in vals:
                        vals.remove(d)
                out[name] = vals
            elif op == "removeregex":
                cur = out.get(name)
                if cur is None:
                    continue
                vals = list(cur) if isinstance(cur, list) else [cur]
                pats = (field_val if isinstance(field_val, list)
                        else [field_val])
                pats = [re.compile(p) for p in pats]
                out[name] = [v for v in vals
                             if not any(p.fullmatch(str(v)) for p in pats)]
            elif op == "inc":
                cur = out.get(name)
                if cur is None:
                    out[name] = field_val
                elif isinstance(cur, bool):
                    raise ValueError(f"inc on non-numeric field {name!r}")
                elif isinstance(cur, int):
                    out[name] = cur + int(field_val)
                elif isinstance(cur, float):
                    out[name] = cur + float(field_val)
                else:  # string old value: int result like the int branch
                    out[name] = int(str(cur)) + int(field_val)
            else:
                warnings.warn(
                    f"Unknown operation for the an atomic update, operation "
                    f"ignored: {op}"
                )
    return out


def atomic_update(index, source: DataFrame, key: dict, updates: dict,
                  num_partitions: int = 1) -> dict:
    """Atomic document update end-to-end: RealTimeGet fetch of the current
    stored doc by uniqueKey, AtomicUpdateDocumentMerger.merge, then the
    updateDocument path (DistributedUpdateProcessor.getUpdatedDocument ->
    delete-by-key + re-add via `upsert_batch`).

    `source` is the stored-fields table of record; `key` gives the
    (repo, path, commit) values.  A missing doc starts fresh from the key
    (the reference merges into a new SolrInputDocument holding only the id).
    Returns the merged doc dict; list-valued merge results must be collapsed
    by the caller before indexing (the corpus schema is single-valued).

    Scale shape: one key-pushed-down source lookup (parquet min/max prune)
    + one O(1)-doc upsert batch — never a source scan."""
    pred = None
    for f_ in DOC_KEY_FIELDS:
        if f_ not in key:
            raise ValueError(f"atomic_update key must carry {f_!r}")
        p = F.col(f_) == key[f_]
        pred = p if pred is None else (pred & p)
    rows = source.filter(pred).collect()
    if len(rows) > 1:
        raise ValueError(f"uniqueKey {key} matches {len(rows)} docs")
    cur = rows[0].asDict() if rows else dict(key)
    merged = atomic_merge(updates, cur)
    for c in source.columns:
        v = merged.get(c)
        if isinstance(v, list):
            raise ValueError(
                f"field {c!r} merged to a multi-value {v!r}; the corpus "
                f"schema is single-valued — collapse before indexing"
            )
    from .streaming import upsert_batch

    batch = index.spark.createDataFrame(
        [tuple(merged.get(c) for c in source.columns)], source.schema
    )
    upsert_batch(index, batch, num_partitions=num_partitions)
    return merged


CURSOR_MARK_START = "*"  # CursorMarkParams.CURSOR_MARK_START


def _parse_sort_clauses(sort: str) -> list[tuple[str, bool]]:
    """'doclen desc, doc_id asc' -> [(field, ascending), ...]."""
    clauses = []
    for part in sort.split(","):
        field, _, direction = part.strip().partition(" ")
        if not field:
            raise ValueError(f"empty sort clause in {sort!r}")
        d = direction.strip().lower() or "asc"
        if d not in ("asc", "desc"):
            raise ValueError(f"bad sort direction {direction!r} in {sort!r}")
        clauses.append((field, d == "asc"))
    return clauses


def export(
    index,
    q: str,
    sort: str,
    fl: list[str] | str,
    fq: list[str] | str | None = None,
) -> DataFrame:
    """The /export handler: the ENTIRE match set sorted — no rows cap.

    Reference: `solr/core/src/java/org/apache/solr/response/
    SortingResponseWriter.java` (the xsort/export writer): exports every
    matching document ordered by the sort spec, streaming in 30,000-doc
    priority-queue sweeps over the match bitset (:127-160).  Contract kept
    exactly: sort is REQUIRED (:82-90), fl is REQUIRED (:106-109), scoring
    is unsupported in either (:93-94,115-116), and at most 4 sort fields
    (:336-338).  Tie-break is doc_id ascending (the SortDoc ordinal
    comparison), deterministic like every engine surface.

    Spark-first shape: the reference's repeated single-node PQ sweeps
    exist because it streams one HTTP response from one process; the
    distributed form IS a global sort — matches (score projected away
    before any shuffle) join the docmap, fq filters push into the scan,
    and `orderBy` runs as a range-partitioned exchange + per-partition
    sort, the scale-correct equivalent of N queue sweeps.  No limit is
    applied anywhere: the result is the full sorted match set, written
    out partition-parallel instead of through one writer."""
    if not sort or not str(sort).strip():
        raise ValueError("No sort criteria was provided.")
    if not fl:
        raise ValueError("export field list (fl) must be specified.")
    if isinstance(fl, str):
        fl = [c.strip() for c in fl.split(",")]
    if "score" in fl:
        raise ValueError("Scoring is not currently supported with export.")
    clauses = _parse_sort_clauses(sort)
    if len(clauses) > 4:
        raise ValueError("A max of 4 sorts can be specified")
    if any(f == "score" for f, _ in clauses):
        raise ValueError("Scoring is not currently supported with export.")
    bad = [f for f, _ in clauses
           if f not in _DOCMAP_FIELDS and f != "doc_id"]
    if bad:
        raise ValueError(f"unknown sort field(s): {bad}")
    unknown = [c for c in fl if c not in _DOCMAP_FIELDS and c != "doc_id"]
    if unknown:
        raise ValueError(f"unknown fl field(s): {unknown}")
    matches = scores(index, q).select("doc_id")
    joined = index.docmap().join(matches, "doc_id")
    if fq:
        if isinstance(fq, str):
            fq = [fq]
        for f_ in fq:
            joined = apply_fq(index, joined, f_)
    keys = [F.asc(f) if asc else F.desc(f) for f, asc in clauses]
    return joined.orderBy(*keys, F.asc("doc_id")).select(*fl)


def duplicate_filter(
    index,
    q: str,
    field: str,
    keep: str = "last",
    k: int = 10,
) -> DataFrame:
    """DuplicateFilter (lucene/sandbox/src/java/org/apache/lucene/sandbox/
    queries/DuplicateFilter.java): keep at most ONE document per value of
    `field` — the "master" is the first or last occurrence in doc-id order
    (KeepMode KM_USE_FIRST/LAST_OCCURRENCE, :53-55, default last, :79) —
    and intersect the query's matches with those masters.  Masters are
    chosen over the WHOLE index, not the match set (getDocIdSet walks
    every term of the field per segment, :89-175).

    Spark shape: masters = one partial-agg min/max(doc_id) per key (the
    PM_FULL_VALIDATION single pass), then a semi join against the match
    set — broadcast when the key cardinality is small; the reference's
    per-segment bitset flips become Catalyst predicates.  Top-k is
    TakeOrderedAndProject."""
    if keep not in ("first", "last"):
        raise ValueError(f"keep must be first or last, got {keep!r}")
    if field not in _DOCMAP_FIELDS:
        raise ValueError(f"unknown field {field!r}")
    agg = F.min("doc_id") if keep == "first" else F.max("doc_id")
    # masters over LIVE docs only (DuplicateFilter honors liveDocs):
    # otherwise deleting a group's master hides the whole group
    masters = index.live_docmap().groupBy(field).agg(agg.alias("doc_id"))
    res = scores(index, q).join(masters.select("doc_id"), "doc_id", "semi")
    return res.orderBy(F.desc("score"), F.asc("doc_id")).limit(k)


def cursor_page(
    index,
    q: str,
    sort: str,
    rows: int = 10,
    cursor_mark: str = CURSOR_MARK_START,
    fq: list[str] | str | None = None,
) -> tuple[DataFrame, str]:
    """CursorMark deep paging (solr/core/src/java/org/apache/solr/search/
    CursorMark.java, CursorMarkParams.java): stateless cursors over a total
    order, the scale-safe alternative to start=N offsets (each offset page
    re-ranks N+rows docs; a cursor page is always one `after`-filtered
    top-rows).

    Reference validation kept (CursorMark ctor): the sort MUST contain the
    uniqueKey field (doc_id here) as tie-breaker, and cursors never combine
    with a start offset (this API simply has none).  `cursorMark=*` starts;
    each call returns (page, nextCursorMark) where the mark serializes the
    last returned doc's sort values (Solr base64s a JavaBin list; ours is
    base64(JSON) — behavior-identical, format documented divergence).  An
    empty page returns the SAME mark: clients detect exhaustion by mark
    equality, exactly the reference contract.

    Scale shape: the after-predicate is a plain Catalyst filter on the sort
    columns, so every page is one TakeOrderedAndProject over the filtered
    match set — no accumulated offset skip, no driver state beyond the
    rows-sized page Solr itself materializes to serve."""
    clauses = _parse_sort_clauses(sort)
    fields = [f for f, _ in clauses]
    if "doc_id" not in fields:
        raise ValueError(
            "Cursor functionality requires a sort containing a uniqueKey "
            "field tie breaker (add 'doc_id asc')"
        )
    for f_ in fields:
        if f_ not in _DOCMAP_FIELDS and f_ not in ("doc_id", "score"):
            raise ValueError(f"unknown sort field {f_!r}")

    matches = scores(index, q)
    joined = matches.join(index.docmap(), "doc_id")
    if fq:
        if isinstance(fq, str):
            fq = [fq]
        for f_ in fq:
            joined = apply_fq(index, joined, f_)

    if cursor_mark != CURSOR_MARK_START:
        vals = json.loads(base64.b64decode(cursor_mark.encode()).decode())
        if len(vals) != len(clauses):
            raise ValueError(
                f"cursorMark holds {len(vals)} values, sort has "
                f"{len(clauses)} clauses"
            )
        # strictly-after predicate on the lexicographic total order:
        # OR_i ( AND_{j<i} c_j == v_j ) AND (c_i strictly-after v_i).
        # NULL-aware: Spark orders NULLs FIRST under asc and LAST under
        # desc, so a NULL cursor value must not poison the comparison (a
        # plain col > lit(None) is NULL for every row and silently
        # truncates pagination) — equality uses eqNullSafe and the
        # strict step encodes the null ordering explicitly
        def _after(col, v, asc):
            if v is None:
                # asc: non-null sorts after null; desc: nothing does
                return col.isNotNull() if asc else F.lit(False)
            return (col > F.lit(v)) if asc else \
                ((col < F.lit(v)) | col.isNull())

        pred = None
        for i, (field, asc) in enumerate(clauses):
            term = _after(F.col(field), vals[i], asc)
            for pf, pv in zip(fields[:i], vals[:i]):
                term = term & F.col(pf).eqNullSafe(F.lit(pv))
            pred = term if pred is None else (pred | term)
        joined = joined.filter(pred)

    order = [F.asc(f) if asc else F.desc(f) for f, asc in clauses]
    page_rows = joined.orderBy(*order).limit(int(rows)).collect()
    out_cols = ["doc_id", "score"] + [f for f in fields if f not in ("doc_id", "score")]
    page = index.spark.createDataFrame(page_rows, joined.schema).select(*out_cols)
    if not page_rows:
        return page, cursor_mark
    last = page_rows[-1]
    next_mark = base64.b64encode(
        json.dumps([last[f] for f in fields]).encode()
    ).decode()
    return page, next_mark


#: fields the {!hash} parser treats as numeric (NumericHash); everything
#: else hashes as a string (BytesHash -> Java String.hashCode)
_NUMERIC_FQ_FIELDS = ("doc_id", "doclen", "nchars", "n_chars")

_LOCAL_PARAMS_RE = re.compile(r"^\{!(\w+)((?:\s+\w+=[^\s}]+)*)\}(.*)$")


def _java_string_hash(col):
    """Java String.hashCode as one JVM aggregate expression — s[0]*31^(n-1)
    + ... computed with int-overflow semantics (each step mod 2^32, which
    preserves the value mod 2^31, the only bits {!hash} keeps).  ASCII
    fields only (the docmap key fields are), like ascii()."""
    return F.aggregate(
        F.split(col.cast("string"), ""),
        F.lit(0).cast("long"),
        lambda acc, c: (acc * F.lit(31) + F.ascii(c)) % F.lit(4294967296),
    )


def _hash_qparser_predicate(params: dict):
    """HashQParserPlugin (solr/core .../search/HashQParserPlugin.java:66,
    185-230): fq={!hash workers=N worker=W keys=f1,f2} keeps the docs
    whose composite key hash lands on this worker —
    (hash & 0x7FFFFFFF) % workers == worker, hash = SUM of per-key hashes
    (CompositeHash:350), string keys via String.hashCode (BytesHash:292),
    numeric keys via Long.hashCode l^(l>>>32) (NumericHash:336).  The
    parallel-streaming partitioner: each worker of a ParallelStream adds
    this fq so the N workers cover the corpus disjointly.

    All modular arithmetic stays in long: int truncation and sign
    extension are multiples of 2^32, which vanish mod 2^31."""
    workers = int(params["workers"])
    worker = int(params["worker"])
    keys = params.get("keys", params.get("partitionKeys", "")).split(",")
    if not keys or not keys[0]:
        raise ValueError("{!hash} requires keys=f1[,f2...]")
    total = None
    for kf in keys:
        kf = kf.strip()
        if kf in _NUMERIC_FQ_FIELDS:
            c = F.col(kf).cast("long")
            h = c.bitwiseXOR(F.shiftrightunsigned(c, 32))
        else:
            h = _java_string_hash(F.col(kf))
        total = h if total is None else (total + h)
    low31 = ((total % F.lit(2147483648)) + F.lit(2147483648)) \
        % F.lit(2147483648)
    return (low31 % F.lit(workers)) == F.lit(worker)


def _frange_predicate(lp):
    """FunctionRangeQuery / {!frange l=.. u=.. incl=.. incu=..}func
    (solr FunctionRangeQParserPlugin; lucene/queries FunctionRangeQuery):
    keep docs whose FUNCTION value lies in [l, u] — the function is a
    Solr function-query string over numeric docmap fields, compiled to
    one JVM-side F.expr scalar (the funcquery discipline), so the filter
    runs inside whole-stage codegen with no Python."""
    from .funcquery import parse_func

    params = dict(p.split("=", 1) for p in lp.group(2).split())
    body = lp.group(3)
    fqry = parse_func(body)
    bad = [v for v in fqry.field_vars()
           if v not in _DOCMAP_FIELDS and v != "doc_id"]
    if bad:
        raise ValueError(f"unknown frange field(s): {bad}")
    if fqry.tf_refs or fqry.df_refs or fqry.scale is not None:
        raise ValueError(
            "frange covers field/constant functions "
            "(termfreq/docfreq/scale ride the relational func_rank flow)")
    col = F.expr(fqry.expr.sql({v: v for v in fqry.field_vars()}))
    pred = None
    if "l" in params:
        lo = float(params["l"])
        p = (col >= lo) if params.get("incl", "true") == "true" \
            else (col > lo)
        pred = p
    if "u" in params:
        hi = float(params["u"])
        p = (col <= hi) if params.get("incu", "true") == "true" \
            else (col < hi)
        pred = p if pred is None else (pred & p)
    if pred is None:
        raise ValueError("{!frange} requires l= and/or u=")
    return pred


def _apply_collapse(joined, params: dict):
    """CollapsingQParserPlugin post-filter: one survivor per collapse
    field group — by highest score (default; doc_id-asc tie, the engine's
    HitQueue discipline), or by the min/max of a numeric field with the
    score as tie-break (CollapsingQParserPlugin.java:86-95).  nullPolicy
    is the default `ignore` (docs with a NULL collapse value drop,
    :99-101).  One grouped window — the collapse key is the shuffle key,
    same shape as grouping/collapse everywhere else in the engine."""
    from pyspark.sql import Window

    fld = params.get("field")
    if not fld or (fld not in _DOCMAP_FIELDS and fld != "doc_id"):
        raise ValueError(f"unknown collapse field {fld!r}")
    if "min" in params or "max" in params:
        sel = params.get("min") or params.get("max")
        if sel not in _DOCMAP_FIELDS and sel != "doc_id":
            raise ValueError(f"unknown collapse selector field {sel!r}")
        lead = F.asc(sel) if "min" in params else F.desc(sel)
        order = [lead, F.desc("score"), F.asc("doc_id")]
    else:
        order = [F.desc("score"), F.asc("doc_id")]
    w = Window.partitionBy(fld).orderBy(*order)
    return (
        joined.filter(F.col(fld).isNotNull())
        .withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .drop("__rn")
    )


# ---------------------------------------------------------------------------
# filterCache — SolrIndexSearcher.java:128-129: per-searcher cache of
# fq -> DocSet, shared across DIFFERENT q, dropped on searcher reopen.
# ---------------------------------------------------------------------------

FILTER_CACHE_MAX = 64  # entries, LRU (solrconfig.xml filterCache size)
# DocSets at or under this row count live driver-side (a LocalRelation
# DataFrame reused on every hit -> ZERO Spark jobs to reconstruct, the
# analog of Solr's in-heap SortedIntDocSet) and broadcast into the semi
# join.  Bigger sets stay executor-side as a persisted MEMORY_AND_DISK
# doc_id DataFrame: at 10^10 docs a hot fq's DocSet is GBs — Solr's
# in-heap bitset does not survive that scale, a cached+spillable Spark
# partition set does.  8192 rows (64 KiB/entry, <=4 MiB driver worst
# case across the cache): the 250k soak measured that re-broadcasting a
# ~100k-id LocalRelation from the driver on every hit costs as much as
# recomputing the match set — only genuinely small DocSets belong
# driver-side; everything else serves from the executor-persisted tier.
FILTER_CACHE_SMALL_ROWS = 8_192


def _filter_cache(index):
    cache = getattr(index, "_fq_cache", None)
    if cache is None:
        from collections import OrderedDict

        cache = index._fq_cache = OrderedDict()
        index._fq_cache_stats = {"hits": 0, "misses": 0, "evictions": 0}
    return cache


def _evict_entry(entry) -> None:
    if entry[1] == "df":
        try:
            entry[2].unpersist()
        except Exception:
            pass


def filter_docset(index, fq: str) -> tuple[DataFrame, bool]:
    """fq -> cached DocSet; returns (doc_id DataFrame, is_small).

    Key = (fq text, index version): any commit/append/merge/delete bumps
    `_index_version` (the searcher-reopen point), so stale entries are
    recomputed — and their persisted storage released — on next touch,
    exactly Solr's cache-per-searcher lifetime.  A miss evaluates the fq
    predicate ONCE against the docmap: a single limit-pushed probe job
    decides the tier (small -> the probe already holds the ids; large ->
    persist + materialize).  Hits run zero jobs beyond the consumer's own
    semi join."""
    from .search import _index_version

    ver = _index_version(index)
    cache = _filter_cache(index)
    stats = index._fq_cache_stats
    # searcher reopened: sweep EVERY stale-version entry now, not just the
    # requested key — a long-lived server that moves on to other fqs after
    # a commit must not leave GB-scale persisted DocSets pinned until the
    # old fq happens to recur or LRU pressure reaches it
    stale = [k for k, e in cache.items() if e[0] != ver]
    for k in stale:
        _evict_entry(cache[k])
        del cache[k]
    ent = cache.get(fq)
    if ent is not None:
        cache.move_to_end(fq)
        stats["hits"] += 1
        return ent[2], ent[1] == "arr"
    stats["misses"] += 1
    from pyspark import StorageLevel

    # one scan decides the tier AND warms the cache: persist, count (an
    # aggregate — no rows reach the driver), then collect only the small
    # tier (<= FILTER_CACHE_SMALL_ROWS ids) into the driver-side
    # LocalRelation, releasing the executor copy
    pers = (
        _fq_docset_df(index, fq)
        .persist(StorageLevel.MEMORY_AND_DISK)
    )
    n = pers.count()
    if n <= FILTER_CACHE_SMALL_ROWS:
        import pandas as pd

        pdf = pers.toPandas()
        pers.unpersist()
        ds = index.spark.createDataFrame(pdf, "doc_id long")
        ent = (ver, "arr", ds)
    else:
        ds = pers
        ent = (ver, "df", ds)
    cache[fq] = ent
    if len(cache) > FILTER_CACHE_MAX:
        _, old = cache.popitem(last=False)
        _evict_entry(old)
        stats["evictions"] += 1
    return ds, ent[1] == "arr"


_CACHE_FALSE_RE = re.compile(r"^\{!cache=false\}(.*)$", re.S)


def apply_fq(index, df: DataFrame, fq: str, use_cache: bool = True) -> DataFrame:
    """Filter `df` (any doc_id-keyed frame) to the fq's DocSet.

    Field-form fqs (`lang:java`, ranges, {!terms}/{!hash}/{!frange})
    ALWAYS apply as a pushed-down Catalyst predicate and never consult
    the cache: the predicate rides a scan the consumer is already doing
    (zero extra I/O, zero join), while a cached-DocSet semi join costs a
    broadcast + join per request — measured 2.2x SLOWER at 250k docs
    (BENCH/SERVING_SOAK.md).  Solr caches its filters because every
    filter there is an inverted-index query; the Spark-first split is
    predicate -> Catalyst, query -> DocSet cache.

    QUERY fqs (any other syntax — a full query whose DocSet costs a
    scoring pass to recompute) ride the version-keyed filterCache:
    left-semi join against the cached DocSet, broadcast for the small
    tier, a persisted executor-side set for the large tier.  A
    `{!cache=false}` prefix (Solr's per-request opt-out),
    `use_cache=False`, or `index._no_filter_cache` recomputes the match
    set instead."""
    m = _CACHE_FALSE_RE.match(fq.strip())
    if m:
        fq, use_cache = m.group(1), False
    pred = _try_fq_predicate(fq)
    if pred is not None:
        return df.filter(pred)
    if not use_cache or getattr(index, "_no_filter_cache", False):
        # QUERY fq, uncached: one-shot semi join against its match set
        return df.join(scores(index, fq).select("doc_id"),
                       "doc_id", "semi")
    ds, small = filter_docset(index, fq)
    return df.join(F.broadcast(ds) if small else ds, "doc_id", "semi")


def _fq_docset_df(index, fq: str) -> DataFrame:
    """The fq's DocSet as a doc_id frame.

    `field:value` forms (ranges, wildcards, {!terms}/{!hash}/{!frange})
    compile to a docmap predicate; anything else parses as a FULL QUERY —
    Solr's fq accepts any query (SolrIndexSearcher.getDocSet over the
    parsed filter list), e.g. fq=batch AND dup — whose doc set is the
    match set of the engine's own scorer (scores(), scores discarded,
    live-docs filtered).  Query fqs are exactly the DocSets the
    filterCache exists for: recomputing one costs a scoring pass, not a
    pushed-down scan predicate."""
    pred = _try_fq_predicate(fq)
    if pred is None:
        return scores(index, fq).select("doc_id")
    return index.docmap().filter(pred).select("doc_id")


def clear_filter_cache(index) -> None:
    """Release every cached DocSet (persisted tiers unpersisted)."""
    cache = getattr(index, "_fq_cache", None)
    if cache:
        for ent in cache.values():
            _evict_entry(ent)
        cache.clear()
    if getattr(index, "_fq_cache_stats", None):
        index._fq_cache_stats = {"hits": 0, "misses": 0, "evictions": 0}


def facet_domain(
    index,
    q: str | None = None,
    fq: list[str] | str | None = None,
) -> DataFrame:
    """The JSON Facet API's domain: main query matches (or the whole
    docmap for q=None / *:*) filtered by fq through the filterCache —
    faceted browsing re-sends the SAME fq set with every drill, which is
    exactly the workload the cache exists for.  Feed the result to
    `jsonfacet.json_facet`.  The match-all domain is the LIVE docmap —
    counting tombstoned docs would diverge from the scored domains,
    which exclude them via _apply_live_docs."""
    dm = index.live_docmap()
    if q is not None and q.strip() not in ("", "*:*"):
        dm = dm.join(scores(index, q).select("doc_id"), "doc_id", "semi")
    if fq:
        if isinstance(fq, str):
            fq = [fq]
        for f_ in fq:
            dm = apply_fq(index, dm, f_)
    return dm


def _try_fq_predicate(fq: str):
    """Field-form fq -> its Catalyst predicate; None when the fq is not
    field-form (i.e. a QUERY fq).  Unknown fields, unknown qparsers, and
    fielded boolean expressions stay loud — only the one 'not a
    field:value form at all' case routes to the query-fq path.  The
    single dispatch point apply_fq and _fq_docset_df share."""
    return _fq_predicate(fq, lenient=True)


def _fq_predicate(fq: str, lenient: bool = False):
    lp = _LOCAL_PARAMS_RE.match(fq.strip())
    if lp:
        name, raw, rest = lp.group(1), lp.group(2), lp.group(3)
        params = dict(p.split("=", 1) for p in raw.split())
        if name == "terms":
            # TermsQParserPlugin (solr/core .../search/TermsQParserPlugin
            # .java:47-70): {!terms f=field separator=,}v1,v2 -> a
            # set-membership filter (the termsFilter method; the other
            # methods are execution strategies for the same doc set)
            fld = params.get("f")
            if fld not in _DOCMAP_FIELDS and fld != "doc_id":
                raise ValueError(f"unknown fq field {fld!r}")
            sep = params.get("separator", ",")
            vals = [_coerce(v) for v in rest.split(sep)]
            return F.col(fld).isin(vals)
        if name == "hash":
            return _hash_qparser_predicate(params)
        if name == "frange":
            # a pure docmap-field predicate (field vars validated
            # inside), so EVERY fq consumer accepts it — /select,
            # /export, cursor paging, facet domains — applied as a
            # pushed-down Catalyst predicate (field-form fqs never
            # consult the filterCache since r5)
            return _frange_predicate(lp)
        raise ValueError(f"unsupported fq query parser {name!r}")
    m = _FQ_RE.match(fq.strip())
    if not m:
        if lenient:
            return None  # not field-form at all: the QUERY-fq shape
        raise ValueError(f"unsupported fq syntax: {fq!r}")
    field, value = m.group(1), m.group(2)
    if field not in _DOCMAP_FIELDS and field != "doc_id":
        raise ValueError(f"unknown fq field {field!r}")
    if _FQ_BOOL_RE.search(value) and not _FQ_RANGE_RE.match(value):
        # 'lang:java OR lang:go' would otherwise bind as the literal
        # equality lang == 'java OR lang:go' (silently zero rows), and
        # the engine parser has no fielded syntax either — refuse loudly.
        # Plain spaces WITHOUT boolean structure stay legal values
        # (path:my doc.py equality, path:my doc* prefix)
        raise ValueError(
            f"fq {fq!r}: fielded boolean expressions are not supported — "
            "use {!terms f=" + field + "}v1,v2 for a union, or separate "
            "fq clauses for an intersection")
    col = F.col(field)
    if value.endswith("*"):
        return col.startswith(value[:-1])
    m2 = _FQ_RANGE_RE.match(value)
    if m2:  # Solr range syntax fq=doclen:[10 TO 200]
        lo, hi = m2.group(1), m2.group(2)
        pred = None
        if lo != "*":
            pred = col >= _coerce(lo)
        if hi != "*":
            pred = (col <= _coerce(hi)) if pred is None else (pred & (col <= _coerce(hi)))
        return pred if pred is not None else col.isNotNull()
    return col == _coerce(value)


def _coerce(v: str):
    """Numeric fq values compare numerically (doclen:[10 TO 200])."""
    try:
        return int(v)
    except ValueError:
        try:
            return float(v)
        except ValueError:
            return v


def _sorted_fast_path(index, q, fq, fl, sort, rows, start):
    """Early-terminating sort-by-field path; None when ineligible (the
    generic filter-before-rank flow handles everything else)."""
    isort = getattr(index, "index_sort", None)
    if isort is None or fq or not sort or fl is None:
        return None
    field, _, direction = sort.strip().partition(" ")
    d = direction.strip().lower() or "asc"
    if field != isort["field"] or (d == "asc") != bool(isort["asc"]):
        return None  # canEarlyTerminate: same field, same direction only
    if isinstance(fl, str):
        fl = [c.strip() for c in fl.split(",")]
    if "score" in fl:
        return None  # trackScores=false path only
    unknown = [c for c in fl if c not in _DOCMAP_FIELDS and c != "doc_id"]
    if unknown:
        raise ValueError(f"unknown fl field(s): {unknown}")
    from .search import matches_first_by_docid

    ids = matches_first_by_docid(index, q, start + rows)
    # the cut happened BEFORE any docmap access: join the <= start+rows
    # surviving ids (broadcast) against the docmap scan
    joined = index.docmap().join(F.broadcast(ids), "doc_id")
    ordered = joined.orderBy(F.asc("doc_id"))  # == (field dir, DOC_KEY) order
    paged = ordered.offset(start).limit(rows) if start else ordered.limit(rows)
    return paged.select(*fl)


def solr_select(
    index,
    q: str,
    fq: list[str] | str | None = None,
    fl: list[str] | str | None = None,
    sort: str | None = None,
    rows: int = 10,
    start: int = 0,
) -> DataFrame:
    """The /select handler: scored q, filtered by fq, sorted, paged.

    When the index was built with index_sort and the request sorts by that
    same field in the same direction with no fq and a score-free fl, the
    early-terminating collector path is taken (TopFieldCollector.
    canEarlyTerminate: the query sort must be a prefix of the index sort):
    doc-id order IS the sort order, so each segment emits only its first
    start+rows matching ids, scores are never computed (trackScores=false),
    and the docmap joins only the <= start+rows surviving ids."""
    fast = _sorted_fast_path(index, q, fq, fl, sort, rows, start)
    if fast is not None:
        return fast
    matches = scores(index, q)
    dm = index.docmap()
    joined = matches.join(dm, "doc_id")
    collapse = None
    if fq:
        if isinstance(fq, str):
            fq = [fq]
        for f_ in fq:
            lp = _LOCAL_PARAMS_RE.match(f_.strip())
            if lp and lp.group(1) == "collapse":
                # CollapsingQParserPlugin (solr/core .../search/
                # CollapsingQParserPlugin.java:73-101): a POST filter —
                # collapse runs on the scored set, not the docmap
                if collapse is not None:
                    raise ValueError("at most one {!collapse} fq")
                collapse = dict(p.split("=", 1)
                                for p in lp.group(2).split())
                continue
            joined = apply_fq(index, joined, f_)
    if collapse is not None:
        joined = _apply_collapse(joined, collapse)
    if sort is None or sort.strip().lower() in ("score desc", "score"):
        ordered = joined.orderBy(F.desc("score"), F.asc("doc_id"))
    else:
        # full multi-clause Solr sort syntax, validated — a malformed
        # direction or a silently-dropped second clause must be loud,
        # exactly like export()/cursor_page() (which share this parser)
        keys = [
            (F.col(f).asc() if asc else F.col(f).desc())
            for f, asc in _parse_sort_clauses(sort)
        ]
        ordered = joined.orderBy(*keys, F.asc("doc_id"))
    paged = ordered.offset(start).limit(rows) if start else ordered.limit(rows)
    if fl:
        if isinstance(fl, str):
            fl = [c.strip() for c in fl.split(",")]
        unknown = [c for c in fl if c not in _DOCMAP_FIELDS and c not in ("doc_id", "score")]
        if unknown:  # loud, like _fq_predicate: never a zero-column projection
            raise ValueError(f"unknown fl field(s): {unknown}")
        return paged.select(*fl)
    return paged.select("doc_id", "score", "repo", "path", "commit", "lang")
