"""JSON Facet API (reference module solr/core .../search/facet).

Reference semantics re-expressed, not ported — `FacetModule.java` /
`FacetField.java` / `FacetRequest.java` (the `json.facet` request syntax):

* a `terms` facet buckets the current DOMAIN by a field; each bucket
  carries `count`, any sibling metric aggregations, and nested sub-facets
  computed over the bucket's own domain;
* defaults kept: `limit` 10, `mincount` 1, sort `count desc` with the
  index-order (bucket value asc) tie-break, `offset` 0;
* metrics: `sum(f)`, `avg(f)`, `min(f)`, `max(f)`, `unique(f)` —
  avg is the one double division sum/count (deterministic under any
  partitioning);
* `sort` may name a sibling metric (`"avg_len desc"`), the
  sort-by-stat form.

Spark-first shape (documented strengthening over the reference): Solr's
distributed mode merges per-shard facet tops and is approximate unless
`refine:true`; here every level is ONE global partial-aggregated
groupBy over (parent bucket keys + field), per-bucket limits are a
window rank over the already-aggregated (tiny) bucket table, and nested
levels semi-join their surviving parents — exact at any cluster size,
no refinement pass needed.  The whole spec compiles to one declarative
plan (`json_facet_flat`); the nested response dict is assembled
driver-side from the flattened leaf rows (`json_facet`), which are
bounded by prod(limits) — response-sized, never corpus-sized.
"""

from __future__ import annotations

import re

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

_METRIC_RE = re.compile(r"^(sum|avg|min|max|unique)\((\w+)\)$")


def _metric_expr(spec: str, alias: str):
    m = _METRIC_RE.match(spec.strip())
    if m is None:
        raise ValueError(f"unsupported facet metric: {spec!r}")
    fn, fld = m.groups()
    if fn == "sum":
        e = F.sum(fld)
    elif fn == "avg":
        e = F.sum(fld).cast("double") / F.count("*")
    elif fn == "min":
        e = F.min(fld)
    elif fn == "max":
        e = F.max(fld)
    else:  # unique — Solr's exact form is countDistinct
        e = F.countDistinct(fld)
    return e.alias(alias)


def _split(spec: dict):
    """A facet node's children: (metrics {alias: expr-str}, subfacets)."""
    metrics = {k: v for k, v in spec.items() if isinstance(v, str)}
    subs = {k: v for k, v in spec.items() if isinstance(v, dict)}
    return metrics, subs


def _terms_level(
    domain: DataFrame, parents: list[str], node: dict, name: str
) -> DataFrame:
    """One terms-facet level: bucket the domain by `field` inside each
    parent bucket; per-parent top-`limit` by the node's sort."""
    if node.get("type", "terms") != "terms":
        raise ValueError(f"unsupported facet type: {node.get('type')!r}")
    field = node["field"]
    limit = int(node.get("limit", 10))
    mincount = int(node.get("mincount", 1))
    metrics, _ = _split(node.get("facet", {}))
    aggs = [F.count("*").alias(f"{name}_count")] + [
        _metric_expr(expr, alias) for alias, expr in metrics.items()
    ]
    g = domain.groupBy(*parents, field).agg(*aggs)
    if mincount > 1:
        g = g.filter(F.col(f"{name}_count") >= mincount)
    sort = node.get("sort", "count desc")
    key, _, direction = sort.partition(" ")
    key = f"{name}_count" if key == "count" else key
    order = (F.asc(key) if direction.strip() == "asc" else F.desc(key))
    w = Window.partitionBy(*parents).orderBy(order, F.asc(field))
    return (
        g.withColumn("__rk", F.row_number().over(w))
        .filter(F.col("__rk") <= limit)
        .drop("__rk")
    )


def json_facet_flat(domain: DataFrame, spec: dict) -> DataFrame:
    """Compile a (possibly nested) terms-facet spec over the match-set
    domain into ONE declarative plan; rows = the deepest level's buckets
    carrying every ancestor's value, count, and metrics.

    Each spec level must be a single named terms facet (the flattened
    row shape needs one path per level); sibling metrics ride on their
    level's row.
    """
    out = None
    parents: list[str] = []
    node_map = spec
    depth = 0
    probe = spec
    while True:
        _, s = _split(probe)
        if not s:
            break
        depth += len(s) if len(s) > 1 else 1
        probe = next(iter(s.values())).get("facet", {}) if len(s) == 1 else {}
    if depth > 1:
        # every level aggregates the same domain — materialize it once so
        # the (tokenize/search) match-set subtree is not re-evaluated per
        # level (one InMemoryRelation, L tiny bucket aggs over it)
        domain = domain.persist()
    while True:
        _, subs = _split(node_map)
        if not subs:
            break
        if len(subs) != 1:
            raise ValueError(
                "json_facet_flat flattens ONE terms facet per level; use "
                "json_facet for sibling facets"
            )
        name, node = next(iter(subs.items()))
        level = _terms_level(domain, parents, node, name)
        out = level if out is None else out.join(level, parents)
        parents = parents + [node["field"]]
        node_map = node.get("facet", {})
    if out is None:
        raise ValueError("spec contains no terms facet")
    return out


def json_facet(domain: DataFrame, spec: dict) -> dict:
    """The Solr response shape: {"count": N, "<name>": {"buckets": [
    {"val": ..., "count": ..., <metrics>, <subfacets>}, ...]}, ...}.

    Supports sibling facets at every level.  Exactly ONE aggregation job
    runs per facet node (never per bucket): each level groups the full
    domain by (ancestor fields + its field), per-parent-ranked, then
    left-semi-joins its parent level's surviving buckets; the nested
    response assembles driver-side from the collected level rows, which
    are bounded by prod(limits)."""
    metrics, subs = _split(spec)
    aggs = [F.count("*").alias("count")] + [
        _metric_expr(expr, alias) for alias, expr in metrics.items()
    ]
    if subs:  # every facet node re-aggregates the same domain
        domain = domain.persist()
    resp = dict(domain.agg(*aggs).collect()[0].asDict())
    for name, node in subs.items():
        collected: dict = {}
        _collect_levels(domain, [], None, node, name, (), collected)
        resp[name] = _assemble(collected, (), name, ())
    return resp


def _collect_levels(domain, parents, parent_level, node, name, path, out):
    """One aggregation per node; rows keyed by (facet path, name)."""
    level = _terms_level(domain, parents, node, name)
    if parent_level is not None:
        level = level.join(
            parent_level.select(*parents).distinct(), parents, "left_semi")
    out[(path, name)] = (node, [r.asDict() for r in level.collect()])
    _, subs = _split(node.get("facet", {}))
    for sub_name, sub_node in subs.items():
        _collect_levels(domain, parents + [node["field"]], level,
                        sub_node, sub_name, path + (name,), out)


def _assemble(collected, path, name, parent_vals) -> dict:
    node, rows = collected[(path, name)]
    field = node["field"]
    metrics, subs = _split(node.get("facet", {}))
    parent_fields = [collected[(path[:i], path[i])][0]["field"]
                     for i in range(len(path))]
    buckets = []
    for d in rows:
        if tuple(d[f] for f in parent_fields) != parent_vals:
            continue
        b = {"val": d[field], "count": d[f"{name}_count"]}
        for alias in metrics:
            b[alias] = d[alias]
        for sub_name in subs:
            b[sub_name] = _assemble(
                collected, path + (name,), sub_name,
                parent_vals + (d[field],))
        buckets.append(b)
    # response bucket order = the node's sort (collect order is not
    # guaranteed); index-order (val asc) tie-break via stable two-pass sort
    sort = node.get("sort", "count desc")
    key, _, direction = sort.partition(" ")
    key = "count" if key == "count" else key
    buckets.sort(key=lambda b: b["val"])
    buckets.sort(key=lambda b: b[key],
                 reverse=direction.strip() != "asc")
    return {"buckets": buckets}
