"""Geo-spatial search, Spark-first (reference module `lucene/spatial`).

Reference semantics re-expressed (not ported):

* `spatial/vector/PointVectorStrategy.java:44-66` — a point is two numeric
  doc fields (x, y); a *distance* query is a bounding-box **range query**
  over those fields plus an exact distance verification step
  (`makeWithin` -> bbox approximation, `:104-129`).
* `spatial/bbox/BBoxStrategy.java:63-90` — rectangle queries are pure
  numeric range predicates on the coordinate fields.
* `spatial/prefix/RecursivePrefixTreeStrategy.java:40-60` +
  `spatial/prefix/tree/SpatialPrefixTree.java:35-50` — a grid-cell token
  per point lets the engine prune by cell before verifying exactly.
* `lucene/core/src/java/org/apache/lucene/util/SloppyMath.java:44-68`
  (`haversinMeters`, TO_METERS = 6371008.7714) — the haversine distance
  used by `LatLonPoint.newDistanceQuery`.

Spark-first shape: coordinates are plain numeric columns next to the doc
row, so every spatial predicate is a **native Catalyst range filter** —
at scale (stored lat/lon/cell columns, writer sorted by cell) the
predicates reach the parquet scan as PushedFilters and prune row groups,
exactly like the numeric range path (E15).  The circle -> bbox reduction
happens on the driver with pure arithmetic (no data pass), then the exact
haversine verify runs JVM-side with built-in trig expressions — no UDF,
no shuffle; nearest-k rides the same per-partition top-k + tiny global
merge as every other top-k in the engine (`distributed_topk`).

The driver's test tables carry no coordinates, so this surface derives a
deterministic synthetic point per document from `doc_id` with *pure
integer arithmetic* (exact in binary64, reproduced verbatim by the DuckDB
oracle): lat = ((doc_id*7919) % 18000)/100 - 90, lon =
((doc_id*104729) % 36000)/100 - 180.  A production writer would store
real lat/lon (and the coarse cell id) as parquet columns; every operator
below only assumes the columns exist.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .relational import _ranked, distributed_topk, documents

#: mean Earth radius in km — SloppyMath.java:68 (TO_METERS = 6371008.7714)
EARTH_RADIUS_KM = 6371.0087714

#: round exact haversine distances to 4 decimals (0.1 m) before filtering /
#: ranking so the Spark (JVM libm) and DuckDB (C libm) evaluations agree on
#: every comparison — same discipline as the cosine near-dup surface
DIST_ROUND = 4


def geo_points(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(doc_id, lat, lon, cell): the PointVectorStrategy field pair plus a
    1-degree grid cell id (the SpatialPrefixTree level-1 token analog, used
    as the write-time sort/partition key at scale)."""
    d = documents(spark, sf_dir).select("doc_id")
    lat = (F.col("doc_id") * F.lit(7919) % F.lit(18000)) / F.lit(100.0) - F.lit(90.0)
    lon = (F.col("doc_id") * F.lit(104729) % F.lit(36000)) / F.lit(100.0) - F.lit(180.0)
    d = d.withColumn("lat", lat).withColumn("lon", lon)
    cell = (F.floor("lat") + F.lit(90)) * F.lit(360) + (F.floor("lon") + F.lit(180))
    return d.withColumn("cell", cell.cast("long"))


def bbox_search(
    spark: SparkSession, sf_dir: str,
    min_lat: float, max_lat: float, min_lon: float, max_lon: float,
) -> DataFrame:
    """Rectangle query (BBoxStrategy.java:63-90): two native range
    predicates, nothing else — pushdown-shaped end to end."""
    p = geo_points(spark, sf_dir)
    return p.filter(
        (F.col("lat") >= min_lat) & (F.col("lat") <= max_lat)
        & (F.col("lon") >= min_lon) & (F.col("lon") <= max_lon)
    ).select("doc_id", "lat", "lon")


def _haversine_km(lat_col, lon_col, clat: float, clon: float):
    """Exact haversine (SloppyMath.haversinMeters) as a JVM expression."""
    lat1 = F.radians(F.lit(float(clat)))
    lon1 = F.radians(F.lit(float(clon)))
    lat2 = F.radians(lat_col)
    lon2 = F.radians(lon_col)
    h = (
        F.pow(F.sin((lat2 - lat1) / 2), 2)
        + F.cos(lat1) * F.cos(lat2) * F.pow(F.sin((lon2 - lon1) / 2), 2)
    )
    return F.lit(2.0 * EARTH_RADIUS_KM) * F.asin(F.sqrt(h))


def circle_bbox(
    clat: float, clon: float, radius_km: float
) -> tuple[float, float, float, float]:
    """Driver-side circle -> conservative bounding box (the makeWithin
    approximation step, PointVectorStrategy.java:104-129).  Longitude width
    uses the tightest cos(lat) in the latitude band; near the poles (or for
    a radius spanning them) it degrades to the full longitude range — still
    a superset, so the exact verify keeps the result correct."""
    dlat = math.degrees(radius_km / EARTH_RADIUS_KM)
    min_lat = max(-90.0, clat - dlat)
    max_lat = min(90.0, clat + dlat)
    max_abs_lat = min(max(abs(min_lat), abs(max_lat)), 89.9)
    cos_band = math.cos(math.radians(max_abs_lat))
    if min_lat <= -90.0 + 1e-9 or max_lat >= 90.0 - 1e-9 or cos_band <= 1e-6:
        return min_lat, max_lat, -180.0, 180.0
    dlon = math.degrees(radius_km / (EARTH_RADIUS_KM * cos_band))
    if dlon >= 180.0:
        return min_lat, max_lat, -180.0, 180.0
    # the synthetic surface has no dateline wrap; a wrapped box widens to
    # the full range (conservative) rather than splitting into two boxes
    if clon - dlon < -180.0 or clon + dlon > 180.0:
        return min_lat, max_lat, -180.0, 180.0
    return min_lat, max_lat, clon - dlon, clon + dlon


def distance_search(
    spark: SparkSession, sf_dir: str,
    clat: float, clon: float, radius_km: float,
) -> DataFrame:
    """Points within radius_km of (clat, clon): pushdown-shaped bbox
    prefilter + exact haversine verify (the approximate-then-verify shape
    of RecursivePrefixTreeStrategy / LatLonPoint.newDistanceQuery)."""
    lo_lat, hi_lat, lo_lon, hi_lon = circle_bbox(clat, clon, radius_km)
    p = geo_points(spark, sf_dir).filter(
        (F.col("lat") >= lo_lat) & (F.col("lat") <= hi_lat)
        & (F.col("lon") >= lo_lon) & (F.col("lon") <= hi_lon)
    )
    dist = F.round(_haversine_km(F.col("lat"), F.col("lon"), clat, clon),
                   DIST_ROUND)
    return (
        p.withColumn("dist_km", dist)
        .filter(F.col("dist_km") <= radius_km)
        .select("doc_id", "lat", "lon", "dist_km")
    )


def nearest(
    spark: SparkSession, sf_dir: str, clat: float, clon: float, k: int
) -> DataFrame:
    """k nearest points to (clat, clon), ties broken by doc_id — the
    distance-sort path (PointVectorStrategy.makeDistanceValueSource +
    top-k collector).  Per-partition top-k, k-row global merge — no
    single-reducer window, no full sort."""
    p = geo_points(spark, sf_dir).withColumn(
        "dist_km",
        F.round(_haversine_km(F.col("lat"), F.col("lon"), clat, clon),
                DIST_ROUND),
    )
    by = [("dist_km", True), ("doc_id", True)]
    top = distributed_topk(p.select("doc_id", "dist_km"), k, by)
    return _ranked(top, by, ["doc_id", "dist_km"])


def bbox_filtered_bm25(
    spark: SparkSession, sf_dir: str, term: str,
    min_lat: float, max_lat: float, min_lon: float, max_lon: float,
) -> DataFrame:
    """BM25 term scoring restricted to a bounding box — the Solr spatial
    `fq={!bbox ...}` composition (spatial filter as a FILTER clause, E8:
    constant-score, does not contribute to ranking)."""
    from .relational import bm25_term

    scored = bm25_term(spark, sf_dir, term)
    box = bbox_search(spark, sf_dir, min_lat, max_lat, min_lon, max_lon)
    return scored.join(box.select("doc_id"), "doc_id")


def _centi(v: float, name: str) -> int:
    c = round(v * 100)
    if abs(v * 100 - c) > 1e-6:
        raise ValueError(
            f"{name}={v}: heatmap geom must lie on the synthetic lattice's "
            "0.01-degree resolution")
    return int(c)


def heatmap_bounds(
    min_lat: float, max_lat: float, min_lon: float, max_lon: float,
    level: int,
) -> tuple:
    """Driver-side (no data pass) heatmap region snap, integer-exact.

    SpatialHeatmapFacets.java:94-146 / HeatmapFacetCounter.calcFacets:
    the requested geom snaps OUTWARD to the prefix-tree cell lattice at
    `level` — edge cells that overlap the geom are included whole.  Our
    lattice is the quad form (SpatialPrefixTree.java:35-50): level L
    splits the world into 2^L x 2^L cells; the synthetic corpus
    coordinates live on a 0.01-degree integer grid, so levels 1..4 keep
    every cell boundary integer in centi-degrees and the whole
    computation exact in both engines.

    Returns (row0, row1, col0, col1, wlat, wlon) — inclusive global cell
    index ranges plus the cell sides in centi-degrees.
    """
    if not (1 <= level <= 4):
        raise ValueError("facet.heatmap.gridLevel should be > 0 and <= 4")
    if min_lat > max_lat or min_lon > max_lon:
        raise ValueError("heatmap geom: min must not exceed max")
    wlat = 18000 // (1 << level)
    wlon = 36000 // (1 << level)
    lat0, lat1 = _centi(min_lat + 90, "min_lat"), _centi(max_lat + 90, "max_lat")
    lon0, lon1 = _centi(min_lon + 180, "min_lon"), _centi(max_lon + 180, "max_lon")
    if not (0 <= lat0 and lat1 <= 18000 and 0 <= lon0 and lon1 <= 36000):
        raise ValueError("heatmap geom outside world bounds")
    row0, row1 = lat0 // wlat, min(lat1 // wlat, (1 << level) - 1)
    col0, col1 = lon0 // wlon, min(lon1 // wlon, (1 << level) - 1)
    return row0, row1, col0, col1, wlat, wlon


def heatmap_facet(
    spark: SparkSession, sf_dir: str,
    min_lat: float, max_lat: float, min_lon: float, max_lon: float,
    level: int = 4, max_cells: int = 100_000,
    where: str | None = None,
) -> DataFrame:
    """facet.heatmap (SpatialHeatmapFacets.java:77-160 +
    HeatmapFacetCounter.java:93-180): per-grid-cell doc counts over the
    cells intersecting the requested geom, the optional `where` predicate
    playing the filtered-DocSet role.  Too many cells raises, as the
    reference does (HeatmapFacetCounter.java:123-125).

    Spark-first: cell ids are two integer divisions on the coordinate
    columns, the count is ONE partial-aggregated groupBy — at 100 TB this
    is a scan plus a (#cells)-sized shuffle, nothing driver-side.  Rows
    come back sparse ((col, row) present only when count > 0 — the dense
    ints2D render is a driver-side reshape of at most max_cells values);
    col/row are heatmap-local indices exactly like the reference's counts
    array, with the cell's min corner in degrees alongside.
    """
    row0, row1, col0, col1, wlat, wlon = heatmap_bounds(
        min_lat, max_lat, min_lon, max_lon, level)
    ncells = (row1 - row0 + 1) * (col1 - col0 + 1)
    if ncells > max_cells:
        raise ValueError(
            f"Too many cells ({col1 - col0 + 1} x {row1 - row0 + 1}) "
            f"for level {level}")
    p = geo_points(spark, sf_dir)
    if where:
        d = documents(spark, sf_dir).filter(where).select("doc_id")
        p = p.join(d, "doc_id")
    lati = (F.col("doc_id") * F.lit(7919)) % F.lit(18000)
    loni = (F.col("doc_id") * F.lit(104729)) % F.lit(36000)
    g = p.withColumn("grow", (lati / F.lit(wlat)).cast("long")) \
         .withColumn("gcol", (loni / F.lit(wlon)).cast("long")) \
         .filter(
             (F.col("grow") >= row0) & (F.col("grow") <= row1)
             & (F.col("gcol") >= col0) & (F.col("gcol") <= col1))
    out = g.groupBy("gcol", "grow").count()
    return out.select(
        (F.col("gcol") - F.lit(col0)).alias("col"),
        (F.col("grow") - F.lit(row0)).alias("row"),
        ((F.col("gcol") * F.lit(wlon)).cast("double") / F.lit(100.0)
         - F.lit(180.0)).alias("cell_min_lon"),
        ((F.col("grow") * F.lit(wlat)).cast("double") / F.lit(100.0)
         - F.lit(90.0)).alias("cell_min_lat"),
        F.col("count").alias("n"),
    ).orderBy("col", "row")
