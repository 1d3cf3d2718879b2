"""Spatial module (lucene/spatial analog): bbox prefilter correctness,
haversine properties, nearest-k semantics."""

import math
import sys
from pathlib import Path

import numpy as np
import pytest
from pyspark.sql import functions as F

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

from voyagr_spark import spatial as S

SF = "/root/testdata/sf0.001"


def _hav_np(lat, lon, clat, clon):
    lat1, lon1 = math.radians(clat), math.radians(clon)
    lat2, lon2 = np.radians(lat), np.radians(lon)
    h = (
        np.sin((lat2 - lat1) / 2) ** 2
        + math.cos(lat1) * np.cos(lat2) * np.sin((lon2 - lon1) / 2) ** 2
    )
    return 2 * S.EARTH_RADIUS_KM * np.arcsin(np.sqrt(h))


def test_circle_bbox_is_conservative():
    """Every point within the radius lies inside the derived bbox — the
    makeWithin approximation must be a superset (verify step shrinks it)."""
    rng = np.random.default_rng(7)
    for _ in range(200):
        clat = float(rng.uniform(-85, 85))
        clon = float(rng.uniform(-180, 180))
        r = float(rng.uniform(1, 5000))
        lo_lat, hi_lat, lo_lon, hi_lon = S.circle_bbox(clat, clon, r)
        lat = rng.uniform(-90, 90, 500)
        lon = rng.uniform(-180, 180, 500)
        d = _hav_np(lat, lon, clat, clon)
        inside = d <= r
        in_box = (
            (lat >= lo_lat) & (lat <= hi_lat)
            & (lon >= lo_lon) & (lon <= hi_lon)
        )
        assert not (inside & ~in_box).any(), (clat, clon, r)


def test_circle_bbox_pole_and_dateline_degrade_to_full_lon():
    lo_lat, hi_lat, lo_lon, hi_lon = S.circle_bbox(89.0, 0.0, 500.0)
    assert (lo_lon, hi_lon) == (-180.0, 180.0)
    lo_lat, hi_lat, lo_lon, hi_lon = S.circle_bbox(0.0, 179.5, 500.0)
    assert (lo_lon, hi_lon) == (-180.0, 180.0)


def test_distance_prefilter_matches_full_scan(spark):
    """bbox-prefiltered distance query == unfiltered exact haversine scan."""
    got = S.distance_search(spark, SF, 12.0, -30.0, 4000.0)
    p = S.geo_points(spark, SF)
    dist = F.round(S._haversine_km(F.col("lat"), F.col("lon"), 12.0, -30.0),
                   S.DIST_ROUND)
    want = (
        p.withColumn("dist_km", dist)
        .filter(F.col("dist_km") <= 4000.0)
        .select("doc_id", "lat", "lon", "dist_km")
    )
    a = sorted(tuple(r) for r in got.collect())
    b = sorted(tuple(r) for r in want.collect())
    assert a == b and len(a) > 0


def test_nearest_matches_brute_force(spark):
    top = S.nearest(spark, SF, 12.0, -30.0, 7).collect()
    pts = S.geo_points(spark, SF).select("doc_id", "lat", "lon").collect()
    lat = np.array([r["lat"] for r in pts])
    lon = np.array([r["lon"] for r in pts])
    ids = np.array([r["doc_id"] for r in pts])
    d = np.round(_hav_np(lat, lon, 12.0, -30.0), S.DIST_ROUND)
    order = sorted(range(len(ids)), key=lambda i: (d[i], ids[i]))[:7]
    assert [r["doc_id"] for r in top] == [int(ids[i]) for i in order]
    assert [r["rank"] for r in top] == list(range(1, 8))


def test_bbox_filtered_bm25_is_a_subset(spark):
    from voyagr_spark.relational import bm25_term

    full = {r["doc_id"]: r["score4"]
            for r in bm25_term(spark, SF, "batch").collect()}
    box = S.bbox_filtered_bm25(spark, SF, "batch", -45, 45, -90, 90).collect()
    assert 0 < len(box) < len(full)  # the box genuinely filters
    for r in box:  # FILTER clause: scores unchanged (constant-score filter)
        assert full[r["doc_id"]] == r["score4"]


def test_bbox_search_edges_inclusive(spark):
    pts = S.geo_points(spark, SF).collect()
    r0 = next(r for r in pts if r["doc_id"] == 1)
    got = S.bbox_search(
        spark, SF, r0["lat"], r0["lat"], r0["lon"], r0["lon"]
    ).collect()
    assert any(r["doc_id"] == 1 for r in got)
