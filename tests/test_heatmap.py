"""facet.heatmap (SpatialHeatmapFacets + HeatmapFacetCounter)."""

import sys
from pathlib import Path

import pytest

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

from voyagr_spark.spatial import heatmap_bounds, heatmap_facet

SF_DIR = "/root/testdata/sf0.001"


def _points(n):
    return [((d * 7919) % 18000, (d * 104729) % 36000) for d in range(n)]


def test_bounds_snap_outward():
    # level 4: 1125 x 2250 centi-degree cells, 16x16 world grid
    row0, row1, col0, col1, wlat, wlon = heatmap_bounds(
        -90, 90, -180, 180, 4)
    assert (row0, row1, col0, col1) == (0, 15, 0, 15)
    assert (wlat, wlon) == (1125, 2250)
    # a box strictly inside one cell still returns that whole cell
    row0, row1, col0, col1, _, _ = heatmap_bounds(1.0, 2.0, 1.0, 2.0, 4)
    assert row0 == row1 == 8 and col0 == col1 == 8
    # max on an exact cell boundary includes the touching cell
    # (HeatmapFacetCounter: edge cells that overlap are returned)
    _, row1b, _, col1b, _, _ = heatmap_bounds(1.0, 11.25, 1.0, 22.5, 4)
    assert row1b == 9 and col1b == 9


def test_bounds_validation():
    with pytest.raises(ValueError, match="gridLevel"):
        heatmap_bounds(0, 1, 0, 1, 0)
    with pytest.raises(ValueError, match="gridLevel"):
        heatmap_bounds(0, 1, 0, 1, 7)
    with pytest.raises(ValueError, match="min must not exceed"):
        heatmap_bounds(5, 1, 0, 1, 4)
    with pytest.raises(ValueError, match="world bounds"):
        heatmap_bounds(0, 95, 0, 1, 4)
    with pytest.raises(ValueError, match="resolution"):
        heatmap_bounds(0.001, 1, 0, 1, 4)


def test_too_many_cells_raises(spark):
    with pytest.raises(ValueError, match="Too many cells"):
        heatmap_facet(spark, SF_DIR, -90, 90, -180, 180, level=4,
                      max_cells=100)


def test_counts_match_reference_walk(spark):
    """Whole-world level-3 heatmap == a literal per-point walk."""
    import duckdb

    n = duckdb.sql(
        f"SELECT count(*) FROM '{SF_DIR}/documents.parquet'").fetchone()[0]
    wlat, wlon = 18000 // 8, 36000 // 8
    expect = {}
    for lati, loni in _points(n):
        key = (loni // wlon, lati // wlat)
        expect[key] = expect.get(key, 0) + 1
    rows = heatmap_facet(spark, SF_DIR, -90, 90, -180, 180, 3).collect()
    got = {(r.col, r.row): r.n for r in rows}
    assert got == expect
    assert sum(got.values()) == n
    for r in rows:
        assert r.cell_min_lon == r.col * wlon / 100.0 - 180.0
        assert r.cell_min_lat == r.row * wlat / 100.0 - 90.0


def test_edge_cells_count_whole(spark):
    """Docs outside the geom but inside an overlapping edge cell count
    (HeatmapFacetCounter javadoc: edge cells are returned whole)."""
    import duckdb

    n = duckdb.sql(
        f"SELECT count(*) FROM '{SF_DIR}/documents.parquet'").fetchone()[0]
    wlat, wlon = 1125, 2250
    # geom = one centi-degree dot inside cell (8, 8)
    rows = heatmap_facet(spark, SF_DIR, 1.0, 1.01, 1.0, 1.01, 4).collect()
    expect = sum(
        1 for lati, loni in _points(n)
        if loni // wlon == 8 and lati // wlat == 8)
    assert len(rows) == 1 and rows[0].n == expect
    assert (rows[0].col, rows[0].row) == (0, 0)  # heatmap-local indices


def test_where_filter_is_docset(spark):
    all_rows = heatmap_facet(spark, SF_DIR, -90, 90, -180, 180, 2)
    en_rows = heatmap_facet(spark, SF_DIR, -90, 90, -180, 180, 2,
                            where="lang = 'en'")
    total = sum(r.n for r in all_rows.collect())
    en = sum(r.n for r in en_rows.collect())
    assert 0 < en < total
