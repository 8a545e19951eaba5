"""Raster->vector dissolve: cell unions polygonize to exact outlines."""

import json

import numpy as np

from insideout_spark.geo import grid as geo_grid
from insideout_spark.geo import pip as geo_pip
from insideout_spark.geo.dissolve import dissolve_grid_cells, dissolve_to_geojson

RES = 10
W = geo_grid.cell_width(RES)
H = geo_grid.cell_height(RES)


def _cell(cx, cy):
    return RES * geo_grid.RES_MULT + cx * geo_grid.X_MULT + cy


def test_single_cell():
    rings = dissolve_grid_cells([_cell(100, 200)])
    assert len(rings) == 1
    r = rings[0]
    assert len(r) == 5 and r[0] == r[-1]
    lng0, lat0 = -180.0 + 100 * W, -90.0 + 200 * H
    assert [lng0, lat0] in r and [lng0 + W, lat0 + H] in r


def test_two_adjacent_cells_merge():
    rings = dissolve_grid_cells([_cell(10, 10), _cell(11, 10)])
    assert len(rings) == 1
    assert len(rings[0]) == 5  # 2x1 rectangle: 4 corners + close


def test_square_with_hole():
    cells = [
        _cell(x, y) for x in range(5, 8) for y in range(5, 8) if not (x == 6 and y == 6)
    ]
    rings = dissolve_grid_cells(cells)
    assert len(rings) == 2  # outer + hole
    feat = json.loads(dissolve_to_geojson(cells))
    assert feat["geometry"]["type"] == "Polygon"
    assert len(feat["geometry"]["coordinates"]) == 2
    # the hole's interior point is NOT inside the dissolved region but
    # IS inside the outer ring
    outer, hole = feat["geometry"]["coordinates"]
    hx = -180.0 + 6.5 * W
    hy = -90.0 + 6.5 * H
    assert geo_pip.ring_contains_point(np.array(outer), hx, hy)
    assert geo_pip.ring_contains_point(np.array(hole), hx, hy)


def test_disjoint_components():
    cells = [_cell(1, 1), _cell(50, 50)]
    feat = json.loads(dissolve_to_geojson(cells))
    assert feat["geometry"]["type"] == "MultiPolygon"
    assert len(feat["geometry"]["coordinates"]) == 2


def test_l_shape_vertex_count():
    cells = [_cell(0, 0), _cell(1, 0), _cell(0, 1)]
    rings = dissolve_grid_cells(cells)
    assert len(rings) == 1
    assert len(rings[0]) == 7  # L-shape: 6 corners + close


def test_dissolve_membership_property():
    """Random cell blobs: a point is inside the dissolved rings (outer
    minus holes, even-odd) iff its cell is in the set."""
    rng = np.random.default_rng(9)
    for _ in range(5):
        xs = rng.integers(100, 112, 40)
        ys = rng.integers(100, 112, 40)
        cells = sorted({int(_cell(int(a), int(b))) for a, b in zip(xs, ys)})
        rings = dissolve_grid_cells(cells)
        # sample random points in the bbox; even-odd over all rings
        lng = -180.0 + rng.uniform(99, 113, 300) * W
        lat = -90.0 + rng.uniform(99, 113, 300) * H
        inside = np.zeros(300, dtype=bool)
        for r in rings:
            inside ^= geo_pip.points_in_ring(lng, lat, np.array(r))
        want_cells = geo_grid.latlng_to_cell(lat, lng, RES)
        want = np.isin(want_cells, cells)
        assert np.array_equal(inside, want)


def test_dissolve_tiles_spark(spark):
    import json as _json

    from pyspark.sql import functions as F

    from insideout_spark.plans.tiles import assign_tiles, dissolve_tiles
    from insideout_spark.sources import pages as src_pages

    pts = src_pages.extract_points(src_pages.synth_pages(spark, 500, partitions=4))
    tiled = assign_tiles(pts, grid_res=7).withColumn(
        "bucket", (F.col("grid_cell_r7") % 3).cast("int")
    )
    out = dissolve_tiles(tiled, ["bucket"], "grid_cell_r7").collect()
    assert len(out) == 3
    for r in out:
        feat = _json.loads(r["outline_geojson"])
        assert feat["geometry"]["type"] in ("Polygon", "MultiPolygon")
        assert r["n_cells"] > 0
