"""Grid tiler invariants + exact agreement between the numpy kernel,
the Catalyst expression, and the DuckDB oracle SQL (FIXTURES.md §6)."""

import duckdb
import numpy as np

from insideout_spark.geo import grid


def test_cell_roundtrip_bounds():
    rng = np.random.default_rng(5)
    lat = rng.uniform(-89.9, 89.9, 2000)
    lng = rng.uniform(-180, 180, 2000)
    for res in (3, 7, 12):
        cells = grid.latlng_to_cell(lat, lng, res)
        assert np.all(grid.cell_res(cells) == res)
        lng0, lat0, lng1, lat1 = grid.cell_bounds(cells)
        assert np.all((lng >= lng0) & (lng <= lng1 + 1e-9))
        assert np.all((lat >= lat0 - 1e-9) & (lat <= lat1 + 1e-9))


def test_parent_contains():
    rng = np.random.default_rng(6)
    lat = rng.uniform(-89, 89, 500)
    lng = rng.uniform(-180, 180, 500)
    fine = grid.latlng_to_cell(lat, lng, 10)
    coarse = grid.cell_to_parent(fine, 4)
    direct = grid.latlng_to_cell(lat, lng, 4)
    assert np.all(coarse == direct)


def test_disk_ring():
    c = int(grid.latlng_to_cell(np.array([47.0]), np.array([2.0]), 7)[0])
    d0 = grid.grid_disk(c, 0)
    assert d0 == [c]
    d2 = grid.grid_disk(c, 2)
    assert len(d2) == 25
    r2 = grid.grid_ring(c, 2)
    assert len(r2) == 16
    assert set(r2) == set(d2) - set(grid.grid_disk(c, 1))


def test_lng_wrap():
    c_w = grid.latlng_to_cell(np.array([0.0]), np.array([-179.99]), 5)[0]
    disk = grid.grid_disk(int(grid.latlng_to_cell(np.array([0.0]), np.array([179.99]), 5)[0]), 1)
    assert int(c_w) in disk  # neighbors wrap the antimeridian


def test_boundary_closed_ring():
    c = int(grid.latlng_to_cell(np.array([47.0]), np.array([2.0]), 7)[0])
    ring = grid.cell_to_boundary(c)
    assert len(ring) == 5 and ring[0] == ring[-1]


def test_sql_expr_matches_kernel():
    """The DuckDB oracle expression is exactly the kernel."""
    rng = np.random.default_rng(9)
    lat = rng.uniform(-89.9, 89.9, 5000)
    lng = rng.uniform(-179.9, 179.9, 5000)
    for res in (4, 7, 11):
        want = grid.latlng_to_cell(lat, lng, res)
        con = duckdb.connect()
        con.register("pts", __import__("pandas").DataFrame({"lat": lat, "lng": lng}))
        got = con.execute(
            f"SELECT {grid.sql_cell_expr('lat', 'lng', res)} AS c FROM pts"
        ).fetchnumpy()["c"]
        assert np.array_equal(want, got), res


def test_spark_expr_matches_kernel(spark):
    from insideout_spark.functions.udfs import grid_cell_expr

    rng = np.random.default_rng(11)
    import pandas as pd

    pdf = pd.DataFrame(
        {"lat": rng.uniform(-89.9, 89.9, 3000), "lng": rng.uniform(-179.9, 179.9, 3000)}
    )
    df = spark.createDataFrame(pdf)
    got = np.array(
        [r["c"] for r in df.select(grid_cell_expr("lat", "lng", 7).alias("c")).collect()]
    )
    want = grid.latlng_to_cell(pdf["lat"].to_numpy(), pdf["lng"].to_numpy(), 7)
    # collect order == input order for a narrow local pipeline; sort both anyway
    assert np.array_equal(np.sort(want), np.sort(got))
