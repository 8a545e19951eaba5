"""PostGIS integration shim (VERDICT r04 'Next round' #7): execute the
EXACT SQL text the PostGIS strategy pushes down (sources/postgis.py
stab_sql / stab_union_sql — the reference's postgis.go:40-68 shape)
against an in-process stand-in: DuckDB with ST_MakePoint / ST_SetSRID /
ST_Contains registered as Python UDFs backed by this repo's exact PIP
kernel over REAL geometry (the golden houat fixture). The shim's rows
must match pip_join's on the same layer and points — a running gate
for the one strategy this sandbox cannot execute over real JDBC.
"""

import json

import duckdb
import numpy as np
import pytest
from pyspark.sql import functions as F

from insideout_spark.geo import pip as geo_pip
from insideout_spark.plans.pip_join import pip_join
from insideout_spark.sources import pages as src_pages
from insideout_spark.sources.postgis import stab_sql, stab_union_sql


@pytest.fixture(scope="module")
def postgis_duck(houat_loops):
    """DuckDB standing in for PostGIS: table france(ogc_fid, geom) with
    one row per feature LOOP (geom = JSON ring, matching pip_join's
    per-(fid,pos) identity), and the three ST_ functions as UDFs."""
    con = duckdb.connect()

    def st_makepoint(lng: float, lat: float) -> str:
        return json.dumps([lng, lat])

    def st_setsrid(geom: str, srid: int) -> str:
        return geom  # SRID bookkeeping only — one CRS in play

    def st_contains(geom: str, point: str) -> bool:
        ring = np.array(json.loads(geom), dtype=np.float64)
        lng, lat = json.loads(point)
        return bool(geo_pip.points_in_ring(np.array([lng]), np.array([lat]), ring)[0])

    con.create_function("st_makepoint", st_makepoint)
    con.create_function("st_setsrid", st_setsrid)
    con.create_function("st_contains", st_contains)
    con.execute("CREATE TABLE france (ogc_fid BIGINT, geom VARCHAR)")
    for lr in houat_loops:
        fid = int(lr["feature_id"]) * 1000 + int(lr["loop_pos"])
        ring = [[float(v[0]), float(v[1])] for v in lr["ring"]]
        con.execute("INSERT INTO france VALUES (?, ?)", [fid, json.dumps(ring)])
    return con


def _pip_join_hits(spark, houat_index, points):
    df = spark.createDataFrame(
        [(i, float(lng), float(lat)) for i, (lng, lat) in enumerate(points)],
        "point_id long, lng double, lat double",
    ).withColumn("url", F.concat(F.lit("p/"), F.col("point_id")))
    res = pip_join(df, houat_index, include_properties=False)
    return {
        (int(r["url"].split("/")[1]), int(r["feature_id"]) * 1000 + int(r["loop_pos"]))
        for r in res.collect()
    }


@pytest.fixture(scope="module")
def shim_points(spark):
    """The golden synthetic points (the ones every stab gate uses) plus
    hand-picked inside/outside probes."""
    pg = src_pages.synth_pages(spark, 64, partitions=2)
    rows = src_pages.extract_points(pg).select("lng", "lat").collect()
    return [(float(r["lng"]), float(r["lat"])) for r in rows]


def test_stab_union_sql_matches_pip_join(spark, houat_index, postgis_duck, shim_points):
    """One pushdown statement for the whole batch (the stab_postgis
    shape) returns exactly pip_join's (point, feature-loop) hit set."""
    sql = stab_union_sql(shim_points, "france")
    got = {(int(p), int(f)) for p, f in postgis_duck.execute(sql).fetchall()}
    want = _pip_join_hits(spark, houat_index, shim_points)
    assert got == want
    assert len(got) > 0  # the golden corpus must actually hit the island


def test_stab_sql_single_point_matches(postgis_duck, houat_loops, shim_points):
    """The reference's single-point statement (postgis.go:40-68 shape)
    agrees with a direct exact-PIP evaluation per loop."""
    for lng, lat in shim_points[:16]:
        got = {int(r[0]) for r in postgis_duck.execute(stab_sql(lng, lat, "france")).fetchall()}
        want = {
            int(lr["feature_id"]) * 1000 + int(lr["loop_pos"])
            for lr in houat_loops
            if geo_pip.ring_contains_point(np.array(lr["ring"]), lng, lat)
        }
        assert got == want


def test_stab_union_sql_bounds():
    with pytest.raises(ValueError, match="at most"):
        stab_union_sql([(0.0, 0.0)] * 513)
    with pytest.raises(ValueError, match="identifier"):
        stab_union_sql([(0.0, 0.0)], table="france; DROP TABLE x")
