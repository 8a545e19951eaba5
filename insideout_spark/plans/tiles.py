"""Tile assignment + raster<->vector export (SURVEY.md §2.8 F6-F11).

S2 leaf projection is the only Python (vectorized pandas UDF); the
ancestor/parent math and the whole grid tiler run as Catalyst
expressions inside whole-stage codegen.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import StringType

from ..functions.udfs import grid_cell_expr, s2_leaf_cell, s2_parent_expr, s2_token
from ..geo import grid as geo_grid


def assign_tiles(
    df: DataFrame,
    lat_col: str = "lat",
    lng_col: str = "lng",
    s2_level: int = 10,
    grid_res: int = geo_grid.DEFAULT_RES,
    with_token: bool = False,
) -> DataFrame:
    """Adds `s2_cell_l{level}`, `grid_cell_r{res}` (and optionally
    `s2_token`) columns. The reference's point->cell assignment
    (index/treeindex/index.go:57-59 + Parent storage.go:242), batched."""
    out = df.withColumn("__leaf", s2_leaf_cell(F.col(lat_col), F.col(lng_col)))
    out = out.withColumn(f"s2_cell_l{s2_level}", s2_parent_expr("__leaf", s2_level))
    out = out.withColumn(f"grid_cell_r{grid_res}", grid_cell_expr(lat_col, lng_col, grid_res))
    if with_token:
        out = out.withColumn("s2_token", s2_token(F.col(f"s2_cell_l{s2_level}")))
    return out.drop("__leaf")


@F.pandas_udf(StringType())
def s2_cell_geojson(cell: pd.Series) -> pd.Series:
    """S2 cell id -> GeoJSON polygon feature string (closed 5-vertex
    ring; reference server/debug/web.go:47-77)."""
    import json

    import numpy as np

    from ..geo import s2 as geo_s2

    cells = geo_s2.to_unsigned(cell.to_numpy())
    lats, lngs = geo_s2.cell_vertices_latlng(cells)
    out = []
    for k in range(len(cells)):
        ring = [[float(lngs[k, c]), float(lats[k, c])] for c in range(4)]
        ring.append(ring[0])
        out.append(
            json.dumps(
                {
                    "type": "Feature",
                    "properties": {"token": geo_s2.token(cells[k])},
                    "geometry": {"type": "Polygon", "coordinates": [ring]},
                }
            )
        )
    return pd.Series(out)


def dissolve_tiles(df: DataFrame, group_cols, cell_col: str) -> DataFrame:
    """Raster->vector dissolve per group: merge each group's grid cells
    into the GeoJSON outline of their union (geo/dissolve.py) — e.g. the
    vector footprint of every feature's tile set. applyInPandas per
    group; the lattice tracing is integer-exact numpy."""
    group_cols = list(group_cols)

    def run(key, pdf):
        import pandas as pd

        from ..geo.dissolve import dissolve_to_geojson

        gj = dissolve_to_geojson(pdf[cell_col].to_numpy())
        return pd.DataFrame([[*key, len(pdf), gj]])

    schema = ", ".join(
        [f"{df.schema[c].name} {df.schema[c].dataType.simpleString()}" for c in group_cols]
        + ["n_cells long", "outline_geojson string"]
    )
    return df.select(*group_cols, cell_col).groupBy(*group_cols).applyInPandas(run, schema)


def grid_cell_bounds_cols(df: DataFrame, cell_col: str) -> DataFrame:
    """Vector corners of grid cells as plain double columns — exact
    arithmetic, fully Catalyst-side, and expressible in the DuckDB
    oracle (FIXTURES.md §6 raster->vector)."""
    c = F.col(cell_col)
    res = (c / geo_grid.RES_MULT).cast("long")
    rem = c % geo_grid.RES_MULT
    x = (rem / geo_grid.X_MULT).cast("long")
    y = rem % geo_grid.X_MULT
    w = F.lit(360.0) / F.pow(F.lit(2.0), res.cast("double"))
    h = F.lit(180.0) / F.pow(F.lit(2.0), res.cast("double"))
    lng0 = F.lit(-180.0) + x.cast("double") * w
    lat0 = F.lit(-90.0) + y.cast("double") * h
    return (
        df.withColumn("cell_lng0", lng0)
        .withColumn("cell_lat0", lat0)
        .withColumn("cell_lng1", lng0 + w)
        .withColumn("cell_lat1", lat0 + h)
    )
