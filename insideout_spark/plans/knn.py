"""kNN join via grid cell-ring expansion (north-rule operator; no
reference equivalent — SURVEY.md §2.3 'kNN join').

Distance metric: squared Euclidean in (lat,lng) degree space — chosen
because it is exactly reproducible in the DuckDB oracle (identical
IEEE multiply/add order), so the driver's value-hash comparison is
bit-exact. Ties break on target_id.

Two physical strategies:

* `knn_brute` — broadcast the target coordinate matrix, vectorized
  numpy top-k per Arrow batch. No shuffle at all; right answer whenever
  targets fit in a broadcast (<~10^6). This is also the oracle path.
* `knn_cell_join` — the scale path: iterative ring expansion. Round r
  joins still-active points against targets exploded to their ring-r
  grid cells (all Catalyst arithmetic); a point finishes when it holds
  >= k candidates within the ring-r distance guarantee
  (cells outside Chebyshev disk r are >= r*min(cell_w,cell_h) away).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ..functions.udfs import grid_cell_expr
from ..geo import grid as geo_grid


def _dist_sq(plat, plng, tlat, tlng):
    dlat = plat - tlat
    dlng = plng - tlng
    return dlat * dlat + dlng * dlng


def knn_brute(
    points: DataFrame,
    targets: DataFrame,
    k: int,
    id_col: str = "point_id",
    target_id_col: str = "target_id",
) -> DataFrame:
    """Vectorized brute-force kNN with a broadcast target matrix."""
    import numpy as np

    spark = points.sparkSession
    t = targets.select(target_id_col, "lat", "lng").collect()
    tid = np.array([r[target_id_col] for r in t], dtype=np.int64)
    tlat = np.array([r["lat"] for r in t], dtype=np.float64)
    tlng = np.array([r["lng"] for r in t], dtype=np.float64)
    bc = spark.sparkContext.broadcast((tid, tlat, tlng))
    kk = int(k)

    def run(batches):
        import pandas as pd

        tid, tlat, tlng = bc.value
        for pdf in batches:
            if len(pdf) == 0:
                continue
            plat = pdf["lat"].to_numpy()
            plng = pdf["lng"].to_numpy()
            dlat = plat[:, None] - tlat[None, :]
            dlng = plng[:, None] - tlng[None, :]
            d = dlat * dlat + dlng * dlng
            kcl = min(kk, d.shape[1])
            # top-k with (dist, target_id) tiebreak
            order = np.lexsort((np.broadcast_to(tid, d.shape), d), axis=1)[:, :kcl]
            rows = {
                id_col: np.repeat(pdf[id_col].to_numpy(), kcl),
                target_id_col: tid[order].ravel(),
                "dist_sq": np.take_along_axis(d, order, axis=1).ravel(),
                "rank": np.tile(np.arange(1, kcl + 1), len(pdf)),
            }
            yield pd.DataFrame(rows)

    schema = (
        f"{id_col} long, {target_id_col} long, dist_sq double, rank int"
    )
    return points.select(id_col, "lat", "lng").mapInPandas(run, schema=schema)


def _explode_ring_cells(
    targets: DataFrame, res: int, r: int, target_id_col: str, r_from: int | None = None
) -> DataFrame:
    """Targets -> one row per grid cell at Chebyshev distance in
    [r_from, r] around each target's cell (a ring when r_from is None->r,
    a disk when r_from=0). Offsets are a literal array (JVM explode);
    cell recombination is pure arithmetic with lng wrap and lat clamp."""
    n = 1 << res
    lo = r if r_from is None else r_from
    offs = [
        (dx, dy)
        for dx in range(-r, r + 1)
        for dy in range(-r, r + 1)
        if lo <= max(abs(dx), abs(dy)) <= r
    ]
    t = targets.withColumn("__cell", grid_cell_expr("lat", "lng", res))
    rem = F.col("__cell") % geo_grid.RES_MULT
    t = t.withColumn("__x", (rem / geo_grid.X_MULT).cast("long")).withColumn(
        "__y", rem % geo_grid.X_MULT
    )
    t = t.withColumn(
        "__off", F.explode(F.array(*[F.struct(F.lit(dx).alias("dx"), F.lit(dy).alias("dy")) for dx, dy in offs]))
    )
    yy = F.col("__y") + F.col("__off.dy")
    xx = ((F.col("__x") + F.col("__off.dx")) % n + n) % n
    t = t.filter((yy >= 0) & (yy < n))
    cell = F.lit(res).cast("long") * F.lit(geo_grid.RES_MULT) + xx * F.lit(geo_grid.X_MULT) + yy
    return t.select(
        cell.alias("cell_id"),
        F.col(target_id_col),
        F.col("lat").alias("t_lat"),
        F.col("lng").alias("t_lng"),
    )


def _auto_res(targets: DataFrame, k: int) -> int:
    """Pick the grid resolution so a cell holds ~max(8, 2k) targets:
    fine enough that ring-0 joins stay small, coarse enough that a few
    rings find k neighbors. One cheap aggregate over the (small) target
    side."""
    row = targets.agg(
        F.count("*").alias("n"),
        F.min("lat").alias("lat0"),
        F.max("lat").alias("lat1"),
        F.min("lng").alias("lng0"),
        F.max("lng").alias("lng1"),
    ).first()
    n = max(int(row["n"]), 1)
    per_cell = max(8, 2 * k)
    want_cells = max(n / per_cell, 1.0)
    dlng = max(float(row["lng1"] - row["lng0"]), 1e-9)
    dlat = max(float(row["lat1"] - row["lat0"]), 1e-9)
    for res in range(0, geo_grid.MAX_RES + 1):
        cells = max(dlng / geo_grid.cell_width(res), 1.0) * max(
            dlat / geo_grid.cell_height(res), 1.0
        )
        if cells >= want_cells:
            return res
    return geo_grid.MAX_RES


def knn_join(
    points: DataFrame,
    targets: DataFrame,
    k: int,
    id_col: str = "point_id",
    target_id_col: str = "target_id",
    strategy: str = "auto",
    broadcast_limit: int = 200_000,
) -> DataFrame:
    """Strategy-selecting kNN (the engine's AQE-style physical choice):
    small target sets -> vectorized brute force (no shuffle at all);
    large -> cell-ring expansion. Both return identical rows."""
    if strategy == "auto":
        strategy = "brute" if targets.count() <= broadcast_limit else "cells"
    if strategy == "brute":
        return knn_brute(points, targets, k, id_col, target_id_col)
    return knn_cell_join(points, targets, k, id_col=id_col, target_id_col=target_id_col)


def knn_cell_join(
    points: DataFrame,
    targets: DataFrame,
    k: int,
    res: int | None = None,
    id_col: str = "point_id",
    target_id_col: str = "target_id",
    max_rings: int | None = None,
) -> DataFrame:
    """Exact kNN via iterative cell-ring expansion; returns
    (id, target_id, dist_sq, rank) identical to `knn_brute`."""
    if res is None:
        res = _auto_res(targets, k)
    n = 1 << res
    guarantee_step = min(geo_grid.cell_width(res), geo_grid.cell_height(res))
    max_rings = max_rings if max_rings is not None else n  # full sweep worst case

    pts = points.select(id_col, "lat", "lng").withColumn(
        "cell_id", grid_cell_expr("lat", "lng", res)
    )
    active = pts
    acc = None
    # first probe covers disk(1) in ONE join so the common case resolves
    # in a single round instead of two (each round costs Spark actions);
    # disk(2) was measured to overshoot (25 offsets x targets inflates
    # the ranking window's input more than a round saves)
    initial_disk = 1
    r = 0
    while r <= max_rings:
        if r == 0:
            ring_cells = _explode_ring_cells(
                targets, res, min(initial_disk, max_rings), target_id_col, r_from=0
            )
            r = min(initial_disk, max_rings)
        else:
            ring_cells = _explode_ring_cells(targets, res, r, target_id_col)
        cand = active.join(F.broadcast(ring_cells), "cell_id", "inner").select(
            id_col,
            "lat",
            "lng",
            "cell_id",
            target_id_col,
            _dist_sq(F.col("lat"), F.col("lng"), F.col("t_lat"), F.col("t_lng")).alias(
                "dist_sq"
            ),
        )
        acc = cand if acc is None else acc.unionByName(cand)
        # rank once per round, TRIM the accumulator to top-k per point
        # (rows beyond rank k can never re-enter the result, so the
        # accumulator stays bounded at k rows/point instead of growing
        # with every ring), and reuse the same ranking for the
        # termination check
        w = Window.partitionBy(id_col).orderBy("dist_sq", target_id_col)
        ranked = acc.withColumn("rank", F.row_number().over(w)).filter(
            F.col("rank") <= k
        )
        # memory persist instead of localCheckpoint: rounds are few (~3)
        # so bounded lineage is fine and we skip the disk write
        prev = acc
        acc = ranked.drop("rank").persist()
        acc.count()
        if hasattr(prev, "unpersist") and prev.is_cached:
            prev.unpersist()

        # a point is done when its k-th best distance beats the guarantee
        g = r * guarantee_step
        kth = (
            ranked.filter((F.col("rank") == k) & (F.col("dist_sq") <= F.lit(g * g)))
            .select(id_col)
        )
        active = active.join(kth, id_col, "left_anti")
        r += 1
        if active.isEmpty():
            break

    w = Window.partitionBy(id_col).orderBy("dist_sq", target_id_col)
    return (
        acc.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(id_col, target_id_col, "dist_sq", "rank")
    )
