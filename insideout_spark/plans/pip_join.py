"""The flagship stab query as a distributed cell-keyed spatial join.

Reference lifecycle (server/server.go:159-310): point -> leaf cell ->
ancestor lookup in the 'I' (interior) and 'O' (exterior) cell postings
-> sure hits skip geometry, candidates run exact Loop.ContainsPoint.

Spark-first re-expression (SURVEY.md §3.1/§4):

    points --extract/leaf-cell (pandas UDF)-->
           --explode ancestors [min..max level] (JVM bit math)-->
           --broadcast hash join vs cell_index-->
           --groupBy(point, fid, pos) max(is_interior)  [= dedup A2 + anti-join J5]-->
           --is_sure? emit : vectorized ray-cast PIP (mapInPandas)-->
           --broadcast join features (properties)-->

Two physical paths, mirroring the reference's strategy knob
(server/server.go:73-108):

* **broadcast** (default): the cell index is broadcast; the probe side
  streams with NO shuffle before the join — at 10^12 pages this is one
  scan + map-side join. Skew is irrelevant to the join itself.
* **shuffle+salt** (`broadcast_index=False`): for polygon layers too big
  to broadcast; the join shuffles on cell_id, so hot cells (dense
  cities) are salted: index rows replicated x `salt_buckets`, probe rows
  pick pmod(xxhash64(point), S) — explicit skew handling per the north
  rule, on top of AQE skew-join splitting.

The exact-PIP residue runs in `mapInPandas` over Arrow batches, grouped
by (feature_id, loop_pos) inside each batch and ray-cast with numpy —
no per-row Python anywhere.
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ..functions.udfs import s2_ancestors_array, s2_leaf_cell
from ..geo import pip as geo_pip
from .index_build import IndexBundle


def _fused_stab(joined: DataFrame, rings_bc, id_cols, lat_col: str, lng_col: str) -> DataFrame:
    """Single-pass dedup + interior short-circuit + exact-PIP residue.

    Exploits a broadcast-join invariant: the ancestor explode emits each
    point's rows contiguously and the broadcast hash join preserves
    per-partition row order, so all hit rows of one point are contiguous
    within a partition. Dedup + max(is_interior) therefore need NO
    shuffle — only a carryover of the trailing point's rows across Arrow
    batch boundaries. (The filter-split + union formulation executed the
    whole upstream twice and shuffled for the aggregate; observed via
    .explain and removed.)
    """
    key = list(id_cols)
    cols = key + [lat_col, lng_col, "feature_id", "loop_pos"]

    def run(batches):
        import pandas as pd

        rings = rings_bc.value
        carry = None

        def process(pdf):
            # pure-numpy group math (pandas string groupby was the hot
            # spot): consecutive-run ids for the point key + packed
            # (run, fid, pos) int64 group keys + reduceat aggregation
            pdf = pdf.reset_index(drop=True)
            n = len(pdf)
            lats = pdf[lat_col].to_numpy()
            lngs = pdf[lng_col].to_numpy()
            fid = pdf["feature_id"].to_numpy().astype(np.int64)
            pos = pdf["loop_pos"].to_numpy().astype(np.int64)
            isint = pdf["is_interior"].to_numpy().astype(np.int8)
            change = np.zeros(n, dtype=bool)
            change[0] = True
            for c in key:
                arr = pdf[c].to_numpy()
                change[1:] |= arr[1:] != arr[:-1]
            run_id = np.cumsum(change) - 1
            # layout: run(23b) | fid(25b) | pos(16b) — batches are <2^23
            # rows; supports 33M features / 65k loops per feature
            packed = (run_id << np.int64(41)) | (fid << np.int64(16)) | pos
            order = np.argsort(packed, kind="stable")
            sp = packed[order]
            starts = np.flatnonzero(np.r_[True, sp[1:] != sp[:-1]])
            rep = order[starts]  # one representative row per group
            sure = np.maximum.reduceat(isint[order], starts).astype(bool)
            keep = sure.copy()
            # exact test only for the non-sure residue, grouped per loop
            resid = np.flatnonzero(~sure)
            if len(resid):
                fp = (fid[rep[resid]] << np.int64(16)) | pos[rep[resid]]
                fo = np.argsort(fp, kind="stable")
                fps = fp[fo]
                fstarts = np.flatnonzero(np.r_[True, fps[1:] != fps[:-1]])
                for si, gstart in enumerate(fstarts):
                    gend = fstarts[si + 1] if si + 1 < len(fstarts) else len(fo)
                    gsel = resid[fo[gstart:gend]]
                    f, p = int(fps[gstart] >> 16), int(fps[gstart] & 0xFFFF)
                    ring = rings.get((f, p))
                    if ring is None or len(ring) < 3:
                        continue
                    rows = rep[gsel]
                    keep[gsel] = geo_pip.points_in_ring(lngs[rows], lats[rows], ring)
            sel = rep[keep]
            out = pdf.iloc[sel][cols].copy()
            out["is_sure_hit"] = sure[keep]
            return out

        for pdf in batches:
            if carry is not None:
                pdf = pd.concat([carry, pdf], ignore_index=True)
                carry = None
            if len(pdf) == 0:
                continue
            # hold back the trailing point's rows: its group may continue
            # in the next batch
            last = tuple(pdf[c].iloc[-1] for c in key)
            tailmask = np.ones(len(pdf), dtype=bool)
            for c, v in zip(key, last):
                tailmask &= (pdf[c] == v).to_numpy()
            # tail rows are contiguous at the end
            tail_start = len(pdf) - int(tailmask[::-1].argmin() if not tailmask.all() else len(pdf))
            carry = pdf.iloc[tail_start:]
            head = pdf.iloc[:tail_start]
            if len(head):
                yield process(head)
        if carry is not None and len(carry):
            yield process(carry)

    out_schema = ", ".join(
        [f"{joined.schema[c].name} {joined.schema[c].dataType.simpleString()}" for c in cols]
        + ["is_sure_hit boolean"]
    )
    return joined.mapInPandas(run, schema=out_schema)


def _pip_filter_with_ring_col(candidates: DataFrame, lat_col: str, lng_col: str) -> DataFrame:
    """Fully distributed PIP for the shuffle path: the ring travels as a
    column (joined from features), so no driver collect / broadcast of
    geometry is needed at any polygon-layer size."""

    def run(batches):
        for pdf in batches:
            if len(pdf) == 0:
                yield pdf.drop(columns=["ring"])
                continue
            pdf = pdf.reset_index(drop=True)
            keep = np.zeros(len(pdf), dtype=bool)
            for (fid, pos), idx in pdf.groupby(["feature_id", "loop_pos"]).indices.items():
                ring = geo_pip.normalize_ring(
                    np.asarray([[v[0], v[1]] for v in pdf["ring"].iloc[idx[0]]], dtype=np.float64)
                )
                if len(ring) < 3:
                    continue
                keep[idx] = geo_pip.points_in_ring(
                    pdf[lng_col].to_numpy()[idx], pdf[lat_col].to_numpy()[idx], ring
                )
            yield pdf[keep].drop(columns=["ring"])

    out_schema = candidates.drop("ring").schema
    return candidates.mapInPandas(run, schema=out_schema)


def pip_join(
    points: DataFrame,
    index: IndexBundle,
    id_cols=("url",),
    lat_col: str = "lat",
    lng_col: str = "lng",
    *,
    broadcast_index: bool = True,
    salt_buckets: int | None = None,
    include_properties: bool = True,
    stop_on_first: bool = False,
    ordered: bool = False,
) -> DataFrame:
    """Stab-join `points` against the dual-cover index.

    Returns one row per (point, feature_id, loop_pos) containment hit
    with `is_sure_hit` marking interior-cover hits that skipped the
    exact test (reference IDsInside vs IDsMayBeInside, index.go:14-17).
    """
    id_cols = list(id_cols)
    man = index.manifest
    min_l, max_l = man["min_cover_level"], man["max_cover_level"]

    pts = points.filter(F.col(lat_col).isNotNull() & F.col(lng_col).isNotNull())
    pts = pts.withColumn("__leaf", s2_leaf_cell(F.col(lat_col), F.col(lng_col)))
    pts = pts.select(
        *id_cols,
        lat_col,
        lng_col,
        F.explode(s2_ancestors_array("__leaf", min_l, max_l)).alias("cell_id"),
    )

    cell_index = index.cell_index
    if broadcast_index:
        # fused zero-shuffle path: broadcast join keeps each point's hit
        # rows contiguous in its partition; dedup + interior
        # short-circuit + exact PIP happen in one Arrow pass
        # (reference A2 dedup storage.go:243,284 + J5 anti-join
        # treeindex:79-91 + P3 exact test server.go:246-249)
        joined = pts.join(F.broadcast(cell_index), "cell_id", "inner")
        result = _fused_stab(joined, index.rings_broadcast(), id_cols, lat_col, lng_col)
    else:
        s = int(salt_buckets or 8)
        salted_index = cell_index.withColumn(
            "salt", F.explode(F.array(*[F.lit(i) for i in range(s)]))
        )
        pts = pts.withColumn("salt", F.pmod(F.xxhash64(*id_cols), F.lit(s)).cast("int"))
        joined = pts.join(salted_index, ["cell_id", "salt"], "inner").drop("salt")
        # shuffle path: row contiguity is not guaranteed after a shuffled
        # join, so dedup is an explicit (map-side-combinable) aggregation
        hits = joined.groupBy(*id_cols, lat_col, lng_col, "feature_id", "loop_pos").agg(
            F.max("is_interior").alias("is_sure_hit")
        )
        sure = hits.filter(F.col("is_sure_hit"))
        candidates = hits.filter(~F.col("is_sure_hit"))
        with_ring = candidates.join(
            index.features.select("feature_id", "loop_pos", "ring"),
            ["feature_id", "loop_pos"],
        )
        passed = _pip_filter_with_ring_col(with_ring, lat_col, lng_col).select(
            *candidates.columns
        )
        result = sure.unionByName(passed)

    props = index.features.select("feature_id", "loop_pos", "properties", "admin_level")
    if include_properties:
        result = result.join(F.broadcast(props), ["feature_id", "loop_pos"], "left")
    else:  # P1 projection: strip feature payload (reference insidesvc.proto:21-24)
        result = result.join(
            F.broadcast(props.select("feature_id", "loop_pos", "admin_level")),
            ["feature_id", "loop_pos"],
            "left",
        )

    if stop_on_first:
        # semantic top-1 per point (reference stopOnFirstFound,
        # index/treeindex/index.go:67-69) — admin_level asc nulls last
        w = Window.partitionBy(*id_cols).orderBy(
            F.col("admin_level").asc_nulls_last(), "feature_id", "loop_pos"
        )
        result = result.withColumn("__rn", F.row_number().over(w)).filter(
            F.col("__rn") == 1
        ).drop("__rn")

    if ordered:
        # reference result ordering (server/server.go:287-294)
        result = result.orderBy(
            *id_cols, F.col("admin_level").asc_nulls_last(), "feature_id", "loop_pos"
        )
    return result
