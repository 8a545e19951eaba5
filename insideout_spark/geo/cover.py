"""Dual S2 cell covering (interior + exterior) of polygon rings.

This reimplements — from scratch, via conservative recursive cell
subdivision — the role of `s2.RegionCoverer.Covering` /
`.InteriorCovering` used by the reference (tools.go:112-131,
storage/bbolt/storage.go:345-359):

* **interior cover**: cells whose entire extent lies strictly inside
  the ring. A query point in such a cell is a definite hit with no
  exact PIP test (reference server/server.go:185-229).
* **exterior (full) cover**: cells whose union contains the whole
  ring. A point outside the exterior cover is a definite miss; a point
  in the exterior cover but not the interior cover is a candidate
  (reference server/server.go:233-284).

The exact cell *sets* differ from the Go RegionCoverer (different
search heuristics), but the semantic contract above — which is all the
join relies on — is preserved by construction and property-tested
against the exact PIP oracle on thousands of random points
(tests/test_cover.py). The interior/boundary split as a join-time
filter-refinement approximation follows the published "Raster
Intervals" idea (SIGMOD 2023, see PAPERS.md): precompute a raster
approximation whose fully-inside cells skip exact geometry. Classification is done in (lng,lat) space with
an inflated conservative bounding rect per cell, so a cell is only
called INSIDE/OUTSIDE when that holds with margin; anything borderline
is BOUNDARY and recursed.
"""

from __future__ import annotations

from dataclasses import dataclass

import numpy as np

from . import pip, s2

INSIDE = 1
OUTSIDE = 2
BOUNDARY = 3

# matches the reference test coverers (index/treeindex/index_test.go:120-129)
DEFAULT_INTERIOR = (10, 16, 24)
DEFAULT_EXTERIOR = (10, 15, 16)


@dataclass(frozen=True)
class CoverParams:
    min_level: int = 10
    max_level: int = 16
    max_cells: int = 24


_FACE_CELLS = [np.uint64((f << 61) | (1 << 60)) for f in range(6)]

# per-edge sample count for the conservative latlng bbox of a cell
_EDGE_SAMPLES = 4


def cell_latlng_rect(cell_id):
    """Conservative (lng0, lng1, lat0, lat1) rect containing the cell.

    Samples the 4 uv-space edges and inflates; guaranteed to contain the
    true (curved) cell boundary for levels >= 4 by a wide margin.
    Returns None for cells where a planar rect is meaningless (polar
    faces at very coarse levels, antimeridian wrap) — callers must then
    treat the cell as BOUNDARY/recurse.
    """
    face, u0, u1, v0, v1 = s2.cell_uv_bounds(np.array([cell_id]))
    face = int(face[0])
    u0, u1, v0, v1 = float(u0[0]), float(u1[0]), float(v0[0]), float(v1[0])
    ts = np.linspace(0.0, 1.0, _EDGE_SAMPLES + 1)
    us = u0 + (u1 - u0) * ts
    vs = v0 + (v1 - v0) * ts
    bu = np.concatenate([us, np.full_like(ts, u1), us[::-1], np.full_like(ts, u0)])
    bv = np.concatenate([np.full_like(ts, v0), vs, np.full_like(ts, v1), vs[::-1]])
    x, y, z = s2.face_uv_to_xyz(np.full(bu.shape, face), bu, bv)
    norm = np.sqrt(x * x + y * y + z * z)
    lat, lng = s2.xyz_to_latlng(x / norm, y / norm, z / norm)
    lng0, lng1 = float(lng.min()), float(lng.max())
    lat0, lat1 = float(lat.min()), float(lat.max())
    if lng1 - lng0 > 180.0:  # antimeridian wrap — no planar rect
        return None
    if lat1 > 89.9 or lat0 < -89.9:  # polar neighborhood
        return None
    # inflate: covers sampling error of the curved edges
    dl = (lng1 - lng0) * 0.02 + 1e-12
    dt = (lat1 - lat0) * 0.02 + 1e-12
    return (lng0 - dl, lng1 + dl, lat0 - dt, lat1 + dt)


def _classify(rect, ring, ring_bbox):
    """Classify a conservative cell rect against a ring."""
    rx0, rx1, ry0, ry1 = rect
    bx0, bx1, by0, by1 = ring_bbox
    if rx1 < bx0 or rx0 > bx1 or ry1 < by0 or ry0 > by1:
        return OUTSIDE
    if pip.segments_intersect_rect(ring, rx0, rx1, ry0, ry1):
        return BOUNDARY
    # no edge crosses the rect: either rect wholly in/out of ring, or
    # ring wholly inside rect
    vx = ring[:, 0]
    vy = ring[:, 1]
    if np.any((vx >= rx0) & (vx <= rx1) & (vy >= ry0) & (vy <= ry1)):
        return BOUNDARY  # ring contained in the rect
    cx, cy = (rx0 + rx1) * 0.5, (ry0 + ry1) * 0.5
    if pip.ring_contains_point(ring, cx, cy):
        return INSIDE
    return OUTSIDE


def normalize_cells(cells):
    """Sort, dedup, and drop cells contained in another cell of the set."""
    if not cells:
        return []
    arr = np.unique(np.array(cells, dtype=np.uint64))
    rmin = s2.range_min(arr)
    rmax = s2.range_max(arr)
    # ranges are nested or disjoint: sweep by (range_min asc, coarser first)
    order = np.lexsort((s2.level(arr), rmin))
    keep = []
    cur_max = None
    for k in order:
        if cur_max is not None and rmax[k] <= cur_max:
            continue  # contained in a previously kept cell
        keep.append(arr[k])
        cur_max = rmax[k]
    return [np.uint64(c) for c in sorted(keep)]


def _coarsen_covering(cells, min_level, max_cells):
    """Reduce a covering to <= max_cells by replacing the deepest cells
    with their parents (keeps the covering property, like the
    RegionCoverer's budget behavior)."""
    cells = normalize_cells(cells)
    while len(cells) > max_cells:
        arr = np.array(cells, dtype=np.uint64)
        levels = s2.level(arr)
        deepest = int(levels.max())
        if deepest <= min_level:
            break
        promote = arr[levels == deepest]
        keep = arr[levels != deepest]
        parents = s2.parent(promote, deepest - 1)
        cells = normalize_cells(list(keep) + list(parents))
    return cells


def _shrink_interior(cells, max_cells):
    """Reduce an interior cover to <= max_cells by dropping the smallest
    cells (dropping preserves the interior property)."""
    cells = normalize_cells(cells)
    if len(cells) <= max_cells:
        return cells
    arr = np.array(cells, dtype=np.uint64)
    levels = s2.level(arr)
    order = np.lexsort((arr, levels))  # coarsest (lowest level) first
    return [np.uint64(c) for c in arr[order][:max_cells]]


def _ring_cap(ring):
    """Conservative spherical cap (center xyz, max angular radius) of a
    ring — used as a level-independent quick reject that also works for
    polar / antimeridian cells where a lat/lng rect is meaningless."""
    x, y, z = s2.latlng_to_xyz(ring[:, 1], ring[:, 0])
    cx, cy, cz = x.mean(), y.mean(), z.mean()
    n = np.sqrt(cx * cx + cy * cy + cz * cz)
    cx, cy, cz = cx / n, cy / n, cz / n
    cosang = np.clip(x * cx + y * cy + z * cz, -1.0, 1.0)
    return (cx, cy, cz), float(np.arccos(cosang.min()))


def _cell_cap(cell):
    """Conservative spherical cap of a cell from its center + corners
    (x1.5 margin covers edge curvature at every level)."""
    arr = np.array([cell], dtype=np.uint64)
    clat, clng = s2.cell_center_latlng(arr)
    vlat, vlng = s2.cell_vertices_latlng(arr)
    cx, cy, cz = s2.latlng_to_xyz(clat[0], clng[0])
    vx, vy, vz = s2.latlng_to_xyz(vlat[0], vlng[0])
    cosang = np.clip(vx * cx + vy * cy + vz * cz, -1.0, 1.0)
    return (float(cx), float(cy), float(cz)), float(np.arccos(cosang.min())) * 1.5


def cell_latlng_rects(cells):
    """Vectorized conservative rects for N cells. Returns
    (valid (N,), lng0, lng1, lat0, lat1) — invalid where polar/wrapping."""
    cells = np.asarray(cells, dtype=np.uint64)
    n = len(cells)
    face, u0, u1, v0, v1 = s2.cell_uv_bounds(cells)
    ts = np.linspace(0.0, 1.0, _EDGE_SAMPLES + 1)
    # boundary samples in uv: 4 edges x (S+1) points -> (n, 4(S+1))
    us = u0[:, None] + (u1 - u0)[:, None] * ts[None, :]
    vs = v0[:, None] + (v1 - v0)[:, None] * ts[None, :]
    cu1 = np.broadcast_to(u1[:, None], us.shape)
    cu0 = np.broadcast_to(u0[:, None], us.shape)
    cv0 = np.broadcast_to(v0[:, None], vs.shape)
    cv1 = np.broadcast_to(v1[:, None], vs.shape)
    bu = np.concatenate([us, cu1, us[:, ::-1], cu0], axis=1)
    bv = np.concatenate([cv0, vs, cv1, vs[:, ::-1]], axis=1)
    bface = np.broadcast_to(face[:, None], bu.shape)
    x, y, z = s2.face_uv_to_xyz(bface.ravel(), bu.ravel(), bv.ravel())
    norm = np.sqrt(x * x + y * y + z * z)
    lat, lng = s2.xyz_to_latlng(x / norm, y / norm, z / norm)
    lat = lat.reshape(n, -1)
    lng = lng.reshape(n, -1)
    lng0, lng1 = lng.min(axis=1), lng.max(axis=1)
    lat0, lat1 = lat.min(axis=1), lat.max(axis=1)
    valid = (lng1 - lng0 <= 180.0) & (lat1 <= 89.9) & (lat0 >= -89.9)
    dl = (lng1 - lng0) * 0.02 + 1e-12
    dt = (lat1 - lat0) * 0.02 + 1e-12
    return valid, lng0 - dl, lng1 + dl, lat0 - dt, lat1 + dt


def _cell_caps(cells):
    """Vectorized conservative spherical caps: (cx,cy,cz (N,)), rad (N,)."""
    cells = np.asarray(cells, dtype=np.uint64)
    clat, clng = s2.cell_center_latlng(cells)
    vlat, vlng = s2.cell_vertices_latlng(cells)
    cx, cy, cz = s2.latlng_to_xyz(clat, clng)
    vx, vy, vz = s2.latlng_to_xyz(vlat, vlng)
    cosang = np.clip(
        vx * cx[:, None] + vy * cy[:, None] + vz * cz[:, None], -1.0, 1.0
    )
    return (cx, cy, cz), np.arccos(cosang.min(axis=1)) * 1.5


def cover_ring(ring, params: CoverParams, interior: bool):
    """Compute the covering (interior=False) or interior covering
    (interior=True) of one ring. Returns a normalized list of uint64
    cell ids. Level-synchronous BFS, fully vectorized per level."""
    ring = pip.normalize_ring(np.asarray(ring, dtype=np.float64))
    if len(ring) < 3:
        return []
    bx0, bx1 = float(ring[:, 0].min()), float(ring[:, 0].max())
    by0, by1 = float(ring[:, 1].min()), float(ring[:, 1].max())
    (rcx, rcy, rcz), rrad = _ring_cap(ring)
    out = []
    alive = np.array(_FACE_CELLS, dtype=np.uint64)
    for lvl in range(0, params.max_level + 1):
        if len(alive) == 0:
            break
        # level-independent spherical-cap reject (handles poles/wrap)
        (ccx, ccy, ccz), crad = _cell_caps(alive)
        cosd = np.clip(rcx * ccx + rcy * ccy + rcz * ccz, -1.0, 1.0)
        alive = alive[np.arccos(cosd) <= rrad + crad + 1e-9]
        if len(alive) == 0:
            break
        valid, rx0, rx1, ry0, ry1 = cell_latlng_rects(alive)
        classify = valid & (lvl >= params.min_level)
        code = np.full(len(alive), BOUNDARY, dtype=np.int8)
        if np.any(classify):
            cm = classify
            # bbox reject
            disjoint = (rx1 < bx0) | (rx0 > bx1) | (ry1 < by0) | (ry0 > by1)
            edge_hit = np.zeros(len(alive), dtype=bool)
            vert_in = np.zeros(len(alive), dtype=bool)
            todo = cm & ~disjoint
            if np.any(todo):
                edge_hit[todo] = pip.segments_intersect_rects(
                    ring, rx0[todo], rx1[todo], ry0[todo], ry1[todo]
                )
                vert_in[todo] = pip.vertices_in_rects(
                    ring, rx0[todo], rx1[todo], ry0[todo], ry1[todo]
                )
            center_in = np.zeros(len(alive), dtype=bool)
            plain = todo & ~edge_hit & ~vert_in
            if np.any(plain):
                center_in[plain] = pip.points_in_ring(
                    (rx0[plain] + rx1[plain]) * 0.5,
                    (ry0[plain] + ry1[plain]) * 0.5,
                    ring,
                )
            code[cm & disjoint] = OUTSIDE
            code[plain & center_in] = INSIDE
            code[plain & ~center_in] = OUTSIDE
            # edge_hit or vert_in stay BOUNDARY
        out.extend(alive[code == INSIDE])
        if lvl == params.max_level:
            if not interior:
                out.extend(alive[code == BOUNDARY])
            break
        recurse = alive[code == BOUNDARY]
        alive = s2.children(recurse).T.ravel() if len(recurse) else recurse
    if interior:
        return _shrink_interior(out, params.max_cells)
    return _coarsen_covering(out, params.min_level, params.max_cells)


def auto_cover_params(loop_rows, max_cells: int = 32):
    """Pick (interior, exterior) CoverParams from the polygon sizes, the
    way the reference picks indexer flags per dataset (communes: levels
    10-16, countries: 4-10 — cmd/indexer/main.go:61-67, Makefile:50-53):
    min_level ~ the cell size of the median loop's bbox diagonal,
    max_level 3 levels finer (interior one more for a tighter
    short-circuit region)."""
    import math

    diags = []
    for r in loop_rows:
        ring = np.asarray(r["ring"], dtype=np.float64)
        dx = float(ring[:, 0].max() - ring[:, 0].min())
        dy = float(ring[:, 1].max() - ring[:, 1].min())
        diags.append(math.hypot(dx, dy))
    if not diags:
        return (
            CoverParams(*DEFAULT_INTERIOR),
            CoverParams(*DEFAULT_EXTERIOR),
        )
    med = sorted(diags)[len(diags) // 2]
    # S2 level whose cell edge (~90deg / 2^level on a face) matches med
    lvl = int(np.clip(round(math.log2(90.0 / max(med, 1e-6))), 0, 18))
    min_l = max(lvl - 1, 0)
    return (
        CoverParams(min_l, min(min_l + 4, s2.MAX_LEVEL), max_cells * 2),
        CoverParams(min_l, min(min_l + 3, s2.MAX_LEVEL), max_cells),
    )


def dual_cover(ring, interior_params: CoverParams, exterior_params: CoverParams):
    """(interior_cells, exterior_cells) for one ring — the reference's
    per-loop `CellsIn` / `CellsOut` (storage.go:34-40)."""
    return (
        cover_ring(ring, interior_params, interior=True),
        cover_ring(ring, exterior_params, interior=False),
    )
