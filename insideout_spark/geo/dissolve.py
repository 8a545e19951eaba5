"""Raster -> vector dissolve: merge a set of grid cells into the
boundary rings of their union (polygonize).

Completes the raster<->vector story (SURVEY.md F11 covers single-cell
boundaries; this produces the merged outline of a cell SET — e.g. the
vector footprint of a feature's cover, or of all tiles above a count
threshold). Algorithm: every cell contributes its 4 directed CCW edges
on the integer lattice; edges shared by two cells cancel; the survivors
chain into closed rings (outer rings CCW, holes CW). All lattice math
is integer-exact; coordinates convert to lng/lat only at the end.
"""

from __future__ import annotations

import numpy as np

from . import grid as geo_grid


def _trace_rings(edges: set) -> list:
    """edges: set of directed ((x1,y1),(x2,y2)) lattice segments.
    Returns closed integer rings. At pinch points (two diagonal cells
    sharing a corner) prefer the leftmost turn so rings stay simple."""
    out_by_start: dict = {}
    for a, b in edges:
        out_by_start.setdefault(a, []).append(b)
    # deterministic choice order
    for k in out_by_start:
        out_by_start[k].sort()
    rings = []
    remaining = set(edges)
    while remaining:
        start, nxt = min(remaining)
        ring = [start, nxt]
        remaining.discard((start, nxt))
        prev, cur = start, nxt
        while cur != start:
            cands = [b for b in out_by_start.get(cur, []) if (cur, b) in remaining]
            if not cands:
                break  # degenerate; shouldn't happen for valid cell sets
            if len(cands) == 1:
                chosen = cands[0]
            else:
                # pinch point: pick the leftmost turn relative to the
                # incoming direction (keeps each ring simple)
                din = (cur[0] - prev[0], cur[1] - prev[1])

                def turn(b):
                    dout = (b[0] - cur[0], b[1] - cur[1])
                    return din[0] * dout[1] - din[1] * dout[0]  # cross z

                chosen = max(cands, key=turn)
            remaining.discard((cur, chosen))
            ring.append(chosen)
            prev, cur = cur, chosen
        rings.append(ring)
    return rings


def dissolve_grid_cells(cell_ids) -> list:
    """Grid cell ids (same resolution) -> list of closed [lng, lat]
    rings outlining the union. Outer boundaries come out CCW, holes CW
    (standard GeoJSON winding)."""
    cells = np.unique(np.asarray(cell_ids, dtype=np.int64))
    if len(cells) == 0:
        return []
    res = int(geo_grid.cell_res(cells)[0])
    if not np.all(geo_grid.cell_res(cells) == res):
        raise ValueError("dissolve requires a single resolution")
    x, y = geo_grid.cell_xy(cells)
    edges: set = set()
    for cx, cy in zip(x.tolist(), y.tolist()):
        bl, br = (cx, cy), (cx + 1, cy)
        tr, tl = (cx + 1, cy + 1), (cx, cy + 1)
        for a, b in ((bl, br), (br, tr), (tr, tl), (tl, bl)):
            if (b, a) in edges:
                edges.discard((b, a))  # interior edge cancels
            else:
                edges.add((a, b))
    rings = _trace_rings(edges)
    w = geo_grid.cell_width(res)
    h = geo_grid.cell_height(res)
    out = []
    for ring in rings:
        # collapse collinear lattice points for compact output
        compact = []
        for k, p in enumerate(ring[:-1]):
            prv = ring[k - 1] if k else ring[-2]
            nxt = ring[k + 1]
            if (p[0] - prv[0]) * (nxt[1] - p[1]) == (p[1] - prv[1]) * (nxt[0] - p[0]):
                continue  # collinear
            compact.append(p)
        compact.append(compact[0])
        out.append([[-180.0 + px * w, -90.0 + py * h] for px, py in compact])
    return out


def dissolve_to_geojson(cell_ids, properties=None) -> str:
    """Cell set -> GeoJSON Feature with a (Multi)Polygon of the union."""
    import json

    rings = dissolve_grid_cells(cell_ids)
    if not rings:
        geom = {"type": "Polygon", "coordinates": []}
    else:
        # classify winding: CCW (positive shoelace) = outer ring
        def area2(r):
            return sum(
                r[i][0] * r[i + 1][1] - r[i + 1][0] * r[i][1] for i in range(len(r) - 1)
            )

        outers = [r for r in rings if area2(r) > 0]
        holes = [r for r in rings if area2(r) <= 0]
        if len(outers) == 1:
            geom = {"type": "Polygon", "coordinates": [outers[0], *holes]}
        else:
            # assign each hole to the outer ring containing its first vertex
            from . import pip as geo_pip

            polys = [[o] for o in outers]
            for hole in holes:
                hx, hy = hole[0]
                for poly in polys:
                    if geo_pip.ring_contains_point(np.array(poly[0]), hx, hy):
                        poly.append(hole)
                        break
            geom = {"type": "MultiPolygon", "coordinates": polys}
    return json.dumps(
        {"type": "Feature", "properties": properties or {}, "geometry": geom}
    )
