"""Vectorized open-boundary point-in-polygon (ray casting) in numpy.

Replaces the reference's exact containment test `Loop.ContainsPoint`
(reference server/server.go:246-249) and the shapeindex strategy's
`ContainsPointQuery(VertexModelOpen)` (reference index/shapeindex/
index.go:57-81). Semantics:

* planar even-odd ray casting in (lng, lat) degree space — the fixture
  geometries are small enough that planar and spherical containment
  agree on all golden points (tests assert this);
* OPEN boundary: a point exactly on an edge or vertex is NOT contained,
  matching `s2.VertexModelOpen` (reference index/shapeindex/index.go:66);
* the duplicated closing vertex of GeoJSON rings is dropped before
  testing, matching reference tools.go:145-148.

Everything is vectorized over numpy arrays: `points_in_ring` broadcasts
N points against M edges in one shot.
"""

from __future__ import annotations

import numpy as np


def normalize_ring(ring):
    """ring: (M,2) array of [lng, lat] pairs -> ring without the
    duplicated closing vertex (reference tools.go:145-148)."""
    ring = np.asarray(ring, dtype=np.float64)
    if len(ring) >= 2 and ring[0][0] == ring[-1][0] and ring[0][1] == ring[-1][1]:
        ring = ring[:-1]
    return ring


def points_in_ring(lng, lat, ring):
    """Open-boundary even-odd containment of N points in one ring.

    lng, lat: (N,) arrays in degrees. ring: (M,2) [lng,lat] pairs
    (closing vertex optional). Returns (N,) bool — True iff strictly
    inside. Points exactly on an edge/vertex return False.
    """
    ring = normalize_ring(ring)
    lng = np.asarray(lng, dtype=np.float64)
    lat = np.asarray(lat, dtype=np.float64)
    if len(ring) < 3:
        return np.zeros(lng.shape, dtype=bool)
    x1 = ring[:, 0]  # (M,)
    y1 = ring[:, 1]
    x2 = np.roll(x1, -1)
    y2 = np.roll(y1, -1)

    px = lng[:, None]  # (N,1)
    py = lat[:, None]

    # --- exact on-boundary detection (open boundary => not contained) ---
    # collinear (cross == 0) and within the segment's bbox
    cross = (x2 - x1) * (py - y1) - (y2 - y1) * (px - x1)  # (N,M)
    within = (
        (px >= np.minimum(x1, x2))
        & (px <= np.maximum(x1, x2))
        & (py >= np.minimum(y1, y2))
        & (py <= np.maximum(y1, y2))
    )
    on_boundary = np.any((cross == 0.0) & within, axis=1)

    # --- even-odd crossing count (half-open rule handles vertices) ---
    cond = (y1 <= py) != (y2 <= py)  # edge straddles the horizontal ray
    # x coordinate of edge/ray intersection, only meaningful where cond
    with np.errstate(divide="ignore", invalid="ignore"):
        xint = x1 + (py - y1) * (x2 - x1) / (y2 - y1)
    crossings = np.sum(cond & (px < xint), axis=1)
    inside = (crossings % 2 == 1) & ~on_boundary
    return inside


def ring_contains_point(ring, lng, lat):
    """Scalar convenience wrapper."""
    return bool(points_in_ring(np.array([lng]), np.array([lat]), ring)[0])


def segments_intersect_rects(ring, rx0, rx1, ry0, ry1):
    """Vectorized over N rects: True where any ring edge intersects the
    rect [rx0,rx1]x[ry0,ry1]. rx0.. are (N,) arrays. Used by the
    coverer's batched cell classification."""
    ring = normalize_ring(ring)
    x1 = ring[:, 0][None, :]  # (1,M)
    y1 = ring[:, 1][None, :]
    x2 = np.roll(ring[:, 0], -1)[None, :]
    y2 = np.roll(ring[:, 1], -1)[None, :]
    rx0 = np.asarray(rx0, dtype=np.float64)[:, None]  # (N,1)
    rx1 = np.asarray(rx1, dtype=np.float64)[:, None]
    ry0 = np.asarray(ry0, dtype=np.float64)[:, None]
    ry1 = np.asarray(ry1, dtype=np.float64)[:, None]
    # quick reject per (rect, edge)
    cand = ~(
        (np.maximum(x1, x2) < rx0)
        | (np.minimum(x1, x2) > rx1)
        | (np.maximum(y1, y2) < ry0)
        | (np.minimum(y1, y2) > ry1)
    )  # (N,M)
    # endpoint inside rect
    inside1 = (x1 >= rx0) & (x1 <= rx1) & (y1 >= ry0) & (y1 <= ry1)
    inside2 = (x2 >= rx0) & (x2 <= rx1) & (y2 >= ry0) & (y2 <= ry1)
    hit = np.any(cand & (inside1 | inside2), axis=1)
    todo = np.any(cand, axis=1) & ~hit
    if not np.any(todo):
        return hit
    # proper segment-segment tests against the 4 rect edges
    corners = (
        (rx0, ry0, rx1, ry0),
        (rx1, ry0, rx1, ry1),
        (rx1, ry1, rx0, ry1),
        (rx0, ry1, rx0, ry0),
    )
    for ax0, ay0, ax1, ay1 in corners:
        d1 = (x2 - x1) * (ay0 - y1) - (y2 - y1) * (ax0 - x1)
        d2 = (x2 - x1) * (ay1 - y1) - (y2 - y1) * (ax1 - x1)
        d3 = (ax1 - ax0) * (y1 - ay0) - (ay1 - ay0) * (x1 - ax0)
        d4 = (ax1 - ax0) * (y2 - ay0) - (ay1 - ay0) * (x2 - ax0)
        hit |= np.any(cand & (d1 * d2 <= 0) & (d3 * d4 <= 0), axis=1)
    return hit


def vertices_in_rects(ring, rx0, rx1, ry0, ry1):
    """Vectorized over N rects: True where any ring vertex lies in the
    rect."""
    ring = normalize_ring(ring)
    vx = ring[:, 0][None, :]
    vy = ring[:, 1][None, :]
    rx0 = np.asarray(rx0, dtype=np.float64)[:, None]
    rx1 = np.asarray(rx1, dtype=np.float64)[:, None]
    ry0 = np.asarray(ry0, dtype=np.float64)[:, None]
    ry1 = np.asarray(ry1, dtype=np.float64)[:, None]
    return np.any((vx >= rx0) & (vx <= rx1) & (vy >= ry0) & (vy <= ry1), axis=1)


def segments_intersect_rect(ring, rx0, rx1, ry0, ry1):
    """True if any ring edge intersects the axis-aligned rect
    [rx0,rx1]x[ry0,ry1] (in lng/lat). Vectorized over edges —
    used by the coverer's cell classification."""
    ring = normalize_ring(ring)
    x1 = ring[:, 0]
    y1 = ring[:, 1]
    x2 = np.roll(x1, -1)
    y2 = np.roll(y1, -1)
    # quick reject: edge bbox vs rect
    reject = (
        (np.maximum(x1, x2) < rx0)
        | (np.minimum(x1, x2) > rx1)
        | (np.maximum(y1, y2) < ry0)
        | (np.minimum(y1, y2) > ry1)
    )
    cand = ~reject
    if not np.any(cand):
        return False
    x1, y1, x2, y2 = x1[cand], y1[cand], x2[cand], y2[cand]
    # endpoint inside rect => intersects
    if np.any((x1 >= rx0) & (x1 <= rx1) & (y1 >= ry0) & (y1 <= ry1)):
        return True
    if np.any((x2 >= rx0) & (x2 <= rx1) & (y2 >= ry0) & (y2 <= ry1)):
        return True
    # segment crosses any of the 4 rect edges
    rect_edges = (
        (rx0, ry0, rx1, ry0),
        (rx1, ry0, rx1, ry1),
        (rx1, ry1, rx0, ry1),
        (rx0, ry1, rx0, ry0),
    )
    for ax0, ay0, ax1, ay1 in rect_edges:
        d1 = (x2 - x1) * (ay0 - y1) - (y2 - y1) * (ax0 - x1)
        d2 = (x2 - x1) * (ay1 - y1) - (y2 - y1) * (ax1 - x1)
        d3 = (ax1 - ax0) * (y1 - ay0) - (ay1 - ay0) * (x1 - ax0)
        d4 = (ax1 - ax0) * (y2 - ay0) - (ay1 - ay0) * (x2 - ax0)
        if np.any((d1 * d2 <= 0) & (d3 * d4 <= 0)):
            return True
    return False
