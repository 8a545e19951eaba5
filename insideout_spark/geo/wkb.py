"""Minimal WKB (Well-Known Binary) codec for Polygon / MultiPolygon.

Plays the role of the reference's s2 binary loop codec
(tools.go:70-109 GeoJSONEncodeLoops + decode storage/bbolt/
storage.go:97-105): a compact binary geometry representation for
storage/interchange. Implemented from the public OGC WKB spec
(little-endian, geometry types 3=Polygon, 6=MultiPolygon); shapely &
PostGIS can read the output when available.
"""

from __future__ import annotations

import struct

import numpy as np

_LE = 1
_POLYGON = 3
_MULTIPOLYGON = 6


def _encode_ring(ring) -> bytes:
    ring = np.asarray(ring, dtype=np.float64)
    # WKB rings are closed: append the closing vertex if missing
    if len(ring) and (ring[0][0] != ring[-1][0] or ring[0][1] != ring[-1][1]):
        ring = np.vstack([ring, ring[:1]])
    return struct.pack("<I", len(ring)) + ring.astype("<f8").tobytes()


def polygon_to_wkb(rings) -> bytes:
    """rings: [outer, hole1, ...] each an array of [lng(x), lat(y)]."""
    out = [struct.pack("<bI", _LE, _POLYGON), struct.pack("<I", len(rings))]
    out.extend(_encode_ring(r) for r in rings)
    return b"".join(out)


def multipolygon_to_wkb(polygons) -> bytes:
    """polygons: list of ring-lists."""
    out = [struct.pack("<bI", _LE, _MULTIPOLYGON), struct.pack("<I", len(polygons))]
    out.extend(polygon_to_wkb(p) for p in polygons)
    return b"".join(out)


def _read_ring(buf: memoryview, off: int):
    (n,) = struct.unpack_from("<I", buf, off)
    off += 4
    arr = np.frombuffer(buf[off : off + 16 * n], dtype="<f8").reshape(n, 2).copy()
    return arr, off + 16 * n


def _read_polygon(buf: memoryview, off: int):
    endian, gtype = struct.unpack_from("<bI", buf, off)
    if endian != _LE or gtype != _POLYGON:
        raise ValueError(f"unsupported WKB header: endian={endian} type={gtype}")
    off += 5
    (nrings,) = struct.unpack_from("<I", buf, off)
    off += 4
    rings = []
    for _ in range(nrings):
        ring, off = _read_ring(buf, off)
        rings.append(ring)
    return rings, off


def wkb_to_rings(wkb: bytes):
    """WKB -> list of polygons, each a list of (n,2) [x,y] ring arrays.
    Accepts Polygon and MultiPolygon (like reference tools.go:41-64)."""
    buf = memoryview(wkb)
    endian, gtype = struct.unpack_from("<bI", buf, 0)
    if endian != _LE:
        raise ValueError("only little-endian WKB supported")
    if gtype == _POLYGON:
        rings, _ = _read_polygon(buf, 0)
        return [rings]
    if gtype == _MULTIPOLYGON:
        (npolys,) = struct.unpack_from("<I", buf, 5)
        off = 9
        polys = []
        for _ in range(npolys):
            rings, off = _read_polygon(buf, off)
            polys.append(rings)
        return polys
    raise ValueError(f"unsupported data type: {gtype}")  # tools.go:62-63


def loops_to_wkb(loop_rows) -> bytes:
    """Engine loop rows of one feature -> MultiPolygon WKB (outer rings
    only, matching the reference's outer-ring model, tools.go:43)."""
    return multipolygon_to_wkb([[r["ring"]] for r in loop_rows])
