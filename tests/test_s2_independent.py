"""Independent from-spec S2 implementation vs the vectorized kernel.

The kernel (insideout_spark/geo/s2.py) is table-driven (precomputed
4-bit Hilbert lookup tables, vectorized numpy). This file re-derives
cell ids with a COMPLETELY different code path written directly from
the published s2geometry algorithm description: scalar math, one
Hilbert level at a time (2 bits), no lookup tables, orientation
updated per level. Any i/j swap, orientation-seed, projection or
face-table bug in either side makes them disagree (VERDICT r01
'What's missing' #1 — external check on the S2 ids/tokens; reference
tools.go:295-310, storage/bbolt/storage.go:239-258).
"""

import math

import numpy as np

from insideout_spark.geo import s2 as geo_s2

# Published Hilbert traversal constants (same public values the kernel
# embeds; the *algorithm* here is the per-level recursion, not tables).
_POS_TO_IJ = ((0, 1, 3, 2), (0, 2, 3, 1), (3, 2, 0, 1), (3, 1, 0, 2))
_POS_TO_ORIENTATION = (1, 0, 0, 3)  # SWAP, 0, 0, SWAP|INVERT
# inverse: orientation -> (ij -> pos)
_IJ_TO_POS = tuple(
    tuple(row.index(ij) for ij in range(4)) for row in _POS_TO_IJ
)


def indep_cell_id(lat_deg: float, lng_deg: float, level: int = 30) -> int:
    """Scalar, per-level S2 cell id straight from the published spec."""
    lat = math.radians(lat_deg)
    lng = math.radians(lng_deg)
    x = math.cos(lat) * math.cos(lng)
    y = math.cos(lat) * math.sin(lng)
    z = math.sin(lat)
    ax, ay, az = abs(x), abs(y), abs(z)
    # LargestAbsComponent with canonical strict-> tie-break (z wins ties)
    if ax > ay:
        axis = 0 if ax > az else 2
    else:
        axis = 1 if ay > az else 2
    comp = (x, y, z)[axis]
    face = axis if comp >= 0 else axis + 3
    # ValidFaceXYZtoUV (published table)
    if face == 0:
        u, v = y / x, z / x
    elif face == 1:
        u, v = -x / y, z / y
    elif face == 2:
        u, v = -x / z, -y / z
    elif face == 3:
        u, v = z / x, y / x
    elif face == 4:
        u, v = z / y, -x / y
    else:
        u, v = -y / z, -x / z

    def st(w: float) -> float:  # quadratic projection
        if w >= 0:
            return 0.5 * math.sqrt(1.0 + 3.0 * w)
        return 1.0 - 0.5 * math.sqrt(1.0 - 3.0 * w)

    def ij(s: float) -> int:
        return max(0, min((1 << 30) - 1, int(math.floor(s * (1 << 30)))))

    i, j = ij(st(u)), ij(st(v))
    # per-level Hilbert: orientation seeded with face & SWAP_MASK
    orientation = face & 1
    pos = 0
    for k in range(level):
        bi = (i >> (29 - k)) & 1
        bj = (j >> (29 - k)) & 1
        subpos = _IJ_TO_POS[orientation][bi * 2 + bj]
        pos = pos * 4 + subpos
        orientation ^= _POS_TO_ORIENTATION[subpos]
    lsb_shift = 2 * (30 - level)
    return (face << 61) | (pos << (lsb_shift + 1)) | (1 << lsb_shift)


def indep_token(cell_id: int) -> str:
    if cell_id == 0:
        return "X"
    return f"{cell_id:016x}".rstrip("0")


def test_face_cells_structural():
    """Level-0 cells are fully determined by the published id layout:
    id = face << 61 | 1 << 60, tokens '1','3','5','7','9','b'."""
    for face, tok in enumerate(["1", "3", "5", "7", "9", "b"]):
        want = (face << 61) | (1 << 60)
        assert indep_cell_id(*_face_center_latlng(face), level=0) == want
        assert indep_token(want) == tok
        assert geo_s2.token(np.uint64(want)) == tok


def _face_center_latlng(face: int):
    centers = {
        0: (0.0, 0.0),
        1: (0.0, 90.0),
        2: (90.0, 0.0),
        3: (0.0, 180.0),
        4: (0.0, -90.0),
        5: (-90.0, 0.0),
    }
    return centers[face]


def test_kernel_matches_independent_fuzz():
    rng = np.random.default_rng(1234)
    lat = rng.uniform(-89.9, 89.9, 2000)
    lng = rng.uniform(-180.0, 180.0, 2000)
    leaf = geo_s2.latlng_to_cell(lat, lng)
    for lvl in (30, 10, 5, 0):
        got = geo_s2.parent(leaf, lvl)
        for n in range(0, 2000, 7):  # every 7th point: 286 scalar checks/level
            want = indep_cell_id(float(lat[n]), float(lng[n]), lvl)
            assert int(got[n]) == want, (lvl, lat[n], lng[n])


def test_kernel_matches_independent_landmarks():
    """Famous coordinates across all six faces, checked at several
    levels and as tokens."""
    pts = [
        ("paris", 48.8566, 2.3522),
        ("nyc", 40.7128, -74.0060),
        ("tokyo", 35.6762, 139.6503),
        ("sydney", -33.8688, 151.2093),
        ("saopaulo", -23.5505, -46.6333),
        ("capetown", -33.9249, 18.4241),
        ("anchorage", 61.2181, -149.9003),
        ("mcmurdo", -77.8419, 166.6863),
        ("northquito", 0.0001, -78.4678),
        ("honolulu", 21.3069, -157.8583),
        ("reykjavik", 64.1466, -21.9426),
        ("singapore", 1.3521, 103.8198),
    ]
    for name, lat, lng in pts:
        leaf_kernel = int(geo_s2.latlng_to_cell(np.array([lat]), np.array([lng]))[0])
        leaf_indep = indep_cell_id(lat, lng, 30)
        assert leaf_kernel == leaf_indep, name
        for lvl in (20, 10, 4):
            k = int(geo_s2.parent(np.uint64(leaf_kernel), lvl))
            assert k == indep_cell_id(lat, lng, lvl), (name, lvl)
            assert geo_s2.token(np.uint64(k)) == indep_token(
                indep_cell_id(lat, lng, lvl)
            ), (name, lvl)


def test_face_boundary_points():
    """Points exactly on face edges/corners (|u|=1 ties) take the
    canonical strict-> tie-break in both implementations."""
    pts = [
        (0.0, 45.0),
        (0.0, -45.0),
        (0.0, 135.0),
        (45.0, 0.0),
        (-45.0, 0.0),
        (45.0, 90.0),
        (0.0, 180.0),
        (90.0, 0.0),
        (-90.0, 0.0),
        (35.26438968275466, 45.0),  # cube corner direction (1,1,1)/sqrt(3)
    ]
    for lat, lng in pts:
        got = int(geo_s2.latlng_to_cell(np.array([lat]), np.array([lng]))[0])
        assert got == indep_cell_id(lat, lng, 30), (lat, lng)
