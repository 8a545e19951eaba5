"""Vectorized S2 cell-id math in pure numpy.

Implements the public S2 geometry cell scheme (quadratic ST projection +
Hilbert curve position, 64-bit ids) as described in the open-source
s2geometry project documentation. This replaces the Go `golang/geo/s2`
dependency of the reference engine (see reference tools.go:172-230,
storage/bbolt/storage.go:239-258) — no s2 python binding exists in this
environment, so the cell math is reimplemented from the published
algorithm and validated by invariants (round-trips, hierarchy
containment, Hilbert adjacency) in tests/test_s2.py.

All array functions are vectorized over numpy arrays; ids are uint64
internally and reinterpreted as int64 (same bits) for Spark LongType.
"""

from __future__ import annotations

import numpy as np

MAX_LEVEL = 30
FACE_BITS = 3
POS_BITS = 2 * MAX_LEVEL + 1
LOOKUP_BITS = 4
SWAP_MASK = 0x01
INVERT_MASK = 0x02

# Hilbert curve traversal tables (public constants from s2geometry).
_POS_TO_IJ = (
    (0, 1, 3, 2),  # canonical order: (0,0) (0,1) (1,1) (1,0)
    (0, 2, 3, 1),  # axes swapped
    (3, 2, 0, 1),  # bits inverted
    (3, 1, 0, 2),  # swapped & inverted
)
_POS_TO_ORIENTATION = (SWAP_MASK, 0, 0, INVERT_MASK + SWAP_MASK)


def _build_lookup_tables():
    lookup_pos = np.zeros(1 << (2 * LOOKUP_BITS + 2), dtype=np.uint64)
    lookup_ij = np.zeros(1 << (2 * LOOKUP_BITS + 2), dtype=np.uint64)
    # iterative version of s2's InitLookupCell recursion
    stack = []
    for orientation in (0, SWAP_MASK, INVERT_MASK, SWAP_MASK | INVERT_MASK):
        stack.append((0, 0, 0, orientation, 0, orientation))
    while stack:
        level, i, j, orig_orientation, pos, orientation = stack.pop()
        if level == LOOKUP_BITS:
            ij = (i << LOOKUP_BITS) + j
            lookup_pos[(ij << 2) + orig_orientation] = (pos << 2) + orientation
            lookup_ij[(pos << 2) + orig_orientation] = (ij << 2) + orientation
            continue
        level += 1
        i <<= 1
        j <<= 1
        pos <<= 2
        r = _POS_TO_IJ[orientation]
        for subpos in range(4):
            ij = r[subpos]
            stack.append(
                (
                    level,
                    i + (ij >> 1),
                    j + (ij & 1),
                    orig_orientation,
                    pos + subpos,
                    orientation ^ _POS_TO_ORIENTATION[subpos],
                )
            )
    return lookup_pos, lookup_ij


_LOOKUP_POS, _LOOKUP_IJ = _build_lookup_tables()

_U64 = np.uint64
_ONE = _U64(1)


def latlng_to_xyz(lat_deg, lng_deg):
    """Degrees lat/lng -> unit-sphere xyz (each an ndarray)."""
    lat = np.radians(np.asarray(lat_deg, dtype=np.float64))
    lng = np.radians(np.asarray(lng_deg, dtype=np.float64))
    clat = np.cos(lat)
    return clat * np.cos(lng), clat * np.sin(lng), np.sin(lat)


def xyz_to_latlng(x, y, z):
    lat = np.degrees(np.arctan2(z, np.hypot(x, y)))
    lng = np.degrees(np.arctan2(y, x))
    return lat, lng


def xyz_to_face_uv(x, y, z):
    """xyz -> (face, u, v). Vectorized."""
    x = np.asarray(x, dtype=np.float64)
    y = np.asarray(y, dtype=np.float64)
    z = np.asarray(z, dtype=np.float64)
    ax, ay, az = np.abs(x), np.abs(y), np.abs(z)
    # canonical LargestAbsComponent tie-break (strict >): z wins ties,
    # matching the published C++ implementation
    axis = np.where(ax > ay, np.where(ax > az, 0, 2), np.where(ay > az, 1, 2))
    comp = np.choose(axis, (x, y, z))
    face = np.where(comp >= 0, axis, axis + 3).astype(np.int64)
    u = np.empty_like(x)
    v = np.empty_like(x)
    for f in range(6):
        m = face == f
        if not np.any(m):
            continue
        xf, yf, zf = x[m], y[m], z[m]
        if f == 0:
            uu, vv = yf / xf, zf / xf
        elif f == 1:
            uu, vv = -xf / yf, zf / yf
        elif f == 2:
            uu, vv = -xf / zf, -yf / zf
        elif f == 3:
            uu, vv = zf / xf, yf / xf
        elif f == 4:
            uu, vv = zf / yf, -xf / yf
        else:
            uu, vv = -yf / zf, -xf / zf
        u[m] = uu
        v[m] = vv
    return face, u, v


# face_uv_to_xyz as coefficient gathers: each axis is c0 + cu*u + cv*v
# with per-face constants in {0, +/-1} (the published FaceUVtoXYZ table)
# — contiguous arithmetic instead of six boolean-mask writes (the
# masked version dominated the cover-BFS profile)
_FX = (
    np.array([1.0, 0, 0, -1.0, 0, 0]),
    np.array([0.0, -1.0, -1.0, 0, 0, 0]),
    np.array([0.0, 0, 0, 0, 1.0, 1.0]),
)
_FY = (
    np.array([0.0, 1.0, 0, 0, -1.0, 0]),
    np.array([1.0, 0, 0, 0, 0, 1.0]),
    np.array([0.0, 0, -1.0, -1.0, 0, 0]),
)
_FZ = (
    np.array([0.0, 0, 1.0, 0, 0, -1.0]),
    np.array([0.0, 0, 0, -1.0, -1.0, 0]),
    np.array([1.0, 1.0, 0, 0, 0, 0]),
)


def face_uv_to_xyz(face, u, v):
    """(face,u,v) -> un-normalized xyz. Vectorized."""
    face = np.asarray(face, dtype=np.int64)
    u = np.asarray(u, dtype=np.float64)
    v = np.asarray(v, dtype=np.float64)
    x = _FX[0][face] + _FX[1][face] * u + _FX[2][face] * v
    y = _FY[0][face] + _FY[1][face] * u + _FY[2][face] * v
    z = _FZ[0][face] + _FZ[1][face] * u + _FZ[2][face] * v
    return x, y, z


def uv_to_st(u):
    """Quadratic projection uv -> st in [0,1]."""
    u = np.asarray(u, dtype=np.float64)
    pos = 0.5 * np.sqrt(np.maximum(1.0 + 3.0 * u, 0.0))
    neg = 1.0 - 0.5 * np.sqrt(np.maximum(1.0 - 3.0 * u, 0.0))
    return np.where(u >= 0, pos, neg)


def st_to_uv(s):
    s = np.asarray(s, dtype=np.float64)
    return np.where(
        s >= 0.5,
        (1.0 / 3.0) * (4.0 * s * s - 1.0),
        (1.0 / 3.0) * (1.0 - 4.0 * (1.0 - s) * (1.0 - s)),
    )


def st_to_ij(s):
    return np.clip((np.asarray(s) * (1 << MAX_LEVEL)).astype(np.int64), 0, (1 << MAX_LEVEL) - 1)


def from_face_ij(face, i, j):
    """(face, i, j) -> leaf cell id (uint64). Vectorized; public FromFaceIJ algorithm."""
    face = np.asarray(face, dtype=np.uint64)
    i = np.asarray(i, dtype=np.uint64)
    j = np.asarray(j, dtype=np.uint64)
    n = face << _U64(POS_BITS - 1)
    bits = face & _U64(SWAP_MASK)
    mask = _U64((1 << LOOKUP_BITS) - 1)
    for k in range(7, -1, -1):
        bits = bits + (((i >> _U64(k * LOOKUP_BITS)) & mask) << _U64(LOOKUP_BITS + 2))
        bits = bits + (((j >> _U64(k * LOOKUP_BITS)) & mask) << _U64(2))
        bits = _LOOKUP_POS[bits.astype(np.int64)]
        n = n | ((bits >> _U64(2)) << _U64(k * 2 * LOOKUP_BITS))
        bits = bits & _U64(SWAP_MASK | INVERT_MASK)
    return n * _U64(2) + _ONE


def to_face_ij(cell_id):
    """cell id -> (face, i, j, orientation) of the leaf-aligned ij. Vectorized."""
    cell_id = np.asarray(cell_id, dtype=np.uint64)
    face = (cell_id >> _U64(POS_BITS)).astype(np.int64)
    bits = (np.asarray(face, dtype=np.uint64)) & _U64(SWAP_MASK)
    i = np.zeros_like(cell_id)
    j = np.zeros_like(cell_id)
    for k in range(7, -1, -1):
        nbits = (MAX_LEVEL - 7 * LOOKUP_BITS) if k == 7 else LOOKUP_BITS
        bits = bits + (
            ((cell_id >> _U64(k * 2 * LOOKUP_BITS + 1)) & _U64((1 << (2 * nbits)) - 1)) << _U64(2)
        )
        bits = _LOOKUP_IJ[bits.astype(np.int64)]
        i = i | ((bits >> _U64(LOOKUP_BITS + 2)) << _U64(k * LOOKUP_BITS))
        j = j | (((bits >> _U64(2)) & _U64((1 << LOOKUP_BITS) - 1)) << _U64(k * LOOKUP_BITS))
        bits = bits & _U64(SWAP_MASK | INVERT_MASK)
    return face, i.astype(np.int64), j.astype(np.int64), bits.astype(np.int64)


def latlng_to_cell(lat_deg, lng_deg):
    """lat/lng degrees -> level-30 leaf cell id (uint64 ndarray)."""
    x, y, z = latlng_to_xyz(lat_deg, lng_deg)
    face, u, v = xyz_to_face_uv(x, y, z)
    i = st_to_ij(uv_to_st(u))
    j = st_to_ij(uv_to_st(v))
    return from_face_ij(face, i, j)


def lsb(cell_id):
    cell_id = np.asarray(cell_id, dtype=np.uint64)
    return cell_id & (~cell_id + _ONE)


def level(cell_id):
    """Level of each cell id (0..30)."""
    lo = lsb(cell_id).astype(np.float64)  # powers of two are exact in float64
    tz = np.log2(lo).astype(np.int64)
    return MAX_LEVEL - tz // 2


def lsb_for_level(lvl):
    lvl = np.asarray(lvl, dtype=np.uint64)
    return _ONE << (_U64(2) * (_U64(MAX_LEVEL) - lvl))


def parent(cell_id, lvl):
    """Ancestor of cell_id at level lvl (lvl must be <= level(cell_id))."""
    cell_id = np.asarray(cell_id, dtype=np.uint64)
    nl = lsb_for_level(lvl)
    return (cell_id & (~(nl - _ONE))) | nl


def ancestors(cell_id, min_level, max_level):
    """Stack of ancestors at each level in [min_level, max_level].

    Returns (n_levels, N) uint64 array. cell_id must be at level >= max_level
    (leaf ids in practice). This is the point-side ancestor-explode of the
    stab join (reference storage/bbolt/storage.go:242 generalized to a
    level range)."""
    cell_id = np.asarray(cell_id, dtype=np.uint64)
    return np.stack([parent(cell_id, lv) for lv in range(min_level, max_level + 1)])


def range_min(cell_id):
    cell_id = np.asarray(cell_id, dtype=np.uint64)
    return cell_id - (lsb(cell_id) - _ONE)


def range_max(cell_id):
    cell_id = np.asarray(cell_id, dtype=np.uint64)
    return cell_id + (lsb(cell_id) - _ONE)


def contains(cell_id, other):
    """True where cell_id contains other (both uint64 arrays)."""
    return (range_min(cell_id) <= np.asarray(other, dtype=np.uint64)) & (
        np.asarray(other, dtype=np.uint64) <= range_max(cell_id)
    )


def children(cell_id):
    """4 children of each cell (level+1). Returns (4, N) array."""
    cell_id = np.asarray(cell_id, dtype=np.uint64)
    l = lsb(cell_id)
    nl = l >> _U64(2)
    base = cell_id - l + nl
    step = nl * _U64(2)
    return np.stack([base + step * _U64(k) for k in range(4)])


def cell_vertices_latlng(cell_id):
    """4 corner vertices (CCW in (u,v)) of each cell, in degrees.

    Returns (lat, lng) arrays of shape (N, 4). Mirrors the raster->vector
    primitive of the reference debug UI (server/debug/web.go:47-77)."""
    cell_id = np.asarray(cell_id, dtype=np.uint64)
    face, i, j, _ = to_face_ij(cell_id)
    lvl = level(cell_id)
    size = np.int64(1) << (MAX_LEVEL - lvl)
    i0 = (i // size) * size
    j0 = (j // size) * size
    scale = 1.0 / (1 << MAX_LEVEL)
    lats = np.empty(cell_id.shape + (4,), dtype=np.float64)
    lngs = np.empty_like(lats)
    corners = ((0, 0), (1, 0), (1, 1), (0, 1))
    for c, (di, dj) in enumerate(corners):
        s = (i0 + di * size) * scale
        t = (j0 + dj * size) * scale
        u = st_to_uv(s)
        v = st_to_uv(t)
        x, y, z = face_uv_to_xyz(face, u, v)
        norm = np.sqrt(x * x + y * y + z * z)
        la, lo = xyz_to_latlng(x / norm, y / norm, z / norm)
        lats[..., c] = la
        lngs[..., c] = lo
    return lats, lngs


def cell_center_latlng(cell_id):
    """Center (lat, lng) degrees of each cell."""
    cell_id = np.asarray(cell_id, dtype=np.uint64)
    face, i, j, _ = to_face_ij(cell_id)
    lvl = level(cell_id)
    size = np.int64(1) << (MAX_LEVEL - lvl)
    scale = 1.0 / (1 << MAX_LEVEL)
    s = ((i // size) * size + size * 0.5) * scale
    t = ((j // size) * size + size * 0.5) * scale
    x, y, z = face_uv_to_xyz(face, st_to_uv(s), st_to_uv(t))
    norm = np.sqrt(x * x + y * y + z * z)
    return xyz_to_latlng(x / norm, y / norm, z / norm)


def cell_uv_bounds(cell_id):
    """(face, u_lo, u_hi, v_lo, v_hi) of each cell."""
    cell_id = np.asarray(cell_id, dtype=np.uint64)
    face, i, j, _ = to_face_ij(cell_id)
    lvl = level(cell_id)
    size = np.int64(1) << (MAX_LEVEL - lvl)
    scale = 1.0 / (1 << MAX_LEVEL)
    i0 = (i // size) * size
    j0 = (j // size) * size
    return (
        face,
        st_to_uv(i0 * scale),
        st_to_uv((i0 + size) * scale),
        st_to_uv(j0 * scale),
        st_to_uv((j0 + size) * scale),
    )


def token(cell_id):
    """Cell id -> hex token (trailing zeros stripped), per reference tools.go:295-310."""
    cid = int(np.uint64(cell_id))
    if cid == 0:
        return "X"
    return f"{cid:016x}".rstrip("0")


def token_to_cell(tok):
    """Inverse of token() (reference server/debug/web.go:36-38)."""
    if tok == "X":
        return np.uint64(0)
    return np.uint64(int(tok.ljust(16, "0"), 16))


def tokens(cell_ids):
    return [token(c) for c in np.asarray(cell_ids, dtype=np.uint64).ravel()]


def fij_keys(cell_id):
    """Join keys for the JVM stab path: injective encoding of each cell
    as (face, i>>s, j>>s, level) — see functions/s2_expr.py for the
    Catalyst twin. Valid for levels <= 28."""
    cell_id = np.asarray(cell_id, dtype=np.uint64)
    face, i, j, _ = to_face_ij(cell_id)
    lvl = level(cell_id)
    if np.any(lvl > 28):
        # i>>s needs < 2^28 for the (face|level|i|j) packing to stay
        # injective — fail loudly instead of corrupting join keys
        # (ADVICE r01: CoverParams up to 30 were accepted unasserted)
        raise ValueError("fij_keys is only injective for levels <= 28")
    s = (MAX_LEVEL - lvl).astype(np.int64)
    return (
        (np.asarray(face, dtype=np.int64) << np.int64(61))
        | (lvl.astype(np.int64) << np.int64(56))
        | ((i >> s) << np.int64(28))
        | (j >> s)
    )


def to_signed(cell_id):
    """Reinterpret uint64 ids as int64 (bit-identical) for Spark LongType."""
    return np.asarray(cell_id, dtype=np.uint64).view(np.int64)


def to_unsigned(cell_id):
    return np.asarray(cell_id, dtype=np.int64).view(np.uint64)
