"""H3 compatibility layer.

The north rule asks for an "H3/S2 index". No `h3` package exists in
this container, so the engine ships its own multi-resolution grid tiler
(geo/grid.py) exposing the same API shape. When the real `h3` package
IS importable (e.g. on a production cluster), this module prefers it —
cell ids then become genuine H3 indexes; nothing else in the engine
changes because all callers go through these functions.
"""

from __future__ import annotations

import numpy as np

try:  # pragma: no cover - h3 not available in this container
    import h3 as _h3

    HAS_H3 = True
except ImportError:
    _h3 = None
    HAS_H3 = False

from . import grid as _grid

DEFAULT_RES = 7


def latlng_to_cell(lat, lng, res: int = DEFAULT_RES):
    if HAS_H3:  # pragma: no cover
        return np.array(
            [_h3.str_to_int(_h3.latlng_to_cell(a, o, res)) for a, o in zip(np.atleast_1d(lat), np.atleast_1d(lng))],
            dtype=np.int64,
        )
    return _grid.latlng_to_cell(lat, lng, res)


def cell_to_parent(cell, parent_res: int):
    if HAS_H3:  # pragma: no cover
        return np.array(
            [_h3.str_to_int(_h3.cell_to_parent(_h3.int_to_str(int(c)), parent_res)) for c in np.atleast_1d(cell)],
            dtype=np.int64,
        )
    return _grid.cell_to_parent(cell, parent_res)


def grid_disk(cell: int, k: int):
    if HAS_H3:  # pragma: no cover
        return sorted(_h3.str_to_int(c) for c in _h3.grid_disk(_h3.int_to_str(int(cell)), k))
    return _grid.grid_disk(cell, k)


def grid_ring(cell: int, k: int):
    if HAS_H3:  # pragma: no cover
        return sorted(_h3.str_to_int(c) for c in _h3.grid_ring(_h3.int_to_str(int(cell)), k))
    return _grid.grid_ring(cell, k)


def cell_to_boundary(cell: int):
    if HAS_H3:  # pragma: no cover
        ring = [[lng, lat] for lat, lng in _h3.cell_to_boundary(_h3.int_to_str(int(cell)))]
        ring.append(ring[0])
        return ring
    return _grid.cell_to_boundary(cell)
