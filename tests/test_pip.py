"""Open-boundary ray-casting semantics (reference VertexModelOpen,
index/shapeindex/index.go:66) + golden exact-PIP verdicts."""

import numpy as np

from insideout_spark.geo import pip
from insideout_spark.sources.polygons import load_geojson_loops

SQUARE = np.array([[0.0, 0.0], [4.0, 0.0], [4.0, 4.0], [0.0, 4.0], [0.0, 0.0]])


def test_basic_inside_outside():
    lng = np.array([2.0, 5.0, -1.0, 3.9999])
    lat = np.array([2.0, 2.0, 2.0, 3.9999])
    assert pip.points_in_ring(lng, lat, SQUARE).tolist() == [True, False, False, True]


def test_open_boundary_edges_and_vertices():
    # on-edge and on-vertex points are NOT contained (VertexModelOpen)
    lng = np.array([0.0, 2.0, 4.0, 0.0, 4.0])
    lat = np.array([2.0, 0.0, 2.0, 0.0, 4.0])
    assert not pip.points_in_ring(lng, lat, SQUARE).any()


def test_closing_vertex_dropped():
    open_ring = SQUARE[:-1]
    lng = np.array([2.0])
    lat = np.array([2.0])
    assert pip.points_in_ring(lng, lat, open_ring)[0]
    assert pip.points_in_ring(lng, lat, SQUARE)[0]


def test_concave_polygon():
    # U-shape: notch from above
    ring = np.array(
        [[0, 0], [6, 0], [6, 4], [4, 4], [4, 2], [2, 2], [2, 4], [0, 4], [0, 0]],
        dtype=float,
    )
    lng = np.array([3.0, 3.0, 1.0, 5.0])
    lat = np.array([1.0, 3.0, 3.0, 3.0])
    assert pip.points_in_ring(lng, lat, ring).tolist() == [True, False, True, True]


def test_degenerate_ring():
    assert not pip.points_in_ring(np.array([0.0]), np.array([0.0]), SQUARE[:2]).any()


def test_golden_exact_pip(houat_loops=None):
    """The 5 distinct golden points' exact verdicts (FIXTURES.md §4)."""
    import os

    loops = load_geojson_loops(
        os.path.join(os.path.dirname(__file__), "golden", "houat.geojson")
    )
    cases = [
        (47.39444367083928, -2.992874768945723, True),
        (47.39650628189986, -2.9876390969486524, True),
        (47.38297924900667, -2.961873380366456, False),
        (47.37616957736262, -3.004367209321472, False),
        (47.3944602327291, -2.9924373872714556, True),
    ]
    for lat, lng, want in cases:
        got = any(
            pip.ring_contains_point(np.array(r["ring"]), lng, lat) for r in loops
        )
        assert got == want, (lat, lng)


def test_segments_intersect_rect():
    ring = SQUARE
    assert pip.segments_intersect_rect(ring, 3.5, 5.0, 1.0, 2.0)  # crosses right edge
    assert not pip.segments_intersect_rect(ring, 1.0, 3.0, 1.0, 3.0)  # fully inside
    assert not pip.segments_intersect_rect(ring, 10.0, 12.0, 1.0, 2.0)  # far away
    assert pip.segments_intersect_rect(ring, -1.0, 5.0, -1.0, 5.0)  # ring inside rect: edges within
