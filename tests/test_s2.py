"""S2 kernel invariants — validates the from-scratch cell math."""

import numpy as np
import pytest

from insideout_spark.geo import s2


@pytest.fixture(scope="module")
def sample():
    rng = np.random.default_rng(7)
    lat = rng.uniform(-89, 89, 5000)
    lng = rng.uniform(-180, 180, 5000)
    return lat, lng, s2.latlng_to_cell(lat, lng)


def test_leaf_level(sample):
    _, _, ids = sample
    assert np.all(s2.level(ids) == 30)


def test_center_roundtrip(sample):
    lat, lng, ids = sample
    clat, clng = s2.cell_center_latlng(ids)
    assert np.abs(clat - lat).max() < 1e-5
    dlng = np.abs((clng - lng + 180) % 360 - 180)
    assert dlng.max() < 1e-3  # lng error grows near poles


@pytest.mark.parametrize("lvl", [0, 5, 10, 16, 29])
def test_parent_contains(sample, lvl):
    _, _, ids = sample
    p = s2.parent(ids, lvl)
    assert np.all(s2.level(p) == lvl)
    assert np.all(s2.contains(p, ids))
    # parent of the parent's center leaf is the parent itself
    pl, pg = s2.cell_center_latlng(p)
    assert np.all(s2.parent(s2.latlng_to_cell(pl, pg), lvl) == p)


def test_face_ij_roundtrip(sample):
    _, _, ids = sample
    f, i, j, _ = s2.to_face_ij(ids)
    assert np.all(s2.from_face_ij(f, i, j) == ids)


def test_hilbert_adjacency():
    """Consecutive leaf ids are spatially adjacent — a strong check of
    the Hilbert lookup tables."""
    base = s2.latlng_to_cell(np.array([47.0]), np.array([2.0]))
    seq = base + np.arange(2000, dtype=np.uint64) * np.uint64(2)
    _, i, j, _ = s2.to_face_ij(seq)
    assert np.all(np.abs(np.diff(i)) + np.abs(np.diff(j)) == 1)


def test_children_partition(sample):
    _, _, ids = sample
    p = s2.parent(ids[:200], 12)
    ch = s2.children(p)
    assert np.all(s2.level(ch) == 13)
    assert np.all(s2.contains(p, ch))
    # children tile the parent exactly
    assert np.all(s2.range_min(ch[0]) == s2.range_min(p))
    assert np.all(s2.range_max(ch[3]) == s2.range_max(p))


def test_token_roundtrip(sample):
    _, _, ids = sample
    for c in ids[:100]:
        assert s2.token_to_cell(s2.token(c)) == c
    assert s2.token(np.uint64(0)) == "X"


def test_signed_unsigned_bits(sample):
    _, _, ids = sample
    assert np.all(s2.to_unsigned(s2.to_signed(ids)) == ids)


def test_ancestors_stack(sample):
    _, _, ids = sample
    anc = s2.ancestors(ids[:50], 10, 16)
    assert anc.shape == (7, 50)
    for k, lvl in enumerate(range(10, 17)):
        assert np.all(s2.level(anc[k]) == lvl)
        assert np.all(s2.contains(anc[k], ids[:50]))


def test_vertices_bound_center(sample):
    _, _, ids = sample
    cells = s2.parent(ids[:100], 9)
    vlat, vlng = s2.cell_vertices_latlng(cells)
    clat, clng = s2.cell_center_latlng(cells)
    assert np.all(clat >= vlat.min(axis=1) - 1e-9)
    assert np.all(clat <= vlat.max(axis=1) + 1e-9)
