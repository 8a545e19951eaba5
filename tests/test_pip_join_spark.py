"""End-to-end stab join on Spark: golden cases, oracle equivalence of
both physical paths, projections, top-1, and index persistence."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from insideout_spark.geo import pip as geo_pip
from insideout_spark.plans.index_build import load_index, save_index
from insideout_spark.plans.pip_join import pip_join
from insideout_spark.sources import pages as src_pages


@pytest.fixture(scope="module")
def golden_points_df(spark):
    pg = src_pages.synth_pages(spark, 400, partitions=4)
    return src_pages.extract_points(pg).cache()


def _hits_by_golden_row(rows):
    out = {}
    for r in rows:
        i = int(r["url"].rsplit("/", 1)[1])
        if i < 6:
            out.setdefault(i, set()).add(
                (r["feature_id"], r["loop_pos"], bool(r["is_sure_hit"]))
            )
    return out


def test_golden_e2e(spark, houat_index, golden_points_df):
    """FIXTURES.md §4: rows 0,1,4 inside (0,1); row 1 via interior cover;
    rows 2,3,5 produce nothing."""
    res = pip_join(golden_points_df, houat_index)
    by = _hits_by_golden_row(res.collect())
    assert by.get(0) == {(0, 1, False)}
    assert by.get(1) == {(0, 1, True)}
    assert by.get(4) == {(0, 1, False)}
    assert 2 not in by and 3 not in by and 5 not in by


def test_matches_exact_oracle(spark, houat_index, houat_loops, golden_points_df):
    """Full result set == brute-force exact PIP oracle (the reference
    shapeindex strategy J3, our correctness oracle)."""
    res = {
        (r["url"], r["feature_id"], r["loop_pos"])
        for r in pip_join(golden_points_df, houat_index).collect()
    }
    pts = golden_points_df.collect()
    oracle = set()
    for p in pts:
        for lr in houat_loops:
            if geo_pip.ring_contains_point(np.array(lr["ring"]), p["lng"], p["lat"]):
                oracle.add((p["url"], lr["feature_id"], lr["loop_pos"]))
    assert res == oracle


def test_salted_shuffle_path_equivalent(spark, houat_index, golden_points_df):
    """broadcast path and salted shuffle path return identical rows."""
    a = {
        (r["url"], r["feature_id"], r["loop_pos"], r["is_sure_hit"])
        for r in pip_join(golden_points_df, houat_index).collect()
    }
    b = {
        (r["url"], r["feature_id"], r["loop_pos"], r["is_sure_hit"])
        for r in pip_join(
            golden_points_df, houat_index, broadcast_index=False, salt_buckets=4
        ).collect()
    }
    assert a == b


def test_properties_and_projection(spark, houat_index, golden_points_df):
    res = pip_join(golden_points_df, houat_index).filter(
        F.col("url") == "https://example.org/00000001"
    )
    row = res.collect()[0]
    assert row["properties"]["nom"] == "Île-d'Houat"
    assert row["properties"]["insee"] == "56086"
    # P1 projection: drop payload
    lean = pip_join(golden_points_df, houat_index, include_properties=False)
    assert "properties" not in lean.columns


def test_stop_on_first(spark, houat_index, golden_points_df):
    res = pip_join(golden_points_df, houat_index, stop_on_first=True)
    counts = res.groupBy("url").count().collect()
    assert all(r["count"] == 1 for r in counts)


def test_index_save_load_roundtrip(spark, houat_index, golden_points_df, tmp_path):
    path = str(tmp_path / "idx")
    save_index(houat_index, path)
    idx2 = load_index(spark, path)
    assert idx2.manifest["min_cover_level"] == 10
    a = {
        (r["url"], r["feature_id"], r["loop_pos"])
        for r in pip_join(golden_points_df, houat_index).collect()
    }
    b = {
        (r["url"], r["feature_id"], r["loop_pos"])
        for r in pip_join(golden_points_df, idx2).collect()
    }
    assert a == b


def test_broadcast_join_in_plan(spark, houat_index, golden_points_df):
    """The stab join must be a broadcast hash join with no shuffle on the
    probe side before the join (scale contract, SURVEY.md §4)."""
    plan = pip_join(golden_points_df, houat_index)._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan


def test_cover_guard_per_side(spark, houat_loops, golden_points_df):
    """Per-side cover guard (reference storage/bbolt/storage.go:363-370
    interior / :408-414 exterior): when ONE cover exceeds the guard
    only that side's postings are dropped — the feature stays findable
    through the other cover. Round 1 dropped the whole loop."""
    from insideout_spark.geo.cover import CoverParams
    from insideout_spark.plans.index_build import (
        build_index,
        cover_guard_stats,
        features_df,
    )

    ip, ep = CoverParams(10, 16, 24), CoverParams(10, 15, 16)
    feats = features_df(spark, houat_loops)
    stats = {
        (r["feature_id"], r["loop_pos"]): (r["n_inside"], r["n_outside"])
        for r in cover_guard_stats(feats, ip, ep, 100).collect()
    }
    ni, no = stats[(0, 1)]
    assert ni > 0 and no > 0 and ni != no
    guard = min(ni, no)  # drops exactly the larger side
    idx = build_index(spark, houat_loops, ip, ep, warning_cells_cover=guard)
    kinds = {
        bool(r["is_interior"])
        for r in idx.cell_index.select("is_interior").distinct().collect()
    }
    res = pip_join(golden_points_df, idx)
    by = _hits_by_golden_row(res.collect())
    if ni > no:
        # interior postings dropped: all three inside rows still hit,
        # now via exterior candidates + exact test (no sure hits)
        assert kinds == {False}
        assert by.get(0) == {(0, 1, False)}
        assert by.get(1) == {(0, 1, False)}
        assert by.get(4) == {(0, 1, False)}
    else:
        # exterior postings dropped: the interior sure-hit row survives
        assert kinds == {True}
        assert by.get(1) == {(0, 1, True)}
    # guard-stats observability flags the dropped side
    st = {
        (r["feature_id"], r["loop_pos"]): (r["inside_dropped"], r["outside_dropped"])
        for r in cover_guard_stats(feats, ip, ep, guard).collect()
    }
    assert st[(0, 1)] == (ni > guard, no > guard)


def test_antimeridian_ring_rejected(spark):
    """Rings crossing the antimeridian (lng extent > 180°) are rejected
    at build time instead of being indexed with wrong planar PIP
    semantics (ADVICE r01)."""
    from insideout_spark.geo.cover import CoverParams
    from insideout_spark.plans.index_build import build_index

    fiji_like = [
        {
            "feature_id": 0,
            "loop_pos": 0,
            "ring": [[179.0, -17.0], [-179.5, -17.0], [-179.5, -18.0],
                      [179.0, -18.0], [179.0, -17.0]],
            "properties": {},
            "admin_level": None,
        }
    ]
    with pytest.raises(Exception, match="antimeridian|lng extent"):
        build_index(
            spark, fiji_like, CoverParams(4, 8, 16), CoverParams(4, 8, 16)
        )


def test_build_rejects_level_above_28(spark, houat_loops):
    from insideout_spark.geo.cover import CoverParams
    from insideout_spark.plans.index_build import build_index

    with pytest.raises(ValueError, match="<= 28"):
        build_index(
            spark, houat_loops, CoverParams(10, 30, 24), CoverParams(10, 15, 16)
        )


def test_typed_properties_roundtrip(spark, tmp_path):
    """Typed property fidelity (reference tools.go:253-274:
    bool/int/float64/string/nil survive): values keep their JSON types
    through parse -> features -> save/load -> typed_prop access."""
    import json

    from insideout_spark.geo.geojson import parse_feature_collection
    from insideout_spark.plans.index_build import build_index, load_index, save_index
    from insideout_spark.plans.metrics import get_feature, typed_prop

    fc = {
        "type": "FeatureCollection",
        "features": [
            {
                "type": "Feature",
                "properties": {
                    "name": "zone-a", "population": 12345, "density": 3.25,
                    "urban": True, "note": None, "admin_level": "4",
                },
                "geometry": {"type": "Polygon", "coordinates": [[
                    [0.0, 0.0], [1.0, 0.0], [1.0, 1.0], [0.0, 1.0], [0.0, 0.0]
                ]]},
            }
        ],
    }
    rows = parse_feature_collection(json.dumps(fc))
    from insideout_spark.geo.cover import CoverParams

    idx = build_index(spark, rows, CoverParams(4, 8, 16), CoverParams(4, 8, 16))
    path = str(tmp_path / "tidx")
    save_index(idx, path)
    idx2 = load_index(spark, path)
    feat = get_feature(idx2, 0, 0).select(
        typed_prop("population", "long").alias("population"),
        typed_prop("density", "double").alias("density"),
        typed_prop("urban", "boolean").alias("urban"),
        typed_prop("name", "string").alias("name"),
        typed_prop("note", "string").alias("note"),
        typed_prop("missing", "long").alias("missing"),
    ).first()
    assert feat["population"] == 12345 and isinstance(feat["population"], int)
    assert feat["density"] == 3.25
    assert feat["urban"] is True
    assert feat["name"] == "zone-a"
    assert feat["note"] is None and feat["missing"] is None
    # typed numeric filter runs Catalyst-side
    assert get_feature(idx2, 0).filter(typed_prop("population", "long") > 10000).count() == 1
    assert get_feature(idx2, 0).filter(typed_prop("population", "long") > 99999).count() == 0


def test_get_feature_api(spark, houat_index):
    from insideout_spark.plans.metrics import get_feature

    rows = get_feature(houat_index, 0, 1).collect()
    assert len(rows) == 1
    assert rows[0]["properties"]["nom"] == "Île-d'Houat"
    assert get_feature(houat_index, 0).count() >= 1
    assert get_feature(houat_index, 999).count() == 0


def test_nonbroadcast_edges_equivalent(spark, houat_index, golden_points_df):
    """broadcast_edges=False (shuffled edge join for continent-scale
    rings) returns identical rows to the broadcast default."""
    a = {
        (r["url"], r["feature_id"], r["loop_pos"], r["is_sure_hit"])
        for r in pip_join(golden_points_df, houat_index).collect()
    }
    b = {
        (r["url"], r["feature_id"], r["loop_pos"], r["is_sure_hit"])
        for r in pip_join(
            golden_points_df, houat_index, broadcast_edges=False
        ).collect()
    }
    assert a == b and len(a) > 0


def test_bucketed_n_buckets_from_manifest_and_catalog(spark, houat_index, golden_points_df):
    """The bucketed strategy reads the bucket count from the index
    manifest (recorded by save_index_bucketed) and, when the manifest
    lacks the entry (e.g. an index loaded fresh from parquet), from the
    catalog's bucketSpec API — never from parsing DESCRIBE text
    (VERDICT r02 'What's wrong' #4)."""
    from insideout_spark.plans.index_build import save_index_bucketed

    save_index_bucketed(houat_index, "houat_cells_bucketed_t", n_buckets=4)
    assert houat_index.manifest["bucketed_tables"]["houat_cells_bucketed_t"] == 4
    base = {
        (r["url"], r["feature_id"], r["loop_pos"])
        for r in pip_join(golden_points_df, houat_index).collect()
    }
    via_manifest = {
        (r["url"], r["feature_id"], r["loop_pos"])
        for r in pip_join(
            golden_points_df, houat_index, strategy="bucketed",
            bucketed_table="houat_cells_bucketed_t",
        ).collect()
    }
    assert via_manifest == base
    # catalog fallback: drop the manifest entry
    del houat_index.manifest["bucketed_tables"]["houat_cells_bucketed_t"]
    via_catalog = {
        (r["url"], r["feature_id"], r["loop_pos"])
        for r in pip_join(
            golden_points_df, houat_index, strategy="bucketed",
            bucketed_table="houat_cells_bucketed_t",
        ).collect()
    }
    assert via_catalog == base


def test_random_layer_differential(spark):
    """Randomized differential test through the full auto-params path:
    a fresh wobbly multi-polygon layer + random points, every physical
    strategy vs the brute exact-PIP oracle. Guards the whole
    cover->index->join chain (incl. the round-2 deeper auto interior
    covers) against subtle conservativeness regressions."""
    import math

    import pandas as pd

    rng = np.random.default_rng(97)
    loops = []
    for fid in range(30):
        cx = rng.uniform(-3.0, 6.0)
        cy = rng.uniform(44.0, 49.0)
        nv = int(rng.integers(6, 24))
        radii = rng.uniform(0.05, 0.35, nv)
        ring = []
        for k in range(nv):
            ang = 2 * math.pi * k / nv
            ring.append([cx + radii[k] * math.cos(ang), cy + radii[k] * math.sin(ang)])
        ring.append(list(ring[0]))
        loops.append({"feature_id": fid, "loop_pos": 0, "ring": ring,
                      "properties": {}, "admin_level": None})
    from insideout_spark.plans.index_build import build_index

    idx = build_index(spark, loops)  # auto params path
    pts = pd.DataFrame({
        "point_id": np.arange(3000, dtype=np.int64),
        "lat": rng.uniform(43.5, 49.5, 3000),
        "lng": rng.uniform(-3.5, 6.5, 3000),
    })
    pdf = spark.createDataFrame(pts)

    oracle = set()
    rings = {r["feature_id"]: np.asarray(r["ring"]) for r in loops}
    for fid, ring in rings.items():
        inside = geo_pip.points_in_ring(pts["lng"].to_numpy(), pts["lat"].to_numpy(), ring)
        for pid in pts["point_id"].to_numpy()[inside]:
            oracle.add((int(pid), fid, 0))
    assert len(oracle) > 100  # the layer actually covers points

    for strategy in ("jvm", "fused", "salted"):
        got = {
            (r["point_id"], r["feature_id"], r["loop_pos"])
            for r in pip_join(
                pdf, idx, id_cols=("point_id",), include_properties=False,
                strategy=strategy,
            ).collect()
        }
        assert got == oracle, strategy
