"""FIXTURES.md §5: tile assignments of the golden stab points must match
the checked-in golden values (pins kernel regressions)."""

import json
import os

from insideout_spark.sources import pages as src_pages
from insideout_spark.plans.tiles import assign_tiles

GOLDEN = json.load(open(os.path.join(os.path.dirname(__file__), "golden", "tiles.json")))


def test_tile_assignment_matches_golden(spark):
    pg = src_pages.synth_pages(spark, 6, partitions=1)
    pts = src_pages.extract_points(pg)
    out = assign_tiles(pts, s2_level=10, grid_res=7, with_token=True)
    rows = {int(r["url"].rsplit("/", 1)[1]): r for r in out.collect()}
    match = 0
    for g in GOLDEN:
        r = rows[g["i"]]
        assert r["s2_cell_l10"] == g["s2_cell_l10"], g["i"]
        assert r["s2_token"] == g["s2_token"], g["i"]
        assert r["grid_cell_r7"] == g["grid_cell_r7"], g["i"]
        match += 1
    # tile-assignment exact-match rate (BASELINE.md target): 100%
    assert match == len(GOLDEN)
