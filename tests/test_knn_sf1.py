"""kNN evidence at derived sf1 (1 M points x 10 k targets) — the scale
where the DuckDB cross-join oracle is infeasible (20 B rows), so the
gate is SELF-CONSISTENCY across independent physical paths instead:

1. `knn_cell_join` at two different grid resolutions must agree
   exactly: the resolution changes the cell partitioning, the ring
   sweep schedule, and the number of expansion rounds — everything
   about the execution — while the (dist_sq, target_id) tiebreak makes
   the answer a pure function of the inputs. Compared via a
   commutative checksum aggregate (no 3 M-row driver collect).
2. `knn_brute` (broadcast numpy top-k, the oracle kernel that IS
   cross-engine-gated at sf0.01/sf0.1) on a 50 k-point sample must
   equal the cell-join rows restricted to the same sample — valid
   because each point's k-NN depends only on the target set.
3. The density guard: a deliberately too-coarse res hint (res=7 puts
   the whole 2.5-degree bbox in ~6 cells — unguarded, that round-1
   join IS points x targets and never finishes) completes, because
   `_bump_res_for_density` refines it.

Gated on the derived-sf1 dir (jobs/make_scaled_sf.py); skipped when
absent so the default suite stays fast. Build the input with:
    python jobs/make_scaled_sf.py /root/testdata/sf0.1 /tmp/sf1 10
"""

import os

import pytest
from pyspark.sql import functions as F

import __spark_entry__ as entry_mod
from insideout_spark.plans.knn import _bump_res_for_density, knn_brute, knn_cell_join

SF1_DIR = os.environ.get("SPARK_GRAFT_SF1_DIR", "/tmp/sf1")

pytestmark = [
    pytest.mark.slow,
    pytest.mark.skipif(
        not os.path.exists(os.path.join(SF1_DIR, "events.parquet")),
        reason="derived sf1 dir not present (jobs/make_scaled_sf.py)",
    ),
]


def _checksum(df):
    """Order-independent exact digest: sum of per-row xxhash64 over all
    columns, in decimal so ANSI mode cannot overflow."""
    h = F.xxhash64(*[F.col(c) for c in sorted(df.columns)])
    return df.select(
        F.sum(h.cast("decimal(38,0)")).alias("s"), F.count("*").alias("n")
    ).collect()[0]


def test_knn_cell_join_cross_resolution_sf1(spark):
    pts = entry_mod._points(spark, SF1_DIR)
    tgt = entry_mod._targets(spark, SF1_DIR)
    a = knn_cell_join(pts, tgt, k=3, res=11)
    b = knn_cell_join(pts, tgt, k=3, res=12)
    ca, cb = _checksum(a), _checksum(b)
    assert ca["n"] == cb["n"] == 3_000_000
    assert ca["s"] == cb["s"]


def test_knn_brute_sample_matches_cell_join_sf1(spark):
    pts = entry_mod._points(spark, SF1_DIR).filter(F.col("point_id") % 20 == 0)
    tgt = entry_mod._targets(spark, SF1_DIR)
    cell = knn_cell_join(pts, tgt, k=3, res=12)
    brute = knn_brute(pts, tgt, k=3)
    cols = ["point_id", "target_id", "dist_sq", "rank"]
    got = {tuple(r) for r in cell.select(cols).collect()}
    want = {tuple(r) for r in brute.select(cols).collect()}
    assert got == want


def test_density_guard_bumps_coarse_res_sf1(spark):
    tgt = entry_mod._targets(spark, SF1_DIR)
    bumped = _bump_res_for_density(tgt, 7, 3)
    assert bumped >= 10  # res 7 would be the degenerate cross join
    # and the guarded join actually completes on a slice of the points
    pts = entry_mod._points(spark, SF1_DIR).filter(F.col("point_id") % 100 == 0)
    assert knn_cell_join(pts, tgt, k=3, res=7).count() == 30_000
