"""Same-session A/B for knn3_cell_join (VERDICT r03 'Next round' #1).

BENCH_r03 recorded knn3_cell_join at 5.56 s vs r02's 2.44 s (2.3x) —
outside the documented session-drift band for every other query, and
the kNN code DID change in r3 (Catalyst ring offsets 34fb1ae, strict
boundary termination, density-bump probes cd1ec33). Drift and
regression were confounded; this job un-confounds them by timing, in
ONE Spark session, min-of-N for:

  r3_current      — insideout_spark.plans.knn as shipped
  r3_no_bump      — same code, density-bump probes skipped (res pinned
                    to the bumped value computed once up front, so the
                    join plan is identical and only the probe aggregates
                    differ)
  bump_probes     — the _bump_res_for_density pre-pass alone
  r2_plan         — the round-2 knn.py (git 23b6fca) loaded as a
                    separate module

Usage: python jobs/knn_ab.py [n_reps]   (env: SPARK_GRAFT_SF_DIR)
Prints one JSON line with min/median wall per variant.
"""

from __future__ import annotations

import importlib.util
import json
import os
import statistics
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from insideout_spark.session import get_spark  # noqa: E402
from insideout_spark.plans import knn as knn_r3  # noqa: E402


def _load_r2_module():
    src = subprocess.run(
        ["git", "-C", REPO, "show", "23b6fca:insideout_spark/plans/knn.py"],
        check=True, capture_output=True, text=True,
    ).stdout
    path = "/tmp/_knn_r2_plan.py"
    # the r2 file used package-relative imports; rewrite to absolute
    src = src.replace("from ..functions.udfs", "from insideout_spark.functions.udfs")
    src = src.replace("from ..geo import grid", "from insideout_spark.geo import grid")
    with open(path, "w") as f:
        f.write(src)
    spec = importlib.util.spec_from_file_location("_knn_r2_plan", path)
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def main() -> None:
    reps = int(sys.argv[1]) if len(sys.argv) > 1 else 5
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    spark = get_spark("knn-ab", master=f"local[{cpus}]")
    spark.sparkContext.setLogLevel("ERROR")

    import __spark_entry__ as entry

    pts = entry._points(spark, sf_dir).cache()
    tgt = entry._targets(spark, sf_dir).cache()
    n_pts, n_tgt = pts.count(), tgt.count()

    knn_r2 = _load_r2_module()
    res_hint = knn_r3._auto_res(tgt, 3)
    res_bumped = knn_r3._bump_res_for_density(tgt, res_hint, 3)

    def timed(fn):
        walls = []
        for _ in range(reps):
            t0 = time.perf_counter()
            fn()
            walls.append(time.perf_counter() - t0)
        return {"min": round(min(walls), 3),
                "median": round(statistics.median(walls), 3),
                "all": [round(w, 3) for w in walls]}

    out = {"sf_dir": sf_dir, "cpus": cpus, "n_points": n_pts,
           "n_targets": n_tgt, "reps": reps,
           "res_hint": res_hint, "res_bumped": res_bumped}

    out["bump_probes"] = timed(
        lambda: knn_r3._bump_res_for_density(tgt, res_hint, 3))
    out["r3_current"] = timed(
        lambda: knn_r3.knn_cell_join(pts, tgt, 3, id_col="point_id",
                                     target_id_col="target_id").count())
    # knn_cell_join calls _probe_density DIRECTLY (not through
    # _bump_res_for_density), so the probe's mean occupancy must come
    # from a real measurement once, then be replayed as a constant
    mean_occ_bumped = knn_r3._probe_density(tgt, res_bumped, 3)[1]

    def _no_bump():
        # knn_cell_join re-probes even with an explicit res (one probe
        # when already bumped); patch _probe_density itself (ADVICE r04:
        # patching _bump_res_for_density was a no-op) so this variant
        # times the join plan alone, probes fully excluded
        orig = knn_r3._probe_density
        knn_r3._probe_density = lambda t, r, k, w=2: (r, mean_occ_bumped)
        try:
            knn_r3.knn_cell_join(pts, tgt, 3, res=res_bumped,
                                 id_col="point_id",
                                 target_id_col="target_id").count()
        finally:
            knn_r3._probe_density = orig

    out["r3_no_bump"] = timed(_no_bump)
    out["r2_plan"] = timed(
        lambda: knn_r2.knn_cell_join(pts, tgt, 3, id_col="point_id",
                                     target_id_col="target_id").count())

    # row-equality spot check between the two generations
    a = knn_r3.knn_cell_join(pts, tgt, 3, id_col="point_id",
                             target_id_col="target_id")
    b = knn_r2.knn_cell_join(pts, tgt, 3, id_col="point_id",
                             target_id_col="target_id")
    out["rows_equal_r2_vs_r3"] = (
        a.exceptAll(b).isEmpty() and b.exceptAll(a).isEmpty())

    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()
