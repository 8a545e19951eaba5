"""Benchmark harness.

Runs the headline queries at $SPARK_GRAFT_SF_DIR (default
/root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and prints ONE JSON
line:

    {"metric": "pip_join_pages_per_sec", "value": N, "unit": "sec",
     "queries": {...per-query seconds...}, "sf": ...,
     "scaling": {"local8_pages_per_sec": ..., "local32_pages_per_sec": ...,
                 "efficiency_8_to_32": ...}}

The scaling block evidences the north rule's N->4N criterion in-sandbox:
the identical flagship job at local[8] vs local[32] on the same input
(BASELINE.md). Skip it with SPARK_GRAFT_SCALING=0 for quick local runs.
"""

from __future__ import annotations

import json
import os
import sys
import time

from pyspark.sql import functions as F

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import __spark_entry__ as entry_mod  # noqa: E402
from insideout_spark.geo.cover import CoverParams  # noqa: E402
from insideout_spark.plans.index_build import build_index  # noqa: E402
from insideout_spark.plans.pip_join import pip_join  # noqa: E402
from insideout_spark.session import get_spark  # noqa: E402
from insideout_spark.sources import pages as src_pages  # noqa: E402
from insideout_spark.sources.polygons import france_rects_loops, load_geojson_loops  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
RUN_SCALING = os.environ.get("SPARK_GRAFT_SCALING", "1") != "0"
ISLAND = os.path.join(os.path.dirname(os.path.abspath(__file__)), "tests/golden/houat.geojson")


def _sf_from_dir(d: str) -> float:
    try:
        return float(os.path.basename(d.rstrip("/")).replace("sf", ""))
    except ValueError:
        return -1.0


SF = _sf_from_dir(SF_DIR)
N_PAGES = max(100_000, int(5_000_000 * SF)) if SF > 0 else 500_000
N_SCALING = int(os.environ.get("SPARK_GRAFT_SCALING_PAGES", str(max(N_PAGES, 2_000_000))))


def timed(fn):
    t0 = time.time()
    out = fn()
    return time.time() - t0, out


def flagship_pages_job(spark, n_pages: int, partitions: int):
    """The flagship pipeline: synth pages -> extract coords -> dual-cover
    PIP join vs the France rect layer -> count hits. Points are
    materialized first so the timed section is the engine, not the
    generator."""
    idx = build_index(
        spark, france_rects_loops(), CoverParams(4, 10, 64), CoverParams(4, 10, 64),
        warning_cells_cover=100000,
    )
    pts = src_pages.extract_points(src_pages.synth_pages(spark, n_pages, partitions))
    pts = pts.repartition(partitions).cache()
    pts.count()  # materialize
    sec, cnt = timed(lambda: pip_join(pts, idx, include_properties=False).count())
    pts.unpersist()
    return sec, cnt


def run_headline(spark) -> dict[str, float]:
    q: dict[str, float] = {}

    # 1. flagship pages PIP join (coarse country-scale rect layer)
    sec, cnt = flagship_pages_job(spark, N_PAGES, CPUS * 2)
    q["pip_pages_rects"] = sec
    q["_pip_pages_rects_rows"] = cnt
    q["_pip_pages_per_sec"] = N_PAGES / sec

    # 2. fine-grained island layer (levels 10-16, the reference fixture)
    island_idx = build_index(
        spark, load_geojson_loops(ISLAND), CoverParams(10, 16, 24),
        CoverParams(10, 15, 16), warning_cells_cover=100,
    )
    pts = src_pages.extract_points(src_pages.synth_pages(spark, N_PAGES, CPUS * 2)).cache()
    pts.count()
    sec, _ = timed(lambda: pip_join(pts, island_idx, include_properties=False).count())
    q["pip_pages_island"] = sec
    pts.unpersist()

    # 3-N. driver-contract queries at SF_DIR
    queries = entry_mod.queries()
    for name in (
        "pip_rect_join",
        "grid_assign_r7",
        "s2_assign_l10",
        "knn3_cell_join",
        "dedup_exact",
        "doc_stats",
        "ann_cosine_top10",
        "minhash_lsh_pairs",
    ):
        sec, _ = timed(lambda n=name: queries[n](spark, SF_DIR).count())
        q[name] = sec
    return q


def run_scaling() -> dict:
    """Identical flagship job, identical input partitioning, at
    local[8] and local[32] — the N->4N scaling evidence."""
    out = {}
    for cores in (8, 32):
        spark = get_spark(f"bench-scaling-{cores}", master=f"local[{cores}]",
                          shuffle_partitions=cores)
        spark.sparkContext.setLogLevel("ERROR")
        # warmup (JIT, python worker spinup)
        flagship_pages_job(spark, 50_000, 64)
        join_sec, _ = flagship_pages_job(spark, N_SCALING, 64)
        out[f"local{cores}_sec"] = join_sec
        out[f"local{cores}_pages_per_sec"] = N_SCALING / join_sec
        spark.stop()
    out["efficiency_8_to_32"] = (
        out["local8_sec"] / out["local32_sec"] / 4.0
    )
    out["scaling_pages"] = N_SCALING
    return out


def main() -> None:
    results: dict = {"sf": SF, "sf_dir": SF_DIR, "n_pages": N_PAGES}

    spark = get_spark("bench", master=f"local[{CPUS}]", shuffle_partitions=CPUS)
    spark.sparkContext.setLogLevel("ERROR")
    queries = run_headline(spark)
    spark.stop()

    scaling = run_scaling() if RUN_SCALING else {}

    payload = {
        "metric": "pip_join_pages_per_sec",
        "value": round(queries["_pip_pages_per_sec"], 1),
        "unit": "sec",
        "queries": {k: round(v, 3) for k, v in queries.items() if not k.startswith("_")},
        "sf": SF,
        "scaling": {k: round(v, 3) if isinstance(v, float) else v for k, v in scaling.items()},
    }
    print(json.dumps(payload))


if __name__ == "__main__":
    main()
