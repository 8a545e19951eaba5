"""Extra benchmark harness for optimization work (guide §1.4): times a
named subset of the declared queries in isolation with the SAME
methodology as the frozen bench.py (`queries[name](spark, SF_DIR).count()`,
min-of-2, extra rep under 3 s), and optionally dumps
`.explain("formatted")` to plans/r06/<name>_<tag>.txt.

Usage:
    SPARK_GRAFT_SF_DIR=/root/testdata/sf1.0 python bench_extra.py \
        [--plans TAG] [--reps N] q1 q2 ...

bench.py stays frozen; numbers from here are cited in
OPTIMIZATION_r06.md.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import __spark_entry__ as entry_mod  # noqa: E402
from insideout_spark.session import get_spark  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf1.0")
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))

HEAVY = [
    "ngram_jaccard_pairs",
    "minhash_lsh_pairs",
    "dedup_components",
    "dedup_cluster_sizes",
    "emb_near_dup_pairs",
    "simhash_near_dup_pairs",
    "knn3_cell_join",
    "bm25_top10",
    "curation_pipeline",
    "paragraph_dedup",
    "pmi_top100",
    "bigram_top100",
    "video_frame_pixel_features",
]


def timed(fn):
    t0 = time.time()
    out = fn()
    return time.time() - t0, out


def best_of(fn, n: int = 2):
    samples = [timed(fn)[0]]
    reps = max(n, 3) if samples[0] < 3.0 else n
    samples += [timed(fn)[0] for _ in range(reps - 1)]
    return min(samples), samples


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("names", nargs="*", default=None)
    ap.add_argument("--plans", default=None, help="dump explain to plans/r06/<q>_<TAG>.txt")
    ap.add_argument("--reps", type=int, default=2)
    args = ap.parse_args()
    names = args.names or HEAVY

    spark = get_spark("bench-extra", master=f"local[{CPUS}]", shuffle_partitions=CPUS)
    spark.sparkContext.setLogLevel("ERROR")
    entry_mod._prepare(spark)
    queries = entry_mod.queries()

    out = {}
    for name in names:
        if name not in queries:
            print(f"!! unknown query {name}", file=sys.stderr)
            continue
        if args.plans:
            os.makedirs("plans/r06", exist_ok=True)
            df = queries[name](spark, SF_DIR)
            plan = df._sc._jvm.PythonSQLUtils.explainString(
                df._jdf.queryExecution(), "formatted"
            )
            with open(f"plans/r06/{name}_{args.plans}.txt", "w") as f:
                f.write(plan)
        spark.sparkContext.setJobDescription(f"bench_extra:{name}")
        best, samples = best_of(
            lambda n=name: queries[n](spark, SF_DIR).count(), args.reps
        )
        out[name] = {"best": round(best, 3), "samples": [round(s, 3) for s in samples]}
        print(json.dumps({name: out[name]}), flush=True)
        spark.sparkContext.setJobDescription(None)

    print(json.dumps({"sf_dir": SF_DIR, "results": out}))
    spark.stop()


if __name__ == "__main__":
    main()
