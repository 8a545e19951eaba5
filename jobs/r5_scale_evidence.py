"""10x scale evidence for the round-5 operator batches that the
batch-4 job (jobs/batch4_scale_evidence.py) does not cover: run each
named queries() entry at sf0.1 (5k docs) and derived sf1 (50k docs,
jobs/make_scaled_sf.py output in /tmp/sf1) and report walls + row
counts + the big/small ratio. Near-linearity is the check: each of
these plans is one scan plus key-hashed shuffles (or a bounded
window), so 10x input should cost ~10x or less.

Usage: python jobs/r5_scale_evidence.py [sf_dir_small] [sf_dir_big] [ops...]
Prints one JSON line for BASELINE.md.
"""

from __future__ import annotations

import importlib.util
import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from insideout_spark.session import get_spark  # noqa: E402

DEFAULT_OPS = [
    "pii_redact",
    "sample_stratified",
    "mix_weights",
    "hll_distinct_tokens",
    "url_domain_stats",
    "domain_cap",
    "length_histogram",
    "cms_heavy_hitters",
    "dup_span_stats",
    "paragraph_dedup",
    "dedup_incremental",
    "dedup_keep_best",
    "decontaminate_split",
]


def main() -> None:
    small = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    big = sys.argv[2] if len(sys.argv) > 2 else "/tmp/sf1"
    ops = sys.argv[3:] or DEFAULT_OPS
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    spec = importlib.util.spec_from_file_location(
        "entry", os.path.join(REPO, "__spark_entry__.py")
    )
    entry = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(entry)
    queries = entry.queries()
    spark = get_spark("r5-scale", master=f"local[{cpus}]")
    spark.sparkContext.setLogLevel("ERROR")

    def run(sf_dir: str) -> dict:
        out = {}
        for name in ops:
            fn = queries[name]
            fn(spark, sf_dir).count()  # warm plan + codegen + workers
            best, rows = None, None
            for _ in range(2):
                t0 = time.time()
                rows = fn(spark, sf_dir).count()
                w = time.time() - t0
                best = w if best is None else min(best, w)
            out[name] = {"wall_s": round(best, 3), "rows": rows}
        return out

    res = {
        "small": {"sf_dir": small, **run(small)},
        "big": {"sf_dir": big, **run(big)},
    }
    for name in ops:
        a = res["small"][name]["wall_s"]
        b = res["big"][name]["wall_s"]
        res[f"ratio_{name}"] = round(b / a, 2) if a else None
    print(json.dumps(res))
    spark.stop()


if __name__ == "__main__":
    main()
