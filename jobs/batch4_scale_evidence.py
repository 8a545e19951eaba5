"""Scale evidence for the r05 batch-4 operators: run each at sf0.1
(5k docs / 2k vectors) and derived sf1 (10x: 50k docs / 20k vectors,
jobs/make_scaled_sf.py output in /tmp/sf1) and record walls + row
counts. The check is near-linearity: every batch-4 plan is one scan
plus key-hashed shuffles (or, for pagerank, a fixed number of
join+agg rounds), so 10x input should cost ~10x or less (query-side
constants amortize).

Usage: python jobs/batch4_scale_evidence.py [sf_dir_small] [sf_dir_big]
Prints one JSON line for BASELINE.md.
"""

from __future__ import annotations

import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from insideout_spark.plans import graph, webtext  # noqa: E402
from insideout_spark.session import get_spark  # noqa: E402


def main() -> None:
    small = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    big = sys.argv[2] if len(sys.argv) > 2 else "/tmp/sf1"
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    spark = get_spark("batch4-scale", master=f"local[{cpus}]")
    spark.sparkContext.setLogLevel("ERROR")

    def run(sf_dir: str) -> dict:
        docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
        embs = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
        books = webtext.pq_codebooks_from_parquet(
            f"{sf_dir}/embeddings.parquet"
        )
        ops = {
            "quality_classifier": lambda: webtext.quality_classifier(docs),
            "bigram_top100": lambda: webtext.bigram_topk(docs, k=100),
            "text_index_top200": lambda: webtext.text_index_topk(docs, k=200),
            "pmi_top100": lambda: webtext.pmi_topk(docs, k=100),
            "pagerank_3iter": lambda: graph.pagerank(docs, iters=3),
            "ann_pq_top10": lambda: webtext.ann_pq(
                embs, [0, 1, 2, 3, 4], k=10, codebooks=books
            ),
        }
        out = {}
        for name, fn in ops.items():
            fn().count()  # warm plan + codegen
            best, rows = None, None
            for _ in range(2):
                t0 = time.time()
                rows = fn().count()
                w = time.time() - t0
                best = w if best is None else min(best, w)
            out[name] = {"wall_s": round(best, 3), "rows": rows}
        return out

    res = {
        "small": {"sf_dir": small, **run(small)},
        "big": {"sf_dir": big, **run(big)},
    }
    for name in res["small"]:
        if name == "sf_dir":
            continue
        a, b = res["small"][name]["wall_s"], res["big"][name]["wall_s"]
        res[f"ratio_{name}"] = round(b / a, 2) if a else None
    print(json.dumps(res))
    spark.stop()


if __name__ == "__main__":
    main()
