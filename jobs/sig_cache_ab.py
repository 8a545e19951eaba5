"""Same-session A/B for the r3->r4 minhash/simhash bench moves
(VERDICT r04 'Next round' #5, the jobs/knn_ab.py pattern).

BENCH_r04 recorded minhash_lsh_pairs 1.74->3.38 s and
simhash_near_dup_pairs 1.19->3.12 s vs r03. The r04 ledger attributed
the r03 numbers to CROSS-CALL CACHE REUSE: r03 never unpersisted the
per-call signature caches, so consecutive benchmark reps hit Spark's
plan-equality cache match on the pinned signature frame and skipped
the whole Python fingerprint pass. r04's auto-release registry removes
the leak; this job pins that attribution with a measured A/B in ONE
session:

  cold        — r04 semantics: release_signature_caches() before every
                rep, so each rep pays the full signature pass (the
                honest per-call cost)
  leaked      — r03 semantics: auto_release=False and caches NOT
                released between reps, so rep 2+ reuse the previous
                rep's pinned signature frame (the number r03 reported)
  saved_sigs  — the legitimate production analog of 'leaked': the
                signature table persisted once via save_signatures and
                passed in explicitly (signatures=), paying only the
                band join + pair verify per call

Usage: python jobs/sig_cache_ab.py [n_reps]  (env: SPARK_GRAFT_SF_DIR)
Prints one JSON line with min/median/all walls per variant per op.
"""

from __future__ import annotations

import json
import os
import statistics
import sys
import tempfile
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from insideout_spark.plans import webtext  # noqa: E402
from insideout_spark.session import get_spark  # noqa: E402


def main() -> None:
    reps = int(sys.argv[1]) if len(sys.argv) > 1 else 4
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    spark = get_spark("sig-cache-ab", master=f"local[{cpus}]")
    spark.sparkContext.setLogLevel("ERROR")

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").cache()
    n_docs = docs.count()

    def series(fn, prep=None):
        walls = []
        for _ in range(reps):
            if prep is not None:
                prep()
            t0 = time.perf_counter()
            fn()
            walls.append(round(time.perf_counter() - t0, 3))
        return {"min": min(walls), "median": round(statistics.median(walls), 3),
                "all": walls}

    out = {"sf_dir": sf_dir, "cpus": cpus, "n_docs": n_docs, "reps": reps}

    # --- minhash_lsh_pairs ---
    out["minhash_cold"] = series(
        lambda: webtext.minhash_lsh_pairs(docs, threshold=0.35).count(),
        prep=webtext.release_signature_caches,
    )
    # leaked: auto_release=False and never released between reps — the
    # r03 bench shape (rep 1 pays the pass, reps 2+ hit the pinned
    # signature cache via plan-equality)
    webtext.release_signature_caches()
    out["minhash_leaked"] = series(
        lambda: webtext.minhash_lsh_pairs(
            docs, threshold=0.35, auto_release=False
        ).count()
    )
    webtext.release_signature_caches()

    with tempfile.TemporaryDirectory(prefix="sig_ab_") as td:
        sig_path = os.path.join(td, "sigs.parquet")
        t0 = time.perf_counter()
        webtext.save_signatures(docs, sig_path)
        out["save_signatures_wall"] = round(time.perf_counter() - t0, 3)
        sigs = spark.read.parquet(sig_path)
        out["minhash_saved_sigs"] = series(
            lambda: webtext.minhash_lsh_pairs(
                docs, threshold=0.35, signatures=sigs
            ).count()
        )

        # rows identical across all three paths (spot equality)
        a = webtext.minhash_lsh_pairs(docs, threshold=0.35)
        b = webtext.minhash_lsh_pairs(docs, threshold=0.35, signatures=sigs)
        out["minhash_saved_rows_equal"] = (
            a.exceptAll(b).isEmpty() and b.exceptAll(a).isEmpty()
        )

    # --- simhash_near_dup_pairs ---
    out["simhash_cold"] = series(
        lambda: webtext.simhash_near_dup_pairs(docs).count(),
        prep=webtext.release_signature_caches,
    )
    webtext.release_signature_caches()
    out["simhash_leaked"] = series(
        lambda: webtext.simhash_near_dup_pairs(docs, auto_release=False).count()
    )
    webtext.release_signature_caches()

    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()
