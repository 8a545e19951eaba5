"""Full local replica of the driver's correctness gate — ALL entries.

The driver's per-round gate records only the FIRST 50 `queries()`
entries (diagnosed round 5: CORRECTNESS_r04.json contains exactly the
first 50 of 52 dict-ordered keys, so the two newest queries had no
rows despite passing their oracles). This job runs EVERY entry —
including those past the 50-entry window — through the identical
comparison (row count, column names, order-insensitive column-sorted
value compare, bit-exact doubles: stricter than the driver's value
hash) and writes a committed artifact so each round leaves a recorded
green run for the full surface.

Usage:
    python jobs/local_gate.py [out.json]
Env: SPARK_GRAFT_SF_DIR_T2 (gate sf dir, default /root/testdata/sf0.01),
     SPARK_GRAFT_CPUS.

Output: one JSON object {query: {rows_match, schema_match, hash_match,
spark_rows, oracle_rows, err}} — the driver's row shape — plus a
`_meta` entry (sf dir, counts, wall).
"""

from __future__ import annotations

import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

import duckdb  # noqa: E402

import __spark_entry__ as entry_mod  # noqa: E402
from insideout_spark.gatecheck import normalize as _normalize  # noqa: E402
from insideout_spark.session import get_spark  # noqa: E402

TABLES = (
    "region nation customer supplier part orders lineitem events documents embeddings"
).split()


def main() -> None:
    out_path = sys.argv[1] if len(sys.argv) > 1 else "CORRECTNESS_LOCAL.json"
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR_T2", "/root/testdata/sf0.01")
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    spark = get_spark("local-gate", master=f"local[{cpus}]")
    spark.sparkContext.setLogLevel("ERROR")

    con = duckdb.connect()
    for t in TABLES:
        p = f"{sf_dir}/{t}.parquet"
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")

    queries = entry_mod.queries()
    oracles = entry_mod.oracle_sql()
    only = set(sys.argv[2:])
    if only:
        unknown = only - set(queries)
        if unknown:
            sys.exit(f"unknown query names: {sorted(unknown)}")
        queries = {k: v for k, v in queries.items() if k in only}
    t_start = time.time()
    results: dict = {}
    for name, fn in queries.items():
        row = {
            "rows_match": False, "schema_match": False, "hash_match": False,
            "spark_rows": None, "oracle_rows": None, "err": None,
        }
        try:
            qdf = fn(spark, sf_dir)
            spark_rows = qdf.collect()
            scols = qdf.columns
            row["spark_rows"] = len(spark_rows)
            if name not in oracles:
                # rows-only check (the driver's weaker mode)
                row.update(
                    rows_match=len(spark_rows) >= 0, schema_match=len(scols) > 0,
                    hash_match=None, oracle_rows=None, err="no oracle (rows-only)",
                )
                results[name] = row
                continue
            res = con.execute(oracles[name])
            dcols = [d[0] for d in res.description]
            duck_rows = res.fetchall()
            row["oracle_rows"] = len(duck_rows)
            row["rows_match"] = len(spark_rows) == len(duck_rows)
            row["schema_match"] = sorted(scols) == sorted(dcols)
            if row["rows_match"] and row["schema_match"]:
                _, sdata = _normalize(scols, [[r[c] for c in scols] for r in spark_rows])
                _, ddata = _normalize(dcols, duck_rows)
                row["hash_match"] = sdata == ddata
        except Exception as e:  # record, keep going
            row["err"] = f"{type(e).__name__}: {e}"[:500]
        results[name] = row
        ok = row["rows_match"] and row["schema_match"] and row["hash_match"] in (True, None)
        print(f"{name}: {'PASS' if ok else 'FAIL'} "
              f"({row['spark_rows']} vs {row['oracle_rows']})", flush=True)

    n_pass = sum(
        1 for r in results.values()
        if r["rows_match"] and r["schema_match"] and r["hash_match"] in (True, None)
    )
    results["_meta"] = {
        "sf_dir": sf_dir, "cpus": cpus, "n_queries": len(queries),
        "n_pass": n_pass, "wall_sec": round(time.time() - t_start, 1),
    }
    with open(out_path, "w") as f:
        json.dump(results, f, indent=1)
    print(f"{n_pass}/{len(queries)} pass -> {out_path}")
    spark.stop()


if __name__ == "__main__":
    main()
