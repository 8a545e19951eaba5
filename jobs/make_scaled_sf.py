"""Derive a larger scale factor from driver-provided testdata by
deterministic replication (VERDICT r02 'Next round' #9: the driver
ships sf<=0.1; a 10x step tests the broadcast/shuffle balance the 100x
design claims). Usage:

    python jobs/make_scaled_sf.py /root/testdata/sf0.1 /tmp/sf1 10

Each table is unioned `factor` times; integer key/id columns are
offset by replica * (max+1) so ids stay unique, and document text gets
a per-replica suffix so replicas are NEAR-duplicates rather than exact
ones (exact x10 duplication would just re-measure the dedup path).
Everything is derived from the driver's own parquet — no external
data. DuckDB does the replication (no Spark session needed)."""

from __future__ import annotations

import os
import re
import sys

import duckdb

TABLES = (
    "region nation customer supplier part orders lineitem events documents embeddings"
).split()

_ID_PAT = re.compile(r"(_id$|key$)")


def scale_table(con, src: str, dst: str, factor: int) -> None:
    cols = con.execute(f"DESCRIBE SELECT * FROM read_parquet('{src}')").fetchall()
    exprs = []
    for name, dtype, *_ in cols:
        if _ID_PAT.search(name) and dtype in ("BIGINT", "INTEGER", "SMALLINT", "HUGEINT"):
            mx = con.execute(
                f"SELECT coalesce(max({name}), 0) FROM read_parquet('{src}')"
            ).fetchone()[0]
            exprs.append(f"({name} + i * {int(mx) + 1}) AS {name}")
        elif name == "text" and dtype == "VARCHAR":
            # replicas are near-dups, not exact dups (suffix word)
            exprs.append(f"(text || ' r' || CAST(i AS VARCHAR)) AS text")
        else:
            exprs.append(name)
    sel = ", ".join(exprs)
    con.execute(
        f"COPY (SELECT {sel} FROM read_parquet('{src}'), range({factor}) t(i)) "
        f"TO '{dst}' (FORMAT PARQUET)"
    )


def main() -> None:
    src_dir, dst_dir = sys.argv[1], sys.argv[2]
    factor = int(sys.argv[3]) if len(sys.argv) > 3 else 10
    os.makedirs(dst_dir, exist_ok=True)
    con = duckdb.connect()
    for t in TABLES:
        src = os.path.join(src_dir, f"{t}.parquet")
        dst = os.path.join(dst_dir, f"{t}.parquet")
        if not os.path.exists(src):
            continue
        scale_table(con, src, dst, factor)
        n = con.execute(f"SELECT count(*) FROM read_parquet('{dst}')").fetchone()[0]
        print(f"{t}: {n} rows -> {dst}")


if __name__ == "__main__":
    main()
