"""Derive a larger scale factor from driver-provided testdata by
deterministic replication (VERDICT r02 'Next round' #9: the driver
ships sf<=0.1; a 10x step tests the broadcast/shuffle balance the 100x
design claims). Usage:

    python jobs/make_scaled_sf.py /root/testdata/sf0.1 /tmp/sf1 10

Each table is unioned `factor` times; integer key/id columns are
offset by replica * (domain_max + 1), where the offset is ONE PER KEY
DOMAIN (custkey, orderkey, doc_id, ...) computed as the max of that
domain across ALL tables (ADVICE r03: per-column maxima misalign
foreign keys whenever max(fk) != max(pk) — e.g. customers with no
orders make max(o_custkey) < max(c_custkey), so replica joins saw
dangling keys). Document text gets a per-replica suffix so replicas
are NEAR-duplicates rather than exact ones (exact x10 duplication
would just re-measure the dedup path). Everything is derived from the
driver's own parquet — no external data. DuckDB does the replication
(no Spark session needed)."""

from __future__ import annotations

import os
import re
import sys

import duckdb

TABLES = (
    "region nation customer supplier part orders lineitem events documents embeddings"
).split()

_ID_PAT = re.compile(r"(_id$|key$)")
_INT_TYPES = ("BIGINT", "INTEGER", "SMALLINT", "HUGEINT")


def _domain(col: str) -> str:
    """Key domain of a column: strip the table prefix (c_custkey,
    o_custkey, l_orderkey ... -> custkey, orderkey); doc_id/vec_id/
    event_id are their own domains."""
    if col.endswith("key") and "_" in col:
        return col.split("_", 1)[1]
    return col


def domain_offsets(con, src_dir: str) -> dict:
    """One replica offset per key domain: max of the domain over ALL
    tables + 1, so primary keys and every foreign-key occurrence shift
    by the same amount and replica joins stay aligned."""
    mx: dict[str, int] = {}
    for t in TABLES:
        src = os.path.join(src_dir, f"{t}.parquet")
        if not os.path.exists(src):
            continue
        cols = con.execute(f"DESCRIBE SELECT * FROM read_parquet('{src}')").fetchall()
        for name, dtype, *_ in cols:
            if _ID_PAT.search(name) and dtype in _INT_TYPES:
                v = con.execute(
                    f"SELECT coalesce(max({name}), 0) FROM read_parquet('{src}')"
                ).fetchone()[0]
                d = _domain(name)
                mx[d] = max(mx.get(d, 0), int(v))
    return {d: v + 1 for d, v in mx.items()}


def scale_table(con, src: str, dst: str, factor: int, offsets: dict) -> None:
    cols = con.execute(f"DESCRIBE SELECT * FROM read_parquet('{src}')").fetchall()
    exprs = []
    for name, dtype, *_ in cols:
        if _ID_PAT.search(name) and dtype in _INT_TYPES:
            exprs.append(f"({name} + i * {offsets[_domain(name)]}) AS {name}")
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
    offsets = domain_offsets(con, src_dir)
    print("domain offsets:", offsets)
    for t in TABLES:
        src = os.path.join(src_dir, f"{t}.parquet")
        dst = os.path.join(dst_dir, f"{t}.parquet")
        if not os.path.exists(src):
            continue
        scale_table(con, src, dst, factor, offsets)
        n = con.execute(f"SELECT count(*) FROM read_parquet('{dst}')").fetchone()[0]
        print(f"{t}: {n} rows -> {dst}")


if __name__ == "__main__":
    main()
