"""Local replica of the driver's correctness gate: run every queries()
entry on Spark at sf0.01 and compare against its oracle_sql() twin in
DuckDB — row count, column names, and exact values (order-insensitive,
column-name-sorted, bit-exact doubles — stricter than a value hash)."""

import os

import duckdb
import pytest

import __spark_entry__ as entry_mod
from insideout_spark.gatecheck import normalize as _normalize

pytestmark = pytest.mark.slow

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR_T2", "/root/testdata/sf0.01")
TABLES = (
    "region nation customer supplier part orders lineitem events documents embeddings"
).split()


@pytest.fixture(scope="module")
def ducks():
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF_DIR}/{t}.parquet')"
        )
    return con


ORACLE_KEYS = sorted(entry_mod.oracle_sql().keys())


def test_entry_smoke(spark):
    df = entry_mod.entry(spark)
    rows = df.collect()
    assert len(rows) >= 0
    assert set(df.columns) == {
        "point_id", "feature_id", "loop_pos", "is_sure_hit", "admin_level",
    }
    # at sf0.001 every derived point is inside the bbox rect at least
    assert len(rows) > 0


def test_all_queries_have_callable():
    qs = entry_mod.queries()
    assert len(qs) >= 15
    for name, fn in qs.items():
        assert callable(fn), name
    # every oracle key must have a query
    for name in ORACLE_KEYS:
        assert name in qs


@pytest.mark.parametrize("name", ORACLE_KEYS)
def test_query_matches_oracle(spark, ducks, name):
    qdf = entry_mod.queries()[name](spark, SF_DIR)
    spark_rows = qdf.collect()
    scols = qdf.columns

    res = ducks.execute(entry_mod.oracle_sql()[name])
    dcols = [d[0] for d in res.description]
    duck_rows = res.fetchall()

    assert sorted(scols) == sorted(dcols), f"{name}: column names differ"
    assert len(spark_rows) == len(duck_rows), f"{name}: row count differs"

    snames, sdata = _normalize(scols, [[r[c] for c in scols] for r in spark_rows])
    dnames, ddata = _normalize(dcols, duck_rows)
    assert snames == dnames
    mismatches = [
        (i, a, b) for i, (a, b) in enumerate(zip(sdata, ddata)) if a != b
    ]
    assert not mismatches, f"{name}: first mismatches {mismatches[:3]}"


@pytest.mark.parametrize(
    "name", sorted(set(entry_mod.queries()) - set(ORACLE_KEYS))
)
def test_rows_only_queries_run(spark, name):
    df = entry_mod.queries()[name](spark, SF_DIR)
    assert df.count() >= 0
    assert len(df.columns) > 0
