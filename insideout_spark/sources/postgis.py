"""PostGIS source + stab, gated behind JDBC availability (SURVEY.md
§2.1 S6 / §2.3 J4 — reference index/postgis/postgis.go).

The reference's fourth stab strategy delegates containment to PostGIS:
`SELECT ogc_fid FROM france WHERE ST_Contains(geom, POINT)`
(postgis.go:40-68; same SQL shape in cmd/quickpostgisload/main.go:96-99).
This sandbox has no PostgreSQL server or JDBC driver jar, so this
module is runtime-gated the same way as sources/iceberg.py: the
query-construction logic (the part with parity to the reference) is
pure and unit-tested; the network read needs a real cluster.

Scale note: on a real deployment the JDBC read uses `pushdown_query`
per point-partition (PostGIS does the geometry work server-side), so
Spark only shuffles result rows — but at 10^12 points an external
RDBMS is the wrong shape; this exists for reference parity and for
small authoritative layers.
"""

from __future__ import annotations

import re

from pyspark.sql import DataFrame, SparkSession

# max points per stab_postgis call: each point is one UNION ALL branch,
# and Postgres rejects absurdly long statements — beyond this, batch
# the calls or use the native dual-cover pip_join (ADVICE r02)
MAX_STAB_POINTS = 512

_IDENT = re.compile(r"^[A-Za-z_][A-Za-z0-9_]*(\.[A-Za-z_][A-Za-z0-9_]*)?$")


def _check_table(table: str) -> str:
    """Validate the (optionally schema-qualified) table identifier —
    the interpolated name must never carry SQL (ADVICE r02)."""
    if not _IDENT.match(table):
        raise ValueError(f"invalid PostGIS table identifier: {table!r}")
    return table


def jdbc_postgres_available(spark: SparkSession) -> bool:
    try:
        spark._jvm.java.lang.Class.forName("org.postgresql.Driver")
        return True
    except Exception:
        return False


def stab_sql(lng: float, lat: float, table: str = "france") -> str:
    """The reference's PostGIS stab query (postgis.go:40-68): features
    whose geometry contains the point. Mirrors the exact SQL shape —
    ST_Contains(geom, ST_SetSRID(ST_MakePoint(lng, lat), 4326))."""
    table = _check_table(table)
    return (
        f"SELECT ogc_fid FROM {table} WHERE ST_Contains(geom, "  # noqa: S608
        f"ST_SetSRID(ST_MakePoint({float(lng)!r}, {float(lat)!r}), 4326))"
    )


def stab_union_sql(points, table: str = "france") -> str:
    """The exact SQL text stab_postgis pushes down — one UNION ALL
    branch per point, each the reference's ST_Contains shape. Pure
    (no JDBC), so the statement itself is executable against any
    engine that provides the three ST_ functions: the integration shim
    (tests/test_postgis_shim.py) runs it in DuckDB with ST_Contains
    backed by this repo's exact PIP kernel and matches pip_join rows
    on the golden fixture — the runtime gate for the one strategy the
    sandbox cannot execute over real JDBC."""
    table = _check_table(table)
    points = list(points)
    if len(points) > MAX_STAB_POINTS:
        raise ValueError(
            f"stab_postgis takes at most {MAX_STAB_POINTS} points per call "
            f"(got {len(points)}): batch the calls or use pip_join"
        )
    return " UNION ALL ".join(
        f"SELECT {int(i)} AS point_id, ogc_fid FROM {table} "  # noqa: S608
        "WHERE ST_Contains(geom, "
        f"ST_SetSRID(ST_MakePoint({float(lng)!r}, {float(lat)!r}), 4326))"
        for i, (lng, lat) in enumerate(points)
    )


def read_postgis(
    spark: SparkSession,
    jdbc_url: str,
    table: str,
    properties: dict | None = None,
    predicates: list | None = None,
) -> DataFrame:
    """JDBC read of a PostGIS table (S6). `predicates` partition the
    read (one JDBC connection per predicate — the usual way to
    parallelize a relational scan). Raises a clear error when no
    PostgreSQL driver jar is on the classpath."""
    if not jdbc_postgres_available(spark):
        raise RuntimeError(
            "PostGIS source requires the PostgreSQL JDBC driver jar "
            "(--jars postgresql-*.jar); not present in this environment"
        )
    return spark.read.jdbc(
        jdbc_url,
        table,
        predicates=predicates,
        properties={"driver": "org.postgresql.Driver", **(properties or {})},
    )


def stab_postgis(
    spark: SparkSession,
    jdbc_url: str,
    points,
    table: str = "france",
    properties: dict | None = None,
) -> DataFrame:
    """J4: per-point PostGIS stab via pushdown queries — one JDBC
    sub-query per point batch, PostGIS does the containment. The point
    list is bounded at MAX_STAB_POINTS (each point is one UNION ALL
    branch) and the table identifier is validated — batch larger sets
    or use the native dual-cover pip_join instead."""
    if not jdbc_postgres_available(spark):
        raise RuntimeError(
            "PostGIS stab requires the PostgreSQL JDBC driver jar; "
            "use pip_join (the native dual-cover stab) in this environment"
        )
    union_sql = stab_union_sql(points, table)
    reader = (
        spark.read.format("jdbc")
        .option("url", jdbc_url)
        .option("query", union_sql)
    )
    for k, v in (properties or {}).items():
        reader = reader.option(k, v)
    return reader.load()
