"""JVM-side S2 stab keys as Catalyst expressions.

Why: Arrow JVM<->Python transport is a hard throughput ceiling (on this
box it stops scaling past ~8 concurrent streams), so the 10^12-row hot
path must stay inside whole-stage codegen. A full Catalyst S2 cell id
needs the Hilbert lookup rounds (the expression tree blows up), but the
JOIN does not need Hilbert ids — any injective encoding of the ancestor
cell works. An S2 cell at level L is exactly (face, i >> (30-L),
j >> (30-L)), so the stab key is pure bit math over the (face, i, j)
projection:

    key(L) = face<<61 | L<<56 | (i>>s)<<28 | (j>>s)   with s = 30-L

(valid for L <= 28 — cover levels are far below that). The index side
computes the same keys from its uint64 cell ids once at build time
(geo.s2.fij_keys). Cell ids remain the public tile identifiers; only
the join key space changes.

JVM Math trig can differ from numpy by 1 ulp, so i/j may differ in the
last bit for points within ~1e-16 of a cell boundary; at cover levels
(>= 14 bits truncated) this is vanishingly rare and only moves a point
to the adjacent cell of a conservative cover (tested on large samples).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ..geo import s2 as geo_s2


def s2_face_ij_cols(lat_col, lng_col):
    """(face, i, j) Catalyst columns — the S2 quadratic projection
    (geo.s2.latlng_to_cell without the Hilbert step)."""
    lat = F.radians(F.col(lat_col) if isinstance(lat_col, str) else lat_col)
    lng = F.radians(F.col(lng_col) if isinstance(lng_col, str) else lng_col)
    clat = F.cos(lat)
    x = clat * F.cos(lng)
    y = clat * F.sin(lng)
    z = F.sin(lat)
    ax, ay, az = F.abs(x), F.abs(y), F.abs(z)
    axis = F.when((ax >= ay) & (ax >= az), F.lit(0)).when(ay >= az, F.lit(1)).otherwise(F.lit(2))
    comp = F.when(axis == 0, x).when(axis == 1, y).otherwise(z)
    face = F.when(comp >= 0, axis).otherwise(axis + F.lit(3)).cast("long")
    u = (
        F.when(face == 0, y / x)
        .when(face == 1, -x / y)
        .when(face == 2, -x / z)
        .when(face == 3, z / x)
        .when(face == 4, z / y)
        .otherwise(-y / z)
    )
    v = (
        F.when(face == 0, z / x)
        .when(face == 1, z / y)
        .when(face == 2, -y / z)
        .when(face == 3, y / x)
        .when(face == 4, -x / y)
        .otherwise(-x / z)
    )

    def st_ij(uu: Column) -> Column:
        s = F.when(
            uu >= 0,
            F.lit(0.5) * F.sqrt(F.greatest(F.lit(1.0) + F.lit(3.0) * uu, F.lit(0.0))),
        ).otherwise(
            F.lit(1.0)
            - F.lit(0.5) * F.sqrt(F.greatest(F.lit(1.0) - F.lit(3.0) * uu, F.lit(0.0)))
        )
        ij = F.floor(s * F.lit(float(1 << geo_s2.MAX_LEVEL))).cast("long")
        return F.least(
            F.greatest(ij, F.lit(0).cast("long")),
            F.lit((1 << geo_s2.MAX_LEVEL) - 1).cast("long"),
        )

    return face, st_ij(u), st_ij(v)


def fij_key_expr(face: Column, i: Column, j: Column, level: int) -> Column:
    """Stab key of the ancestor at `level` — pure bit math."""
    s = geo_s2.MAX_LEVEL - level
    return (
        F.shiftleft(face, 61)
        .bitwiseOR(F.shiftleft(F.lit(level).cast("long"), 56))
        .bitwiseOR(F.shiftleft(F.shiftrightunsigned(i, s), 28))
        .bitwiseOR(F.shiftrightunsigned(j, s))
    )


def with_fij_keys(
    df: DataFrame, lat_col: str, lng_col: str, min_level: int, max_level: int,
    key_col: str = "fij_key",
) -> DataFrame:
    """Adds an exploded `fij_key` column with the point's ancestor keys
    for every cover level — all whole-stage codegen. The (face,i,j)
    projection is materialized once so the explode array reuses it."""
    face, i, j = s2_face_ij_cols(lat_col, lng_col)
    out = df.withColumn("__s2f", face).withColumn("__s2i", i).withColumn("__s2j", j)
    keys = F.array(
        *[
            fij_key_expr(F.col("__s2f"), F.col("__s2i"), F.col("__s2j"), lv)
            for lv in range(min_level, max_level + 1)
        ]
    )
    return out.withColumn(key_col, F.explode(keys)).drop("__s2f", "__s2i", "__s2j")
