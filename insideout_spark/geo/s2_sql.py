"""ANSI-SQL (DuckDB) generator for S2 cell assignment — the driver's
independent-engine oracle for the S2 kernel.

Generates a full SELECT that recomputes S2 cell ids from lat/lng
entirely inside DuckDB: lat/lng -> xyz -> (face,u,v) -> quadratic ST
-> ij -> per-level Hilbert position, unrolled `level` times. The SQL
is written straight from the published s2geometry algorithm (same
public constants as tests/test_s2_independent.py, derived
independently of the numpy kernel's lookup-table code path), so a
driver hash-match means DuckDB's floating point + this from-spec SQL
agree with insideout_spark/geo/s2.py bit-for-bit on every row
(VERDICT r01 'Next round' #2; reference tools.go:295-310,
storage/bbolt/storage.go:239-258).

Determinism note: cos/sin/radians may differ from numpy by ~1 ulp;
that flips a *level-10* cell only when a point sits within ~1e-16 of
a level-10 ij boundary (probability ~1e-13/point) — safe for the
driver gate. Do not use this oracle at level 30.
"""

from __future__ import annotations

# Published Hilbert traversal constants (see geo/s2.py, public
# s2geometry documentation).
_POS_TO_IJ = ((0, 1, 3, 2), (0, 2, 3, 1), (3, 2, 0, 1), (3, 1, 0, 2))
_POS_TO_ORIENTATION = (1, 0, 0, 3)
_IJ_TO_POS = tuple(tuple(row.index(ij) for ij in range(4)) for row in _POS_TO_IJ)

_TWO61 = 1 << 61
_TWO63 = 1 << 63
_TWO64 = 1 << 64


def s2_assign_sql(
    source_sql: str,
    lat_col: str,
    lng_col: str,
    level: int,
    passthrough: tuple = ("point_id",),
    id_alias: str = "s2_cell",
    token_alias: str | None = None,
) -> str:
    """Full DuckDB SELECT: passthrough columns + signed int64 S2 cell id
    at `level` (+ optional token). `source_sql` is a table name or a
    parenthesized subquery."""
    keep = ", ".join(passthrough)
    q = (
        f"SELECT {keep}, "
        f"COS(RADIANS({lat_col})) * COS(RADIANS({lng_col})) AS x, "
        f"COS(RADIANS({lat_col})) * SIN(RADIANS({lng_col})) AS y, "
        f"SIN(RADIANS({lat_col})) AS z FROM {source_sql}"
    )
    # canonical LargestAbsComponent (strict >, z wins ties), face += 3
    # when the winning component is negative
    q = (
        f"SELECT {keep}, x, y, z, "
        "CASE WHEN ABS(x) > ABS(y) THEN (CASE WHEN ABS(x) > ABS(z) THEN 0 ELSE 2 END) "
        "ELSE (CASE WHEN ABS(y) > ABS(z) THEN 1 ELSE 2 END) END AS axis "
        f"FROM ({q})"
    )
    q = (
        f"SELECT {keep}, x, y, z, "
        "CASE WHEN (CASE axis WHEN 0 THEN x WHEN 1 THEN y ELSE z END) >= 0 "
        "THEN axis ELSE axis + 3 END AS face "
        f"FROM ({q})"
    )
    # published ValidFaceXYZtoUV table
    q = (
        f"SELECT {keep}, face, "
        "CASE face WHEN 0 THEN y/x WHEN 1 THEN -x/y WHEN 2 THEN -x/z "
        "WHEN 3 THEN z/x WHEN 4 THEN z/y ELSE -y/z END AS u, "
        "CASE face WHEN 0 THEN z/x WHEN 1 THEN z/y WHEN 2 THEN -y/z "
        "WHEN 3 THEN y/x WHEN 4 THEN -x/y ELSE -x/z END AS v "
        f"FROM ({q})"
    )
    # quadratic uv -> st, st -> leaf ij (floor == truncation: st >= 0)
    st = (
        "CASE WHEN {w} >= 0 THEN 0.5 * SQRT(1.0 + 3.0 * {w}) "
        "ELSE 1.0 - 0.5 * SQRT(1.0 - 3.0 * {w}) END"
    )
    ij = (
        "LEAST(GREATEST(CAST(FLOOR(({st}) * 1073741824.0) AS BIGINT), 0), "
        "1073741823)"
    )
    q = (
        f"SELECT {keep}, face, "
        f"{ij.format(st=st.format(w='u'))} AS i, "
        f"{ij.format(st=st.format(w='v'))} AS j "
        f"FROM ({q})"
    )
    # Hilbert seed: orientation = face & SWAP_MASK, position = 0
    q = (
        f"SELECT {keep}, face, i, j, CAST(face % 2 AS BIGINT) AS o, "
        f"CAST(0 AS BIGINT) AS p FROM ({q})"
    )
    sp_cases = " ".join(
        f"WHEN {o * 4 + ij_} THEN {_IJ_TO_POS[o][ij_]}"
        for o in range(4)
        for ij_ in range(4)
    )
    for k in range(level):
        shift = 29 - k
        q = (
            f"SELECT {keep}, face, i, j, o, p, "
            f"CASE o * 4 + ((i >> {shift}) & 1) * 2 + ((j >> {shift}) & 1) "
            f"{sp_cases} END AS sp FROM ({q})"
        )
        q = (
            f"SELECT {keep}, face, i, j, "
            "xor(o, CASE sp WHEN 0 THEN 1 WHEN 3 THEN 3 ELSE 0 END) AS o, "
            f"p * 4 + sp AS p FROM ({q})"
        )
    # id = face<<61 | pos<<(2*(30-level)+1) | 1<<(2*(30-level)), built in
    # HUGEINT (face >= 4 overflows a signed BIGINT shift), reinterpreted
    # as the signed int64 Spark stores
    lsb = 1 << (2 * (30 - level))
    q = (
        f"SELECT {keep}, CAST(face AS HUGEINT) * {_TWO61} "
        f"+ CAST(p AS HUGEINT) * {lsb * 2} + {lsb} AS uid FROM ({q})"
    )
    sel = (
        f"CAST(CASE WHEN uid >= {_TWO63} THEN uid - {_TWO64} ELSE uid END "
        f"AS BIGINT) AS {id_alias}"
    )
    q = f"SELECT {keep}, {sel} FROM ({q})"
    if token_alias:
        q = (
            f"SELECT {keep}, {id_alias}, "
            f"LOWER(RTRIM(LPAD(TO_HEX({id_alias}), 16, '0'), '0')) "
            f"AS {token_alias} FROM ({q})"
        )
    return q
