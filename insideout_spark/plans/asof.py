"""As-of join — for each left event, the most recent right row with
rts <= ts for the same key. The canonical time-series join (market
data, telemetry enrichment) that Spark's joins don't express directly
(a range-join would be O(n*m) per key); named in the build brief as a
first-class custom operator.

Implementation (scale-first): the classic union-merge — tag both
streams, sort within each key by (ts, side), and carry the latest
right row forward with last(ignorenulls) over a running window. ONE
shuffle on the key, linear per key, bounded state; no per-key
collect, no range cross join. At 100 TB this is the plan you want: a
single Exchange on user_id and a sort that AQE sizes per partition.

The DuckDB oracle is the engine's NATIVE `ASOF LEFT JOIN` — an
entirely independent implementation of the same semantics, so the
driver gate cross-checks the algorithm, not a mirrored formula.

Determinism: right rows are pre-collapsed to one row per (key, rts)
(max right-id wins), so ties cannot make the match ambiguous in
either engine; on rts == ts the right row matches (inclusive), which
the union-merge realizes by sorting right rows before left rows at
equal timestamps.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

_EPOCH_NTZ = "1970-01-01 00:00:00"


def _ntz_us(col):
    return F.timestamp_diff(
        "MICROSECOND",
        F.lit(_EPOCH_NTZ).cast("timestamp_ntz"),
        col.cast("timestamp_ntz"),
    )


def asof_join(
    left: DataFrame,
    right: DataFrame,
    key_col: str = "user_id",
    ts_col: str = "ts",
    left_id_col: str = "event_id",
    right_id_col: str = "event_id",
    tolerance_us: int | None = None,
) -> DataFrame:
    """(key, left_id, ts_us, right_id, rts_us): latest right row at or
    before each left row's timestamp, per key; right_id/rts_us NULL
    when no right row precedes. Both inputs need (key, id, ts).
    `tolerance_us` (pandas merge_asof-style) nulls a match older than
    the tolerance — the carried state is unchanged, only the emitted
    match is age-gated, so one parameter serves any staleness rule."""
    r = (
        right.select(
            F.col(key_col).alias("k"),
            _ntz_us(F.col(ts_col)).alias("rts_us"),
            F.col(right_id_col).alias("rid"),
        )
        # one row per (key, rts): max id wins — both engines agree
        .groupBy("k", "rts_us")
        .agg(F.max("rid").alias("rid"))
        .select(
            "k",
            F.col("rts_us").alias("ts_us"),
            F.lit(0).alias("side"),
            F.lit(None).cast("long").alias("lid"),
            F.struct(F.col("rts_us"), F.col("rid")).alias("rmatch"),
        )
    )
    l = left.select(
        F.col(key_col).alias("k"),
        _ntz_us(F.col(ts_col)).alias("ts_us"),
        F.lit(1).alias("side"),
        F.col(left_id_col).alias("lid"),
        F.lit(None).cast("struct<rts_us:long,rid:long>").alias("rmatch"),
    )
    u = r.unionByName(l)
    # right (side 0) sorts before left (side 1) at equal ts => inclusive
    w = (
        Window.partitionBy("k")
        .orderBy("ts_us", "side", "lid")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    carried = F.last("rmatch", ignorenulls=True).over(w)
    out = u.withColumn("__m", carried)
    if tolerance_us is not None:
        out = out.withColumn(
            "__m",
            F.when(
                F.col("ts_us") - F.col("__m.rts_us") <= int(tolerance_us),
                F.col("__m"),
            ),
        )
    return (
        out
        .filter(F.col("side") == 1)
        .select(
            F.col("k").alias(key_col),
            F.col("lid").alias("left_id"),
            "ts_us",
            F.col("__m.rid").alias("right_id"),
            F.col("__m.rts_us").alias("rts_us"),
        )
    )


def asof_join_sql(
    left_sql: str,
    right_sql: str,
    key_col: str = "user_id",
    tolerance_us: int | None = None,
) -> str:
    """DuckDB oracle: the engine-native ASOF LEFT JOIN over the same
    (key, id, ts) inputs, with the same (key, rts)->max(id) collapse;
    DuckDB's ASOF has no tolerance clause, so the age gate is an outer
    CASE — a different formulation of the same rule."""
    if tolerance_us is not None:
        return (
            "SELECT "
            f"{key_col}, left_id, ts_us, "
            "CASE WHEN ok THEN right_id END AS right_id, "
            "CASE WHEN ok THEN rts_us END AS rts_us FROM ("
            f"SELECT b.*, b.ts_us - b.rts_us <= {int(tolerance_us)} AS ok "
            f"FROM ({asof_join_sql(left_sql, right_sql, key_col)}) b)"
        )
    return (
        f"WITH l AS (SELECT {key_col} AS k, event_id AS left_id, "
        f"epoch_us(ts) AS ts_us FROM ({left_sql})), "
        f"r AS (SELECT {key_col} AS k, epoch_us(ts) AS rts_us, "
        f"max(event_id) AS rid FROM ({right_sql}) GROUP BY 1, 2) "
        f"SELECT l.k AS {key_col}, l.left_id, l.ts_us, "
        "r.rid AS right_id, r.rts_us "
        "FROM l ASOF LEFT JOIN r ON l.k = r.k AND r.rts_us <= l.ts_us"
    )


def range_join(
    points: DataFrame,
    intervals: DataFrame,
    key_col: str = "user_id",
    bucket_us: int = 600_000_000,
    point_id_col: str = "event_id",
    interval_id_col: str = "interval_id",
) -> DataFrame:
    """Interval containment join (the brief's 'range join'): every
    (point, interval) pair with the same key and start_us <= ts_us <=
    end_us. Inputs: points (key, id, ts_us), intervals (key, id,
    start_us, end_us).

    Scale shape: intervals explode to the fixed-width time buckets they
    cover (sequence/explode in Catalyst — an interval of width W covers
    ceil(W/bucket)+1 buckets), points map to their ONE bucket, and the
    join is a plain equi-join on (key, bucket) + an exact containment
    filter. Because each point has exactly one bucket, a pair can match
    through exactly one exploded row — no duplicates, no dropDuplicates
    shuffle. The alternative (theta join on the inequality) is a
    per-key cross join; this is the standard bucketed rewrite that
    keeps it linear in points + exploded intervals."""
    b = intervals.select(
        F.col(key_col).alias("k"),
        F.col(interval_id_col).alias("interval_id"),
        "start_us",
        "end_us",
        # integer `div`, not float division: a double quotient near a
        # bucket boundary could round across it for other widths
        F.explode(
            F.sequence(
                F.expr(f"start_us div {int(bucket_us)}"),
                F.expr(f"end_us div {int(bucket_us)}"),
            )
        ).alias("bucket"),
    )
    p = points.select(
        F.col(key_col).alias("k"),
        F.col(point_id_col).alias("point_id"),
        "ts_us",
        F.expr(f"ts_us div {int(bucket_us)}").alias("bucket"),
    )
    return (
        p.join(b, ["k", "bucket"])
        .filter(
            (F.col("ts_us") >= F.col("start_us"))
            & (F.col("ts_us") <= F.col("end_us"))
        )
        .select(
            F.col("k").alias(key_col), "point_id", "ts_us", "interval_id", "start_us"
        )
    )


def range_join_sql(
    points_sql: str,
    intervals_sql: str,
    key_col: str = "user_id",
) -> str:
    """DuckDB oracle for range_join: the plain inequality theta join —
    fine at oracle scale, the thing the bucketed rewrite avoids at
    corpus scale. Inputs project (key, point_id, ts_us) and
    (key, interval_id, start_us, end_us)."""
    return (
        f"WITH p AS ({points_sql}), i AS ({intervals_sql}) "
        f"SELECT p.{key_col}, p.point_id, p.ts_us, i.interval_id, i.start_us "
        f"FROM p JOIN i ON p.{key_col} = i.{key_col} "
        "AND p.ts_us BETWEEN i.start_us AND i.end_us"
    )
