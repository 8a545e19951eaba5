"""Streaming sessionization: event stream -> merging session windows
per user with a watermark, via Spark's native `session_window` — the
gap rule the batch `plans/metrics.sessionize` computes with a
window-sum. (The reference has no streaming at all — SURVEY.md §2.9;
this is the brief's 'watermarks + windowed aggs' applied to the
canonical stateful rollup.)

Scale shape: state is one open session per (user, window) in the state
store (RocksDB at corpus scale), merged incrementally per micro-batch;
the watermark closes sessions whose end precedes it and drops their
state, so memory is bounded by ACTIVE users, not history. Append mode
emits each session exactly once, when it can no longer grow.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def session_stream(
    events: DataFrame,
    gap: str = "30 minutes",
    watermark: str = "30 minutes",
    user_col: str = "user_id",
    ts_col: str = "ts",
) -> DataFrame:
    """(user_id, n_events, start_us, end_us, duration_us) per closed
    session — the same output shape (minus session_seq) as the batch
    `sessionize`, so the flushed stream is directly comparable."""
    # watermarks require TIMESTAMP (not NTZ). The NTZ -> TZ cast reads
    # the naive value in the SESSION time zone; run with
    # spark.sql.session.timeZone=UTC (this repo's sessions do) so the
    # epoch micros match the batch path's naive-as-UTC convention.
    e = events.select(
        user_col, F.col(ts_col).cast("timestamp").alias("__ts")
    ).withWatermark("__ts", watermark)
    g = e.groupBy(user_col, F.session_window("__ts", gap)).agg(
        F.count("*").alias("n_events"),
        F.min("__ts").alias("__min_ts"),
        F.max("__ts").alias("__max_ts"),
    )
    start = F.unix_micros(F.col("__min_ts"))
    end = F.unix_micros(F.col("__max_ts"))
    return g.select(
        user_col,
        "n_events",
        start.alias("start_us"),
        end.alias("end_us"),
        (end - start).alias("duration_us"),
    )


def run_session_stream(
    events_stream: DataFrame,
    out_dir: str,
    checkpoint_dir: str,
    gap: str = "30 minutes",
    watermark: str = "30 minutes",
):
    """availableNow append-mode run to parquet; resumable via the
    checkpoint dir (same contract as the tile-count stream)."""
    sess = session_stream(events_stream, gap=gap, watermark=watermark)
    return (
        sess.writeStream.format("parquet")
        .option("path", out_dir)
        .option("checkpointLocation", checkpoint_dir)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
