"""Streaming sessionization: append-mode session_window flush must
equal the batch sessionize on the same events once the watermark
passes every session (same comparison contract as the tile stream)."""

import datetime as dt

from insideout_spark.plans.metrics import sessionize_native
from insideout_spark.streaming.sessions import run_session_stream

SCHEMA = "event_id long, ts timestamp_ntz, user_id long"


def _events(spark):
    base = dt.datetime(2024, 1, 1)
    rows = []
    eid = 0
    for u in range(6):
        # two sessions per user: a burst at +0..+8 min, another at +90
        for m in (0, 3, 8, 90, 95):
            rows.append((eid, base + dt.timedelta(minutes=m + u), u))
            eid += 1
    return spark.createDataFrame(rows, SCHEMA)


def test_streaming_sessions_match_batch(spark, tmp_path):
    in_dir = str(tmp_path / "in")
    out_dir = str(tmp_path / "out")
    ck_dir = str(tmp_path / "ck")
    ev = _events(spark)
    ev.write.parquet(in_dir)

    stream = spark.readStream.schema(SCHEMA).parquet(in_dir)
    q = run_session_stream(stream, out_dir, ck_dir)
    q.awaitTermination(180)

    # a far-future event pushes the watermark past every session above
    far = spark.createDataFrame(
        [(999, dt.datetime(2024, 1, 3), 0)], SCHEMA
    )
    far.write.mode("append").parquet(in_dir)
    stream2 = spark.readStream.schema(SCHEMA).parquet(in_dir)
    q2 = run_session_stream(stream2, out_dir, ck_dir)
    q2.awaitTermination(180)

    got = {
        (r["user_id"], r["start_us"]): (r["n_events"], r["end_us"], r["duration_us"])
        for r in spark.read.parquet(out_dir).collect()
    }
    want = {
        (r["user_id"], r["start_us"]): (r["n_events"], r["end_us"], r["duration_us"])
        for r in sessionize_native(ev).collect()
    }
    # every original session flushed and exact (the far-future event's
    # own session may or may not have flushed — exclude it)
    for k, v in want.items():
        assert got.get(k) == v, (k, v, got.get(k))
    assert len(want) == 12  # 6 users x 2 sessions


def test_streaming_sessions_late_event_merges(spark, tmp_path):
    """An out-of-order event arriving in a LATER micro-batch (but within
    the watermark) must merge into its session before the flush — the
    late-data semantics the watermark exists for."""
    in_dir = str(tmp_path / "in")
    out_dir = str(tmp_path / "out")
    ck_dir = str(tmp_path / "ck")
    base = dt.datetime(2024, 1, 1)

    first = spark.createDataFrame(
        [(0, base, 1), (1, base + dt.timedelta(minutes=10), 1)], SCHEMA
    )
    first.write.parquet(in_dir)
    q = run_session_stream(
        spark.readStream.schema(SCHEMA).parquet(in_dir), out_dir, ck_dir
    )
    q.awaitTermination(180)

    # batch 2: a LATE event at +5 min (inside the open session, older
    # than the stream's max ts) plus a far-future event to flush
    late = spark.createDataFrame(
        [(2, base + dt.timedelta(minutes=5), 1), (9, dt.datetime(2024, 1, 3), 7)],
        SCHEMA,
    )
    late.write.mode("append").parquet(in_dir)
    q2 = run_session_stream(
        spark.readStream.schema(SCHEMA).parquet(in_dir), out_dir, ck_dir
    )
    q2.awaitTermination(180)

    rows = [r for r in spark.read.parquet(out_dir).collect() if r["user_id"] == 1]
    assert len(rows) == 1
    assert rows[0]["n_events"] == 3  # the late event merged
    assert rows[0]["duration_us"] == 10 * 60_000_000
