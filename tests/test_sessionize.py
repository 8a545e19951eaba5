"""Gap-based sessionization: hand-checked session boundaries + the
one-shuffle plan contract (both windows and the aggregation must reuse
the user_id partitioning)."""

import datetime as dt

from insideout_spark.plans.metrics import sessionize


def _t(minutes):
    return dt.datetime(2024, 1, 1) + dt.timedelta(minutes=minutes)


def test_sessionize_boundaries(spark):
    rows = [
        # user 1: events at 0, 10, 20 -> one session; 60 -> gap 40 > 30
        (0, _t(0), 1), (1, _t(10), 1), (2, _t(20), 1), (3, _t(60), 1),
        # exactly-30-minute gap is NOT a new session (strict >)
        (4, _t(0), 2), (5, _t(30), 2),
        # 30 min + 1 us IS a new session
        (6, _t(0), 3), (7, _t(30) + dt.timedelta(microseconds=1), 3),
    ]
    df = spark.createDataFrame(rows, "event_id long, ts timestamp_ntz, user_id long")
    got = {
        (r["user_id"], r["session_seq"]): (r["n_events"], r["duration_us"])
        for r in sessionize(df).collect()
    }
    assert got[(1, 1)] == (3, 20 * 60_000_000)
    assert got[(1, 2)] == (1, 0)
    assert got[(2, 1)] == (2, 30 * 60_000_000)
    assert got[(3, 1)] == (1, 0)
    assert got[(3, 2)] == (1, 0)
    assert len(got) == 5


def test_sessionize_single_shuffle(spark):
    df = spark.createDataFrame(
        [(0, _t(0), 1)], "event_id long, ts timestamp_ntz, user_id long"
    )
    plan = sessionize(df)._jdf.queryExecution().executedPlan().toString()
    assert plan.count("Exchange") == 1


def test_sessionize_native_matches_boundary(spark):
    """session_window merges at EXACTLY gap distance (inclusive) — the
    same strict-> rule as the window-sum path — and splits one
    microsecond past it. This pins the empirically-verified boundary
    the sessionize_native oracle relies on."""
    from insideout_spark.plans.metrics import sessionize_native

    at_gap = spark.createDataFrame(
        [(0, _t(0), 1), (1, _t(30), 1)],
        "event_id long, ts timestamp_ntz, user_id long",
    )
    past_gap = spark.createDataFrame(
        [(0, _t(0), 1), (1, _t(30) + dt.timedelta(microseconds=1), 1)],
        "event_id long, ts timestamp_ntz, user_id long",
    )
    assert [r["n_events"] for r in sessionize_native(at_gap).collect()] == [2]
    assert len(sessionize_native(past_gap).collect()) == 2
    # and the two implementations agree on both inputs
    for df in (at_gap, past_gap):
        a = sorted(
            (r["user_id"], r["n_events"], r["start_us"], r["end_us"], r["duration_us"])
            for r in sessionize_native(df).collect()
        )
        b = sorted(
            (r["user_id"], r["n_events"], r["start_us"], r["end_us"], r["duration_us"])
            for r in sessionize(df).collect()
        )
        assert a == b
