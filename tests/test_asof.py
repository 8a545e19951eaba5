"""As-of join: hand-checked matches (inclusive ties, no-match nulls,
per-key isolation) + the single-shuffle plan contract."""

import datetime as dt

from insideout_spark.plans.asof import asof_join


def _t(minutes, us=0):
    return dt.datetime(2024, 1, 1) + dt.timedelta(minutes=minutes, microseconds=us)


SCHEMA = "event_id long, ts timestamp_ntz, user_id long"


def test_asof_join_semantics(spark):
    left = spark.createDataFrame(
        [
            (100, _t(10), 1),  # matches rid 2 (ts 5 < 10)
            (101, _t(5), 1),   # tie: right at exactly 5 matches (inclusive)
            (102, _t(1), 1),   # before any right row -> NULL
            (103, _t(10), 2),  # other key: only key-2 rights considered
        ],
        SCHEMA,
    )
    right = spark.createDataFrame(
        [
            (1, _t(3), 1),
            (2, _t(5), 1),
            (3, _t(5), 1),   # duplicate (key, ts): max id (3) wins
            (4, _t(20), 1),  # later than every left row -> never matches
            (5, _t(9), 2),
        ],
        SCHEMA,
    )
    got = {
        r["left_id"]: (r["right_id"], r["rts_us"])
        for r in asof_join(left, right).collect()
    }
    base = int(dt.datetime(2024, 1, 1, tzinfo=dt.timezone.utc).timestamp()) * 1_000_000
    m5 = base + 5 * 60_000_000
    assert got[100] == (3, m5)
    assert got[101] == (3, m5)
    assert got[102] == (None, None)
    assert got[103] == (5, base + 9 * 60_000_000)


def test_asof_join_single_shuffle(spark):
    df = spark.createDataFrame([(0, _t(0), 1)], SCHEMA)
    plan = asof_join(df, df)._jdf.queryExecution().executedPlan().toString()
    assert plan.count("Exchange") <= 2  # right-side pre-collapse + key window


def test_range_join_bucket_boundaries(spark):
    """Bucketed range join vs a brute containment check, with intervals
    spanning bucket boundaries and multiple overlapping windows."""
    from insideout_spark.plans.asof import range_join

    b = 600_000_000  # 10-min buckets
    pts = [(i, 1, i * 97_000_000) for i in range(80)]  # every 97 s
    ivs = [
        (1000, 1, 100_000_000, 100_000_000 + b),       # spans 2 buckets
        (1001, 1, 3 * b - 1, 3 * b + 1),               # straddles boundary
        (1002, 1, 5 * b, 5 * b),                       # zero-width
        (1003, 2, 0, 10 * b),                          # other key: no points
    ]
    p = spark.createDataFrame(pts, "event_id long, user_id long, ts_us long")
    iv = spark.createDataFrame(
        ivs, "interval_id long, user_id long, start_us long, end_us long"
    )
    got = {
        (r["point_id"], r["interval_id"])
        for r in range_join(p, iv, bucket_us=b).collect()
    }
    want = {
        (pid, vid)
        for (pid, k, ts) in pts
        for (vid, vk, s, e) in ivs
        if k == vk and s <= ts <= e
    }
    assert got == want and len(want) > 0


def test_asof_join_tolerance_nulls_stale_matches(spark):
    """merge_asof-style tolerance: a match older than the tolerance
    nulls out; fresh matches are untouched."""
    left = spark.createDataFrame([(100, _t(60), 1), (101, _t(6), 1)], SCHEMA)
    right = spark.createDataFrame([(1, _t(5), 1)], SCHEMA)
    got = {
        r["left_id"]: (r["right_id"], r["rts_us"])
        for r in asof_join(left, right, tolerance_us=10 * 60_000_000).collect()
    }
    base = int(dt.datetime(2024, 1, 1, tzinfo=dt.timezone.utc).timestamp()) * 1_000_000
    assert got[100] == (None, None)          # 55 min stale -> nulled
    assert got[101] == (1, base + 5 * 60_000_000)  # 1 min: kept
