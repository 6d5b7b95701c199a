"""Tests for the as-of join (ops/asof.py) — union-and-carry formulation."""

from __future__ import annotations

from datetime import datetime

from aos_spark.ops.asof import asof_join


def _ts(s):
    return datetime.fromisoformat(s)


def _frames(spark):
    left = spark.createDataFrame(
        [
            (1, 100, _ts("2024-01-01 10:00:00")),
            (2, 100, _ts("2024-01-01 12:00:00")),
            (3, 100, _ts("2024-01-01 09:00:00")),  # before any right row
            (4, 200, _ts("2024-01-01 10:30:00")),
        ],
        ["event_id", "user_id", "ts"],
    )
    right = spark.createDataFrame(
        [
            (100, _ts("2024-01-01 10:00:00"), 1.0),  # tie with event 1
            (100, _ts("2024-01-01 11:00:00"), 2.0),
            (200, _ts("2024-01-01 08:00:00"), 9.0),
        ],
        ["user_id", "ts", "signal"],
    )
    return left, right


def test_asof_backward_inclusive_and_nomatch(spark):
    left, right = _frames(spark)
    out = {
        r["event_id"]: (r["signal"], r["asof_ts"])
        for r in asof_join(left, right, value_cols=["signal"]).collect()
    }
    assert out[1][0] == 1.0  # equal timestamp matches (inclusive)
    assert out[2][0] == 2.0  # most recent, not first
    assert out[3] == (None, None)  # nothing at-or-before
    assert out[4][0] == 9.0
    assert out[1][1] == _ts("2024-01-01 10:00:00")


def test_asof_tolerance(spark):
    left, right = _frames(spark)
    out = {
        r["event_id"]: r["signal"]
        for r in asof_join(
            left, right, value_cols=["signal"], tolerance_seconds=3600
        ).collect()
    }
    assert out[1] == 1.0  # 0 s old
    assert out[2] == 2.0  # 1 h old, at the horizon
    assert out[4] is None  # 2.5 h old signal nulled by tolerance


def test_asof_keeps_all_left_rows(spark):
    left, right = _frames(spark)
    assert asof_join(left, right, value_cols=["signal"]).count() == left.count()


def test_asof_forward_direction(spark):
    left, right = _frames(spark)
    out = {
        r["event_id"]: (r["signal"], r["asof_ts"])
        for r in asof_join(
            left, right, value_cols=["signal"], direction="forward"
        ).collect()
    }
    assert out[1][0] == 1.0  # equal timestamp still matches (inclusive)
    assert out[2] == (None, None)  # nothing at-or-after 12:00
    assert out[3][0] == 1.0  # earliest future right row (10:00)
    assert out[4] == (None, None)  # user 200 has no future row


def test_asof_nearest_prefers_closer_and_ties_backward(spark):
    left, right = _frames(spark)
    out = {
        r["event_id"]: r["signal"]
        for r in asof_join(
            left, right, value_cols=["signal"], direction="nearest"
        ).collect()
    }
    assert out[1] == 1.0   # exact tie on the same timestamp
    assert out[2] == 2.0   # only a past row exists
    assert out[3] == 1.0   # only a future row exists → forward fills
    assert out[4] == 9.0   # only a past row exists
    # a row exactly between two right rows must tie BACKWARD
    mid_left = spark.createDataFrame(
        [(9, 100, _ts("2024-01-01 10:30:00"))], ["event_id", "user_id", "ts"]
    )
    _, right2 = _frames(spark)
    got = asof_join(
        mid_left, right2, value_cols=["signal"], direction="nearest"
    ).collect()[0]
    assert got["signal"] == 1.0  # 30 min back vs 30 min forward → backward


def test_asof_forward_tolerance(spark):
    left, right = _frames(spark)
    out = {
        r["event_id"]: r["signal"]
        for r in asof_join(
            left, right, value_cols=["signal"], direction="forward",
            tolerance_seconds=1800,
        ).collect()
    }
    assert out[3] is None  # 09:00 → 10:00 is 1 h, outside the 30 min horizon
    assert out[1] == 1.0


def test_asof_nearest_subsecond_precision(spark):
    """unix_timestamp truncation regression (ADVICE r4): with deltas of
    0.2 s back vs 0.9 s forward inside the same second, whole-second
    epochs compare equal and `nearest` could pick the farther (forward)
    side. Sub-second epochs must pick the 0.2 s-away backward row."""
    left = spark.createDataFrame(
        [(1, 100, _ts("2024-01-01 10:00:01.200"))],
        ["event_id", "user_id", "ts"],
    )
    right = spark.createDataFrame(
        [
            (100, _ts("2024-01-01 10:00:01.000"), 1.0),  # 0.2 s before
            (100, _ts("2024-01-01 10:00:02.100"), 2.0),  # 0.9 s after
        ],
        ["user_id", "ts", "signal"],
    )
    out = asof_join(
        left, right, value_cols=["signal"], direction="nearest"
    ).collect()
    assert out[0]["signal"] == 1.0
    assert out[0]["asof_ts"] == _ts("2024-01-01 10:00:01.000")


def test_asof_tolerance_subsecond_boundary(spark):
    """tolerance_seconds must compare at sub-second precision: a match
    1.4 s away is OUTSIDE tolerance=1 even though the whole-second delta
    truncates to 1."""
    left = spark.createDataFrame(
        [(1, 100, _ts("2024-01-01 10:00:02.400"))],
        ["event_id", "user_id", "ts"],
    )
    right = spark.createDataFrame(
        [(100, _ts("2024-01-01 10:00:01.000"), 1.0)],
        ["user_id", "ts", "signal"],
    )
    out = asof_join(
        left, right, value_cols=["signal"], tolerance_seconds=1
    ).collect()
    assert out[0]["signal"] is None  # 1.4 s > 1 s horizon


def test_asof_null_value_rows_match_atomically(spark):
    """A matched right row whose VALUE is NULL must yield that row's NULL
    (pandas merge_asof / DuckDB ASOF semantics), not a stale value from
    an earlier row. The r9 review found the per-column last(_, True)
    carries skipped the NULL and paired the matched timestamp with a
    value from outside the tolerance horizon."""
    from pyspark.sql.types import (
        DoubleType, LongType, StructField, StructType, TimestampType,
    )

    left = spark.createDataFrame(
        [(1, 100, _ts("2024-01-01 10:31:00"))], ["event_id", "user_id", "ts"]
    )
    right = spark.createDataFrame(
        [
            (100, _ts("2024-01-01 10:00:00"), 5.0),
            (100, _ts("2024-01-01 10:30:00"), None),
        ],
        StructType([
            StructField("user_id", LongType()),
            StructField("ts", TimestampType()),
            StructField("signal", DoubleType()),
        ]),
    )
    # backward, tolerance 120 s: the 10:30 row matches (61 s away); its
    # value is NULL — the 10:00 row (91 min away) must NOT leak through
    row = asof_join(
        left, right, value_cols=["signal"], tolerance_seconds=120
    ).collect()[0]
    assert row["asof_ts"] == _ts("2024-01-01 10:30:00")
    assert row["signal"] is None

    # nearest direction: same atomicity on both carries
    row_n = asof_join(
        left, right, value_cols=["signal"], direction="nearest"
    ).collect()[0]
    assert row_n["asof_ts"] == _ts("2024-01-01 10:30:00")
    assert row_n["signal"] is None
