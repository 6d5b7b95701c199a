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
