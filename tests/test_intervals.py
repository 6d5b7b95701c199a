"""Tests for the bucketized range join (ops/intervals.py)."""

from __future__ import annotations

import pytest

from aos_spark.ops.intervals import bucketized_range_join


def _frames(spark):
    points = spark.createDataFrame(
        [(1, 0.0), (2, 5.0), (3, 10.0), (4, 25.0), (5, -3.0)],
        ["pid", "value"],
    )
    intervals = spark.createDataFrame(
        [("a", 0.0, 10.0), ("b", 4.0, 6.0), ("c", 20.0, 30.0)],
        ["iv", "lo", "hi"],
    )
    return points, intervals


def test_range_join_boundaries_inclusive_no_dupes(spark):
    points, intervals = _frames(spark)
    # width much smaller than the intervals: every interval spans many
    # buckets — matches must still be exact and unduplicated
    out = bucketized_range_join(points, intervals, "value", "lo", "hi", 1.0)
    got = sorted((r["pid"], r["iv"]) for r in out.collect())
    assert got == [(1, "a"), (2, "a"), (2, "b"), (3, "a"), (4, "c")]
    # width much larger than the intervals: same result
    out2 = bucketized_range_join(points, intervals, "value", "lo", "hi", 100.0)
    assert sorted((r["pid"], r["iv"]) for r in out2.collect()) == got


def test_range_join_negative_domain(spark):
    spark_points = spark.createDataFrame([(1, -7.5)], ["pid", "value"])
    iv = spark.createDataFrame([("n", -10.0, -5.0)], ["iv", "lo", "hi"])
    out = bucketized_range_join(spark_points, iv, "value", "lo", "hi", 4.0)
    assert [(r["pid"], r["iv"]) for r in out.collect()] == [(1, "n")]


def test_range_join_left_keeps_unmatched(spark):
    points, intervals = _frames(spark)
    out = bucketized_range_join(points, intervals, "value", "lo", "hi", 8.0, how="left")
    rows = {(r["pid"], r["iv"]) for r in out.collect()}
    assert (5, None) in rows  # -3.0 matches nothing
    assert len([p for p, iv in rows if p == 5]) == 1


def test_range_join_validates_width(spark):
    points, intervals = _frames(spark)
    with pytest.raises(ValueError, match="positive"):
        bucketized_range_join(points, intervals, "value", "lo", "hi", 0.0)
