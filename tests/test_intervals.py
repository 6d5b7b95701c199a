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


def test_interval_overlap_join_exact_and_dedup(spark):
    """Overlap semantics are half-open and each overlapping pair appears
    exactly ONCE even when it spans many shared buckets."""
    from aos_spark.ops.intervals import interval_overlap_join

    a = spark.createDataFrame(
        [(1, 0.0, 100.0), (2, 200.0, 210.0), (3, 500.0, 501.0)],
        ["a_id", "s", "e"],
    )
    b = spark.createDataFrame(
        [(10, 50.0, 150.0),   # overlaps a1 across many 16-wide buckets
         (20, 100.0, 120.0),  # touches a1 only at the boundary: NO overlap
         (30, 205.0, 206.0),  # inside a2
         (40, 600.0, 700.0)],
        ["b_id", "s2", "e2"],
    )
    got = sorted(
        (r["a_id"], r["b_id"])
        for r in interval_overlap_join(a, b, "s", "e", "s2", "e2", 16.0).collect()
    )
    assert got == [(1, 10), (2, 30)]


def test_interval_overlap_join_matches_naive(spark):
    """Bucketized result must equal the naive cross-filter on random-ish
    deterministic intervals, for an awkward bucket width."""
    from pyspark.sql import functions as F

    from aos_spark.ops.intervals import interval_overlap_join

    a = spark.range(200).select(
        F.col("id").alias("a_id"),
        (F.col("id") * 7 % 500).cast("double").alias("s"),
        ((F.col("id") * 7 % 500) + (F.col("id") % 40) + 1).cast("double").alias("e"),
    )
    b = spark.range(150).select(
        F.col("id").alias("b_id"),
        (F.col("id") * 11 % 480).cast("double").alias("s2"),
        ((F.col("id") * 11 % 480) + (F.col("id") % 25) + 1).cast("double").alias("e2"),
    )
    fast = {
        (r["a_id"], r["b_id"])
        for r in interval_overlap_join(a, b, "s", "e", "s2", "e2", 13.0).collect()
    }
    naive = {
        (r["a_id"], r["b_id"])
        for r in a.crossJoin(b)
        .filter((F.col("s") < F.col("e2")) & (F.col("s2") < F.col("e")))
        .collect()
    }
    assert fast == naive


def test_interval_overlap_join_keyed(spark):
    """With a key, overlaps only pair within the same key group."""
    from aos_spark.ops.intervals import interval_overlap_join

    import pyspark.sql.functions as F

    a = spark.createDataFrame(
        [(1, "u1", 0.0, 10.0), (2, "u2", 0.0, 10.0)], ["rid", "u", "s", "e"]
    )
    rows = interval_overlap_join(a, a, "s", "e", "s", "e", 4.0, by=["u"])
    # each row overlaps itself within its key; never across keys
    assert rows.count() == 2
    assert rows.filter(F.col("a.u") == F.col("b.u")).count() == 2


def test_range_join_left_null_cell_rows_not_duplicated(spark):
    """r9 review: the 'left' rebuild anti-joined on plain column
    equality, so a MATCHED point row with a NULL in any column failed
    the anti-match and was re-emitted as unmatched — one input row
    yielding two output rows. The anti join is now null-safe."""
    from pyspark.sql.types import (
        DoubleType, LongType, StringType, StructField, StructType,
    )

    points = spark.createDataFrame(
        [(1, 5.0, None), (2, -3.0, None)],
        StructType([
            StructField("pid", LongType()),
            StructField("value", DoubleType()),
            StructField("note", StringType()),
        ]),
    )
    intervals = spark.createDataFrame(
        [("a", 4.0, 6.0)], ["iv", "lo", "hi"]
    )
    out = bucketized_range_join(
        points, intervals, "value", "lo", "hi", 8.0, how="left"
    ).collect()
    got = sorted((r["pid"], r["iv"]) for r in out)
    # pid 1 matched (exactly once), pid 2 unmatched (exactly once)
    assert got == [(1, "a"), (2, None)]


def test_range_join_rejects_shared_column_names(spark):
    """Shared names make the points ⋈ intervals output ambiguous (and
    crashed the 'left' rebuild with an AnalysisException pre-r9) — the
    operator now fails loud up front."""
    points = spark.createDataFrame([(1, 5.0)], ["pid", "value"])
    intervals = spark.createDataFrame(
        [("a", 4.0, 6.0, "x")], ["iv", "lo", "hi", "pid"]
    )
    with pytest.raises(ValueError, match="share column names"):
        bucketized_range_join(points, intervals, "value", "lo", "hi", 8.0)
