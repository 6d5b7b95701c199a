"""Null-semantics property tests (SURVEY.md §5.3) — the most
regression-prone semantic in the reference: NaN/NULL = "no data",
0 = "confirmed zero" (impact_analysis.py:152-159, reports.py:29-40).
"""

import math

from pyspark.sql import functions as F

from aos_spark.ops import rollup


def test_optional_sum_stays_null_on_all_null(spark):
    df = spark.createDataFrame(
        [("r1", None), ("r1", None), ("r2", 3.0), ("r2", None)],
        "region string, num_schools double",
    )
    out = rollup.agg_with_null_contract(
        df, ["region"], optional_sum_cols=["num_schools"]
    ).collect()
    by_region = {r["region"]: r["num_schools"] for r in out}
    assert by_region["r1"] is None  # all-NULL → NULL, never 0
    assert by_region["r2"] == 3.0


def test_non_optional_sum_zero_fills(spark):
    df = spark.createDataFrame(
        [("r1", None), ("r2", 5.0)], "region string, population double"
    )
    out = rollup.agg_with_null_contract(df, ["region"], sum_cols=["population"]).collect()
    by_region = {r["region"]: r["population"] for r in out}
    assert by_region["r1"] == 0.0  # non-optional all-NULL → 0 (pandas .sum() parity)
    assert by_region["r2"] == 5.0


def test_empty_region_preservation(spark):
    skeleton = spark.createDataFrame([("a",), ("b",), ("empty",)], "id string")
    agg = spark.createDataFrame(
        [("a", 1.0, 2.0), ("b", 3.0, None)], "id string, population double, num_schools double"
    )
    out = rollup.rollup_preserving_empty(skeleton, agg, ["id"], ["population"]).collect()
    rows = {r["id"]: r for r in out}
    assert len(rows) == 3  # empty region still present
    assert rows["empty"]["population"] == 0.0  # non-optional zero-filled
    assert rows["empty"]["num_schools"] is None  # optional stays NULL
    assert rows["b"]["num_schools"] is None


def test_expected_impact_null_propagation(spark):
    from aos_spark.ops import probability

    df = spark.createDataFrame(
        [("t1", 0.5, None), ("t2", 0.5, 10.0), ("t3", 0.0, 10.0)],
        "tile_id string, probability double, rwi double",
    )
    out = probability.expected_impact(df, ["rwi"], keep=["tile_id"]).collect()
    rows = {r["tile_id"]: r["E_rwi"] for r in out}
    assert rows["t1"] is None  # NULL × p = NULL (pandas NaN parity)
    assert rows["t2"] == 5.0
    assert rows["t3"] == 0.0
