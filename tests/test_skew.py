"""Salted-rewrite equivalence tests: the skew helpers must produce exactly
the unsalted results."""

from __future__ import annotations

from pyspark.sql import functions as F

from aos_spark.io.readers import read_sf_table
from aos_spark.ops import skew

SF_DIR = "/root/testdata/sf0.001"


def test_salted_distinct_count_matches_exact(spark):
    ev = read_sf_table(spark, SF_DIR, "events")
    exact = {
        (r["event_type"],): r["n"]
        for r in ev.groupBy("event_type")
        .agg(F.countDistinct("user_id").alias("n"))
        .collect()
    }
    salted = {
        (r["event_type"],): r["n_distinct"]
        for r in skew.salted_distinct_count(ev, ["event_type"], "user_id", n_salts=8).collect()
    }
    assert salted == exact


def test_salted_join_matches_plain(spark):
    li = read_sf_table(spark, SF_DIR, "lineitem").select("l_orderkey", "l_quantity")
    o = read_sf_table(spark, SF_DIR, "orders").select(
        F.col("o_orderkey").alias("l_orderkey"), "o_totalprice"
    )
    plain = (
        li.join(o, "l_orderkey")
        .groupBy("l_orderkey")
        .agg(F.count(F.lit(1)).alias("n"), F.sum("l_quantity").alias("q"))
    )
    salted = (
        skew.salted_join(li, o, "l_orderkey", n_salts=4)
        .groupBy("l_orderkey")
        .agg(F.count(F.lit(1)).alias("n"), F.sum("l_quantity").alias("q"))
    )
    a = {r["l_orderkey"]: (r["n"], r["q"]) for r in plain.collect()}
    b = {r["l_orderkey"]: (r["n"], r["q"]) for r in salted.collect()}
    assert a == b


def test_salted_distinct_excludes_nulls_and_join_rejects_outer(spark):
    """r9 review: NULL counted as a distinct value (COUNT(DISTINCT x)
    excludes it); right/full salted joins replicate unmatched small rows
    once per salt and are now rejected."""
    import pytest

    from aos_spark.ops.skew import salted_distinct_count, salted_join

    df = spark.createDataFrame(
        [("k1", None), ("k1", "a"), ("k1", "a")], "k string, v string"
    )
    got = salted_distinct_count(df, ["k"], "v").collect()[0]["n_distinct"]
    assert got == 1  # pre-fix: 2

    big = spark.createDataFrame([("k1", 1)], "k string, x int")
    small = spark.createDataFrame([("k2", 9)], "k string, y int")
    with pytest.raises(ValueError, match="inner"):
        salted_join(big, small, "k", how="full")
