"""Tests for the count-min sketch (ops/sketches.py)."""

from __future__ import annotations

from pyspark.sql import functions as F

from aos_spark.ops import sketches


def _skewed(spark):
    # one hot key (600 rows), many cold keys (2 rows each)
    hot = spark.range(600).select(F.lit("hot").alias("k"))
    cold = spark.range(200).select(F.concat(F.lit("c"), (F.col("id") % 100)).alias("k"))
    return hot.unionAll(cold)


def test_cms_never_undercounts(spark):
    df = _skewed(spark)
    exact = {r["k"]: r["n"] for r in df.groupBy("k").agg(F.count(F.lit(1)).alias("n")).collect()}
    sk = sketches.cms_build(df, "k")
    est = {
        r["k"]: r["est_count"]
        for r in sketches.cms_estimate(sk, df.select("k").distinct(), "k").collect()
    }
    assert set(est) == set(exact)
    for k, n in exact.items():
        assert est[k] >= n  # collisions only ever ADD


def test_cms_overcount_bounded(spark):
    df = _skewed(spark)
    n_total = df.count()
    exact = {r["k"]: r["n"] for r in df.groupBy("k").agg(F.count(F.lit(1)).alias("n")).collect()}
    sk = sketches.cms_build(df, "k")
    est = {
        r["k"]: r["est_count"]
        for r in sketches.cms_estimate(sk, df.select("k").distinct(), "k").collect()
    }
    # e*N/w bound (w=64) holds with overwhelming probability for d=4
    bound = 3 * n_total / sketches.DEFAULT_WIDTH
    assert all(est[k] - exact[k] <= bound for k in exact)


def test_hot_keys_finds_the_hot_key(spark):
    df = _skewed(spark)
    hot = sketches.hot_keys(df, "k", threshold=300)
    keys = [r["k"] for r in hot.collect()]
    assert "hot" in keys
    # threshold + overcount bound: no cold key (2 rows) can clear 300
    assert keys == ["hot"]


def test_sketch_size_is_bounded(spark):
    df = _skewed(spark)
    sk = sketches.cms_build(df, "k")
    assert sk.count() <= sketches.DEFAULT_DEPTH * sketches.DEFAULT_WIDTH
