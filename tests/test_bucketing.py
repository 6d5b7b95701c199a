"""Bucketed co-located join: the write-once-shuffle-never pattern that the
100 TB deployment uses for repeatedly-joined fact tables."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from aos_spark.io.readers import read_sf_table
from aos_spark.io.writers import write_bucketed

SF_DIR = "/root/testdata/sf0.001"


def test_bucketed_join_has_no_exchange(spark):
    li = read_sf_table(spark, SF_DIR, "lineitem")
    o = read_sf_table(spark, SF_DIR, "orders")
    write_bucketed(li.select("l_orderkey", "l_quantity"), "b_lineitem", ["l_orderkey"], 8)
    write_bucketed(
        o.select("o_orderkey", "o_totalprice"), "b_orders", ["o_orderkey"], 8
    )
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try:
        # force a non-broadcast join so the shuffle (or its absence) shows
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        bl = spark.table("b_lineitem")
        bo = spark.table("b_orders")
        joined = bl.join(bo, bl.l_orderkey == bo.o_orderkey)
        plan = joined._jdf.queryExecution().executedPlan().toString()
        assert "SortMergeJoin" in plan
        assert "Exchange" not in plan, plan  # co-located: no shuffle at all
        # and it computes the right thing
        expected = (
            li.select("l_orderkey")
            .join(o, li.l_orderkey == o.o_orderkey)
            .count()
        )
        assert joined.count() == expected
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
        spark.sql("DROP TABLE IF EXISTS b_lineitem")
        spark.sql("DROP TABLE IF EXISTS b_orders")
