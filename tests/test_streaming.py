"""Streaming-tier tests: availableNow drain, checkpointed incremental
re-run (the F11 analog), and the foreachBatch impact bridge."""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from aos_spark.streaming import jobs as sjobs

SF_DIR = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def dirs(tmp_path_factory):
    root = tmp_path_factory.mktemp("stream")
    d = {
        "input": str(root / "input"),
        "out": str(root / "out"),
        "ckpt": str(root / "ckpt"),
        "ckpt2": str(root / "ckpt2"),
    }
    os.makedirs(d["input"])
    return d


def _drop_batch(spark, dirs, day: str, tag: str) -> int:
    """Write one day's events as a new parquet drop; returns row count."""
    from aos_spark.io.readers import read_sf_table

    ev = read_sf_table(spark, SF_DIR, "events").filter(F.to_date("ts") == day)
    ev.coalesce(1).write.parquet(os.path.join(dirs["input"], tag))
    return ev.count()


def test_available_now_drains_and_incremental_rerun(spark, dirs):
    n1 = _drop_batch(spark, dirs, "2024-01-10", "drop1")
    assert n1 > 0
    agg = sjobs.windowed_member_counts(
        sjobs.read_event_stream(spark, dirs["input"] + "/*")
    )
    sjobs.run_available_now(agg, dirs["out"], dirs["ckpt"])
    out1 = spark.read.parquet(dirs["out"])
    c1 = out1.count()
    assert c1 > 0
    assert set(out1.columns) == {
        "window_start", "window_end", "user_id", "n_members", "total_value",
    }

    # second drop: checkpoint makes the re-run incremental — only new data
    # is processed, previously emitted windows are not duplicated
    n2 = _drop_batch(spark, dirs, "2024-01-11", "drop2")
    assert n2 > 0
    sjobs.run_available_now(agg, dirs["out"], dirs["ckpt"])
    out2 = spark.read.parquet(dirs["out"])
    assert out2.count() > c1
    dup = (
        out2.groupBy("window_start", "user_id")
        .count()
        .filter(F.col("count") > 1)
        .count()
    )
    assert dup == 0


def test_foreach_batch_bridge(spark, dirs):
    """Each micro-batch reaches the batch callback exactly once across
    checkpointed re-runs."""
    calls: list[tuple[int, int]] = []

    def batch_fn(df, batch_id, warehouse):
        calls.append((batch_id, df.count()))

    sjobs.run_foreach_batch_impact(
        spark, dirs["input"] + "/*", "unused", dirs["ckpt2"], batch_fn
    )
    assert sum(n for _, n in calls) > 0
    total_first = sum(n for _, n in calls)

    # immediate re-run with the same checkpoint: nothing new → no calls
    calls.clear()
    sjobs.run_foreach_batch_impact(
        spark, dirs["input"] + "/*", "unused", dirs["ckpt2"], batch_fn
    )
    assert sum(n for _, n in calls) == 0, f"reprocessed {calls}"
    assert total_first > 0
