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


def test_native_session_window_matches_batch_sessionize(spark):
    """F.session_window (native gap-merge aggregation) must agree with the
    batch window formulation ops/windows.sessionize on the same events:
    same session count per user, same starts, and native end == batch
    session_end + gap (the documented boundary convention)."""
    from aos_spark.io.readers import read_sf_table
    from aos_spark.ops import windows as W

    ev = read_sf_table(spark, SF_DIR, "events")
    gap_s = 6 * 3600
    batch = W.sessionize(ev, ["user_id"], ts_col="ts", gap_seconds=gap_s,
                         value_col="value")
    native = sjobs.session_window_agg(ev, gap=f"{gap_s} seconds")  # batch mode
    b = {
        (r["user_id"], r["session_start"]): (r["session_end"], r["n_events"])
        for r in batch.collect()
    }
    n = {
        (r["user_id"], r["session_start"]): (r["session_end_plus_gap"], r["n_events"])
        for r in native.collect()
    }
    assert set(b) == set(n)
    for k, (end_b, cnt_b) in b.items():
        end_n, cnt_n = n[k]
        assert cnt_n == cnt_b
        assert (end_n - end_b).total_seconds() == gap_s


def test_native_session_window_streams(spark, dirs, tmp_path):
    """The same aggregation must run as an actual stream: drained with
    availableNow, every emitted (finalized-by-watermark) session matches
    the batch result exactly."""
    out = str(tmp_path / "sess_out")
    ckpt = str(tmp_path / "sess_ckpt")
    stream = sjobs.read_event_stream(spark, dirs["input"] + "/*")
    agg = sjobs.session_window_agg(stream, gap="1 hour", watermark="2 hours")
    sjobs.run_available_now(agg, out, ckpt)
    got = spark.read.parquet(out)
    emitted = {
        (r["user_id"], r["session_start"]): r["n_events"] for r in got.collect()
    }
    assert emitted  # watermark passed for the older drop's sessions
    batch_src = spark.read.parquet(dirs["input"] + "/*")
    expect = {
        (r["user_id"], r["session_start"]): r["n_events"]
        for r in sjobs.session_window_agg(batch_src, gap="1 hour").collect()
    }
    for k, cnt in emitted.items():
        assert expect[k] == cnt


def test_stateful_sessionize_across_batches(spark, dirs, tmp_path):
    """applyInPandasWithState: the open session survives the first
    micro-batch in state and is emitted when a later drop breaches the gap."""
    import datetime as dt

    in_dir = str(tmp_path / "sess_in")
    out_dir = str(tmp_path / "sess_out")
    ckpt = str(tmp_path / "sess_ckpt")
    os.makedirs(in_dir)

    def drop(tag, rows):
        spark.createDataFrame(
            [(i, ts, uid, "t", v, None) for i, (ts, uid, v) in enumerate(rows)],
            sjobs.EVENTS_SCHEMA,
        ).coalesce(1).write.parquet(os.path.join(in_dir, tag))

    t0 = dt.datetime(2024, 1, 1, 0, 0, 0)

    # batch 1: two events 10 min apart (one open session for user 1)
    drop("b1", [(t0, 1, 1.0), (t0 + dt.timedelta(minutes=10), 1, 2.0)])
    stream = sjobs.read_event_stream(spark, in_dir + "/*")
    sess = sjobs.sessionize_stream(stream, gap_seconds=3600)
    q = (
        sess.writeStream.format("parquet")
        .option("path", out_dir)
        .option("checkpointLocation", ckpt)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    try:
        n_after_b1 = spark.read.parquet(out_dir).count()
    except Exception:
        n_after_b1 = 0
    assert n_after_b1 == 0  # session still open, held in state

    # batch 2: an event 2 h later closes the first session
    drop("b2", [(t0 + dt.timedelta(hours=2), 1, 5.0)])
    q = (
        sjobs.sessionize_stream(
            sjobs.read_event_stream(spark, in_dir + "/*"), gap_seconds=3600
        )
        .writeStream.format("parquet")
        .option("path", out_dir)
        .option("checkpointLocation", ckpt)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    out = spark.read.parquet(out_dir).collect()
    assert len(out) == 1
    r = out[0]
    assert r["user_id"] == 1 and r["n_events"] == 2 and r["total_value"] == 3.0


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


def test_streaming_dedup_within_watermark(spark, dirs, tmp_path):
    """Duplicate event_ids across two drops in the same micro-batch run are
    emitted once; state stays bounded by the watermark."""
    import shutil

    ddir = str(tmp_path / "dedup_in")
    out = str(tmp_path / "dedup_out")
    ckpt = str(tmp_path / "dedup_ckpt")
    os.makedirs(ddir)
    from aos_spark.io.readers import read_sf_table

    ev = read_sf_table(spark, SF_DIR, "events").filter(
        F.to_date("ts") == "2024-01-10"
    )
    n = ev.count()
    ev.coalesce(1).write.parquet(os.path.join(ddir, "a"))
    ev.coalesce(1).write.parquet(os.path.join(ddir, "b"))  # exact duplicates

    stream = sjobs.read_event_stream(spark, ddir + "/*")
    deduped = sjobs.dedup_stream(stream)
    q = (
        deduped.writeStream.format("parquet")
        .option("path", out)
        .option("checkpointLocation", ckpt)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    got = spark.read.parquet(out)
    assert got.count() == n
    assert got.select("event_id").distinct().count() == n
    shutil.rmtree(ddir)


def test_stream_stream_interval_join_matches_batch(spark, tmp_path):
    """Watermarked stream-stream interval join drains to exactly the rows
    the identical batch join produces (availableNow processes everything,
    so no row is lost to the watermark)."""
    import shutil

    ldir, rdir = str(tmp_path / "sj_l"), str(tmp_path / "sj_r")
    out, ckpt = str(tmp_path / "sj_out"), str(tmp_path / "sj_ckpt")
    from aos_spark.io.readers import read_sf_table

    ev = read_sf_table(spark, SF_DIR, "events")
    left = ev.filter(F.col("event_type") == "click")
    right = ev.filter(F.col("event_type") == "view")
    assert left.count() > 0 and right.count() > 0
    left.coalesce(1).write.parquet(os.path.join(ldir, "a"))
    right.coalesce(1).write.parquet(os.path.join(rdir, "a"))

    joined = sjobs.interval_join_streams(
        sjobs.read_event_stream(spark, ldir + "/*"),
        sjobs.read_event_stream(spark, rdir + "/*"),
        horizon="2 hours",
    )
    q = (
        joined.writeStream.format("parquet")
        .option("path", out)
        .option("checkpointLocation", ckpt)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    got = {
        (r["l_event_id"], r["r_event_id"])
        for r in spark.read.parquet(out).collect()
    }

    batch = (
        left.alias("l")
        .join(
            right.alias("r"),
            (F.col("l.user_id") == F.col("r.user_id"))
            & (F.col("r.ts") >= F.col("l.ts"))
            & (F.col("r.ts") <= F.col("l.ts") + F.expr("INTERVAL 2 HOURS")),
        )
        .select(
            F.col("l.event_id").alias("a"), F.col("r.event_id").alias("b")
        )
    )
    want = {(r["a"], r["b"]) for r in batch.collect()}
    assert got == want and len(want) > 0
    shutil.rmtree(ldir)
    shutil.rmtree(rdir)


def test_stream_static_enrichment_join(spark, dirs, tmp_path):
    """Stream-static broadcast join: every streamed event picks up its
    dim attributes; dim misses survive as NULL (left join, stateless)."""
    out = str(tmp_path / "enrich_out")
    ckpt = str(tmp_path / "enrich_ckpt")
    dim = spark.createDataFrame(
        [("view", 1.0), ("click", 2.0), ("purchase", 5.0)],
        "event_type string, weight double",
    )
    stream = sjobs.read_event_stream(spark, dirs["input"] + "/*")
    enriched = sjobs.enrich_stream(stream, dim, "event_type").select(
        "event_id", "event_type", "weight"
    )
    sjobs.run_available_now(enriched, out, ckpt)
    got = spark.read.parquet(out)
    n_stream = spark.read.parquet(dirs["input"] + "/*").count()
    assert got.count() == n_stream  # left join keeps every event
    assert got.filter(
        (F.col("event_type") == "purchase") & (F.col("weight") != 5.0)
    ).count() == 0
    # types outside the dim (signup/error) survive with NULL weight
    assert got.filter(F.col("weight").isNull()).count() > 0


def test_stateful_burst_stream_across_batches(spark, dirs, tmp_path):
    """burst_stream: an hour's verdict is emitted when a later hour's
    first event closes it, with the integer-exact trailing rule — and
    the open hour correctly survives a micro-batch boundary in state."""
    import datetime as dt

    in_dir = str(tmp_path / "burst_in")
    out_dir = str(tmp_path / "burst_out")
    ckpt = str(tmp_path / "burst_ckpt")
    os.makedirs(in_dir)

    def drop(tag, rows):
        spark.createDataFrame(
            [(i, ts, uid, "t", 0.0, None) for i, (ts, uid) in enumerate(rows)],
            sjobs.EVENTS_SCHEMA,
        ).coalesce(1).write.parquet(os.path.join(in_dir, tag))

    t0 = dt.datetime(2024, 1, 1, 0, 0, 0)

    def at(h, m):
        return t0 + dt.timedelta(hours=h, minutes=m)

    # batch 1: hours 0,1,2 with 2 events each (hour 2 stays open)
    drop("b1", [(at(h, m), 1) for h in range(3) for m in (0, 30)])
    q = (
        sjobs.burst_stream(sjobs.read_event_stream(spark, in_dir + "/*"))
        .writeStream.format("parquet")
        .option("path", out_dir)
        .option("checkpointLocation", ckpt)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    rows = {r["hour_start"].hour: r for r in spark.read.parquet(out_dir).collect()}
    # hours 0 and 1 are closed; hour 0 has no trail, hour 1 is 2 vs 2 (not 2x)
    assert set(rows) == {0, 1}
    assert rows[0]["trail_hours"] == 0 and not rows[0]["is_burst"]
    assert rows[1]["trail_hours"] == 1 and not rows[1]["is_burst"]

    # batch 2: 5 events in hour 3 (closes hour 2: 2 vs trail {2,2} -> no),
    # then 1 event in hour 4 (closes hour 3: 5*3=15 >= 2*(2+2+2)=12 -> BURST)
    drop("b2", [(at(3, m), 1) for m in range(5)] + [(at(4, 0), 1)])
    q = (
        sjobs.burst_stream(sjobs.read_event_stream(spark, in_dir + "/*"))
        .writeStream.format("parquet")
        .option("path", out_dir)
        .option("checkpointLocation", ckpt)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    rows = {r["hour_start"].hour: r for r in spark.read.parquet(out_dir).collect()}
    assert set(rows) == {0, 1, 2, 3}
    assert rows[2]["trail_hours"] == 2 and not rows[2]["is_burst"]
    assert rows[3]["n_events"] == 5 and rows[3]["trail_hours"] == 3
    assert rows[3]["is_burst"]


def test_stateful_transition_stream_across_batches(spark, dirs, tmp_path):
    """transition_stream: the last state before a micro-batch boundary is
    carried in state, so the cross-batch transition is emitted."""
    import datetime as dt

    in_dir = str(tmp_path / "trans_in")
    out_dir = str(tmp_path / "trans_out")
    ckpt = str(tmp_path / "trans_ckpt")
    os.makedirs(in_dir)

    def drop(tag, rows):
        spark.createDataFrame(
            [(i, ts, uid, et, 0.0, None) for i, (ts, uid, et) in enumerate(rows)],
            sjobs.EVENTS_SCHEMA,
        ).coalesce(1).write.parquet(os.path.join(in_dir, tag))

    t0 = dt.datetime(2024, 1, 1)

    def run():
        q = (
            sjobs.transition_stream(sjobs.read_event_stream(spark, in_dir + "/*"))
            .writeStream.format("parquet")
            .option("path", out_dir)
            .option("checkpointLocation", ckpt)
            .outputMode("append")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()

    drop("b1", [(t0, 1, "a"), (t0 + dt.timedelta(minutes=1), 1, "b")])
    run()
    pairs = {
        (r["prev_state"], r["next_state"])
        for r in spark.read.parquet(out_dir).collect()
    }
    assert pairs == {("a", "b")}

    # batch 2 starts with 'c': the b->c transition spans the batch boundary
    drop("b2", [(t0 + dt.timedelta(minutes=2), 1, "c"),
                (t0 + dt.timedelta(minutes=3), 1, "a")])
    run()
    pairs = {
        (r["prev_state"], r["next_state"])
        for r in spark.read.parquet(out_dir).collect()
    }
    assert pairs == {("a", "b"), ("b", "c"), ("c", "a")}


def test_stateful_sessionize_drops_cross_batch_late_events(spark, dirs, tmp_path):
    """r9 review: a cross-batch LATE event used to fold into the open
    session and move last_e BACKWARDS, so a later in-order event could
    emit an end-before-start session and split spuriously. Late events
    are now dropped (the burst/transition siblings' guard)."""
    import datetime as dt

    in_dir = str(tmp_path / "late_in")
    out_dir = str(tmp_path / "late_out")
    ckpt = str(tmp_path / "late_ckpt")
    os.makedirs(in_dir)

    def drop(tag, rows):
        spark.createDataFrame(
            [(i, ts, uid, "t", v, None) for i, (ts, uid, v) in enumerate(rows)],
            sjobs.EVENTS_SCHEMA,
        ).coalesce(1).write.parquet(os.path.join(in_dir, tag))

    def run():
        q = (
            sjobs.sessionize_stream(
                sjobs.read_event_stream(spark, in_dir + "/*"), gap_seconds=3600
            )
            .writeStream.format("parquet")
            .option("path", out_dir)
            .option("checkpointLocation", ckpt)
            .outputMode("append")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()

    t0 = dt.datetime(2024, 1, 1, 6, 0, 0)
    drop("b1", [(t0, 1, 1.0)])
    run()
    # batch 2: a LATE event 2h BEFORE the open session — must be dropped,
    # not fold last_e backwards
    drop("b2", [(t0 - dt.timedelta(hours=2), 1, 9.0)])
    run()
    # batch 3: 30 min after t0 — same session as t0 (old bug: the
    # regressed last_e made this a gap-breach, emitting end < start)
    drop("b3", [(t0 + dt.timedelta(minutes=30), 1, 2.0)])
    run()
    # batch 4: 2h after batch 3 — closes the session
    drop("b4", [(t0 + dt.timedelta(hours=3), 1, 5.0)])
    run()
    out = spark.read.parquet(out_dir).collect()
    assert len(out) == 1
    r = out[0]
    assert r["session_start"] == t0
    assert r["session_end"] == t0 + dt.timedelta(minutes=30)
    assert r["session_end"] >= r["session_start"]
    assert r["n_events"] == 2 and r["total_value"] == 3.0
