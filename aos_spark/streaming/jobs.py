"""Structured Streaming formulation of the reference's poll loop.

The reference has no streaming engine: a 6-hour cron polls the catalog,
an anti-join skips processed (storm, forecast) pairs, and each forecast is
a complete immutable batch (snowflake/README.md:263-312, SURVEY §2.8).
The idiomatic Spark mapping is `readStream` + `Trigger.AvailableNow`:
the checkpoint replaces storms.json/run-log dedup (exactly-once per input
file), and late data needs no watermark because a forecast batch is
immutable — but a watermarked windowed aggregation is provided for the
event-time analytics the batch engine exposes (A1-style member counts per
window).

Everything here processes incrementally: a re-run with the same checkpoint
reads only NEW files — the Structured-Streaming equivalent of F11.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

EVENTS_SCHEMA = (
    "event_id BIGINT, ts TIMESTAMP, user_id BIGINT, event_type STRING, "
    "value DOUBLE, props STRING"
)


def read_event_stream(
    spark: SparkSession, input_dir: str, schema: str = EVENTS_SCHEMA
) -> DataFrame:
    """File-source stream over a directory of parquet drops (the catalog-
    poll analog; each new file = one new forecast batch)."""
    return (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 8)
        .parquet(input_dir)
    )


def windowed_member_counts(
    stream: DataFrame,
    window: str = "1 hour",
    watermark: str = "2 hours",
) -> DataFrame:
    """Watermarked windowed aggregation: distinct-ish member activity per
    (window, user) — the streaming face of the A1 probability count.
    approx_count_distinct is used because exact distinct over an unbounded
    stream needs per-key state; the batch engine provides the exact path."""
    return (
        stream.withWatermark("ts", watermark)
        .groupBy(F.window("ts", window).alias("w"), F.col("user_id"))
        .agg(
            F.approx_count_distinct("event_type").alias("n_members"),
            F.sum("value").alias("total_value"),
        )
        .select(
            F.col("w.start").alias("window_start"),
            F.col("w.end").alias("window_end"),
            "user_id",
            "n_members",
            "total_value",
        )
    )


def session_window_agg(
    stream: DataFrame,
    gap: str = "6 hours",
    watermark: str = "12 hours",
) -> DataFrame:
    """NATIVE session windows (``F.session_window``) — the idiomatic scale
    path when the per-session aggregates are expressible as built-ins: the
    StateStore merges overlapping gap windows incrementally, state is
    bounded by the watermark, and no Python runs in the hot path (contrast
    ``sessionize_stream``, the applyInPandasWithState tier for aggregates
    built-ins can't express). NOTE the boundary convention: a native
    session window's ``end`` is last_event + gap; the batch face
    (ops/windows.sessionize) reports session_end = max(ts) — equivalence
    is session_end + gap (asserted in test_streaming)."""
    return (
        stream.withWatermark("ts", watermark)
        .groupBy(F.col("user_id"), F.session_window("ts", gap).alias("w"))
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum("value").alias("total_value"),
        )
        .select(
            "user_id",
            F.col("w.start").alias("session_start"),
            F.col("w.end").alias("session_end_plus_gap"),
            "n_events",
            "total_value",
        )
    )


def enrich_stream(stream: DataFrame, dim: DataFrame, on: str) -> DataFrame:
    """Stream-static enrichment join: the static dim is re-resolved per
    micro-batch (so a refreshed dim table is picked up without restart)
    and broadcast — the streaming face of every dim lookup in the batch
    tier. No watermark needed: stream-static joins are stateless."""
    return stream.join(F.broadcast(dim), on, "left")


def run_available_now(
    agg: DataFrame, out_dir: str, checkpoint_dir: str
) -> None:
    """Drain everything currently available, then stop (the cron-poll
    replacement). Append mode: only watermark-closed windows are emitted."""
    q = (
        agg.writeStream.format("parquet")
        .option("path", out_dir)
        .option("checkpointLocation", checkpoint_dir)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()


def dedup_stream(
    stream: DataFrame,
    key_cols: list[str] | None = None,
    ts_col: str = "ts",
    watermark: str = "2 hours",
) -> DataFrame:
    """Streaming exact dedup — the streaming face of llm/dedup.exact_dedup
    and the W5 keep-first semantics: drop rows whose key was already seen
    within the watermark horizon (`dropDuplicatesWithinWatermark`), so
    per-key state is bounded by the watermark instead of growing forever —
    the property that keeps this runnable on an unbounded 100 TB/day feed.
    Exactly-once per input file composes with the checkpoint (S12/F11)."""
    if key_cols is None:
        key_cols = ["event_id"]
    return stream.withWatermark(ts_col, watermark).dropDuplicatesWithinWatermark(
        key_cols
    )


def interval_join_streams(
    left: DataFrame,
    right: DataFrame,
    key: str = "user_id",
    horizon: str = "30 minutes",
    watermark: str = "2 hours",
) -> DataFrame:
    """Watermarked stream-stream interval join: pair each left event with
    right events for the same key that happen in [left.ts, left.ts +
    horizon]. Both sides carry watermarks and the join condition bounds
    the time skew, so each side's join state is watermark-bounded —
    without the interval bound a stream-stream join would buffer forever.
    Batch face: the identical join predicate on static frames."""
    lw = left.withWatermark("ts", watermark).select(
        F.col(key).alias("k"),
        F.col("ts").alias("l_ts"),
        F.col("event_id").alias("l_event_id"),
        F.col("event_type").alias("l_type"),
    )
    rw = right.withWatermark("ts", watermark).select(
        F.col(key).alias("k"),
        F.col("ts").alias("r_ts"),
        F.col("event_id").alias("r_event_id"),
        F.col("event_type").alias("r_type"),
    )
    cond = (
        (lw["k"] == rw["k"])
        & (rw["r_ts"] >= lw["l_ts"])
        & (rw["r_ts"] <= lw["l_ts"] + F.expr(f"INTERVAL {horizon}"))
    )
    return lw.join(rw, cond).select(
        lw["k"].alias("user_id"), "l_event_id", "r_event_id", "l_ts", "r_ts",
        "l_type", "r_type",
    )


SESSION_OUTPUT_SCHEMA = (
    "user_id BIGINT, session_start TIMESTAMP, session_end TIMESTAMP, "
    "n_events INT, total_value DOUBLE"
)
SESSION_STATE_SCHEMA = (
    "start_epoch DOUBLE, last_epoch DOUBLE, n_events INT, total_value DOUBLE"
)


def sessionize_stream(
    stream: DataFrame, gap_seconds: int = 21600
) -> DataFrame:
    """Custom stateful operator via applyInPandasWithState: gap-based
    sessions per user. The open session lives in per-key state across
    micro-batches; a session is emitted when a later event arrives more
    than ``gap_seconds`` after it. Batch face: ops/windows.sessionize —
    EMITTED sessions match it exactly on in-order data, with two
    streaming-inherent deviations stated outright: (1) cross-batch LATE
    events (timestamp before the open session's last event) are DROPPED,
    like the burst/transition siblings — folding them in would move the
    session's end backwards and emit end-before-start sessions (r9
    review); (2) the FINAL open session per key stays in state (NoTimeout
    → nothing fires without new data), so a drain over a finished event
    set emits one fewer session per key than the batch face — close it
    with a sentinel event or read the batch face for a complete set.

    This is the (b)-tier custom-operator pattern from the build brief —
    semantics Spark's built-ins can't express incrementally (session
    windows with arbitrary per-session aggregates) as an Arrow-batched
    stateful map, state bounded at one open session per key.
    """
    import pandas as pd
    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

    def fn(key, pdfs, state: GroupState):
        events = pd.concat(list(pdfs), ignore_index=True)
        events = events.sort_values("ts")
        epochs = events["ts"].astype("int64") / 1e9
        values = events["value"].fillna(0.0)

        if state.exists:
            start_e, last_e, n, tot = state.get
        else:
            start_e = last_e = None
            n, tot = 0, 0.0

        out_rows = []
        for e, v in zip(epochs, values):
            if last_e is not None and e < last_e:
                # cross-batch late event: drop (see docstring) — last_e
                # must never regress
                continue
            if last_e is not None and e - last_e > gap_seconds:
                out_rows.append((key[0], start_e, last_e, n, tot))
                start_e, n, tot = e, 0, 0.0
            if start_e is None:
                start_e = e
            last_e = e
            n += 1
            tot += float(v)
        state.update((float(start_e), float(last_e), int(n), float(tot)))
        if out_rows:
            yield pd.DataFrame(
                {
                    "user_id": [r[0] for r in out_rows],
                    "session_start": pd.to_datetime([r[1] for r in out_rows], unit="s"),
                    "session_end": pd.to_datetime([r[2] for r in out_rows], unit="s"),
                    "n_events": [r[3] for r in out_rows],
                    "total_value": [r[4] for r in out_rows],
                }
            )

    return stream.groupBy("user_id").applyInPandasWithState(
        fn,
        outputStructType=SESSION_OUTPUT_SCHEMA,
        stateStructType=SESSION_STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


def run_foreach_batch_impact(
    spark: SparkSession,
    input_dir: str,
    warehouse: str,
    checkpoint_dir: str,
    batch_fn,
) -> None:
    """foreachBatch bridge: each micro-batch (one forecast drop) runs an
    arbitrary batch job — the way the full impact pipeline (jobs.update)
    rides the streaming checkpoint for idempotency (SURVEY §2.8 mapping)."""
    stream = read_event_stream(spark, input_dir)

    def _wrap(batch_df: DataFrame, batch_id: int) -> None:
        batch_fn(batch_df, batch_id, warehouse)

    q = (
        stream.writeStream.foreachBatch(_wrap)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()


BURST_OUTPUT_SCHEMA = (
    "user_id BIGINT, hour_start TIMESTAMP, n_events BIGINT, "
    "trail_hours INT, is_burst BOOLEAN"
)
BURST_STATE_SCHEMA = (
    "open_hour BIGINT, open_n BIGINT, "
    "hist_hours ARRAY<BIGINT>, hist_counts ARRAY<BIGINT>"
)


def burst_stream(
    stream: DataFrame, lookback_hours: int = 3, factor: int = 2
) -> DataFrame:
    """Streaming face of ops/sequences.burst_hours: per-user hourly
    rate-burst detection with the same INTEGER-EXACT rule
    (``n · |trail| ≥ factor · Σtrail``), evaluated the moment an hour
    COMPLETES (the first event of a later hour closes it) instead of in
    a batch RANGE window.

    State per key: the open (hour, count) pair plus the trailing
    ``lookback_hours`` completed hours — O(lookback) per user, bounded.
    Events are processed in event-time order within each micro-batch;
    a cross-batch event older than the open hour cannot reopen a closed
    hour — it is folded into the open hour's trail history if that hour
    is still inside the lookback horizon, else dropped (documented
    at-most-once lateness, the same ordering assumption
    sessionize_stream makes; put a watermark-driven dedup_stream in
    front for exactly-once feeds).
    """
    import pandas as pd
    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

    def fn(key, pdfs, state: GroupState):
        events = pd.concat(list(pdfs), ignore_index=True).sort_values("ts")
        hours = (events["ts"].astype("int64") // (3600 * 10**9)).tolist()

        if state.exists:
            open_hour, open_n, hist_hours, hist_counts = state.get
            hist = list(zip(list(hist_hours), list(hist_counts)))
            open_hour = None if open_hour < 0 else open_hour
        else:
            open_hour, open_n, hist = None, 0, []

        out = []

        def close_open():
            nonlocal hist
            trail = [
                (hh, nn)
                for hh, nn in hist
                if open_hour - lookback_hours <= hh <= open_hour - 1
            ]
            s = sum(nn for _, nn in trail)
            burst = bool(trail) and open_n * len(trail) >= factor * s
            out.append((key[0], open_hour, open_n, len(trail), burst))
            hist = [
                (hh, nn) for hh, nn in hist if hh >= open_hour - lookback_hours
            ] + [(open_hour, open_n)]

        for h in hours:
            if open_hour is None:
                open_hour, open_n = h, 1
            elif h == open_hour:
                open_n += 1
            elif h < open_hour:  # late event: fold into history if in horizon
                if h >= open_hour - lookback_hours:
                    if any(hh == h for hh, _ in hist):
                        hist = [
                            (hh, nn + 1) if hh == h else (hh, nn)
                            for hh, nn in hist
                        ]
                    else:
                        hist.append((h, 1))
            else:
                close_open()
                open_hour, open_n = h, 1

        state.update(
            (
                int(open_hour) if open_hour is not None else -1,
                int(open_n),
                [int(hh) for hh, _ in hist],
                [int(nn) for _, nn in hist],
            )
        )
        if out:
            yield pd.DataFrame(
                {
                    "user_id": [r[0] for r in out],
                    "hour_start": pd.to_datetime(
                        [r[1] * 3600 for r in out], unit="s"
                    ),
                    "n_events": [r[2] for r in out],
                    "trail_hours": [r[3] for r in out],
                    "is_burst": [r[4] for r in out],
                }
            )

    return stream.groupBy("user_id").applyInPandasWithState(
        fn,
        outputStructType=BURST_OUTPUT_SCHEMA,
        stateStructType=BURST_STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


TRANSITION_OUTPUT_SCHEMA = (
    "user_id BIGINT, ts TIMESTAMP, prev_state STRING, next_state STRING"
)
TRANSITION_STATE_SCHEMA = "last_epoch DOUBLE, last_state STRING"


def transition_stream(stream: DataFrame) -> DataFrame:
    """Streaming face of ops/sequences.transition_matrix: per-user state
    transitions emitted incrementally, with the LAST (timestamp, state)
    pair carried in per-key state so the transition across a micro-batch
    boundary is never lost. Emits one row per observed transition with
    the arriving event's timestamp (append mode), so downstream
    consumers can window/order the stream; the matrix itself is the
    downstream groupBy(prev, next) the batch face performs.

    Determinism mirrors the batch face's contract exactly: within a
    batch, events sort by (ts, event_id) — a deterministic TOTAL order,
    never bare ts (equal-timestamp ties would make the emitted pairs
    partition-dependent, review catch). Cross-batch late events (older
    than the carried last_epoch) are DROPPED, not spliced backwards —
    a temporally-backwards transition is never emitted; feed a
    watermarked dedup/sort upstream for exactly-ordered feeds.
    State is O(1) per key.
    """
    import pandas as pd
    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

    def fn(key, pdfs, state: GroupState):
        events = pd.concat(list(pdfs), ignore_index=True).sort_values(
            ["ts", "event_id"], kind="mergesort"
        )
        epochs = (events["ts"].astype("int64") / 1e9).tolist()
        states = events["event_type"].tolist()
        if state.exists:
            last_e, last_s = state.get
        else:
            last_e, last_s = None, None
        out = []
        for e, s in zip(epochs, states):
            if last_e is not None and e < last_e:
                continue  # cross-batch late event: documented drop
            if last_s is not None:
                out.append((key[0], e, last_s, s))
            last_e, last_s = e, s
        state.update((float(last_e), str(last_s)))
        if out:
            yield pd.DataFrame(
                {
                    "user_id": [r[0] for r in out],
                    "ts": pd.to_datetime([r[1] for r in out], unit="s"),
                    "prev_state": [r[2] for r in out],
                    "next_state": [r[3] for r in out],
                }
            )

    return stream.groupBy("user_id").applyInPandasWithState(
        fn,
        outputStructType=TRANSITION_OUTPUT_SCHEMA,
        stateStructType=TRANSITION_STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
