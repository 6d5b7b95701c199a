"""As-of join — match each left row to the nearest right row per key, in
any of the three pandas/DuckDB directions. Spark has no native ASOF JOIN;
the naive range-join formulation (l JOIN r ON key AND r.ts <= l.ts, then
argmax) explodes quadratically per key. The scalable formulation used
here is the union-and-carry pattern:

1. union both sides with a side tag (right rows carry the value columns,
   left rows carry NULLs),
2. one window per key ordered by (ts, side) — right-before-left on ties,
   so the match is INCLUSIVE of equal timestamps,
3. `last(value, True)` over unbounded-preceding carries the latest right
   value forward onto each left row. ``forward`` is the same carry over
   the DESC ordering; ``nearest`` runs both carries over the SAME
   partitioning (one shuffle, two window passes) and picks the closer
   match per row (ties → backward, the pandas default).

Cost: ONE hash shuffle on the key (the windows share partitionBy) over
|L| + |R| rows — linear, no per-key blowup, skew bounded by the busiest
key's own rows. An optional tolerance nulls matches outside the horizon,
mirroring pandas merge_asof / DuckDB ASOF semantics.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql.types import TimestampNTZType, TimestampType


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: str = "ts",
    by: list[str] | None = None,
    value_cols: list[str] | None = None,
    tolerance_seconds: int | None = None,
    direction: str = "backward",
) -> DataFrame:
    """As-of join of ``right`` onto ``left``: ``backward`` (most recent
    at-or-before, the default), ``forward`` (earliest at-or-after), or
    ``nearest`` (closer of the two, ties backward). ``right`` must have
    one row per (by, on) — pre-aggregate ties upstream; the output keeps
    every left row and column plus the matched ``value_cols`` (NULL when
    nothing matches) and ``asof_ts`` (the matched right timestamp)."""
    if direction not in ("backward", "forward", "nearest"):
        raise ValueError(f"unsupported direction: {direction!r}")
    if value_cols and "__matched_ts" in value_cols:
        raise ValueError("'__matched_ts' is reserved by the carry struct")
    if by is None:
        by = ["user_id"]
    if value_cols is None:
        value_cols = ["value"]

    l_tag = left.withColumn("__side", F.lit(1))
    for c in value_cols:
        l_tag = l_tag.withColumn(f"__v_{c}", F.lit(None).cast(right.schema[c].dataType))
    l_tag = l_tag.withColumn("__r_ts", F.lit(None).cast(left.schema[on].dataType))
    r_tag = right.select(
        *by,
        F.col(on),
        F.lit(0).alias("__side"),
        *[F.col(c).alias(f"__v_{c}") for c in value_cols],
        F.col(on).alias("__r_ts"),
    )
    merged = l_tag.unionByName(r_tag, allowMissingColumns=True)

    # both windows share partitionBy(by) → ONE exchange feeds every pass
    w_back = (
        Window.partitionBy(*by)
        .orderBy(F.col(on).asc(), F.col("__side").asc())
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    w_fwd = (
        Window.partitionBy(*by)
        .orderBy(F.col(on).desc(), F.col("__side").asc())
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    tags = {"backward": w_back} if direction == "backward" else (
        {"forward": w_fwd} if direction == "forward" else
        {"backward": w_back, "forward": w_fwd}
    )
    # Carry the matched right row ATOMICALLY: one struct per right row
    # (non-null even when every value field is NULL), one last(_, True)
    # per direction. Independent per-column carries would let
    # last(ignoreNulls=True) skip a matched row's NULL value and pair the
    # matched timestamp with a STALE value from an earlier row — pandas
    # merge_asof / DuckDB ASOF return the matched row's NULL (r9 review).
    carried = merged.withColumn(
        "__r_row",
        F.when(
            F.col("__side") == 0,
            F.struct(
                F.col("__r_ts").alias("__matched_ts"),
                *[F.col(f"__v_{c}").alias(c) for c in value_cols],
            ),
        ),
    )
    for tag, w in tags.items():
        carried = carried.withColumn(f"__row_{tag}", F.last("__r_row", True).over(w))
        carried = carried.withColumn(
            f"__mts_{tag}", F.col(f"__row_{tag}").getField("__matched_ts")
        )
        for c in value_cols:
            carried = carried.withColumn(
                f"__m_{tag}_{c}", F.col(f"__row_{tag}").getField(c)
            )
    out = carried.filter(F.col("__side") == 1)

    # Sub-second epoch seconds (ADVICE r4: unix_timestamp truncates to
    # whole seconds, so `nearest` could pick the farther side and the
    # tolerance admit matches just outside the horizon). unix_micros
    # needs TimestampType; NTZ goes through a cast, exact under the
    # engine's fixed UTC session timezone (session.py). double has 2^53
    # integral precision — micros stay exact for ~285 years of epoch.
    dt_on = left.schema[on].dataType
    is_ts = isinstance(dt_on, (TimestampType, TimestampNTZType))
    if is_ts:
        _needs_cast = isinstance(dt_on, TimestampNTZType)

        def to_epoch(c: Column) -> Column:
            # "timestamp_ltz" explicitly: under timestampType=TIMESTAMP_NTZ
            # sessions (the gate), cast("timestamp") resolves back to NTZ
            # and unix_micros rejects it (r9 review follow-up)
            return F.unix_micros(
                c.cast("timestamp_ltz") if _needs_cast else c
            ) / F.lit(1_000_000.0)
    else:
        def to_epoch(c: Column) -> Column:
            return c.cast("double")

    def delta(tag: str) -> Column:
        d = to_epoch(F.col(f"__mts_{tag}")) - to_epoch(F.col(on))
        return -d if tag == "backward" else d  # nonnegative when matched

    if direction == "nearest":
        has_b = F.col("__mts_backward").isNotNull()
        has_f = F.col("__mts_forward").isNotNull()
        use_b = has_b & (~has_f | (delta("backward") <= delta("forward")))
        for c in value_cols:
            out = out.withColumn(
                f"__m_{c}",
                F.when(use_b, F.col(f"__m_backward_{c}")).otherwise(
                    F.col(f"__m_forward_{c}")
                ),
            )
        out = out.withColumn(
            "__mts",
            F.when(use_b, F.col("__mts_backward")).otherwise(F.col("__mts_forward")),
        )
        chosen_delta = F.when(use_b, delta("backward")).otherwise(delta("forward"))
    else:
        tag = direction
        for c in value_cols:
            out = out.withColumn(f"__m_{c}", F.col(f"__m_{tag}_{c}"))
        out = out.withColumn("__mts", F.col(f"__mts_{tag}"))
        chosen_delta = delta(tag)

    within: Column = F.lit(True)
    if tolerance_seconds is not None:
        within = chosen_delta <= tolerance_seconds
    for c in value_cols:
        out = out.withColumn(
            c if c not in left.columns else f"{c}_asof",
            F.when(within, F.col(f"__m_{c}")),
        )
    out = out.withColumn("asof_ts", F.when(within, F.col("__mts")))
    drop = (
        ["__side", "__r_ts", "__mts", "__r_row"]
        + [f"__v_{c}" for c in value_cols]
        + [f"__m_{c}" for c in value_cols]
        + [f"__m_{t}_{c}" for t in tags for c in value_cols]
        + [f"__mts_{t}" for t in tags]
        + [f"__row_{t}" for t in tags]
    )
    return out.drop(*drop)
