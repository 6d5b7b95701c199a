"""As-of join — match each left row to the most recent right row at or
before its timestamp, per key. Spark has no native ASOF JOIN; the naive
range-join formulation (l JOIN r ON key AND r.ts <= l.ts, then argmax)
explodes quadratically per key. The scalable formulation used here is the
union-and-carry pattern:

1. union both sides with a side tag (right rows carry the value columns,
   left rows carry NULLs),
2. one window per key ordered by (ts, side) — right-before-left on ties,
   so the match is INCLUSIVE of equal timestamps,
3. `last(value, True)` over unbounded-preceding carries the
   latest right value forward onto each left row.

Cost: ONE hash shuffle on the key (the window's partitionBy) over
|L| + |R| rows — linear, no per-key blowup, skew bounded by the busiest
key's own rows. An optional tolerance nulls matches older than the
horizon, mirroring pandas merge_asof / DuckDB ASOF semantics.
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
) -> DataFrame:
    """Backward (most-recent-at-or-before) as-of join of ``right`` onto
    ``left``. ``right`` must have one row per (by, on) — pre-aggregate ties
    upstream; the output keeps every left row and column plus the matched
    ``value_cols`` (NULL when no right row precedes)."""
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
    w = (
        Window.partitionBy(*by)
        .orderBy(F.col(on), F.col("__side"))
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    carried = merged.select(
        "*",
        *[F.last(f"__v_{c}", True).over(w).alias(f"__m_{c}") for c in value_cols],
        F.last("__r_ts", True).over(w).alias("__m_ts"),
    )
    out = carried.filter(F.col("__side") == 1)
    within: Column = F.lit(True)
    if tolerance_seconds is not None:
        # unix_timestamp for timestamp-typed `on` (handles TIMESTAMP_NTZ,
        # which refuses a direct long cast); plain cast for numeric `on`.
        is_ts = isinstance(left.schema[on].dataType, (TimestampType, TimestampNTZType))
        to_epoch = (
            (lambda c: F.unix_timestamp(c)) if is_ts else (lambda c: c.cast("long"))
        )
        within = (
            to_epoch(F.col(on)) - to_epoch(F.col("__m_ts"))
        ) <= tolerance_seconds
    for c in value_cols:
        out = out.withColumn(
            c if c not in left.columns else f"{c}_asof",
            F.when(within, F.col(f"__m_{c}")),
        )
    matched_ts = F.when(within, F.col("__m_ts"))
    out = out.withColumn("asof_ts", matched_ts)
    drop = (
        ["__side", "__r_ts", "__m_ts"]
        + [f"__v_{c}" for c in value_cols]
        + [f"__m_{c}" for c in value_cols]
    )
    return out.drop(*drop)
