"""Window / ordered computation — SURVEY.md §2.5 (W1, W2, W5, W6).

Reference: consecutive-point segments at reports.py:224-254 (W1), first
landfall per member at reports.py:283-293 (W2), keep-first dedup at
impact_analysis.py:1031,1061 (W5), argmax-per-group at
impact_analysis.py:1043 (W6).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def lead_segments(
    df: DataFrame,
    partition_cols: list[str],
    order_col: str | list[str],
    point_cols: list[str],
) -> DataFrame:
    """Pair each row with its successor within the partition (W1): for every
    ``point_cols`` c, adds ``c_next = lead(c)``; rows with no successor are
    dropped (a track of n points yields n-1 segments). Pass a LIST of order
    columns when the primary key can tie (lead over a tied order is
    nondeterministic)."""
    order_cols = order_col if isinstance(order_col, list) else [order_col]
    w = Window.partitionBy(*partition_cols).orderBy(*order_cols)
    out = df
    for c in point_cols:
        out = out.withColumn(f"{c}_next", F.lead(c).over(w))
    # successor EXISTENCE via lead of a constant (r9 review): filtering on
    # lead(point_cols[0]).isNotNull() also dropped segments whose successor
    # row exists but carries a NULL point value — an n-point track must
    # yield n-1 segments regardless of NULL cells.
    return (
        out.withColumn("__has_next", F.lead(F.lit(1)).over(w))
        .filter(F.col("__has_next").isNotNull())
        .drop("__has_next")
    )


def first_match(
    df: DataFrame,
    partition_cols: list[str],
    order_cols: list[str],
    predicate: Column,
) -> DataFrame:
    """First row (by order) satisfying the predicate, per partition (W2)."""
    w = Window.partitionBy(*partition_cols).orderBy(*order_cols)
    return (
        df.filter(predicate)
        .withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .drop("__rn")
    )


def sessionize(
    df: DataFrame,
    key_cols: list[str],
    ts_col: str = "ts",
    gap_seconds: int = 1800,
    value_col: str | None = None,
) -> DataFrame:
    """Gap-based sessionization as pure window ops: a new session starts
    when the gap to the previous event exceeds ``gap_seconds``; session id =
    running count of session starts. One shuffle (by key), two window
    passes over it — the batch face of the stateful streaming operator in
    aos_spark/streaming/jobs.py."""
    from pyspark.sql.types import TimestampNTZType, TimestampType

    w = Window.partitionBy(*key_cols).orderBy(ts_col)
    # Sub-second-exact epoch (r9 review): unix_timestamp truncates to
    # whole seconds, so two events whose true gap is 1800.8 s could land
    # in the SAME session at gap_seconds=1800 — while the streaming face
    # (streaming/jobs.py, fractional ns epochs) splits them. Same
    # unix_micros treatment as ops/asof.py: NTZ via a cast (exact under
    # the engine's fixed UTC session timezone), micros stay exact in
    # double for ~285 years of epoch.
    dt_ts = df.schema[ts_col].dataType
    if isinstance(dt_ts, (TimestampType, TimestampNTZType)):
        _c = F.col(ts_col)
        if isinstance(dt_ts, TimestampNTZType):
            # "timestamp_ltz" explicitly: under sessions with
            # spark.sql.timestampType=TIMESTAMP_NTZ (the gate's driver
            # parity setting), a bare cast("timestamp") resolves to NTZ
            # and unix_micros rejects it
            _c = _c.cast("timestamp_ltz")
        epoch = F.unix_micros(_c) / F.lit(1_000_000.0)
    else:
        epoch = F.col(ts_col).cast("double")
    gap = epoch - F.lag(epoch).over(w)
    starts = F.when(gap.isNull() | (gap > gap_seconds), 1).otherwise(0)
    with_sid = df.withColumn("__start", starts).withColumn(
        "session_id",
        F.sum("__start").over(w.rowsBetween(Window.unboundedPreceding, 0)),
    )
    aggs = [
        F.min(ts_col).alias("session_start"),
        F.max(ts_col).alias("session_end"),
        F.count(F.lit(1)).alias("n_events"),
    ]
    if value_col is not None:
        aggs.append(
            F.sum(F.col(value_col).cast("decimal(18,2)"))
            .cast("double")
            .alias("total_value")
        )
    return with_sid.groupBy(*key_cols, "session_id").agg(*aggs)


def dedup_keep_first(
    df: DataFrame,
    keys: list[str],
    order_cols: list[Column | str],
) -> DataFrame:
    """drop_duplicates(keep='first') with an EXPLICIT order (W5) — the
    reference relies on implicit frame order; we make determinism
    structural."""
    w = Window.partitionBy(*keys).orderBy(*order_cols)
    return (
        df.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .drop("__rn")
    )


def argmax_per_group(
    df: DataFrame,
    keys: list[str],
    value_col: str,
    tiebreak_col: str,
) -> DataFrame:
    """Row with the max value per group, ties broken by tiebreak desc (W6).
    row_number (not rank) guarantees exactly one row per group."""
    w = Window.partitionBy(*keys).orderBy(
        F.col(value_col).desc(), F.col(tiebreak_col).desc()
    )
    return (
        df.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .drop("__rn")
    )


def sequence_gaps(
    df: DataFrame, id_col: str = "event_id", bucket: int = 4096
) -> DataFrame:
    """Holes in an integer id sequence WITHOUT a global sort: two-level
    islands. Ids bucket by ``id div bucket``; intra-bucket holes come
    from a bucket-partitioned lag window, cross-bucket holes (including
    runs of entirely-missing buckets) from the lag of per-bucket
    (min, max) summaries — a frame bucket× smaller than the ids. The one
    ordered window left runs over that summary (n/bucket rows; recurse
    the trick if it ever stops fitting). Output (gap_start, gap_end,
    gap_len) is identical to the single-global-window islands idiom."""
    # exact integer floor-division for the FULL long range: truncating
    # `div` minus one when the (truncated, sign-following) remainder is
    # negative. Never routes through double (floor(id/bucket) misassigns
    # buckets above 2^53) and never forms id - pmod(id, bucket), which
    # can underflow past Long.MIN_VALUE for ids in the lowest partial
    # bucket of a non-power-of-two bucket size.
    ids = df.select(id_col).distinct().withColumn(
        "__b",
        F.expr(
            f"({id_col} div {bucket})"
            f" - (CASE WHEN {id_col} % {bucket} < 0 THEN 1 ELSE 0 END)"
        ),
    )
    wv = Window.partitionBy("__b").orderBy(id_col)
    intra = (
        ids.withColumn("__prev", F.lag(id_col).over(wv))
        .filter(
            F.col("__prev").isNotNull() & (F.col(id_col) - F.col("__prev") > 1)
        )
        .select(
            (F.col("__prev") + 1).alias("gap_start"),
            (F.col(id_col) - 1).alias("gap_end"),
        )
    )
    summary = ids.groupBy("__b").agg(
        F.min(id_col).alias("__mn"), F.max(id_col).alias("__mx")
    )
    ws = Window.orderBy("__b")
    # cross-bucket deltas in decimal(38,0) (r9 review): buckets can sit
    # anywhere in the long range, and a raw long __mn - __pmx overflows
    # for spans past 2^63 — silently missing the gap under non-ANSI
    # arithmetic, throwing under the gate's ANSI sessions. (The
    # intra-bucket delta above is safe: same-bucket ids differ < bucket.)
    # The gap BOUNDS stay long-safe whenever a gap exists: __pmx + 1 and
    # __mn - 1 are then interior to the id range.
    mn_d = F.col("__mn").cast("decimal(38,0)")
    pmx_d = F.col("__pmx").cast("decimal(38,0)")
    inter = (
        summary.withColumn("__pmx", F.lag("__mx").over(ws))
        .filter(F.col("__pmx").isNotNull() & (mn_d - pmx_d > 1))
        .select(
            (F.col("__pmx") + 1).alias("gap_start"),
            (F.col("__mn") - 1).alias("gap_end"),
        )
    )
    # gap_len likewise in decimal, surfaced as long; a gap longer than
    # Long.MAX (possible only for ids spanning most of the long range) is
    # unrepresentable — emit NULL rather than a wrapped/raised value
    len_d = (
        F.col("gap_end").cast("decimal(38,0)")
        - F.col("gap_start").cast("decimal(38,0)")
        + 1
    )
    return intra.unionByName(inter).select(
        "gap_start",
        "gap_end",
        F.when(len_d <= F.lit(2**63 - 1), len_d.cast("long")).alias("gap_len"),
    )
