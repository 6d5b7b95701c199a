"""Event-sequence analytics: Markov transition matrices and rate-burst
detection over keyed event streams.

Both operators follow the repo's window discipline — every window is
PARTITIONED by the entity key, so the only shuffle is one key-hash
exchange and no task ever sees more than one entity's history. Parity
target: the reference's per-storm track sequencing (SURVEY.md §2.5 W1/W2
chronological windows) generalized to arbitrary state sequences; the
reference itself has no Markov/burst operator, these belong to the
training-/product-analytics tier the brief adds on top.

Determinism contract (repo-wide): counts are exact BIGINTs; every
probability is ONE IEEE754 division of two exact integers, so results
are bit-identical on any partitioning and in any engine that follows
the same formula (the DuckDB oracles do).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def transition_matrix(
    df: DataFrame,
    key_col: str,
    state_col: str,
    order_cols: list[str],
) -> DataFrame:
    """First-order Markov transition matrix of ``state_col`` sequences.

    Per entity (``key_col``), order events by ``order_cols`` (must be a
    deterministic total order — include a unique tiebreaker), pair each
    state with its predecessor via ``lag`` over a key-partitioned window,
    then count (prev_state, next_state) pairs corpus-wide and normalize
    per source state.

    Physical shape: ONE key-hash shuffle feeds the lag window; the pair
    count is a partial-agg'd groupBy on (prev, next) — at most
    |states|² groups, so the normalizing window runs over a frame whose
    size is independent of event volume. At 100 TB nothing but the first
    exchange scales with the data.

    Output: prev_state, next_state, n_transitions (BIGINT), prob
    (n_transitions / total-from-prev_state, one exact-int division).
    """
    w = Window.partitionBy(key_col).orderBy(*order_cols)
    pairs = (
        df.select(key_col, state_col, *order_cols)
        .withColumn("__prev", F.lag(state_col).over(w))
        .filter(F.col("__prev").isNotNull())
    )
    counts = pairs.groupBy(
        F.col("__prev").alias("prev_state"),
        F.col(state_col).alias("next_state"),
    ).agg(F.count(F.lit(1)).alias("n_transitions"))
    per_prev = Window.partitionBy("prev_state")
    return counts.withColumn(
        "prob",
        F.col("n_transitions") / F.sum("n_transitions").over(per_prev),
    )


def burst_hours(
    df: DataFrame,
    key_col: str,
    ts_col: str,
    lookback_hours: int = 3,
    factor: int = 2,
) -> DataFrame:
    """Per-entity hourly rate-burst detection (abuse/anomaly screening):
    an active hour is a *burst* when its event count is at least
    ``factor``× the trailing ``lookback_hours``-hour average.

    The trailing average uses a RANGE frame over the integer hour id, so
    calendar gaps are handled without gap-filling: an hour with no
    trailing activity (empty frame) is never a burst — there is no rate
    to exceed. The burst rule is evaluated in EXACT integer arithmetic
    (``n · |frame| ≥ factor · Σframe``), never via a float average, so
    boundary cases are engine- and partitioning-independent.

    Physical shape: one key-hash shuffle for the hourly rollup (partial
    agg combines map-side), then a key-partitioned RANGE window over the
    per-entity HOURLY frame — already reduced by ~events-per-hour — and
    a final per-entity aggregate on the same partitioning. The hour id is
    ``floor(epoch/3600)``; sub-second truncation in ``unix_timestamp``
    cannot move an event across an hour boundary (hour boundaries are
    whole seconds).

    Output per entity: n_active_hours, n_burst_hours (BIGINT), peak
    hourly count, and total events.
    """
    hourly = df.groupBy(
        F.col(key_col),
        F.floor(F.unix_timestamp(F.col(ts_col)) / 3600).alias("__hour_id"),
    ).agg(F.count(F.lit(1)).alias("__n"))
    trail = (
        Window.partitionBy(key_col)
        .orderBy("__hour_id")
        .rangeBetween(-lookback_hours, -1)
    )
    flagged = hourly.select(
        key_col,
        "__n",
        F.sum("__n").over(trail).alias("__trail_sum"),
        F.count("__n").over(trail).alias("__trail_n"),
    ).withColumn(
        "__is_burst",
        (F.col("__trail_n") > 0)
        & (
            F.col("__n") * F.col("__trail_n")
            >= F.lit(factor) * F.col("__trail_sum")
        ),
    )
    return flagged.groupBy(key_col).agg(
        F.count(F.lit(1)).alias("n_active_hours"),
        F.sum(F.col("__is_burst").cast("long")).alias("n_burst_hours"),
        F.max("__n").alias("peak_hourly"),
        F.sum("__n").alias("total_events"),
    )


def session_paths(
    df: DataFrame,
    key_col: str,
    ts_col: str,
    state_col: str,
    tiebreak_col: str,
    gap_seconds: int = 21600,
    max_len: int = 5,
    k: int = 20,
) -> DataFrame:
    """Top-k session journeys: gap-sessionize (same rule as
    ops/windows.sessionize), take each session's first ``max_len`` states
    in event order, join them into a '>'-separated path string, count
    path frequencies corpus-wide, and return the top ``k`` with ranks.

    Physical shape: ONE key-hash shuffle serves the session-id window,
    the within-session row_number window, AND the per-session path
    aggregate (hash partitioning on the key satisfies the (key, session)
    clustering requirement, so Catalyst inserts no further exchange —
    only sorts). The path-count frame then shrinks to |distinct paths|
    (bounded by |states|^max_len, independent of event volume), and the
    global top-k uses ops/topk.topk_global — TakeOrderedAndProject, never
    a partition-less window. The path string is capped at ``max_len``
    states, so no per-session state is ever unbounded.

    Output: path, n_sessions (BIGINT), rank_in_group (1-based).
    """
    from aos_spark.ops.topk import topk_global

    w = Window.partitionBy(key_col).orderBy(ts_col, tiebreak_col)
    epoch = F.unix_timestamp(F.col(ts_col))
    gap = epoch - F.lag(epoch).over(w)
    with_sid = df.select(
        key_col, ts_col, tiebreak_col, state_col
    ).withColumn(
        "__start", F.when(gap.isNull() | (gap > gap_seconds), 1).otherwise(0)
    ).withColumn(
        "__sid",
        F.sum("__start").over(w.rowsBetween(Window.unboundedPreceding, 0)),
    )
    ws = Window.partitionBy(key_col, "__sid").orderBy(ts_col, tiebreak_col)
    paths = (
        with_sid.withColumn("__rn", F.row_number().over(ws))
        .filter(F.col("__rn") <= max_len)
        .groupBy(key_col, "__sid")
        .agg(
            F.array_join(
                F.transform(
                    F.array_sort(
                        F.collect_list(
                            F.struct(
                                F.col(ts_col), F.col(tiebreak_col), F.col(state_col)
                            )
                        )
                    ),
                    lambda x: x[state_col],
                ),
                ">",
            ).alias("path")
        )
    )
    counts = paths.groupBy("path").agg(F.count(F.lit(1)).alias("n_sessions"))
    return topk_global(counts, "n_sessions", "path", k=k)
