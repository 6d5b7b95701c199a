"""Incremental aggregate maintenance: keep a small per-key STATE frame
(count + exact-decimal sum) that new batches merge into, so refreshing a
dashboard aggregate costs O(|batch| + |state|) instead of a full rescan —
the batch-side analog of streaming's stateful aggregation, and the
pattern behind every "update the rollup nightly" job at warehouse scale.

States are algebraic (count/sum/min/max commute with union + re-agg), so
``merge_states(state(A), state(B)) == state(A ∪ B)`` exactly — the sums
accumulate in DECIMAL, so the equality is bit-for-bit regardless of how
the data was batched or partitioned (a double-sum state would drift by
summation order and make incremental != batch).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from aos_spark.ops.exact_round import round_ratio6_micro_signed


def agg_state(
    df: DataFrame,
    key_cols: list[str],
    value_col: str,
    scale: str = "decimal(28,6)",
) -> DataFrame:
    """Build the mergeable state: (keys..., __cnt, __sum, __min, __max)."""
    v = F.col(value_col).cast(scale)
    return df.groupBy(*key_cols).agg(
        F.count(value_col).alias("__cnt"),
        F.sum(v).alias("__sum"),
        F.min(v).alias("__min"),
        F.max(v).alias("__max"),
    )


def merge_states(a: DataFrame, b: DataFrame, key_cols: list[str]) -> DataFrame:
    """Combine two state frames (same schema): one keyed shuffle over
    state-sized inputs — the raw data is never touched."""
    return (
        a.unionByName(b)
        .groupBy(*key_cols)
        .agg(
            F.sum("__cnt").alias("__cnt"),
            F.sum("__sum").alias("__sum"),
            F.min("__min").alias("__min"),
            F.max("__max").alias("__max"),
        )
    )


def finalize(state: DataFrame, key_cols: list[str]) -> DataFrame:
    """State → presentation: n, total, avg, min, max (doubles, rounded)."""
    return state.select(
        *key_cols,
        F.col("__cnt").alias("n"),
        F.round(F.col("__sum").cast("double"), 4).alias("total"),
        # engine-exact mean (ops/exact_round): the double-quotient ROUND
        # is cross-engine knife-edge unsafe for rationals on the micro
        # grid; SIGNED variant — sums of signed value columns (balances,
        # deltas) go negative, where the unsigned idiom truncates toward
        # zero instead of rounding half-away (r9 review)
        round_ratio6_micro_signed(
            F.col("__sum") * 1_000_000, F.col("__cnt")
        ).alias("avg"),
        F.round(F.col("__min").cast("double"), 4).alias("min_value"),
        F.round(F.col("__max").cast("double"), 4).alias("max_value"),
    )
