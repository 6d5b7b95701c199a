"""Exact distributed second-moment statistics (variance/covariance/
correlation) from DECIMAL moment sums.

Engine-native ``corr``/``covar_samp``/``stddev_samp`` accumulate doubles in
a streaming update (Welford-style in Spark, a different order in DuckDB/
pandas), so the last bits depend on partitioning and engine — they can
never be cross-engine or cross-run exact. This module instead aggregates
the five raw moments (n, Σx, Σy, Σxy, Σx², Σy²) as DECIMAL(38, s) — exact
integers-in-disguise, order-independent — and derives the statistics with
a fixed sequence of double operations, so the result is bit-identical on
ANY partitioning and in any engine that follows the same formula.

Numerical caveat, stated honestly: the textbook moment form loses
precision when |mean| ≫ stddev. The decimal accumulation removes the
summation error entirely (sums are exact); only the final catastrophic
cancellation remains, which is acceptable for the value ranges here and
is the price of cross-engine reproducibility. For ill-conditioned data,
pre-center x and y by an approximate mean first (same operator shape).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def moment_aggs(x: str, y: str, scale: int = 6) -> list[Column]:
    """The five exact moment sums + count for (x, y), decimal-accumulated.

    Each sum is ROUNDED (linear sums to 2 decimals, product sums to whole
    units) before the double cast: a decimal whose integer-unit magnitude
    stays under 2^53 converts to double EXACTLY in every engine, whereas
    casting a 26-significant-digit DECIMAL(38,12) to double rounds
    differently ulp-wise across engines (observed Spark vs DuckDB). The
    rounding perturbs the moments by ≤0.5 unit — relative 1e-14 here —
    and identically in both engines, preserving bit-exactness."""
    xd = F.col(x).cast(f"decimal(18,{scale})")
    yd = F.col(y).cast(f"decimal(18,{scale})")

    def lin(c: Column) -> Column:
        return F.round(F.sum(c), 2).cast("double")

    def prod(c: Column) -> Column:
        return F.round(F.sum(c.cast(f"decimal(38,{2 * scale})")), 0).cast("double")

    return [
        F.count(F.lit(1)).alias("n"),
        lin(xd).alias("sum_x"),
        lin(yd).alias("sum_y"),
        prod(xd * yd).alias("sum_xy"),
        prod(xd * xd).alias("sum_xx"),
        prod(yd * yd).alias("sum_yy"),
    ]


def derive_stats(df: DataFrame, round_to: int = 6) -> DataFrame:
    """Attach covar_samp / corr / stddev columns derived from the moment
    sums with a FIXED operation order (documented in the SQL oracle)."""
    n = F.col("n").cast("double")
    cov = (F.col("sum_xy") - F.col("sum_x") * F.col("sum_y") / n) / (n - 1)
    var_x = (F.col("sum_xx") - F.col("sum_x") * F.col("sum_x") / n) / (n - 1)
    var_y = (F.col("sum_yy") - F.col("sum_y") * F.col("sum_y") / n) / (n - 1)
    corr = cov / F.sqrt(var_x * var_y)
    return df.select(
        *df.columns,
        F.round(cov, round_to).alias("covar_xy"),
        F.round(F.sqrt(var_x), round_to).alias("stddev_x"),
        F.round(F.sqrt(var_y), round_to).alias("stddev_y"),
        F.round(corr, round_to).alias("corr_xy"),
    )


def grouped_correlation(
    df: DataFrame, group_cols: list[str], x: str, y: str, scale: int = 6
) -> DataFrame:
    """Per-group exact-moment correlation: one map-side-combined shuffle on
    the group keys; every downstream value is a deterministic function of
    the exact moments."""
    moments = df.groupBy(*group_cols).agg(*moment_aggs(x, y, scale))
    return derive_stats(moments)
