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
    order_col: str,
    point_cols: list[str],
) -> DataFrame:
    """Pair each row with its successor within the partition (W1): for every
    ``point_cols`` c, adds ``c_next = lead(c)``; rows with no successor are
    dropped (a track of n points yields n-1 segments)."""
    w = Window.partitionBy(*partition_cols).orderBy(order_col)
    out = df
    for c in point_cols:
        out = out.withColumn(f"{c}_next", F.lead(c).over(w))
    return out.filter(F.col(f"{point_cols[0]}_next").isNotNull())


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
