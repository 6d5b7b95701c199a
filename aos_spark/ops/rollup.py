"""Admin rollups with the reference's null contract — SURVEY.md §2.4 A3/A4, §2.3 J9.

The load-bearing semantic (SURVEY §1.2): NaN/NULL = "no data", 0 = "confirmed
zero". Optional columns (facility counts) must stay NULL when every input is
NULL — the reference implements this with a custom `_optional_sum`
(impact_analysis.py:152-159). Spark's `F.sum` already returns NULL on
all-NULL groups, so optional columns are native; NON-optional columns need
`coalesce(sum, 0)` to reproduce pandas' all-NaN→0.0 default. Empty regions
(groups with no fact rows at all) are preserved by a left join from the
region skeleton with selective zero-fill (impact_analysis.py:1493-1498).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def agg_with_null_contract(
    df: DataFrame,
    keys: list[str],
    sum_cols: list[str] = (),
    avg_cols: list[str] = (),
    optional_sum_cols: list[str] = (),
) -> DataFrame:
    """groupBy(keys) with sum/avg/optional-sum column families.

    Mirrors the agg-dict pattern at impact_analysis.py:2007-2017 and
    :1443-1446,1488-1491. Runs as one partial+final hash aggregate.
    """
    aggs = [F.coalesce(F.sum(c), F.lit(0.0)).alias(c) for c in sum_cols]
    aggs += [F.avg(c).alias(c) for c in avg_cols]
    aggs += [F.sum(c).alias(c) for c in optional_sum_cols]  # NULL on all-NULL
    return df.groupBy(*keys).agg(*aggs)


def rollup_preserving_empty(
    skeleton: DataFrame,
    agg: DataFrame,
    keys: list[str],
    zero_fill_cols: list[str],
) -> DataFrame:
    """Left-join aggregates onto the full region skeleton so regions with no
    facts still appear (J9, impact_analysis.py:1493-1498); only the
    non-optional columns are zero-filled."""
    out = skeleton.join(agg, keys, "left")
    for c in zero_fill_cols:
        out = out.withColumn(c, F.coalesce(F.col(c), F.lit(0.0)))
    return out
