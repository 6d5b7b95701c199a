"""Per-ensemble-member severity views — SURVEY.md §2.3 J6/J7 + §2.4 A5.

Reference: per member, sum tile population/built-surface under the member's
envelope and count facilities (impact_analysis.py:2038-2091). In the quadkey
formulation this is the SAME cover join as the probability view, grouped by
member instead of tile — compute the (tile, member, threshold) hit set once
and derive both (SURVEY §4.1's CSE note).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def member_severity(
    hits_with_values: DataFrame,
    member_col: str,
    threshold_col: str,
    sum_cols: list[str],
    count_col: str | None = None,
) -> DataFrame:
    """hits (member, threshold, zone, values…) → per-(member, threshold) sums.

    Optional-sum semantics apply: all-NULL inputs yield NULL, matching
    _optional_sum (impact_analysis.py:152-159).
    """
    aggs = [F.sum(c).alias(f"total_{c}") for c in sum_cols]
    if count_col is not None:
        aggs.append(F.count(count_col).alias("n_zones"))
    return hits_with_values.groupBy(member_col, threshold_col).agg(*aggs)
