"""Filter/predicate operators — SURVEY.md §2.2 (F1–F11).

Reference semantics at impact_analysis.py:219-221,1721-1734 (F5),
main_pipeline.py:642 (F4), main_pipeline.py:650-666 + 466-481 (F11).
"""

from __future__ import annotations

from functools import reduce
from operator import or_

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def isin_any(mapping: dict[str, list]) -> Column:
    """OR-of-isin across columns — the facility-type filter (F5).

    Reference: mask |= gdf[col].isin(values) over HC_FACILITY_TYPES
    (impact_analysis.py:219-221,1729-1734). Stays a Catalyst predicate so
    it pushes down to the scan.
    """
    return reduce(or_, [F.col(c).isin(vals) for c, vals in mapping.items()])


def recency_filter(df: DataFrame, ts_col: str, as_of, days: int) -> DataFrame:
    """Keep rows whose ts is within ``days`` before ``as_of`` (F4).

    Reference: (today - forecast_date).days < time_delta (main_pipeline.py:642).
    Expressed as a RANGE predicate on the raw timestamp —
    datediff(as_of, date(ts)) < days  ≡  ts >= midnight of (as_of − days + 1)
    — so it reaches the parquet scan as a PushedFilter / row-group skip,
    which the datediff form (a function of the column) cannot.
    """
    cutoff = F.date_add(F.lit(as_of).cast("date"), -(days - 1)).cast("timestamp")
    return df.filter(F.col(ts_col) >= cutoff)


def new_work_antijoin(
    candidates: DataFrame,
    run_log: DataFrame,
    keys: list[str],
    *,
    status_col: str = "status",
    started_col: str = "started_at",
    as_of=None,
    staleness_hours: int = 6,
) -> DataFrame:
    """Idempotency dedup (F11): keep candidate (storm, forecast) pairs that
    have no SUCCESS row and no *fresh* IN_PROGRESS row in the run log.

    Reference: storms.json membership / run-log COUNT(*) with a 6-hour
    staleness window (main_pipeline.py:650-666, 466-481). Expressed as a
    left-anti join so Catalyst broadcasts the (small) log side.
    """
    now = F.lit(as_of).cast("timestamp") if as_of is not None else F.current_timestamp()
    blocking = run_log.filter(
        (F.col(status_col) == "SUCCESS")
        | (
            (F.col(status_col) == "IN_PROGRESS")
            & (F.col(started_col) > now - F.expr(f"INTERVAL {staleness_hours} HOURS"))
        )
    ).select(*keys).distinct()
    return candidates.join(blocking, keys, "left_anti")


def smod_l2_to_l1() -> Column:
    """SMOD settlement-class recode {10..13→1, 21..23→2, 30→3}, NULL preserved
    for unmapped values (reference impact_analysis.py:296-305,911-915)."""
    c = F.col("smod_class")
    return (
        F.when(c.isin(10.0, 11.0, 12.0, 13.0), F.lit(1.0))
        .when(c.isin(21.0, 22.0, 23.0), F.lit(2.0))
        .when(c == 30.0, F.lit(3.0))
        .otherwise(F.lit(None).cast("double"))
    )
