"""Data-quality expectation checks (the dbt-test / Great-Expectations
surface): each check returns a one-row frame (check, n_failed); a suite
unions them into one validation report.

Every check is a pure aggregate over the target — no collects, no row
materialization of failures (at 100 TB you page failures separately,
keyed by the check that flagged them). The union of N checks over the
same table still scans it N times by default; for hot paths compose the
aggregates into one pass like q_profile_columns does — these stay
separate because validation suites mix TABLES, not just columns.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def check_not_null(df: DataFrame, col: str, name: str | None = None) -> DataFrame:
    return df.agg(
        F.lit(name or f"not_null:{col}").alias("check"),
        F.sum(F.isnull(col).cast("long")).alias("n_failed"),
    )


def check_unique(df: DataFrame, cols: list[str], name: str | None = None) -> DataFrame:
    dups = (
        df.groupBy(*cols)
        .agg(F.count(F.lit(1)).alias("__n"))
        .filter(F.col("__n") > 1)
    )
    return dups.agg(
        F.lit(name or f"unique:{','.join(cols)}").alias("check"),
        F.coalesce(F.sum(F.col("__n") - 1), F.lit(0)).alias("n_failed"),
    )


def check_accepted_values(
    df: DataFrame, col: str, values: list, name: str | None = None
) -> DataFrame:
    bad = ~F.col(col).isin(values) | F.isnull(col)
    return df.agg(
        F.lit(name or f"accepted_values:{col}").alias("check"),
        F.sum(bad.cast("long")).alias("n_failed"),
    )


def check_referential(
    child: DataFrame,
    parent: DataFrame,
    child_key: str,
    parent_key: str,
    name: str | None = None,
) -> DataFrame:
    """Orphaned child rows: anti-join against the parent key set. The
    parent side reduces to its distinct key column before the join, so a
    wide parent never ships more than the key."""
    orphans = child.join(
        parent.select(F.col(parent_key).alias(child_key)).distinct(),
        child_key,
        "left_anti",
    )
    return orphans.agg(
        F.lit(name or f"referential:{child_key}->{parent_key}").alias("check"),
        F.count(F.lit(1)).alias("n_failed"),
    )


def run_suite(checks: list[DataFrame]) -> DataFrame:
    """Union the one-row check frames into the validation report."""
    out = checks[0]
    for c in checks[1:]:
        out = out.unionByName(c)
    return out
