"""Slowly-changing-dimension maintenance (SCD Type 2): apply a new
snapshot of a dimension to its history table, closing changed/deleted
versions and opening new ones.

The reference maintains its country registry by overwrite
(country_utils.py upsert path); SCD2 is the warehouse-grade upgrade a
Spark user expects: full history with (valid_from, valid_to) ranges,
NULL valid_to = current.

Scale shape: ONE full-outer join keyed on the business key between the
OPEN slice of history and the snapshot — closed history rows pass
through untouched (filter, no join), so cost tracks the live dimension
size, not the accumulated history. Change detection compares attribute
structs (null-safe <=>), never row hashes, so type drift can't alias.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _attrs_equal(attr_cols: list[str], left: str, right: str) -> Column:
    cond = F.lit(True)
    for c in attr_cols:
        cond = cond & F.col(f"{left}.{c}").eqNullSafe(F.col(f"{right}.{c}"))
    return cond


def scd2_lookup(
    history: DataFrame,
    as_of: str,
    from_col: str = "valid_from",
    to_col: str = "valid_to",
) -> DataFrame:
    """Point-in-time slice of an SCD2 history: the version of every key
    that was current at ``as_of`` (valid_from ≤ as_of < valid_to, open
    rows unbounded). A pushed filter — no join, no window."""
    d = F.lit(as_of).cast("date")
    return history.filter(
        (F.col(from_col) <= d) & (F.col(to_col).isNull() | (F.col(to_col) > d))
    )


def snapshot_diff(
    old: DataFrame,
    new: DataFrame,
    key_cols: list[str],
    attr_cols: list[str],
) -> DataFrame:
    """Change-data-capture between two snapshots: one full-outer join on
    the business key emitting ('insert' | 'delete' | 'update') rows —
    unchanged rows are dropped, so the feed size tracks the CHANGE rate,
    not the table size. Attribute comparison is null-safe; output carries
    the key plus the new-side attributes (null for deletes)."""
    # Null-safe key join + explicit presence markers (r9 review): a `=`
    # join never matches NULL key cells (spurious delete+insert churn for
    # a key with a NULL component), and testing row presence via
    # key_cols[0].isNotNull() misreads a genuine row whose first key
    # component is NULL as "absent" — here that mislabeled a surviving
    # old row as an 'insert'.
    o = old.withColumn("__o_present", F.lit(1)).alias("o")
    n = new.withColumn("__n_present", F.lit(1)).alias("n")
    cond = F.lit(True)
    for k in key_cols:
        cond = cond & F.col(f"o.{k}").eqNullSafe(F.col(f"n.{k}"))
    j = o.join(n, cond, "full_outer")
    in_old = F.col("o.__o_present").isNotNull()
    in_new = F.col("n.__n_present").isNotNull()
    same = _attrs_equal(attr_cols, "o", "n")
    op = (
        F.when(~in_old, "insert")
        .when(~in_new, "delete")
        .when(~same, "update")
    )
    return (
        j.withColumn("op", op)
        .filter(F.col("op").isNotNull())
        .select(
            "op",
            *[F.coalesce(F.col(f"n.{k}"), F.col(f"o.{k}")).alias(k) for k in key_cols],
            *[F.col(f"n.{c}").alias(c) for c in attr_cols],
        )
    )


def scd2_apply(
    history: DataFrame,
    snapshot: DataFrame,
    key_cols: list[str],
    attr_cols: list[str],
    effective_date: str,
    from_col: str = "valid_from",
    to_col: str = "valid_to",
) -> DataFrame:
    """Return the new history table. Rules, per business key:

    - open row + same attrs in snapshot  → unchanged (stays open)
    - open row + different attrs        → close at ``effective_date``,
      insert a new open row with the snapshot attrs
    - open row + key absent from snapshot → close (logical delete)
    - no open row + key in snapshot      → insert new open row
    - already-closed rows                → pass through untouched
    """
    eff = F.lit(effective_date).cast("date")
    closed = history.filter(F.col(to_col).isNotNull())
    # Null-safe join + presence markers, same rationale as snapshot_diff
    # (r9 review): with `=` keys and key_cols[0].isNotNull() presence
    # tests, an open history row whose first key component is NULL joined
    # nothing and then fell through ALL THREE branch filters — silently
    # vanishing from the returned history; a NULL in a later key
    # component caused a spurious close+reopen on every apply.
    open_rows = (
        history.filter(F.col(to_col).isNull())
        .withColumn("__o_present", F.lit(1))
        .alias("o")
    )
    snap = snapshot.withColumn("__s_present", F.lit(1)).alias("s")

    join_cond = F.lit(True)
    for k in key_cols:
        join_cond = join_cond & F.col(f"o.{k}").eqNullSafe(F.col(f"s.{k}"))
    joined = open_rows.join(snap, join_cond, "full_outer")

    in_open = F.col("o.__o_present").isNotNull()
    in_snap = F.col("s.__s_present").isNotNull()
    same = _attrs_equal(attr_cols, "o", "s")

    # surviving open rows, unchanged
    kept = joined.filter(in_open & in_snap & same).select("o.*")
    # open rows closed by change or deletion
    closing = (
        joined.filter(in_open & (~in_snap | ~same))
        .select("o.*")
        .withColumn(to_col, eff)
    )
    # fresh versions: changed attrs or brand-new keys
    opening = (
        joined.filter(in_snap & (~in_open | ~same))
        .select(
            *[F.col(f"s.{k}").alias(k) for k in key_cols],
            *[F.col(f"s.{c}").alias(c) for c in attr_cols],
        )
        .withColumn(from_col, eff)
        .withColumn(to_col, F.lit(None).cast("date"))
    )
    cols = key_cols + attr_cols + [from_col, to_col]
    return (
        closed.select(*cols)
        .unionByName(kept.select(*cols))
        .unionByName(closing.select(*cols))
        .unionByName(opening.select(*cols))
    )
