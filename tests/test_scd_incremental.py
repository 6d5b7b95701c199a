"""Tests for SCD2 dimension maintenance (ops/scd.py) and incremental
aggregate states (ops/incremental.py)."""

from __future__ import annotations

import datetime

from pyspark.sql import functions as F

from aos_spark.ops import incremental as I
from aos_spark.ops.scd import scd2_apply

D = datetime.date


def _hist(spark, rows):
    return spark.createDataFrame(
        rows, "k long, seg string, valid_from date, valid_to date"
    )


def test_scd2_change_delete_insert_and_passthrough(spark):
    hist = _hist(spark, [
        (1, "A", D(1995, 1, 1), None),          # unchanged
        (2, "A", D(1995, 1, 1), None),          # will change to B
        (3, "A", D(1995, 1, 1), None),          # deleted from snapshot
        (2, "Z", D(1990, 1, 1), D(1995, 1, 1)),  # closed history: untouched
    ])
    snap = spark.createDataFrame(
        [(1, "A"), (2, "B"), (4, "C")], "k long, seg string"
    )
    out = scd2_apply(hist, snap, ["k"], ["seg"], "2000-01-01")
    rows = {(r["k"], r["seg"], r["valid_from"], r["valid_to"]) for r in out.collect()}
    assert rows == {
        (1, "A", D(1995, 1, 1), None),            # kept open
        (2, "A", D(1995, 1, 1), D(2000, 1, 1)),   # closed by change
        (2, "B", D(2000, 1, 1), None),            # new version
        (3, "A", D(1995, 1, 1), D(2000, 1, 1)),   # closed by deletion
        (4, "C", D(2000, 1, 1), None),            # brand-new key
        (2, "Z", D(1990, 1, 1), D(1995, 1, 1)),   # old history untouched
    }


def test_scd2_null_attr_is_not_a_change(spark):
    """NULL attr == NULL attr must count as unchanged (eqNullSafe), not
    close-and-reopen every row with a NULL."""
    hist = _hist(spark, [(1, None, D(1995, 1, 1), None)])
    snap = spark.createDataFrame([(1, None)], "k long, seg string")
    out = scd2_apply(hist, snap, ["k"], ["seg"], "2000-01-01")
    rows = [(r["k"], r["seg"], r["valid_to"]) for r in out.collect()]
    assert rows == [(1, None, None)]


def test_scd2_idempotent_reapply(spark):
    """Applying the same snapshot twice must be a no-op the second time."""
    hist = _hist(spark, [(1, "A", D(1995, 1, 1), None), (2, "A", D(1995, 1, 1), None)])
    snap = spark.createDataFrame([(1, "B"), (2, "A")], "k long, seg string")
    once = scd2_apply(hist, snap, ["k"], ["seg"], "2000-01-01")
    twice = scd2_apply(once, snap, ["k"], ["seg"], "2001-01-01")
    key = lambda r: (r["k"], r["seg"], r["valid_from"], r["valid_to"])
    assert sorted(map(key, once.collect())) == sorted(map(key, twice.collect()))


def test_incremental_merge_equals_batch_any_split(spark):
    """state(A) ⊕ state(B) == state(A ∪ B) exactly, for an arbitrary
    split — the algebraic-state contract."""
    df = spark.range(1_000).select(
        (F.col("id") % 3).alias("g"),
        (F.col("id") * 0.37 - 17.0).alias("v"),
    )
    a = df.filter(F.col("id") % 5 < 2)
    b = df.filter(F.col("id") % 5 >= 2)
    merged = I.finalize(
        I.merge_states(I.agg_state(a, ["g"], "v"), I.agg_state(b, ["g"], "v"), ["g"]),
        ["g"],
    )
    whole = I.finalize(I.agg_state(df, ["g"], "v"), ["g"])
    key = lambda r: tuple(r)
    assert sorted(map(key, merged.collect())) == sorted(map(key, whole.collect()))


def test_encode_tokens_order_and_oov(spark):
    """Ids are frequency-ranked; OOV (below min_df) tokens drop; sequence
    order follows the document, not the join."""
    from aos_spark.llm.text import encode_tokens

    rows = [(1, "b a b rare"), (2, "a b"), (3, "b a")]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {r["doc_id"]: r["token_ids"]
           for r in encode_tokens(df, min_df=2).collect()}
    # df: b=3, a=3 → ties break by term asc: a=1, b=2; 'rare' df=1 dropped
    assert got == {1: [2, 1, 2], 2: [1, 2], 3: [2, 1]}


def test_scd2_empty_snapshot_closes_everything(spark):
    """An empty snapshot is a full logical delete: every open row closes,
    closed history is untouched."""
    hist = _hist(spark, [
        (1, "A", D(1995, 1, 1), None),
        (2, "Z", D(1990, 1, 1), D(1995, 1, 1)),
    ])
    snap = spark.createDataFrame([], "k long, seg string")
    out = scd2_apply(hist, snap, ["k"], ["seg"], "2000-01-01")
    rows = {(r["k"], r["valid_to"]) for r in out.collect()}
    assert rows == {(1, D(2000, 1, 1)), (2, D(1995, 1, 1))}


def test_incremental_empty_batch_is_identity(spark):
    """Merging an empty batch's state must not change the aggregate."""
    df = spark.range(100).select((F.col("id") % 2).alias("g"), F.col("id").alias("v"))
    empty = df.filter(F.col("v") < 0)
    merged = I.finalize(
        I.merge_states(I.agg_state(df, ["g"], "v"), I.agg_state(empty, ["g"], "v"), ["g"]),
        ["g"],
    )
    whole = I.finalize(I.agg_state(df, ["g"], "v"), ["g"])
    assert sorted(map(tuple, merged.collect())) == sorted(map(tuple, whole.collect()))


def test_scd2_lookup_point_in_time(spark):
    from aos_spark.ops.scd import scd2_lookup

    hist = _hist(spark, [
        (1, "A", D(1995, 1, 1), D(2000, 1, 1)),
        (1, "B", D(2000, 1, 1), None),
        (2, "Z", D(1998, 1, 1), None),
    ])
    at_1999 = {(r["k"], r["seg"]) for r in scd2_lookup(hist, "1999-06-01").collect()}
    assert at_1999 == {(1, "A"), (2, "Z")}
    at_2001 = {(r["k"], r["seg"]) for r in scd2_lookup(hist, "2001-01-01").collect()}
    assert at_2001 == {(1, "B"), (2, "Z")}
    # boundary day: the new version is current ON its valid_from
    at_boundary = {(r["k"], r["seg"]) for r in scd2_lookup(hist, "2000-01-01").collect()}
    assert at_boundary == {(1, "B"), (2, "Z")}


def test_snapshot_diff_ops(spark):
    from aos_spark.ops.scd import snapshot_diff

    old = spark.createDataFrame([(1, "A"), (2, "B"), (3, "C")], "k long, v string")
    new = spark.createDataFrame([(2, "B"), (3, "X"), (4, "D")], "k long, v string")
    feed = {(r["op"], r["k"], r["v"]) for r in
            snapshot_diff(old, new, ["k"], ["v"]).collect()}
    assert feed == {("delete", 1, None), ("update", 3, "X"), ("insert", 4, "D")}


def test_scd2_null_key_rows_survive(spark):
    """r9 review: an open history row whose key is NULL joined nothing
    under `=` keys and fell through all three branch filters — silently
    vanishing from the returned history. NULL keys now join null-safely
    and row presence is tracked by markers, not key nullness."""
    hist = _hist(spark, [
        (None, "A", D(1995, 1, 1), None),
        (1, "A", D(1995, 1, 1), None),
    ])
    snap = spark.createDataFrame([(None, "A"), (1, "A")], "k long, seg string")
    out = scd2_apply(hist, snap, ["k"], ["seg"], "1996-01-01")
    rows = sorted(
        ((r["k"], r["seg"], r["valid_to"]) for r in out.collect()),
        key=str,
    )
    # both keys unchanged: both stay open, nothing closed, nothing lost
    assert rows == [(1, "A", None), (None, "A", None)]

    # and a CHANGED null-key row closes + reopens like any other key
    snap2 = spark.createDataFrame([(None, "B"), (1, "A")], "k long, seg string")
    out2 = scd2_apply(hist, snap2, ["k"], ["seg"], "1996-01-01").collect()
    nulls = sorted(
        ((r["seg"], r["valid_to"]) for r in out2 if r["k"] is None), key=str
    )
    assert nulls == [("A", D(1996, 1, 1)), ("B", None)]


def test_snapshot_diff_null_key_not_misread_as_insert(spark):
    """r9 review sibling defect: an old-side row with a NULL key was
    labeled 'insert' (presence tested via key nullness). With markers +
    null-safe keys, an unchanged NULL-key row emits nothing and a
    changed one emits 'update'."""
    from aos_spark.ops.scd import snapshot_diff

    old = spark.createDataFrame([(None, "x"), (1, "x")], "k long, v string")
    new = spark.createDataFrame([(None, "x"), (1, "y")], "k long, v string")
    got = {(r["k"], r["op"]) for r in
           snapshot_diff(old, new, ["k"], ["v"]).collect()}
    assert got == {(1, "update")}


def test_incremental_finalize_negative_means_exact(spark):
    """r9 review: negative sums hit the unsigned rounding idiom's
    truncate-toward-zero path — avg(-5/4) read -1.249999."""
    from aos_spark.ops.incremental import agg_state, finalize

    df = spark.createDataFrame(
        [("k", -1.0), ("k", -1.0), ("k", -1.0), ("k", -2.0)], "g string, v double"
    )
    row = finalize(agg_state(df, ["g"], "v"), ["g"]).collect()[0]
    assert row["avg"] == -1.25, row["avg"]
