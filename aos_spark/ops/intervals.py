"""Range (interval) join — match points to the intervals containing them.

Spark plans a raw `p BETWEEN lo AND hi` join as a BroadcastNestedLoopJoin
(fine for a tiny interval dim — see j2) or, when neither side broadcasts, a
cartesian product — a non-starter at scale. The scalable formulation is
BUCKETIZATION: quantize the domain into fixed-width buckets, explode each
interval to the buckets it spans, map each point to its single bucket, and
equi-join on the bucket id before applying the exact range predicate. The
join becomes a hash join keyed by bucket — shuffle proportional to
|points| + Σ interval-spans/width, no pairwise blowup.

Bucket width trades duplication for selectivity: ~ the median interval
width is a good default (each interval lands in 1–2 buckets; each point
probes one). The same trick at 2-D is the quadkey cover join (geo/sjoin).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def interval_overlap_join(
    a: DataFrame,
    b: DataFrame,
    a_start: str,
    a_end: str,
    b_start: str,
    b_end: str,
    bucket_width: float,
    by: list[str] | None = None,
) -> DataFrame:
    """Interval × interval OVERLAP join (half-open [start, end) semantics):
    both sides explode to their bucket spans, equi-join on (by..., bucket),
    apply the exact overlap predicate, and DEDUPLICATE pairs that co-occur
    in several buckets by keeping only the bucket containing the overlap's
    start — a pure filter, no distinct shuffle. ``by`` adds equality keys
    (overlaps within a customer/session/machine) to the join, tightening
    both the shuffle key and the candidate set. Cost: hash join keyed by
    (by, bucket), shuffle ∝ Σ spans/width on each side."""
    if bucket_width <= 0:
        raise ValueError("bucket_width must be positive")
    w = float(bucket_width)
    by = by or []

    def spanned(df: DataFrame, start: str, end: str) -> DataFrame:
        return df.withColumn(
            "__bucket",
            F.explode(
                F.sequence(
                    F.floor(F.col(start) / w).cast("long"),
                    F.floor(F.col(end) / w).cast("long"),
                )
            ),
        )
    ea = spanned(a, a_start, a_end).alias("a")
    eb = spanned(b, b_start, b_end).alias("b")
    cond = F.col("a.__bucket") == F.col("b.__bucket")
    for k in by:
        cond = cond & (F.col(f"a.{k}") == F.col(f"b.{k}"))
    overlap_start = F.greatest(F.col(f"a.{a_start}"), F.col(f"b.{b_start}"))
    return (
        ea.join(eb, cond)
        .filter(
            (F.col(f"a.{a_start}") < F.col(f"b.{b_end}"))
            & (F.col(f"b.{b_start}") < F.col(f"a.{a_end}"))
        )
        # emit each overlapping pair from exactly ONE bucket
        .filter(F.floor(overlap_start / w).cast("long") == F.col("a.__bucket"))
        .drop("__bucket")
    )


def bucketized_range_join(
    points: DataFrame,
    intervals: DataFrame,
    value_col: str,
    start_col: str,
    end_col: str,
    bucket_width: float,
    how: str = "inner",
) -> DataFrame:
    """Join each point row to every interval row with
    start <= value <= end, via the bucket equi-join above. Output columns =
    points ⋈ intervals (bucket id dropped). ``how`` supports 'inner' and
    'left' (left keeps unmatched points with NULL interval columns via an
    anti-join union)."""
    if bucket_width <= 0:
        raise ValueError("bucket_width must be positive")
    shared = set(points.columns) & set(intervals.columns)
    if shared:
        # the output is points ⋈ intervals side by side — a shared name
        # makes every downstream reference ambiguous (and crashed the
        # 'left' rebuild before r9); fail loud instead
        raise ValueError(f"points and intervals share column names: {sorted(shared)}")
    w = float(bucket_width)
    iv = intervals.withColumn(
        "__bucket",
        F.explode(
            F.sequence(
                F.floor(F.col(start_col) / w).cast("long"),
                F.floor(F.col(end_col) / w).cast("long"),
            )
        ),
    )
    pt = points.withColumn("__bucket", F.floor(F.col(value_col) / w).cast("long"))
    matched = (
        pt.join(iv, "__bucket", "inner")
        .filter(
            (F.col(value_col) >= F.col(start_col))
            & (F.col(value_col) <= F.col(end_col))
        )
        .drop("__bucket")
    )
    if how == "inner":
        return matched
    if how == "left":
        # NULL-SAFE anti join (r9 review): a plain column-name anti join
        # evaluates `x = x` as NULL for a NULL cell, so a matched point
        # row containing any NULL was re-emitted as unmatched — one input
        # row becoming two output rows. eqNullSafe keys still plan as a
        # hash/sort-merge join (Spark supports null-safe equality keys).
        mk = matched.select(
            *[F.col(c).alias(f"__m_{c}") for c in points.columns]
        )
        cond = F.lit(True)
        for c in points.columns:
            cond = cond & F.col(c).eqNullSafe(F.col(f"__m_{c}"))
        missing = pt.drop("__bucket").join(mk, cond, "left_anti")
        return matched.unionByName(missing, allowMissingColumns=True)
    raise ValueError(f"unsupported how: {how!r}")


def merge_intervals(
    df: DataFrame,
    key_cols: list[str],
    start_col: str,
    end_col: str,
) -> DataFrame:
    """Union overlapping/touching intervals per key into maximal islands
    (the classic gaps-and-islands sweep). Start/end should be integers
    (e.g. epoch seconds) so the island arithmetic is exact.

    One shuffle, keyed by ``key_cols``: both windows (the previous-end
    running max that detects gaps, and the running sum that numbers the
    islands) ride the same partitioning, so Spark plans a single Exchange
    followed by one sort — per-key work is linear in the key's interval
    count, and no key's data leaves its partition. A touching interval
    (next.start == prev.end) merges, matching half-open coverage
    semantics; strict gaps (start > running max end) open a new island.

    Returns one row per island: key_cols + island_start / island_end /
    n_intervals. Scale note: island state never exceeds the key's own
    rows, so skew is bounded by the hottest key, same envelope as
    sessionize (ops/windows.py)."""
    from pyspark.sql import Window

    order = Window.partitionBy(*key_cols).orderBy(start_col, end_col)
    prev_max = F.max(end_col).over(
        order.rowsBetween(Window.unboundedPreceding, -1)
    )
    flagged = df.withColumn(
        "__new_island",
        F.when(prev_max.isNull() | (F.col(start_col) > prev_max), 1).otherwise(0),
    ).withColumn(
        "__island",
        F.sum("__new_island").over(
            order.rowsBetween(Window.unboundedPreceding, 0)
        ),
    )
    return flagged.groupBy(*key_cols, "__island").agg(
        F.min(start_col).alias("island_start"),
        F.max(end_col).alias("island_end"),
        F.count(F.lit(1)).alias("n_intervals"),
    )
