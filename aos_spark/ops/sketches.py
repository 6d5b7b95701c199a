"""Count-min sketch — sublinear frequency estimation for hot-key /
heavy-hitter detection.

At 100 TB you cannot afford an exact `groupBy(key).count()` just to decide
which keys need salting (ops/skew); a count-min sketch compresses the
frequency table to d×w counters in ONE map-side-combined shuffle of d·w
groups, independent of key cardinality. Estimates never undercount
(collisions only add), overcount is bounded by 2N/w with probability
1-(1/2)^d — so "estimate > threshold" is a safe hot-key test.

Hashes are md5-derived (the cross-engine-reproducible trick used across
the oracle suite), so the sketch itself is deterministic and the gate
query can verify the exact same construction in DuckDB.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

DEFAULT_DEPTH = 4
DEFAULT_WIDTH = 64


def _bucket(key: Column, row: Column | int, width: int) -> Column:
    r = F.lit(row) if isinstance(row, int) else row
    h = F.conv(
        F.substring(
            F.md5(F.concat(r.cast("string"), F.lit(":"), key.cast("string"))), 1, 8
        ),
        16,
        10,
    )
    return h.cast("bigint") % width


def cms_build(
    df: DataFrame,
    key_col: str,
    depth: int = DEFAULT_DEPTH,
    width: int = DEFAULT_WIDTH,
) -> DataFrame:
    """Build the sketch: one row per (hash row, bucket) with its counter.
    d×w rows total — broadcastable whatever the input size."""
    rows = F.explode(F.sequence(F.lit(0), F.lit(depth - 1))).alias("__row")
    exploded = df.select(F.col(key_col).alias("__key"), rows)
    return (
        exploded.select(
            "__row", _bucket(F.col("__key"), F.col("__row"), width).alias("__bucket")
        )
        .groupBy("__row", "__bucket")
        .agg(F.count(F.lit(1)).alias("counter"))
    )


def cms_estimate(
    sketch: DataFrame,
    keys: DataFrame,
    key_col: str,
    depth: int = DEFAULT_DEPTH,
    width: int = DEFAULT_WIDTH,
) -> DataFrame:
    """Estimated frequency per key: min over the d counters the key hashes
    to. The sketch side is d×w rows — broadcast; keys never shuffle beyond
    their own aggregation."""
    probes = keys.select(
        F.col(key_col),
        F.explode(F.sequence(F.lit(0), F.lit(depth - 1))).alias("__row"),
    ).withColumn("__bucket", _bucket(F.col(key_col), F.col("__row"), width))
    return (
        probes.join(F.broadcast(sketch), ["__row", "__bucket"], "left")
        .groupBy(key_col)
        .agg(F.min(F.coalesce("counter", F.lit(0))).alias("est_count"))
    )


def hot_keys(
    df: DataFrame,
    key_col: str,
    threshold: int,
    depth: int = DEFAULT_DEPTH,
    width: int = DEFAULT_WIDTH,
) -> DataFrame:
    """Keys whose estimated frequency exceeds ``threshold`` — the input to
    salting decisions (ops/skew). Never misses a genuinely hot key (CMS
    never undercounts); may include borderline false positives, which a
    targeted exact count over just these candidates can then prune."""
    sketch = cms_build(df, key_col, depth, width)
    distinct_keys = df.select(key_col).distinct()
    est = cms_estimate(sketch, distinct_keys, key_col, depth, width)
    return est.filter(F.col("est_count") > threshold)
