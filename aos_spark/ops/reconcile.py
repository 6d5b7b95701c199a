"""Table reconciliation (anti-entropy): locate WHERE two huge tables
differ without shipping either — the cross-environment "did the migration
copy everything" check.

Shape: each side reduces to (bucket, n_rows, bucket_checksum) where the
bucket is an md5 prefix of the row's key and the checksum is an
order-independent SUM of per-row content hashes (exact integer math, so
bucket equality ⇔ bag-of-rows equality up to hash collisions). Comparing
two tables then costs one tiny bucket-frame join — mismatched buckets
name the key ranges to re-scan, turning a 100 TB diff into a drill-down.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def row_digest(cols: list[str]) -> F.Column:
    """Order-independent-summable content hash: first 8 md5 hex chars of
    the null-tagged concatenation, as a bigint."""
    parts = [F.coalesce(F.col(c).cast("string"), F.lit("\x00null")) for c in cols]
    return F.conv(
        F.substring(F.md5(F.concat_ws("\x1f", *parts)), 1, 8), 16, 10
    ).cast("bigint")


def bucket_checksums(
    df: DataFrame,
    key_col: str,
    cols: list[str] | None = None,
    n_buckets: int = 256,
) -> DataFrame:
    """(bucket, n_rows, checksum) — one aggregate pass, output size fixed
    at ``n_buckets`` regardless of table size."""
    cols = cols or df.columns
    bucket = (
        F.conv(F.substring(F.md5(F.col(key_col).cast("string")), 1, 8), 16, 10)
        .cast("bigint")
        % n_buckets
    )
    return (
        df.select(bucket.alias("bucket"), row_digest(cols).alias("__d"))
        .groupBy("bucket")
        .agg(
            F.count(F.lit(1)).alias("n_rows"),
            F.sum("__d").alias("checksum"),
        )
    )


def diff_buckets(
    a: DataFrame,
    b: DataFrame,
    key_col: str,
    cols: list[str] | None = None,
    n_buckets: int = 256,
) -> DataFrame:
    """Buckets where the two tables disagree: (bucket, n_rows_a, n_rows_b,
    match). Full-outer on the bucket frames; absent side reads as 0 rows."""
    ca = bucket_checksums(a, key_col, cols, n_buckets).alias("a")
    cb = bucket_checksums(b, key_col, cols, n_buckets).alias("b")
    j = ca.join(cb, F.col("a.bucket") == F.col("b.bucket"), "full_outer")
    return j.select(
        F.coalesce(F.col("a.bucket"), F.col("b.bucket")).alias("bucket"),
        F.coalesce(F.col("a.n_rows"), F.lit(0)).alias("n_rows_a"),
        F.coalesce(F.col("b.n_rows"), F.lit(0)).alias("n_rows_b"),
        (
            F.coalesce(F.col("a.n_rows"), F.lit(0)).eqNullSafe(
                F.coalesce(F.col("b.n_rows"), F.lit(0))
            )
            & F.coalesce(F.col("a.checksum"), F.lit(0)).eqNullSafe(
                F.coalesce(F.col("b.checksum"), F.lit(0))
            )
        ).alias("match"),
    )
