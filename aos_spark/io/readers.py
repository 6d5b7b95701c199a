"""Parquet/CSV readers through a storage-abstraction boundary (S9, S15, S16).

The reference reads through a pluggable file store (data_store_utils.py:34-83)
where the backend switch is configuration, not code. In Spark that property
is native: the path URI scheme selects the filesystem (file://, s3a://,
abfss://), so ``read_table`` only adds what Spark lacks out of the box —
tolerant handling of nanosecond parquet timestamps (Spark refuses
TIMESTAMP(NANOS); we read them as longs and convert to truncated-to-micros
timestamps, which is exactly how DuckDB/pandas present the same files).
"""

from __future__ import annotations

from functools import lru_cache

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


@lru_cache(maxsize=256)
def _nano_ts_columns(path: str) -> tuple[str, ...]:
    """Column names stored as parquet TIMESTAMP(NANOS) at ``path``."""
    try:
        import pyarrow.dataset as ds
        import pyarrow as pa

        schema = ds.dataset(path.removeprefix("file://")).schema
        return tuple(
            name
            for name, typ in zip(schema.names, schema.types)
            if pa.types.is_timestamp(typ) and typ.unit == "ns"
        )
    except Exception:
        return ()


def read_table(spark: SparkSession, path: str) -> DataFrame:
    """spark.read.parquet with nanosecond-timestamp normalization."""
    nanos = _nano_ts_columns(path)
    if nanos:
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    df = spark.read.parquet(path)
    for c in nanos:
        # floor-divide to microseconds — matches DuckDB's truncation of
        # TIMESTAMP_NS to its native micros TIMESTAMP
        df = df.withColumn(c, F.timestamp_micros(F.floor(F.col(c) / 1000).cast("long")))
    return df


def read_sf_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return read_table(spark, f"{sf_dir}/{name}.parquet")
