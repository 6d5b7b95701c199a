"""SparkSession factory.

One place for every engine-level config so local tests and cluster runs
share the same semantics. Defaults target correctness-critical settings
(UTC session timezone, ANSI off to match reference NaN-tolerant math) and
scale-critical settings (AQE with skew handling, dynamic partition
overwrite replacing the reference's prefix-delete idiom,
impact_analysis.py:2790-2805).
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def get_spark(
    app_name: str = "aos_spark",
    master: str | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    """Build (or fetch) the engine SparkSession.

    Local mode sizes shuffle partitions to the core count; on a real
    cluster leave ``shuffle_partitions`` None and let AQE coalesce from
    an intentionally-high initial number.
    """
    if master is None:
        cpus = os.environ.get("SPARK_GRAFT_CPUS") or str(os.cpu_count() or 4)
        master = f"local[{cpus}]"
    is_local = master.startswith("local")
    if shuffle_partitions is None:
        shuffle_partitions = (os.cpu_count() or 8) if is_local else 2000

    b = (
        SparkSession.builder.master(master)
        .appName(app_name)
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.sources.partitionOverwriteMode", "dynamic")
        # split even a single small parquet file across the cluster: the
        # driver test tables are one file each, and a 1-partition scan
        # serializes every downstream codegen stage onto one core
        .config("spark.sql.files.minPartitionNum", str((os.cpu_count() or 8) if is_local else 2000))
        # reference math is NaN-propagating pandas; ANSI would raise instead
        .config("spark.sql.ansi.enabled", "false")
        # AQE coalesces post-shuffle partitions by BYTES, but the LLM-tier
        # verify stages (exact-cosine / shingle-intersection checks after
        # banding) carry ~100-300 bytes/row of keys+vectors while costing
        # ~6 µs/candidate of compute, so the default 1 MB floor collapses a
        # multi-second stage onto one core (measured: the embedding
        # near-dup verify join, 609 KB post-shuffle, ran 1 task at 0.79 s
        # warm; with a 64 KB floor it spreads to ~10 tasks, 0.48 s). The
        # floor only matters for exchanges under cores×1 MB — at cluster
        # scale target size is bytes/parallelism and this setting is inert,
        # so it is scale-neutral, not a local[32] tune. Env-overridable for
        # deployments whose scheduler overhead dominates tiny tasks.
        .config(
            "spark.sql.adaptive.coalescePartitions.minPartitionSize",
            os.environ.get("AOS_AQE_MIN_PARTITION_SIZE", "64k"),
        )
        # envelopes / admin dims / quadkey covers are all broadcast-size
        .config("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
        .config("spark.ui.enabled", "false")
        .config("spark.driver.memory", os.environ.get("AOS_DRIVER_MEM", "8g"))
    )
    for k, v in (extra_conf or {}).items():
        b = b.config(k, v)
    spark = b.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark
