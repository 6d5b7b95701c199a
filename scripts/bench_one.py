"""Isolated single-query benchmark: cold + N warm runs in a fresh session.

Used to attribute round-over-round bench regressions: the full bench.py
sweep shares one JVM across 87 queries, so GC pressure / shuffle-file
accumulation / codegen-cache churn from earlier queries can inflate a
later query's number. Running one query in its own process gives the
noise-free figure. Usage:

    python scripts/bench_one.py <query> [n_warm] [sf_dir]
"""

from __future__ import annotations

import json
import os
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from aos_spark.cache import release_tracked
from aos_spark.queries import QUERIES
from aos_spark.session import get_spark


def main() -> None:
    name = sys.argv[1]
    n_warm = int(sys.argv[2]) if len(sys.argv) > 2 else 3
    sf_dir = sys.argv[3] if len(sys.argv) > 3 else os.environ.get(
        "SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"
    )
    spark = get_spark("bench-one")
    spark.read.parquet(f"{sf_dir}/nation.parquet").count()
    cpus = os.cpu_count() or 8
    spark.range(cpus * 4, numPartitions=cpus).mapInPandas(
        lambda it: it, "id long"
    ).count()

    times: list[float] = []
    for _ in range(1 + n_warm):
        release_tracked()
        spark.catalog.clearCache()
        t0 = time.time()
        QUERIES[name](spark, sf_dir).write.format("noop").mode("overwrite").save()
        times.append(round(time.time() - t0, 3))
    print(json.dumps({"query": name, "sf_dir": sf_dir, "cold": times[0],
                      "warm": times[1:],
                      "warm_min": min(times[1:]) if times[1:] else None}))


if __name__ == "__main__":
    main()
