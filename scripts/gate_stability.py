"""Run-to-run stability of the full oracle gate (VERDICT r8 #6).

The r8 flake (`order_autocorrelation` hash-red exactly once, in the
driver's end-of-round 203-query shared-session sweep, green in every
isolated rerun) motivates an empirical invariance check that the
per-query property tests can't give: run the ENTIRE gate N times in one
shared Spark session — the driver's exact execution context — and diff
each query's canonical value hash run-to-run.

Two axes of perturbation, because "same bits twice" alone doesn't prove
partitioning invariance:

- Spark passes can vary ``spark.sql.shuffle.partitions`` per pass
  (runtime-settable; changes every exchange's partition count, hence
  every partial-aggregation grouping and task ordering). A query whose
  hash moves across passes has an order-sensitivity its design denies.
- DuckDB passes vary ``threads`` (parallel aggregation order).

Any run-to-run divergence is appended to MISMATCH_LOG.jsonl with the
environment fingerprint, and a summary goes to GATE_STABILITY.json.

Usage: python scripts/gate_stability.py [sf_dir] [query ...]
  env GATE_STABILITY_PASSES  number of Spark passes   (default 3)
  env GATE_STABILITY_SHUFFLE comma list of shuffle-partition counts per
                             pass, "default" for the session value
                             (default "default,7,61")
"""

from __future__ import annotations

import json
import os
import sys
import time
from pathlib import Path

ROOT = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(ROOT))
sys.path.insert(0, str(ROOT / "scripts"))

import duckdb

from aos_spark.cache import release_tracked
from aos_spark.envinfo import env_fingerprint
from aos_spark.queries import ORACLES, QUERIES
from aos_spark.session import get_spark
from check_oracle import TABLES, value_hash


def spark_pass(spark, names, sf_dir: str, shuffle: str | None) -> dict[str, str]:
    """One full-sweep pass: name -> value hash ('ERR:<msg>' on failure)."""
    if shuffle is not None:
        spark.conf.set("spark.sql.shuffle.partitions", shuffle)
    hashes: dict[str, str] = {}
    for name in names:
        try:
            sdf = QUERIES[name](spark, sf_dir)
            rows = [tuple(r) for r in sdf.collect()]
            hashes[name] = value_hash(rows, sdf.columns)
        except Exception as e:  # keep sweeping; an error IS an instability
            hashes[name] = f"ERR:{e}"[:120]
        finally:
            release_tracked()
    return hashes


def duck_pass(sf_dir: str, names, threads: int | None) -> dict[str, str]:
    con = duckdb.connect()
    if threads is not None:
        con.execute(f"SET threads={threads}")
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    hashes: dict[str, str] = {}
    for name in names:
        if name not in ORACLES:
            continue
        try:
            res = con.execute(ORACLES[name])
            cols = [d[0] for d in res.description]
            hashes[name] = value_hash(res.fetchall(), cols)
        except Exception as e:
            hashes[name] = f"ERR:{e}"[:120]
    return hashes


def diff_passes(tag: str, passes: list[dict[str, str]]) -> list[dict]:
    unstable = []
    for name in passes[0]:
        seen = [p.get(name) for p in passes]
        if len(set(seen)) > 1:
            unstable.append({"engine": tag, "query": name, "hashes": seen})
    return unstable


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 and "/" in sys.argv[1] else "/root/testdata/sf0.01"
    only = [a for a in sys.argv[1:] if "/" not in a]
    names = only or list(QUERIES)

    n_passes = int(os.environ.get("GATE_STABILITY_PASSES", "3"))
    shuffles = os.environ.get("GATE_STABILITY_SHUFFLE", "default,7,61").split(",")

    spark = get_spark("gate-stability")
    spark.conf.set("spark.sql.timestampType", "TIMESTAMP_NTZ")
    spark.conf.set("spark.sql.ansi.enabled", "true")
    default_shuffle = spark.conf.get("spark.sql.shuffle.partitions")

    spark_passes = []
    resolved_shuffles = []  # what each pass ACTUALLY ran under, for forensics
    for i in range(n_passes):
        shuffle = shuffles[i % len(shuffles)]
        shuffle = default_shuffle if shuffle == "default" else shuffle
        resolved_shuffles.append(int(shuffle))
        t0 = time.time()
        spark_passes.append(spark_pass(spark, names, sf_dir, shuffle))
        print(f"spark pass {i + 1}/{n_passes} (shuffle={shuffle}): "
              f"{time.time() - t0:.0f}s", flush=True)
    spark.conf.set("spark.sql.shuffle.partitions", default_shuffle)

    duck_passes = [duck_pass(sf_dir, names, threads) for threads in (None, 1)]
    print("duckdb passes done (threads=auto,1)", flush=True)

    unstable = diff_passes("spark", spark_passes) + diff_passes("duckdb", duck_passes)
    summary = {
        "sf_dir": sf_dir,
        "n_queries": len(names),
        "spark_passes": n_passes,
        "shuffle_partitions_per_pass": resolved_shuffles,
        "duckdb_threads_per_pass": ["auto", 1],
        "unstable": unstable,
        "env": env_fingerprint(spark),
    }
    if not only:
        # same guard as check_oracle.py: diagnostic sweeps at other SFs
        # must not clobber the sf0.01 artifact of record
        if sf_dir.rstrip("/").endswith("sf0.01"):
            out = ROOT / "GATE_STABILITY.json"
        else:
            sf_tag = sf_dir.rstrip("/").rsplit("/", 1)[-1].replace(".", "")
            out = ROOT / f"GATE_STABILITY_{sf_tag.upper()}_DIAG.json"
        out.write_text(json.dumps(summary, indent=2) + "\n")
    if unstable:
        rounds = [int(p.stem.split("_r")[1])
                  for p in ROOT.glob("CORRECTNESS_r*.json")]
        log = ROOT / "MISMATCH_LOG.jsonl"
        with log.open("a") as f:
            for u in unstable:
                f.write(json.dumps({
                    "kind": "run_to_run", **u,
                    "as_of_latest_driver_round": max(rounds, default=0),
                    "env": summary["env"],
                }) + "\n")
        for u in unstable:
            print(f"UNSTABLE {u['engine']} {u['query']}: {u['hashes']}")
        print(f"{len(unstable)} unstable queries")
        return 1
    print(f"stable: {len(names)} queries x {n_passes} spark passes "
          f"(+2 duckdb passes) — all hashes identical run-to-run")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
