"""Local replica of the driver's correctness gate.

Runs every queries() entry on Spark and its oracle_sql() on DuckDB over the
same parquet tables, then compares row count, column names, and an
order-insensitive value hash (columns sorted by name, rows sorted by their
serialized form). Values are canonicalized with a PER-VALUE TYPE TAG and
floats as ``float.hex()`` — bit-exact and type-exact, so an int 36 never
matches a float 36.0 and a last-ulp double divergence is a FAIL.
(The round-1 ``%.9g``-and-untyped version masked two driver failures —
VERDICT r1 "What's wrong" #3.)

Value-exactness alone is NOT driver-faithful: the driver canonicalizes
through pandas, where DuckDB HUGEINT (any uncast integer SUM) becomes
float64 and LIST/STRUCT cells crash the hasher — 13 queries were locally
green but driver-red in r4 (VERDICT r4 "What's wrong"). So this gate also
DESCRIBEs every oracle and fails any output column whose DuckDB type is
outside the pandas-roundtrip-safe set, and fails any Spark output column
with a complex (array/map/struct) type. With both layers, local PASS
implies driver PASS.

Usage: python scripts/check_oracle.py [sf_dir] [query ...]
"""

from __future__ import annotations

import hashlib
import math
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import duckdb

from aos_spark.cache import release_tracked
from aos_spark.queries import ORACLES, QUERIES
from aos_spark.session import get_spark

TABLES = [
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
]

# DuckDB output types that survive the driver's pandas canonicalization
# with their values intact. HUGEINT/UHUGEINT render as float64, DECIMAL
# as float64 (while Spark's decimal arrives as object), LIST/STRUCT/MAP
# are unhashable — all are driver-reds even when values match bit-exact.
SAFE_DUCKDB_TYPES = {
    "BIGINT", "INTEGER", "SMALLINT", "TINYINT",
    "DOUBLE", "FLOAT",
    "VARCHAR", "DATE", "TIMESTAMP", "TIMESTAMP_NS", "BOOLEAN",
}


def unsafe_oracle_cols(con, sql: str) -> list[tuple[str, str]]:
    """(column, duckdb_type) pairs whose type the driver's pandas layer
    would mangle. DESCRIBE plans without executing, so this is cheap."""
    rows = con.execute(f"DESCRIBE {sql}").fetchall()
    return [(name, typ) for name, typ, *_ in rows if typ not in SAFE_DUCKDB_TYPES]


def unsafe_spark_cols(sdf) -> list[tuple[str, str]]:
    """Spark output columns with complex types — unhashable in the
    driver's pandas canonicalizer, same failure mode as DuckDB LIST."""
    return [
        (f.name, f.dataType.simpleString())
        for f in sdf.schema.fields
        if f.dataType.typeName() in ("array", "map", "struct")
    ]


def canon_value(v):
    if v is None:
        return "NULL"
    if isinstance(v, bool):  # before int: bool is an int subclass
        return f"bool:{str(v).lower()}"
    if isinstance(v, float):
        if math.isnan(v):
            return "float:nan"
        return f"float:{v.hex()}"
    if isinstance(v, int):
        return f"int:{v}"
    # Decimal/str/datetime/date/bytes/list: tag with the type name so type
    # drift between engines (e.g. Decimal vs float) can never alias.
    return f"{type(v).__name__}:{v}"


def value_hash(rows, colnames) -> str:
    order = sorted(range(len(colnames)), key=lambda i: colnames[i])
    lines = sorted("|".join(canon_value(r[i]) for i in order) for r in rows)
    h = hashlib.sha256()
    for line in lines:
        h.update(line.encode())
        h.update(b"\n")
    return h.hexdigest()[:16]


def log_mismatch(name: str, sf_dir: str, diff: dict, spark) -> None:
    """Append a hash-mismatch event (query, diverging canonical rows,
    full environment fingerprint) to MISMATCH_LOG.jsonl. Append-only and
    never cleaned: one line per observed divergence is exactly the
    forensic record the unreproduced r8 flake lacked."""
    import json

    from aos_spark.envinfo import env_fingerprint

    root = Path(__file__).resolve().parent.parent
    # Anchor for the rotation machinery (scripts/rotation_status.py):
    # the suspect clears when a STRICTLY LATER driver round samples the
    # query green.
    rounds = [int(p.stem.split("_r")[1]) for p in root.glob("CORRECTNESS_r*.json")]
    entry = {"query": name, "kind": "cross_engine", "sf_dir": sf_dir,
             "diff": diff, "as_of_latest_driver_round": max(rounds, default=0),
             "env": env_fingerprint(spark)}
    with (root / "MISMATCH_LOG.jsonl").open("a") as f:
        f.write(json.dumps(entry) + "\n")


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 and "/" in sys.argv[1] else "/root/testdata/sf0.01"
    only = [a for a in sys.argv[1:] if "/" not in a]

    spark = get_spark("oracle-check")
    # The driver's gate reads the testdata parquet (NTZ-annotated
    # TIMESTAMP_MICROS, isAdjustedToUTC=0) as TIMESTAMP_NTZ; round-2 and
    # round-3 both lost `sessionize_events` to a cast that was legal on
    # LTZ but not NTZ. Force NTZ locally so local green implies driver
    # green (VERDICT r3 "Next round" #1).
    spark.conf.set("spark.sql.timestampType", "TIMESTAMP_NTZ")
    # Session-faithfulness, round 3 of the lesson (r1 hashing, r4 pandas
    # typing, r5 ANSI): the driver runs a stock Spark-4 session where
    # spark.sql.ansi.enabled defaults to TRUE, so arithmetic that silently
    # wraps under the builder session (session.py forces ansi=false)
    # raises ARITHMETIC_OVERFLOW on the driver — that was
    # bloom_semijoin_prune's r5 red. Run the whole gate ANSI-on so local
    # PASS implies driver PASS under the driver's config too.
    spark.conf.set("spark.sql.ansi.enabled", "true")
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")

    names = only or list(QUERIES)
    n_pass = n_fail = 0
    results: dict[str, dict] = {}
    for name in names:
        t0 = time.time()
        try:
            sdf = QUERIES[name](spark, sf_dir)
            scols = sdf.columns
            bad_spark = unsafe_spark_cols(sdf)
            srows = [tuple(r) for r in sdf.collect()]
            release_tracked()  # free operator-internal persists per query
        except Exception as e:
            print(f"FAIL {name}: spark error: {e}")
            results[name] = {"rows_match": False, "schema_match": False,
                             "hash_match": False, "err": f"spark: {e}"[:200]}
            n_fail += 1
            continue
        if name not in ORACLES:
            print(f"SKIP {name}: no oracle ({len(srows)} rows)")
            continue
        try:
            bad_duck = unsafe_oracle_cols(con, ORACLES[name])
            res = con.execute(ORACLES[name])
            dcols = [d[0] for d in res.description]
            drows = res.fetchall()
        except Exception as e:
            print(f"FAIL {name}: duckdb error: {e}")
            results[name] = {"rows_match": False, "schema_match": False,
                             "hash_match": False, "err": f"duckdb: {e}"[:200]}
            n_fail += 1
            continue
        problems = []
        if bad_spark:
            problems.append(f"spark complex-typed output cols {bad_spark}")
        if bad_duck:
            problems.append(f"oracle pandas-unsafe output cols {bad_duck}")
        if len(srows) != len(drows):
            problems.append(f"rows {len(srows)} vs {len(drows)}")
        if sorted(scols) != sorted(dcols):
            problems.append(f"cols {sorted(scols)} vs {sorted(dcols)}")
        diff = None
        if not problems:
            sh, dh = value_hash(srows, scols), value_hash(drows, dcols)
            if sh != dh:
                problems.append(f"hash {sh} vs {dh}")

                def canon_rows(rows, cols):
                    idx = [cols.index(c) for c in sorted(cols)]
                    return {"|".join(canon_value(r[i]) for i in idx) for r in rows}

                sset, dset = canon_rows(srows, scols), canon_rows(drows, dcols)
                # Persisted evidence, not just stdout: the r8 flake
                # (order_autocorrelation red once, in the driver's
                # end-of-round sweep) was unattributable because the
                # driver's stdout is lost. The diverging rows now ride in
                # the artifact row AND in an append-only mismatch log.
                diff = {
                    "cols": sorted(scols),
                    "spark_only": sorted(sset - dset)[:5],
                    "duck_only": sorted(dset - sset)[:5],
                }
                print(f"    cols: {sorted(scols)}")
                for x in diff["spark_only"][:3]:
                    print(f"    spark-only: {x}")
                for x in diff["duck_only"][:3]:
                    print(f"    duck-only:  {x}")
                log_mismatch(name, sf_dir, diff, spark)
        dt = time.time() - t0
        results[name] = {
            "rows_match": len(srows) == len(drows),
            "schema_match": sorted(scols) == sorted(dcols),
            "hash_match": not problems,
            "spark_rows": len(srows),
            "oracle_rows": len(drows),
            "err": None,
        }
        if diff is not None:
            results[name]["diff"] = diff
        if problems:
            print(f"FAIL {name}: {'; '.join(problems)} ({dt:.1f}s)")
            n_fail += 1
        else:
            print(f"PASS {name} ({len(srows)} rows, {dt:.1f}s)")
            n_pass += 1
    print(f"\n{n_pass} passed, {n_fail} failed")
    if not only:  # full run: persist the all-queries artifact for the judge
        import json

        from aos_spark.envinfo import env_fingerprint

        # "__env__" (reserved, double-underscored so it can never collide
        # with a query name): the engine-version/config fingerprint that
        # makes a once-in-a-sweep divergence attributable after the fact
        # (VERDICT r8 "Next round" #2).
        # sf_dir is part of the fingerprint: the round-8 divergence was
        # only attributable because the red artifact's ROW COUNTS happened
        # to betray that the run had executed at sf0.1 — record it outright.
        artifact = {"__env__": env_fingerprint(spark) | {"sf_dir": sf_dir}} | results
        if sf_dir.rstrip("/").endswith("sf0.01"):
            out = Path(__file__).resolve().parent.parent / "CORRECTNESS_LOCAL.json"
        else:
            # Diagnostic sweeps at other SFs must not clobber the artifact
            # of record (its lock asserts __env__.sf_dir is the sf0.01
            # gate) — they get their own file, kept as evidence.
            sf_tag = sf_dir.rstrip("/").rsplit("/", 1)[-1].replace(".", "")
            out = Path(__file__).resolve().parent.parent / f"GATE_{sf_tag.upper()}_DIAG.json"
        out.write_text(json.dumps(artifact, indent=2) + "\n")
        print(f"wrote {out} ({len(results)} queries)")
    return 1 if n_fail else 0


if __name__ == "__main__":
    raise SystemExit(main())
