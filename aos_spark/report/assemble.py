"""JSON situation-report assembly (reports.py:106-143 template,
:577-784 do_report) with forecast-over-forecast change tracking (J13,
reports.py:627-703) and the None-vs-0 contract (reports.py:29-40,747-773).

All heavy computation happens in Spark aggregations; only the final ~small
dict is collected. Deltas come from the PREVIOUS report JSON (same storm,
forecast_time − 6 h), mirroring load_json_report(date-6h) — not a recompute.
"""

from __future__ import annotations

import json
import math
import os
from datetime import datetime, timedelta

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

TOP_K = 5  # reports.py:73
COMPACT_FMT = "%Y%m%d%H%M%S"  # FILE_STRUCTURE.md:308-311


def compact_to_dt(compact: str) -> datetime:
    return datetime.strptime(compact, COMPACT_FMT)


def dt_to_compact(dt: datetime) -> str:
    return dt.strftime(COMPACT_FMT)


def human_time(compact: str) -> str:
    """'October 15, 2025 12:00 UTC' (reports.py:195-222)."""
    dt = compact_to_dt(compact)
    return dt.strftime("%B %-d, %Y %H:%M UTC")


def previous_forecast(compact: str, hours: int = 6) -> str:
    return dt_to_compact(compact_to_dt(compact) - timedelta(hours=hours))


def _optional(v):
    """None-on-NULL/NaN (the _optional_ceil/_optional_int contract,
    reports.py:29-40): absent data is None, never 0."""
    if v is None:
        return None
    if isinstance(v, float) and math.isnan(v):
        return None
    return v


def _optional_ceil(v):
    v = _optional(v)
    return None if v is None else int(math.ceil(v))


def report_path(warehouse: str, storm: str, forecast_time: str) -> str:
    return os.path.join(
        warehouse, "reports", f"{storm}_{forecast_time}.json"
    )


def save_report(warehouse: str, storm: str, forecast_time: str, report: dict) -> str:
    path = report_path(warehouse, storm, forecast_time)
    os.makedirs(os.path.dirname(path), exist_ok=True)
    with open(path, "w") as f:
        json.dump(report, f, indent=2, sort_keys=True)
    return path


def load_report(warehouse: str, storm: str, forecast_time: str) -> dict | None:
    path = report_path(warehouse, storm, forecast_time)
    if not os.path.exists(path):
        return None
    with open(path) as f:
        return json.load(f)


def build_report(
    spark: SparkSession,
    warehouse: str,
    storm: str,
    forecast_time: str,
    tile_view: DataFrame,
    admin_view: DataFrame,
    events: DataFrame,
    fac_view: DataFrame | None = None,
    key_threshold: int = 100,
    ensemble_size: int = 8,
) -> dict:
    """Assemble the flat report dict: per-threshold totals (A6), top-K tiles
    (A8), max active threshold (A9), landfall stats (A10/W2), per-admin rows,
    vulnerability breakdowns (A7/F8, reports.py:393-462), per-facility-type
    top-5 lists and expected-impact counts (reports.py:106-143,705-736),
    deltas vs the previous forecast (J13)."""
    # A6 — ceil'd expected totals per threshold (NULL-safe)
    totals = {
        int(r["wind_threshold"]): r.asDict()
        for r in tile_view.groupBy("wind_threshold")
        .agg(
            F.sum(F.col("E_population").cast("decimal(18,6)"))
            .cast("double")
            .alias("E_population"),
            F.sum(F.col("E_built_surface").cast("decimal(18,6)"))
            .cast("double")
            .alias("E_built_surface"),
        )
        .collect()
    }
    # A9 — highest threshold with any probability mass
    max_th_row = (
        tile_view.groupBy("wind_threshold")
        .agg(F.sum("probability").alias("p"))
        .filter(F.col("p") > 0)
        .agg(F.max("wind_threshold").alias("m"))
        .first()
    )
    max_active_threshold = _optional(max_th_row["m"]) if max_th_row else None

    # A8 — top-K tiles by probability at the key threshold (deterministic
    # tie-break by tile_id)
    top_tiles = [
        {"tile_id": int(r["tile_id"]), "probability": r["probability"]}
        for r in tile_view.filter(F.col("wind_threshold") == key_threshold)
        .orderBy(F.col("probability").desc(), F.col("tile_id"))
        .limit(TOP_K)
        .collect()
    ]

    # A10/W2 — landfall: first event above the key threshold per member
    from aos_spark.ops.windows import first_match

    firsts = first_match(
        events.select(
            F.col("event_type").alias("member"), "ts", "event_id", "value"
        ),
        ["member"],
        ["ts", "event_id"],
        F.col("value") >= key_threshold,
    )
    lf = firsts.agg(
        F.count(F.lit(1)).alias("n"),
        F.date_format(F.min("ts"), "yyyy-MM-dd HH:mm:ss").alias("earliest"),
        F.date_format(F.max("ts"), "yyyy-MM-dd HH:mm:ss").alias("latest"),
    ).first()
    landfall = {
        "n_members_making_landfall": int(lf["n"]),
        "landfall_fraction": round(lf["n"] / ensemble_size, 6),
        "earliest": lf["earliest"],
        "latest": lf["latest"],
    }

    # per-admin rows at the key threshold, keyed BY NAME (deliberate
    # deviation from reports.py:538-544's positional alignment — documented)
    admin_rows = {
        int(r["admin_id"]): {
            "E_population": _optional(r["E_population"]),
            "E_built_surface": _optional(r["E_built_surface"]),
            "E_rwi": _optional(r["E_rwi"]),
        }
        for r in admin_view.filter(F.col("wind_threshold") == key_threshold).collect()
        if r["admin_id"] is not None
    }

    # A7/F8 — vulnerability section at the key threshold. Poverty bands come
    # from actual RWI (E_rwi / probability, reports.py:440-462); the
    # urban/rural split uses actual built-surface density as the settlement-
    # class analog (the domain has no SMOD layer; same de-expected formula,
    # reports.py:416-439). None-vs-0 contract: no banding data at all → None
    # ("N/A"); data present but an empty band → 0 (confirmed zero).
    from aos_spark.ops.vulnerability import band_sums, poverty_band, urban_rural_class

    key_tiles = tile_view.filter(
        (F.col("wind_threshold") == key_threshold) & (F.col("probability") > 0)
    )
    vulnerability: dict = {}
    rwi_bands = {
        r["band"]: r
        for r in band_sums(
            key_tiles.filter(F.col("E_rwi").isNotNull()),
            poverty_band(),
            "band",
            ["E_population", "E_built_surface"],
        ).collect()
    }
    for band, label in [("poverty", "poverty"), ("severe_poverty", "severe")]:
        for metric, mlabel in [("E_population", "pop"), ("E_built_surface", "built_surface")]:
            vulnerability[f"expected_{mlabel}_{label}"] = (
                _optional_ceil(rwi_bands[band][metric])
                if band in rwi_bands
                else (0 if rwi_bands else None)
            )
    ur_bands = {
        r["band"]: r
        for r in band_sums(
            key_tiles.withColumn("E_smod_class", F.col("E_built_surface")).filter(
                F.col("E_smod_class").isNotNull()
            ),
            urban_rural_class(),
            "band",
            ["E_population", "E_built_surface"],
        ).collect()
    }
    for band in ("urban", "rural"):
        for metric, mlabel in [("E_population", "pop"), ("E_built_surface", "built_surface")]:
            vulnerability[f"expected_{mlabel}_{band}"] = (
                _optional_ceil(ur_bands[band][metric])
                if band in ur_bands
                else (0 if ur_bands else None)
            )

    # per-facility-type top-5 + expected impacted-facility counts
    # (reports.py:705-736: nlargest(5, probability) at the key threshold,
    # falling back to the lowest available threshold; expected count =
    # ceil(Σ probability); kind with no facility data at all → None)
    top_facilities: dict = {}
    expected_facilities: dict = {}
    if fac_view is not None:
        from pyspark.sql import Window

        from aos_spark.pipeline.jobs import FACILITY_KINDS

        ths = sorted(
            r["wind_threshold"]
            for r in fac_view.select("wind_threshold").distinct().collect()
        )
        key_th = key_threshold if key_threshold in ths else (ths[0] if ths else None)
        if key_th is not None:
            kf = fac_view.filter(F.col("wind_threshold") == key_th)
            w = Window.partitionBy("kind").orderBy(
                F.col("probability").desc(), "facility_id"
            )
            top_rows = (
                kf.withColumn("__rn", F.row_number().over(w))
                .filter(F.col("__rn") <= TOP_K)
                .collect()
            )
            sums = {
                r["kind"]: r
                for r in kf.groupBy("kind")
                .agg(F.sum("probability").alias("p"))
                .collect()
            }
            for kind in FACILITY_KINDS:
                rows = sorted(
                    (r for r in top_rows if r["kind"] == kind),
                    key=lambda r: r["__rn"],
                )
                top_facilities[kind] = [
                    {
                        "facility_id": int(r["facility_id"]),
                        "probability": r["probability"],
                    }
                    for r in rows
                ]
                expected_facilities[f"expected_{kind}"] = (
                    _optional_ceil(sums[kind]["p"]) if kind in sums else None
                )

    report = {
        "storm": storm,
        "forecast_time": forecast_time,
        "forecast_time_human": human_time(forecast_time),
        "max_active_threshold": max_active_threshold,
        "thresholds": {
            str(th): {
                "expected_population_impacted": _optional_ceil(
                    totals.get(th, {}).get("E_population") if th in totals else None
                ),
                "expected_built_surface_impacted": _optional_ceil(
                    totals.get(th, {}).get("E_built_surface") if th in totals else None
                ),
            }
            for th in sorted(totals)
        },
        "top_tiles": top_tiles,
        "landfall": landfall,
        "admin_rows": admin_rows,
        "vulnerability": vulnerability,
        "top_facilities": top_facilities,
        "expected_facilities": expected_facilities,
    }

    # J13 — change vs previous forecast (6 h earlier), if that report exists
    prev = load_report(warehouse, storm, previous_forecast(forecast_time))
    deltas = {}
    if prev is not None:
        for th, cur in report["thresholds"].items():
            p = prev.get("thresholds", {}).get(th, {})
            for k, v in cur.items():
                pv = p.get(k)
                deltas[f"{th}:{k}"] = (
                    None if v is None or pv is None else v - pv
                )
        # change_{kind} analog (reports.py:694-703): facility-count deltas
        prev_fac = prev.get("expected_facilities", {})
        for k, v in report["expected_facilities"].items():
            pv = prev_fac.get(k)
            deltas[f"facilities:{k}"] = None if v is None or pv is None else v - pv
    report["deltas_vs_previous"] = deltas
    report["has_previous"] = prev is not None
    return report
