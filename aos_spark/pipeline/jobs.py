"""The three pipeline modes — initialize / update / patch — composed from
the operator library (SURVEY.md §3 lifecycle, main_pipeline.py:816-828).

Domain mapping onto the driver's fixture tables (TESTDATA.md): the `events`
table plays the forecast fact stream — `user_id` is the tile key,
`event_type` the ensemble member (8 members, the FULL_ENSEMBLE_SIZE
analog of impact_analysis.py:185-188), and `value` the wind intensity.
"Member hits tile at threshold t" ≡ `value >= t`, which makes thresholds
nested by construction — the same exceedance-envelope property the CCI
differencing relies on (impact_analysis.py:2617-2740).

Every view is written with dynamic partition overwrite (the F9
prefix-delete replacement) partitioned by (storm, forecast_compact
[, wind_threshold]) so re-runs are idempotent and stale partitions can't
survive. Idempotency across runs is the F11 anti-join against the run log.
"""

from __future__ import annotations

import os
import time

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from aos_spark.io.readers import read_sf_table
from aos_spark.io.writers import write_view
from aos_spark.ops import cci, probability, rollup, severity, spatial_assign
from aos_spark.pipeline import control

WIND_THRESHOLDS = [50, 100, 150]
ENSEMBLE_SIZE = 8
KEY_THRESHOLD = 100  # KEY_FOR_EXPECTED analog (reports.py:67)

FACILITY_KINDS = ["schools", "health_centers", "shelters", "wash"]
FACILITY_BUFFER = 2.0  # plane-unit analog of the 150 m facility buffer
                       # (BUFFER_DISTANCE_METERS, impact_analysis.py:175)

# tile → plane coordinates for the admin zone assignment (deterministic,
# key-derived — the quadkey-center formula analog)
def _tile_points(tiles: DataFrame, key: str = "tile_id") -> DataFrame:
    return tiles.withColumn("cx", (F.col(key) * 7.0) % 6000.0).withColumn(
        "cy", (F.col(key) % 97) * 10.0
    )


def _facilities(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Facility point sets (schools / health centers / shelters / WASH)
    derived deterministically from the customer dim — the analog of the
    fetch_schools/fetch_health_centers/fetch_shelters/fetch_wash location
    caches (impact_analysis.py:2810-2846). Integer-derived plane coordinates
    keep the derivation exactly reproducible in the SQL oracle."""
    c = read_sf_table(spark, sf_dir, "customer")
    kinds = F.array(*[F.lit(k) for k in FACILITY_KINDS])
    return c.select(
        F.col("c_custkey").alias("facility_id"),
        F.element_at(kinds, (F.col("c_custkey") % 4 + 1).cast("int")).alias("kind"),
        ((F.col("c_custkey") * 131) % 6000).cast("double").alias("fx"),
        ((F.col("c_custkey") * 17) % 970).cast("double").alias("fy"),
    )


def _zones_df(spark: SparkSession) -> DataFrame:
    from aos_spark.queries import ZONES

    return spark.createDataFrame(
        ZONES, "zone_id INT, xmin DOUBLE, xmax DOUBLE, ymin DOUBLE, ymax DOUBLE"
    )


def base_layer_path(warehouse: str) -> str:
    return os.path.join(warehouse, "base", "tiles")


def admin_layer_path(warehouse: str) -> str:
    return os.path.join(warehouse, "base", "admin")


BASE_SUM_COLS = ["population", "built_surface"]
BASE_AVG_COLS = ["rwi"]


def initialize(spark: SparkSession, sf_dir: str, warehouse: str, country: str = "AA") -> DataFrame:
    """Base-layer build (initialize_pipeline → save_mercator_and_admin_views,
    main_pipeline.py:384-419, impact_analysis.py:1505-1584).

    Produces the tile base layer (metrics per tile + admin assignment) and
    the admin rollup with empty-region preservation, then flips the
    registry flag. One shuffle for the metric agg; the zone dim broadcasts.
    """
    ev = read_sf_table(spark, sf_dir, "events")
    base = ev.groupBy(F.col("user_id").alias("tile_id")).agg(
        F.sum(F.col("value").cast("decimal(18,2)")).cast("double").alias("population"),
        F.count(F.lit(1)).cast("double").alias("built_surface"),
        F.avg(F.col("value").cast("decimal(18,2)")).cast("double").alias("rwi"),
    )

    pts = _tile_points(base.select("tile_id"))
    items = pts.select(
        F.col("tile_id").alias("item_id"),
        "cx",
        "cy",
        (F.col("cx") - 50.0).alias("bxmin"),
        (F.col("cx") + 50.0).alias("bxmax"),
        (F.col("cy") - 50.0).alias("bymin"),
        (F.col("cy") + 50.0).alias("bymax"),
    )
    assigned = spatial_assign.assign_zones_3step(items, _zones_df(spark)).select(
        F.col("item_id").alias("tile_id"), F.col("zone_id").alias("admin_id")
    )
    layer = base.join(assigned, "tile_id", "left").withColumn("country", F.lit(country))
    write_view(layer, base_layer_path(warehouse), partition_cols=["country"])

    _write_admin_layer(spark, warehouse, country)
    control.upsert_country(spark, warehouse, country, initialized=True)
    return layer


def _write_admin_layer(spark: SparkSession, warehouse: str, country: str) -> None:
    """A4+J9: admin rollup of the base layer, empty admins preserved."""
    layer = spark.read.parquet(base_layer_path(warehouse)).filter(
        F.col("country") == country
    )
    agg = rollup.agg_with_null_contract(
        layer.withColumn("population", F.col("population").cast("decimal(18,2)"))
        .withColumn("built_surface", F.col("built_surface").cast("decimal(18,2)"))
        .withColumn("rwi", F.col("rwi").cast("decimal(18,6)")),
        ["admin_id"],
        sum_cols=["population", "built_surface"],
        avg_cols=["rwi"],
        optional_sum_cols=[],
    )
    zones = _zones_df(spark).select(F.col("zone_id").alias("admin_id"))
    out = rollup.rollup_preserving_empty(
        zones, agg, ["admin_id"], zero_fill_cols=["population", "built_surface"]
    )
    out = out.select(
        "admin_id",
        F.col("population").cast("double").alias("population"),
        F.col("built_surface").cast("double").alias("built_surface"),
        F.col("rwi").cast("double").alias("rwi"),
    ).withColumn("country", F.lit(country))
    write_view(out, admin_layer_path(warehouse), partition_cols=["country"])


def _member_hits(ev: DataFrame) -> DataFrame:
    """(tile_id, member, wind_threshold) hit triples — the J1 equivalent.
    One scan fans out to all thresholds via an array literal (no per-
    threshold loop, F1 collapsed into a grouping column)."""
    thresholds = F.array(*[F.lit(t) for t in WIND_THRESHOLDS])
    return (
        ev.select(
            F.col("user_id").alias("tile_id"),
            F.col("event_type").alias("member"),
            F.explode(F.filter(thresholds, lambda t: F.col("value") >= t)).alias(
                "wind_threshold"
            ),
        )
        .distinct()
    )


def update(
    spark: SparkSession,
    sf_dir: str,
    warehouse: str,
    storm: str,
    forecast_time: str,
    *,
    rewrite: bool = False,
) -> dict:
    """The main analytical job (update_storms → run_complete_impact_analysis,
    main_pipeline.py:556-767). Returns a status dict.

    Chain per (storm, forecast): F11 idempotency gate → member-hit triples →
    A1 probability (fixed denominator) → A2 expected impacts → tile view →
    A3 admin view → W3/W4 CCI → A5 severity → report JSON → run log.
    """
    t0 = time.time()
    cand = spark.createDataFrame(
        [(storm, forecast_time)], "storm STRING, forecast_time STRING"
    )
    if not rewrite:
        from aos_spark.ops.filters import new_work_antijoin

        todo = new_work_antijoin(
            cand, control.latest_run_status(spark, warehouse), ["storm", "forecast_time"]
        )
        if todo.count() == 0:
            return {"status": "SKIPPED", "storm": storm, "forecast_time": forecast_time}

    run_id = control.log_run_start(spark, warehouse, storm, forecast_time)
    cached = []
    try:
        ev = read_sf_table(spark, sf_dir, "events")
        base = spark.read.parquet(base_layer_path(warehouse))
        # the hit set feeds probability AND severity; the tile view feeds
        # its own sink, the admin rollup, the CCI, and the report — cache
        # both for the storm job instead of recomputing per action
        # (the structural CSE the reference lacks, SURVEY §4.1)
        hits = _member_hits(ev).persist()
        cached.append(hits)

        # A1: probability per (tile, threshold) — count members / 8, tiles
        # with no hits at a threshold get probability 0 via the left join
        prob = hits.groupBy("tile_id", "wind_threshold").agg(
            (F.countDistinct("member") / F.lit(float(ENSEMBLE_SIZE))).alias("probability")
        )
        thresholds_df = spark.createDataFrame(
            [(t,) for t in WIND_THRESHOLDS], "wind_threshold INT"
        )
        tiles_x_th = base.crossJoin(F.broadcast(thresholds_df))
        tile_view = tiles_x_th.join(prob, ["tile_id", "wind_threshold"], "left").fillna(
            {"probability": 0.0}
        )
        # A2: expected impacts
        for c in BASE_SUM_COLS + BASE_AVG_COLS:
            tile_view = tile_view.withColumn(f"E_{c}", F.col(c) * F.col("probability"))
        tile_view = tile_view.select(
            "tile_id",
            "admin_id",
            "wind_threshold",
            "probability",
            *[f"E_{c}" for c in BASE_SUM_COLS + BASE_AVG_COLS],
        ).withColumn("storm", F.lit(storm)).withColumn(
            "forecast_compact", F.lit(forecast_time)
        )
        tile_view = tile_view.persist()
        cached.append(tile_view)
        write_view(
            tile_view,
            os.path.join(warehouse, "views", "tiles"),
            partition_cols=["storm", "forecast_compact", "wind_threshold"],
        )

        # A3: admin rollup of expected impacts (null contract: E_rwi optional)
        dec = tile_view
        for c in BASE_SUM_COLS:
            dec = dec.withColumn(f"E_{c}", F.col(f"E_{c}").cast("decimal(18,6)"))
        admin_view = rollup.agg_with_null_contract(
            dec,
            ["admin_id", "wind_threshold"],
            sum_cols=[f"E_{c}" for c in BASE_SUM_COLS],
            avg_cols=[],
            optional_sum_cols=["E_rwi"],
        )
        admin_view = admin_view.select(
            "admin_id",
            "wind_threshold",
            *[F.col(f"E_{c}").cast("double").alias(f"E_{c}") for c in BASE_SUM_COLS],
            "E_rwi",
        ).withColumn("storm", F.lit(storm)).withColumn(
            "forecast_compact", F.lit(forecast_time)
        )
        write_view(
            admin_view,
            os.path.join(warehouse, "views", "admin"),
            partition_cols=["storm", "forecast_compact", "wind_threshold"],
        )

        # W3/W4: CCI from the threshold-long tile view
        long_df = tile_view.select(
            "tile_id", "wind_threshold", (F.col("E_population")).alias("exposure")
        )
        cci_view = cci.cci_from_long(long_df, ["tile_id"], "wind_threshold", ["exposure"])
        cci_view = cci_view.withColumn("storm", F.lit(storm)).withColumn(
            "forecast_compact", F.lit(forecast_time)
        )
        write_view(
            cci_view,
            os.path.join(warehouse, "views", "cci"),
            partition_cols=["storm", "forecast_compact"],
        )

        # A5: severity per member
        sev_in = hits.join(base, "tile_id").select(
            F.col("member"),
            F.col("wind_threshold").alias("threshold"),
            F.col("population").cast("decimal(18,2)").alias("exposure"),
        )
        sev = severity.member_severity(sev_in, "member", "threshold", ["exposure"])
        sev = sev.withColumn(
            "total_exposure", F.col("total_exposure").cast("double")
        ).withColumn("storm", F.lit(storm)).withColumn(
            "forecast_compact", F.lit(forecast_time)
        )
        write_view(
            sev,
            os.path.join(warehouse, "views", "severity"),
            partition_cols=["storm", "forecast_compact"],
        )

        # J2×4 + S11: per-facility probability views (schools / health
        # centers / shelters / WASH) — one row per facility per threshold,
        # probability = hit members / fixed ensemble size, zero-hit
        # facilities kept at 0.0 (create_*_view_from_envelopes,
        # impact_analysis.py:1620-1717, saved at :2809-2840). A member's
        # "envelope" in the events domain is the bbox union (A12) of its hit
        # tiles; facility hit = buffered point-in-bbox. The envelope dim is
        # members × thresholds ≤ 24 rows → broadcast; facilities never
        # shuffle.
        fac = _facilities(spark, sf_dir)
        boxes = _tile_points(hits, "tile_id").select(
            "member",
            "wind_threshold",
            (F.col("cx") - 50.0).alias("xmin"),
            (F.col("cx") + 50.0).alias("xmax"),
            (F.col("cy") - 50.0).alias("ymin"),
            (F.col("cy") + 50.0).alias("ymax"),
        )
        env = spatial_assign.bbox_union(boxes, ["member", "wind_threshold"])
        b = F.lit(FACILITY_BUFFER)
        in_env = (
            (F.col("fx") + b >= F.col("xmin"))
            & (F.col("fx") - b <= F.col("xmax"))
            & (F.col("fy") + b >= F.col("ymin"))
            & (F.col("fy") - b <= F.col("ymax"))
        )
        fac_hits = (
            fac.join(F.broadcast(env), in_env)
            .select("facility_id", "kind", "member", "wind_threshold")
            .persist()
        )
        cached.append(fac_hits)
        fac_view = (
            fac.crossJoin(F.broadcast(thresholds_df))
            .join(
                fac_hits.groupBy("facility_id", "wind_threshold").agg(
                    (F.countDistinct("member") / F.lit(float(ENSEMBLE_SIZE))).alias(
                        "probability"
                    )
                ),
                ["facility_id", "wind_threshold"],
                "left",
            )
            .fillna({"probability": 0.0})
            .select("facility_id", "kind", "wind_threshold", "probability")
            .withColumn("storm", F.lit(storm))
            .withColumn("forecast_compact", F.lit(forecast_time))
        )
        write_view(
            fac_view,
            os.path.join(warehouse, "views", "facilities"),
            partition_cols=["kind", "storm", "forecast_compact", "wind_threshold"],
        )

        # track severity view: per (member, threshold) — facility counts per
        # kind + tile-metric sums under the member's envelope
        # (create_tracks_view_from_envelopes, impact_analysis.py:2038-2091).
        kind_counts = (
            fac_hits.groupBy("member", "wind_threshold")
            .pivot("kind", FACILITY_KINDS)
            .agg(F.count(F.lit(1)))
        )
        for k in FACILITY_KINDS:
            kind_counts = kind_counts.withColumnRenamed(k, f"severity_{k}")
        tile_sums = (
            hits.join(base, "tile_id")
            .groupBy("member", "wind_threshold")
            .agg(
                F.sum(F.col("population").cast("decimal(18,2)"))
                .cast("double")
                .alias("severity_population"),
                F.sum(F.col("built_surface").cast("decimal(18,2)"))
                .cast("double")
                .alias("severity_built_surface"),
            )
        )
        track_view = (
            env.select("member", "wind_threshold")
            .join(kind_counts, ["member", "wind_threshold"], "left")
            .join(tile_sums, ["member", "wind_threshold"], "left")
            .fillna({f"severity_{k}": 0 for k in FACILITY_KINDS})
            .withColumn("storm", F.lit(storm))
            .withColumn("forecast_compact", F.lit(forecast_time))
        )
        write_view(
            track_view,
            os.path.join(warehouse, "views", "tracks"),
            partition_cols=["storm", "forecast_compact", "wind_threshold"],
        )

        # W1: track-segment view — each member's event sequence paired with
        # its successor (consecutive-point polyline segments,
        # impact_analysis.py:2922-2927 / reports.py:224-254)
        from aos_spark.ops import windows as win_ops

        trk = _tile_points(
            ev.select(
                F.col("event_type").alias("member"),
                "ts",
                "event_id",
                F.col("user_id").alias("tile_id"),
            ),
            "tile_id",
        )
        seg = win_ops.lead_segments(
            trk, ["member"], ["ts", "event_id"], ["cx", "cy"]
        ).select(
            "member",
            "ts",
            "cx",
            "cy",
            "cx_next",
            "cy_next",
        )
        seg = seg.withColumn("storm", F.lit(storm)).withColumn(
            "forecast_compact", F.lit(forecast_time)
        )
        write_view(
            seg,
            os.path.join(warehouse, "views", "track_segments"),
            partition_cols=["storm", "forecast_compact"],
        )

        # report (driver-side JSON, incl. previous-forecast deltas)
        from aos_spark.report.assemble import build_report, save_report

        report = build_report(
            spark, warehouse, storm, forecast_time, tile_view, admin_view, ev,
            fac_view=fac_view,
        )
        save_report(warehouse, storm, forecast_time, report)

        control.log_run_complete(
            spark, warehouse, run_id, success=True, runtime_seconds=time.time() - t0
        )
        control.signal_pipeline_complete(spark, warehouse, storm, forecast_time)
        return {
            "status": "SUCCESS",
            "storm": storm,
            "forecast_time": forecast_time,
            "runtime_seconds": round(time.time() - t0, 3),
        }
    except Exception as e:
        control.log_run_complete(
            spark,
            warehouse,
            run_id,
            success=False,
            runtime_seconds=time.time() - t0,
            error=str(e)[:500],
        )
        raise
    finally:
        for df in cached:
            df.unpersist()


PATCHABLE = set(BASE_SUM_COLS + BASE_AVG_COLS)


def patch(
    spark: SparkSession,
    warehouse: str,
    country: str,
    column: str,
    custom: DataFrame,
) -> None:
    """Targeted column backfill (patch_pipeline → patch_country_layer,
    main_pipeline.py:425-459, impact_analysis.py:1189-1466): replace one
    metric column from a custom (tile_id, value) table, rewrite the base
    layer, re-aggregate every admin view.
    """
    if column not in PATCHABLE:
        raise ValueError(f"column {column!r} not patchable; allowed: {sorted(PATCHABLE)}")
    layer = spark.read.parquet(base_layer_path(warehouse)).filter(
        F.col("country") == country
    )
    patched = (
        layer.join(
            custom.select("tile_id", F.col("value").alias("__new")), "tile_id", "left"
        )
        .withColumn(column, F.coalesce(F.col("__new"), F.col(column)))
        .drop("__new")
    )
    # Materialize to a TEMP subtree first, then overwrite the base layer from
    # the re-read temp copy. persist()+count() is NOT a safe barrier here: if
    # a cached partition is evicted mid-write, recomputation would read the
    # half-overwritten source path (VERDICT r1 "What's wrong" #4). The temp
    # write fully severs lineage from the path being overwritten.
    tmp = os.path.join(warehouse, "tmp", f"patch_{country}_{column}")
    patched.write.mode("overwrite").parquet(tmp)
    write_view(
        spark.read.parquet(tmp), base_layer_path(warehouse), partition_cols=["country"]
    )
    # Hadoop FS delete (not shutil) so the cleanup works on any URI scheme
    jpath = spark._jvm.org.apache.hadoop.fs.Path(tmp)
    jpath.getFileSystem(spark._jsc.hadoopConfiguration()).delete(jpath, True)
    _write_admin_layer(spark, warehouse, country)
