"""Spark-side spatial join strategies (SURVEY.md §4.3).

Strategy 1 — quadkey reduction (exact for tiles, the hot join J1/J6/J7):
tiles ARE zoom-N quadkeys, so "tile intersects envelope" is an equi-join
against the envelope's quadkey cover. Covers are computed driver-side
(envelopes are ≤408 small polygons per forecast — reference
snowflake_utils.py:394-427), broadcast, and joined per prefix length, so
Catalyst sees only broadcast hash joins; the fact table never shuffles.

Strategy 2 — cover-candidates + exact verify (points): a point's zoom-N
quadkey either lands on a FULL cover tile (inside, no check needed) or a
boundary leaf (verify with the exact point-in-polygon kernel in an
Arrow-batched pandas UDF). This keeps the Python slow path to the boundary
sliver — O(perimeter), not O(area).
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from aos_spark.geo import quadkey as qklib
from aos_spark.geo import wkt as wktlib


def quadkey_expr(lat_col: str, lon_col: str, zoom: int) -> Column:
    """Closed-form lat/lon → quadkey as a pure Catalyst expression (no UDF,
    whole-stage-codegen'd): Web-Mercator tile math + digit interleave."""
    lat = F.least(F.greatest(F.col(lat_col), F.lit(-qklib.MAX_LATITUDE)), F.lit(qklib.MAX_LATITUDE))
    lon = F.least(F.greatest(F.col(lon_col), F.lit(-180.0)), F.lit(180.0))
    n = F.lit(float(1 << zoom))
    x = F.floor((lon + 180.0) / 360.0 * n).cast("int")
    sin_lat = F.sin(F.radians(lat))
    y = F.floor(
        (0.5 - F.log((1 + sin_lat) / (1 - sin_lat)) / (4.0 * 3.141592653589793)) * n
    ).cast("int")
    max_idx = F.lit((1 << zoom) - 1)
    x = F.least(x, max_idx)
    y = F.least(F.greatest(y, F.lit(0)), max_idx)
    digits = []
    for i in range(zoom, 0, -1):
        bit_x = F.shiftright(x, i - 1).bitwiseAND(F.lit(1))
        bit_y = F.shiftright(y, i - 1).bitwiseAND(F.lit(1))
        digits.append((bit_x + 2 * bit_y).cast("string"))
    return F.concat(*digits)


def with_quadkey(
    points: DataFrame,
    zoom: int,
    lat_col: str = "latitude",
    lon_col: str = "longitude",
    out_col: str = "tile_id",
) -> DataFrame:
    """J7 point→tile assignment as a closed-form expression."""
    return points.withColumn(out_col, quadkey_expr(lat_col, lon_col, zoom))


COVER_SCHEMA = T.StructType(
    [
        T.StructField("ensemble_member", T.IntegerType(), False),
        T.StructField("wind_threshold", T.IntegerType(), False),
        T.StructField("prefix", T.StringType(), False),
        T.StructField("prefix_len", T.IntegerType(), False),
        T.StructField("full", T.BooleanType(), False),
        T.StructField("envelope_wkt", T.StringType(), True),
    ]
)


def envelope_cover_df(
    spark: SparkSession,
    envelopes: DataFrame,
    zoom: int,
    *,
    member_col: str = "ensemble_member",
    threshold_col: str = "wind_threshold",
    wkt_col: str = "envelope_wkt",
    keep_wkt: bool = False,
) -> DataFrame:
    """Compute each envelope's mixed-zoom quadkey cover driver-side and
    return it as a small DataFrame (broadcast side of the hot join).

    The envelope working set is ≤51×8=408 polygons per (storm, forecast)
    (BASELINE.md) — driver-side cover computation is the right physical
    plan at any corpus scale because this side is O(storms), not O(data).
    Unparseable/NULL WKT rows are dropped, matching the reference's loader
    (snowflake_utils.py:452-478).
    """
    rows = []
    for r in envelopes.select(member_col, threshold_col, wkt_col).collect():
        polys = wktlib.polygons_of(r[wkt_col])
        for rings in polys:
            for qk, full in qklib.polygon_cover(rings, zoom):
                rows.append(
                    (
                        int(r[member_col]),
                        int(r[threshold_col]),
                        qk,
                        len(qk),
                        bool(full),
                        r[wkt_col] if keep_wkt else None,
                    )
                )
    return spark.createDataFrame(rows, COVER_SCHEMA)


def _cover_candidates(
    df: DataFrame, cover: DataFrame, qk_col: str, cover_cols: list[str]
) -> DataFrame | None:
    """Shared candidate generation for the two cover joins below: one
    broadcast equi-join per distinct prefix length, unioned. Returns None
    for an empty cover (caller supplies its own empty-schema frame).
    Factored out in r9 — the two consumers carried verbatim copies of
    this loop, and a fix to one had to be remembered in the other."""
    lens = [r["prefix_len"] for r in cover.select("prefix_len").distinct().collect()]
    parts = []
    for ln in sorted(lens):
        c = cover.filter(F.col("prefix_len") == ln).select("prefix", *cover_cols)
        p = df.withColumn("prefix", F.substring(F.col(qk_col), 1, ln))
        parts.append(p.join(F.broadcast(c), "prefix").drop("prefix"))
    if not parts:
        return None
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out


def tiles_hit_by_envelopes(
    tiles: DataFrame,
    cover: DataFrame,
    tile_col: str = "tile_id",
) -> DataFrame:
    """The hot spatial join J1 as a union of per-prefix-length broadcast
    equi-joins: tiles × cover → (tile, member, threshold) hit set.

    Exact: a zoom-N tile intersects the envelope iff its quadkey is a
    cover leaf or descends from a full-cover prefix. Each pass is a
    broadcast hash join on a computed key; the fact side never shuffles.
    A tile can match several cover rows of one member only via distinct
    prefixes of different length — dropDuplicates keeps the hit set exact.
    """
    cand = _cover_candidates(
        tiles, cover, tile_col, ["ensemble_member", "wind_threshold"]
    )
    if cand is None:
        return tiles.limit(0).withColumn("ensemble_member", F.lit(0)).withColumn(
            "wind_threshold", F.lit(0)
        )
    return cand.dropDuplicates([tile_col, "ensemble_member", "wind_threshold"])


def _point_in_wkt_verify_udf(wkt_by_key: dict):
    """Pandas UDF factory: verify (key, lon, lat) membership against the
    polygon WKT for that key. The dict is closure-captured and shipped once
    per executor (broadcast-sized: ≤408 envelopes)."""
    # antimeridian-split BEFORE the planar ray-cast (r9 review): the cover
    # splits dateline polygons, so the verifier must test the same split
    # parts — on the raw rings the planar test reads the interior as the
    # complement and rejects every inside point
    parsed = {
        k: qklib.split_polygons(wktlib.polygons_of(w))
        for k, w in wkt_by_key.items()
    }

    @F.pandas_udf(T.BooleanType())
    def verify(keys: pd.Series, lons: pd.Series, lats: pd.Series) -> pd.Series:
        out = []
        for k, x, y in zip(keys, lons, lats):
            polys = parsed.get(k)
            out.append(bool(polys) and wktlib.point_in_any_polygon(x, y, polys))
        return pd.Series(out)

    return verify


def points_hit_by_envelopes(
    points: DataFrame,
    cover: DataFrame,
    envelopes_wkt: dict,
    zoom: int,
    id_col: str = "id",
    lat_col: str = "latitude",
    lon_col: str = "longitude",
) -> DataFrame:
    """J2/J11 — point-in-envelope via cover candidates + exact boundary
    verification.

    ``envelopes_wkt``: {(member, threshold): wkt} for the boundary check.
    Points on FULL cover tiles are inside by construction; points on
    boundary leaves run the exact kernel. Python cost is proportional to
    the boundary sliver only.
    """
    from aos_spark.cache import persist_tracked

    pts = with_quadkey(points, zoom, lat_col, lon_col, "__qk")
    cand = _cover_candidates(
        pts, cover, "__qk", ["ensemble_member", "wind_threshold", "full"]
    )
    if cand is None:
        return points.limit(0).withColumn("ensemble_member", F.lit(0)).withColumn(
            "wind_threshold", F.lit(0)
        )
    # persist: the candidate frame feeds THREE consumers (the isEmpty
    # probe, the inside filter, the boundary verify) — unpersisted, each
    # re-ran the whole multi-join pipeline over the fact side (r9 review)
    cand = persist_tracked(
        cand.dropDuplicates([id_col, "ensemble_member", "wind_threshold", "full"])
    )

    inside = cand.filter(F.col("full")).drop("full", "__qk")
    boundary = cand.filter(~F.col("full"))
    if boundary.isEmpty():
        return inside.dropDuplicates([id_col, "ensemble_member", "wind_threshold"])

    verify = _point_in_wkt_verify_udf(
        {f"{m}|{t}": w for (m, t), w in envelopes_wkt.items()}
    )
    key = F.concat_ws("|", F.col("ensemble_member"), F.col("wind_threshold"))
    verified = (
        boundary.withColumn("__ok", verify(key, F.col(lon_col), F.col(lat_col)))
        .filter(F.col("__ok"))
        .drop("__ok", "full", "__qk")
    )
    return inside.unionByName(verified).dropDuplicates(
        [id_col, "ensemble_member", "wind_threshold"]
    )
