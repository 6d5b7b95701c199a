"""J3→J4→J5 zone assignment — incl. the exact-polygon tier (J4 parity with
gpd.overlay, reference impact_analysis.py:1034-1047).

Golden fixture: a triangular admin zone whose BBOX overlaps an item box
that the TRUE polygon does not touch. The bbox-only path misassigns it;
the exact rect×polygon clip-area path fixes it.
"""

from pyspark.sql import functions as F

from aos_spark.ops.spatial_assign import assign_zones_3step

# zone 1: triangle (0,0)-(10,0)-(0,10); its bbox is [0,10]×[0,10]
# zone 2: true rectangle [8,12]×[8,12]
TRI_WKT = "POLYGON ((0 0, 10 0, 0 10, 0 0))"
ZONES = [
    (1, 0.0, 10.0, 0.0, 10.0),
    (2, 8.0, 12.0, 8.0, 12.0),
]


def _zones(spark):
    return spark.createDataFrame(
        ZONES, "zone_id INT, xmin DOUBLE, xmax DOUBLE, ymin DOUBLE, ymax DOUBLE"
    )


def _item(spark, cx, cy, half):
    return spark.createDataFrame(
        [(1, cx, cy, cx - half, cx + half, cy - half, cy + half)],
        "item_id INT, cx DOUBLE, cy DOUBLE, bxmin DOUBLE, bxmax DOUBLE,"
        " bymin DOUBLE, bymax DOUBLE",
    )


def test_bbox_path_misassigns_boundary_tile(spark):
    # box [5.5,9.5]² sits inside the triangle's BBOX (overlap 16) but every
    # corner has x+y > 10, so the true triangle misses it entirely; the real
    # overlap is with zone 2 (area 2.25). Center (7.5,7.5) is within the
    # triangle's bbox → the bbox path even takes the 'center' step.
    item = _item(spark, 7.5, 7.5, 2.0)
    got = assign_zones_3step(item, _zones(spark)).first()
    assert got["zone_id"] == 1  # the documented bbox-tier limitation


def test_exact_path_fixes_boundary_tile(spark):
    item = _item(spark, 7.5, 7.5, 2.0)
    got = assign_zones_3step(item, _zones(spark), zone_wkt={1: TRI_WKT}).first()
    assert got["zone_id"] == 2
    assert got["method"] == "overlap"


def test_exact_path_center_within_polygon(spark):
    # center (2,2) is inside the triangle proper → 'center' via exact test
    item = _item(spark, 2.0, 2.0, 1.0)
    got = assign_zones_3step(item, _zones(spark), zone_wkt={1: TRI_WKT}).first()
    assert got["zone_id"] == 1
    assert got["method"] == "center"


def test_exact_path_matches_bbox_for_rectangles(spark):
    # zones without a WKT entry must behave identically to the bbox tier
    items = spark.createDataFrame(
        [
            (i, float(x), float(y), x - 1.0, x + 1.0, y - 1.0, y + 1.0)
            for i, (x, y) in enumerate([(9, 9), (11, 11), (50, 50), (0, 12)])
        ],
        "item_id INT, cx DOUBLE, cy DOUBLE, bxmin DOUBLE, bxmax DOUBLE,"
        " bymin DOUBLE, bymax DOUBLE",
    )
    rect_only = {
        r["item_id"]: (r["zone_id"], r["method"])
        for r in assign_zones_3step(items, _zones(spark)).collect()
    }
    with_wkt_rect = {
        r["item_id"]: (r["zone_id"], r["method"])
        for r in assign_zones_3step(
            items,
            _zones(spark),
            zone_wkt={2: "POLYGON ((8 8, 12 8, 12 12, 8 12, 8 8))"},
        ).collect()
    }
    assert rect_only == with_wkt_rect


def test_exact_clip_area_ranks_between_polygon_zones(spark):
    # two polygon zones overlapping the same box: the one with the larger
    # TRUE clip area must win even when its bbox overlap is smaller
    zones = spark.createDataFrame(
        [(1, 0.0, 20.0, 0.0, 20.0), (2, 4.0, 8.0, 4.0, 8.0)],
        "zone_id INT, xmin DOUBLE, xmax DOUBLE, ymin DOUBLE, ymax DOUBLE",
    )
    # zone 1: thin diagonal sliver triangle; zone 2: solid square
    wkt = {
        1: "POLYGON ((0 0, 20 0, 0 1, 0 0))",
        2: "POLYGON ((4 4, 8 4, 8 8, 4 8, 4 4))",
    }
    item = _item(spark, 6.0, 6.0, 2.0)  # box [4,8]²; center inside zone 2
    # suppress the center step by moving the center outside both polygons
    item = item.withColumn("cx", F.lit(3.0)).withColumn("cy", F.lit(9.0))
    got = assign_zones_3step(item, zones, zone_wkt=wkt).first()
    assert got["zone_id"] == 2
    assert got["method"] == "overlap"
