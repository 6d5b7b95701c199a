"""Golden tests for quadkey arithmetic (pure, no Spark).

Cross-checked against the public Bing Maps tile-system examples.
"""

import math

from aos_spark.geo import quadkey as qk


def test_roundtrip_xy():
    for zoom in (1, 3, 7, 14):
        for x, y in [(0, 0), (1, 0), (2**zoom - 1, 2**zoom - 1), (5 % 2**zoom, 3 % 2**zoom)]:
            key = qk.tile_xy_to_quadkey(x, y, zoom)
            assert len(key) == zoom
            assert qk.quadkey_to_tile_xy(key) == (x, y, zoom)


def test_bing_example():
    # Bing docs: tile (3, 5) at level 3 → quadkey "213"
    assert qk.tile_xy_to_quadkey(3, 5, 3) == "213"
    assert qk.quadkey_to_tile_xy("213") == (3, 5, 3)


def test_point_to_quadkey_quadrants():
    # zoom 1: quadrants — NW=0, NE=1, SW=2, SE=3
    assert qk.point_to_quadkey(40, -100, 1) == "0"
    assert qk.point_to_quadkey(40, 100, 1) == "1"
    assert qk.point_to_quadkey(-40, -100, 1) == "2"
    assert qk.point_to_quadkey(-40, 100, 1) == "3"


def test_bbox_contains_center_and_roundtrips():
    for lat, lon in [(40.7128, -74.0060), (-33.86, 151.21), (0.01, 0.01)]:
        key = qk.point_to_quadkey(lat, lon, 14)
        w, s, e, n = qk.quadkey_to_bbox(key)
        assert w <= lon <= e and s <= lat <= n
        clat, clon = qk.quadkey_center(key)
        assert qk.point_to_quadkey(clat, clon, 14) == key


def test_children_partition_parent():
    w, s, e, n = qk.quadkey_to_bbox("21")
    kids = qk.children("21")
    boxes = [qk.quadkey_to_bbox(k) for k in kids]
    assert math.isclose(min(b[0] for b in boxes), w)
    assert math.isclose(max(b[2] for b in boxes), e)
    assert math.isclose(min(b[1] for b in boxes), s, abs_tol=1e-9)
    assert math.isclose(max(b[3] for b in boxes), n, abs_tol=1e-9)


def test_polygon_cover_exactness():
    """Cover of a rect == set of tiles whose bbox intersects the rect."""
    zoom = 10
    poly = [[(10.0, 10.0), (12.0, 10.0), (12.0, 12.0), (10.0, 12.0)]]
    cover = set(qk.expand_cover(qk.polygon_cover(poly, zoom), zoom))
    # brute force over the tile range
    x0, y1 = qk.point_to_tile_xy(10.0, 10.0, zoom)
    x1, y0 = qk.point_to_tile_xy(12.0, 12.0, zoom)
    brute = set()
    for x in range(x0, x1 + 1):
        for y in range(y0, y1 + 1):
            brute.add(qk.tile_xy_to_quadkey(x, y, zoom))
    assert cover == brute


def test_polygon_cover_mixed_zoom_is_smaller():
    zoom = 12
    poly = [[(10.0, 10.0), (14.0, 10.0), (14.0, 14.0), (10.0, 14.0)]]
    mixed = qk.polygon_cover(poly, zoom)
    leaves = qk.expand_cover(mixed, zoom)
    assert len(mixed) < len(leaves)  # interior collapsed to prefixes
    assert all(len(k) <= zoom for k in mixed)


def test_antimeridian_crossing_cover():
    """A box crossing the dateline (175°E → 175°W) must cover tiles on both
    sides of the seam and nothing in the mid-Pacific gap or Greenwich side."""
    from aos_spark.geo.quadkey import expand_cover, point_to_quadkey, polygon_cover

    ring = [(175.0, -10.0), (-175.0, -10.0), (-175.0, 10.0), (175.0, 10.0), (175.0, -10.0)]
    cover = polygon_cover([ring], zoom=6)
    leaves = set(expand_cover(cover, 6))
    assert point_to_quadkey(0.0, 179.0, 6) in leaves      # west of seam
    assert point_to_quadkey(0.0, -179.0, 6) in leaves     # east of seam
    assert point_to_quadkey(0.0, 0.0, 6) not in leaves    # Greenwich
    assert point_to_quadkey(0.0, 150.0, 6) not in leaves  # outside west edge
    assert point_to_quadkey(0.0, -150.0, 6) not in leaves # outside east edge


def test_non_crossing_polygon_not_split():
    from aos_spark.geo.quadkey import split_antimeridian

    ring = [(-10.0, -10.0), (10.0, -10.0), (10.0, 10.0), (-10.0, 10.0), (-10.0, -10.0)]
    assert len(split_antimeridian([ring])) == 1
