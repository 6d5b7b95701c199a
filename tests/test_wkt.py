"""Tests for the dependency-free WKT/geometry kernel."""

import math

from aos_spark.geo import wkt as W


SQUARE = "POLYGON ((0 0, 10 0, 10 10, 0 10, 0 0))"
DONUT = "POLYGON ((0 0, 10 0, 10 10, 0 10, 0 0), (4 4, 6 4, 6 6, 4 6, 4 4))"
MULTI = "MULTIPOLYGON (((0 0, 2 0, 2 2, 0 2, 0 0)), ((5 5, 7 5, 7 7, 5 7, 5 5)))"


def test_parse_point_linestring():
    assert W.parse_wkt("POINT (3.5 -2)") == ("POINT", (3.5, -2.0))
    kind, pts = W.parse_wkt("LINESTRING (0 0, 1 1, 2 0)")
    assert kind == "LINESTRING" and len(pts) == 3


def test_parse_polygon_and_roundtrip():
    kind, rings = W.parse_wkt(SQUARE)
    assert kind == "POLYGON" and len(rings) == 1 and len(rings[0]) == 5
    assert W.polygons_of(W.polygon_to_wkt(rings)) == [rings]


def test_parse_invalid_returns_none():
    assert W.parse_wkt(None) is None
    assert W.parse_wkt("") is None
    assert W.parse_wkt("POLYGON EMPTY") is None
    assert W.parse_wkt("garbage (1 2)") is None
    assert W.parse_wkt("POLYGON ((a b))") is None


def test_point_in_polygon_with_hole():
    rings = W.polygons_of(DONUT)[0]
    assert W.point_in_polygon(2, 2, rings)
    assert not W.point_in_polygon(5, 5, rings)  # in the hole
    assert not W.point_in_polygon(11, 5, rings)


def test_multipolygon_membership():
    polys = W.polygons_of(MULTI)
    assert W.point_in_any_polygon(1, 1, polys)
    assert W.point_in_any_polygon(6, 6, polys)
    assert not W.point_in_any_polygon(3, 3, polys)


def test_segment_intersects_polygon():
    rings = W.polygons_of(SQUARE)[0]
    assert W.segment_intersects_polygon((-5, 5), (15, 5), rings)  # crosses
    assert W.segment_intersects_polygon((5, 5), (20, 20), rings)  # endpoint inside
    assert not W.segment_intersects_polygon((-5, -5), (-1, 15), rings)


def test_areas_and_clip():
    rings = W.polygons_of(DONUT)[0]
    assert math.isclose(W.polygon_area(rings), 100 - 4)
    # clip square by a rect covering its right half
    full = W.polygons_of(SQUARE)[0]
    assert math.isclose(W.rect_clip_area((5, 0, 15, 10), full), 50.0)
    # clip donut by rect containing the hole
    assert math.isclose(W.rect_clip_area((3, 3, 7, 7), rings), 16 - 4)
    assert W.rect_clip_area((20, 20, 30, 30), full) == 0.0


def test_rect_polygon_relation():
    rings = W.polygons_of(SQUARE)[0]
    assert W.rect_polygon_relation((2, 2, 4, 4), rings) == "within"
    assert W.rect_polygon_relation((-5, -5, -1, -1), rings) == "disjoint"
    assert W.rect_polygon_relation((8, 8, 12, 12), rings) == "intersects"
    # rect fully containing the polygon
    assert W.rect_polygon_relation((-5, -5, 15, 15), rings) == "intersects"
    # rect inside the donut hole is NOT within
    donut = W.polygons_of(DONUT)[0]
    assert W.rect_polygon_relation((4.5, 4.5, 5.5, 5.5), donut) == "disjoint"


def test_haversine():
    # equator degree ≈ 111.19 km
    assert abs(W.haversine_m(0, 0, 0, 1) - 111_195) < 200
    assert W.point_polygon_distance_m(5, 5, W.polygons_of(SQUARE)[0]) == 0.0
    d = W.point_polygon_distance_m(0, 20, W.polygons_of(SQUARE)[0])
    assert abs(d - W.haversine_m(0, 20, 0, 10)) < 5_000


def test_bbox_min_gc_distance_exact_cases():
    # overlapping boxes → 0
    assert W.bbox_min_gc_distance_m((0, 10, 0, 10), (5, 15, 5, 15)) == 0.0
    # pure meridional gap: 10° of latitude
    d = W.bbox_min_gc_distance_m((0, 10, 0, 10), (5, 15, 20, 30))
    assert abs(d - W.haversine_m(10, 5, 20, 5)) < 1.0
    # same-latitude separation at 60°N: true geodesic, not the parallel arc
    d = W.bbox_min_gc_distance_m((-1, 0, 60, 60), (90, 91, 60, 60))
    assert abs(d - W.haversine_m(60, 0, 60, 90)) < 1.0


def test_bbox_min_gc_distance_never_exceeds_sampled(subtests=None):
    """Conservative-pre-filter property (VERDICT r1 #10): the box distance
    must never exceed the distance between ANY sampled point pair — so a
    keep-if-within-radius filter can never reject a zone whose exact
    geometry is in range."""
    import itertools
    import random

    rng = random.Random(42)
    for _ in range(40):
        b1 = _rand_box(rng)
        b2 = _rand_box(rng)
        dmin = W.bbox_min_gc_distance_m(b1, b2)
        sampled = min(
            W.haversine_m(p1[1], p1[0], p2[1], p2[0])
            for p1, p2 in itertools.product(_grid(b1), _grid(b2))
        )
        assert dmin <= sampled + 1e-6, (b1, b2, dmin, sampled)


def _rand_box(rng):
    x = rng.uniform(-170, 160)
    y = rng.uniform(-80, 70)
    return (x, x + rng.uniform(0.1, 10), y, y + rng.uniform(0.1, 10))


def _grid(box, n=7):
    xmin, xmax, ymin, ymax = box
    return [
        (xmin + (xmax - xmin) * i / (n - 1), ymin + (ymax - ymin) * j / (n - 1))
        for i in range(n)
        for j in range(n)
    ]
