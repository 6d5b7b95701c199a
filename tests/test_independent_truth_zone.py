"""Independent-truth checks, wave 13: the spatial storm family — the
covered equi-join, point-in-zone counting with the circular buffer,
facility ensemble probability, the 3-step zone assignment cascade
(center → overlap → nearest), empty-region-preserving rollup, first
landfall, and raster zonal aggregation.

Replication contract as in waves 1–12: the zone/envelope geometry is
pure arithmetic over synthetic coordinates, recomputed with Python
loops — squared point-to-box distances, rectangle intersection areas,
centroid distances — and every tie broken exactly as the definitions
specify (zone_id ascending).
"""

from __future__ import annotations

import math
from collections import Counter, defaultdict
from decimal import ROUND_HALF_UP, Decimal

import pandas as pd
import pytest

from aos_spark.queries import QUERIES

FMT = "%Y-%m-%d %H:%M:%S"
ZONES = [
    (1, 0.0, 3000.0, 0.0, 500.0),
    (2, 2500.0, 6000.0, 0.0, 500.0),
    (3, 0.0, 3000.0, 500.0, 1000.0),
    (4, 3000.0, 6000.0, 400.0, 1000.0),
    (5, 8000.0, 9000.0, 0.0, 300.0),
]


def _close(a, b, rel=1e-9, abs_=1e-9):
    assert math.isclose(a, b, rel_tol=rel, abs_tol=abs_), (a, b)


def _q(v: float, scale: int) -> Decimal:
    return Decimal(repr(float(v))).quantize(
        Decimal(1).scaleb(-scale), ROUND_HALF_UP
    )


def _box_dist_sq(x, y, xmin, xmax, ymin, ymax):
    dx = max(xmin - x, x - xmax, 0.0)
    dy = max(ymin - y, y - ymax, 0.0)
    return dx * dx + dy * dy


@pytest.fixture(scope="module")
def customer(sf_dir):
    return pd.read_parquet(f"{sf_dir}/customer.parquet")


@pytest.fixture(scope="module")
def events(sf_dir):
    return pd.read_parquet(f"{sf_dir}/events.parquet")


def test_j1_cover_equi_join(spark, sf_dir):
    li = pd.read_parquet(f"{sf_dir}/lineitem.parquet")
    p = pd.read_parquet(f"{sf_dir}/part.parquet")
    j = li.merge(p[p["p_size"] < 10], left_on="l_partkey", right_on="p_partkey")
    expect = {}
    for brand, g in j.groupby("p_brand"):
        expect[brand] = (
            len(g),
            float(sum((_q(v, 2) for v in g["l_quantity"]), Decimal(0))),
        )
    got = {
        r["p_brand"]: (r["n_lines"], r["sum_qty"])
        for r in QUERIES["j1_cover_equi_join"](spark, sf_dir).collect()
    }
    assert set(got) == set(expect) and expect
    for k, (n, s) in expect.items():
        assert got[k][0] == n, k
        _close(got[k][1], s)


def test_j2_point_zone_count(spark, sf_dir, customer):
    expect = {}
    for r in customer.itertuples():
        x, y = r.c_acctbal, (r.c_custkey % 97) * 10.0
        n = sum(
            1 for _z, xmin, xmax, ymin, ymax in ZONES
            if _box_dist_sq(x, y, xmin, xmax, ymin, ymax) <= 2500.0
        )
        expect[r.c_custkey] = n
    got = {
        r["item_id"]: r["n_zones"]
        for r in QUERIES["j2_point_zone_count"](spark, sf_dir).collect()
    }
    assert got == expect
    assert any(v > 1 for v in expect.values()), "degenerate: no overlaps"


def test_j2_facility_probability(spark, sf_dir, customer, events):
    envs = {}
    for th in (50, 100, 150):
        hits = events[events["value"] >= th]
        for member, g in hits.groupby("event_type"):
            tiles = set(g["user_id"])
            xs = [(t * 7) % 6000 for t in tiles]
            ys = [(t % 97) * 10 for t in tiles]
            envs[(member, th)] = (
                min(x - 50 for x in xs), max(x + 50 for x in xs),
                min(y - 50 for y in ys), max(y + 50 for y in ys),
            )
    kinds = ("schools", "health_centers", "shelters", "wash")
    expect = {}
    for r in customer.itertuples():
        fx, fy = (r.c_custkey * 131) % 6000, (r.c_custkey * 17) % 970
        for th in (50, 100, 150):
            n = sum(
                1 for (member, t), (xmin, xmax, ymin, ymax) in envs.items()
                if t == th
                and _box_dist_sq(fx, fy, xmin, xmax, ymin, ymax) <= 4
            )
            expect[(r.c_custkey, th)] = (kinds[r.c_custkey % 4], n / 8.0)
    got = {
        (r["facility_id"], r["wind_threshold"]): (r["kind"], r["probability"])
        for r in QUERIES["j2_facility_probability"](spark, sf_dir).collect()
    }
    assert got == expect
    assert any(v[1] > 0 for v in expect.values()), "degenerate: no hits"


def test_j3_j5_zone_assignment(spark, sf_dir, customer):
    expect = {}
    for r in customer.itertuples():
        cx, cy = r.c_acctbal, (r.c_custkey % 97) * 10.0
        inside = [
            z for z, xmin, xmax, ymin, ymax in ZONES
            if xmin <= cx <= xmax and ymin <= cy <= ymax
        ]
        if inside:
            expect[r.c_custkey] = (min(inside), "center")
            continue
        bxmin, bxmax = cx - 50.0, cx + 50.0
        bymin, bymax = cy - 50.0, cy + 50.0
        areas = []
        for z, xmin, xmax, ymin, ymax in ZONES:
            area = max(min(bxmax, xmax) - max(bxmin, xmin), 0.0) * max(
                min(bymax, ymax) - max(bymin, ymin), 0.0
            )
            if area > 0:
                areas.append((-area, z))
        if areas:
            areas.sort()
            expect[r.c_custkey] = (areas[0][1], "overlap")
            continue
        near = sorted(
            (
                (cx - (xmin + xmax) / 2) ** 2 + (cy - (ymin + ymax) / 2) ** 2,
                z,
            )
            for z, xmin, xmax, ymin, ymax in ZONES
        )
        expect[r.c_custkey] = (near[0][1], "nearest")
    got = {
        r["item_id"]: (r["zone_id"], r["method"])
        for r in QUERIES["j3_j5_zone_assignment"](spark, sf_dir).collect()
    }
    assert got == expect
    assert {m for _z, m in expect.values()} == {"center", "overlap", "nearest"}


def test_j9_preserve_empty_regions(spark, sf_dir, customer):
    n = pd.read_parquet(f"{sf_dir}/nation.parquet")
    rich = customer[customer["c_acctbal"] > 9000]
    agg = {}
    for nk, g in rich.groupby("c_nationkey"):
        micro = int(sum((_q(v, 2) for v in g["c_acctbal"]), Decimal(0)) * 1_000_000)
        cnt = len(g)
        agg[nk] = (float(cnt), ((micro * 2 + cnt) // (2 * cnt)) / 1e6)
    expect = {}
    for r in n.itertuples():
        if r.n_nationkey in agg:
            cnt, avg = agg[r.n_nationkey]
            expect[r.n_name] = (cnt, float(_q(avg, 6)))
        else:
            expect[r.n_name] = (0.0, None)
    got = {
        r["n_name"]: (r["n_rich"], r["avg_bal"])
        for r in QUERIES["j9_preserve_empty_regions"](spark, sf_dir).collect()
    }
    assert set(got) == set(expect)
    for k, (cnt, avg) in expect.items():
        assert got[k][0] == cnt, k
        if avg is None:
            assert got[k][1] is None, k
        else:
            _close(got[k][1], avg)


def test_w2_first_landfall(spark, sf_dir, events):
    firsts = {}
    for r in events[events["value"] > 147].itertuples():
        key = (r.ts, r.event_id)
        if r.user_id not in firsts or key < firsts[r.user_id]:
            firsts[r.user_id] = key
    expect = {
        u: (ts.strftime(FMT), eid) for u, (ts, eid) in firsts.items()
    }
    got = {
        r["user_id"]: (r["first_ts"], r["first_event"])
        for r in QUERIES["w2_first_landfall"](spark, sf_dir).collect()
    }
    assert got == expect and expect


def test_s17_raster_zonal(spark, sf_dir):
    region = pd.read_parquet(f"{sf_dir}/region.parquet")
    acc: dict[tuple, list] = defaultdict(lambda: [0.0, 0])
    for rid in region["r_regionkey"]:
        rid = int(rid)
        for pos in range(256):
            value = float((rid * 997 + pos * 131) % 100)
            lon = (-30.0 + rid * 15.0) + ((pos % 16) + 0.5) * 0.1
            lat = (20.0 - rid * 7.0) - (math.floor(pos / 16.0) + 0.5) * 0.1
            tx = math.floor((lon + 180.0) / 360.0 * 64.0)
            ty = math.floor((90.0 - lat) / 180.0 * 64.0)
            acc[(tx, ty)][0] += value
            acc[(tx, ty)][1] += 1
    got = {
        (r["tile_x"], r["tile_y"]): (r["total_value"], r["n_cells"])
        for r in QUERIES["s17_raster_zonal"](spark, sf_dir).collect()
    }
    assert set(got) == set(acc)
    for k, (tv, n) in acc.items():
        assert got[k][1] == n, k
        _close(got[k][0], tv, rel=1e-12, abs_=1e-9)
