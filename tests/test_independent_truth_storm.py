"""Independent-truth checks, wave 10: the storm-domain relational
queries (scan/filter/join/window/aggregate shapes S1/S6, F4/F5/F11,
J10/J13, W1/W5/W6, A5–A10/A14) plus the scalar-function sweep and the
SMOD recode map.

Replication contract as in waves 1–9: pandas groupbys and dict walks,
timestamps formatted with strftime, decimals via repr-HALF_UP
quantization, the scalar battery recomputed with Python datetime/re.
"""

from __future__ import annotations

import math
import re
from collections import Counter, defaultdict
from decimal import ROUND_HALF_UP, Decimal

import pandas as pd
import pytest

from aos_spark.queries import QUERIES

FMT = "%Y-%m-%d %H:%M:%S"


def _close(a, b, rel=1e-9, abs_=1e-9):
    assert math.isclose(a, b, rel_tol=rel, abs_tol=abs_), (a, b)


def _q(v: float, scale: int) -> Decimal:
    return Decimal(repr(float(v))).quantize(
        Decimal(1).scaleb(-scale), ROUND_HALF_UP
    )


@pytest.fixture(scope="module")
def events(sf_dir):
    return pd.read_parquet(f"{sf_dir}/events.parquet")


@pytest.fixture(scope="module")
def orders(sf_dir):
    return pd.read_parquet(f"{sf_dir}/orders.parquet")


@pytest.fixture(scope="module")
def lineitem(sf_dir):
    return pd.read_parquet(f"{sf_dir}/lineitem.parquet")


def test_s1_catalog_scan(spark, sf_dir, events):
    expect = {
        t: (g["user_id"].nunique(), len(g), g["ts"].max().strftime(FMT))
        for t, g in events.groupby("event_type")
    }
    got = {
        r["event_type"]: (r["n_members"], r["n_rows"], r["latest_ts"])
        for r in QUERIES["s1_catalog_scan"](spark, sf_dir).collect()
    }
    assert got == expect


def test_s6_distinct_ordered(spark, sf_dir, events):
    expect = {
        t: i + 1 for i, t in enumerate(sorted(events["event_type"].unique()))
    }
    got = {
        r["event_type"]: r["ord"]
        for r in QUERIES["s6_distinct_ordered"](spark, sf_dir).collect()
    }
    assert got == expect


def test_f4_recency_filter(spark, sf_dir, events):
    cut = pd.Timestamp("2024-01-20").date()
    recent = events[[(cut - ts.date()).days < 7 for ts in events["ts"]]]
    expect = dict(Counter(recent["event_type"]))
    got = {
        r["event_type"]: r["n_recent"]
        for r in QUERIES["f4_recency_filter"](spark, sf_dir).collect()
    }
    assert got == expect


def test_f5_isin_or_filter(spark, sf_dir, orders):
    m = orders[
        (orders["o_orderstatus"] == "F")
        | (orders["o_orderpriority"].isin(["1-URGENT", "2-HIGH"]))
    ]
    expect = {}
    for (s, p), g in m.groupby(["o_orderstatus", "o_orderpriority"]):
        expect[(s, p)] = (
            len(g),
            float(sum((_q(v, 2) for v in g["o_totalprice"]), Decimal(0))),
        )
    got = {
        (r["o_orderstatus"], r["o_orderpriority"]): (r["n_orders"], r["total_value"])
        for r in QUERIES["f5_isin_or_filter"](spark, sf_dir).collect()
    }
    assert set(got) == set(expect)
    for k, (n, tv) in expect.items():
        assert got[k][0] == n, k
        _close(got[k][1], tv)


def test_f11_antijoin_new_work(spark, sf_dir, orders):
    c = pd.read_parquet(f"{sf_dir}/customer.parquet")
    n = pd.read_parquet(f"{sf_dir}/nation.parquet")
    nm = dict(zip(n["n_nationkey"], n["n_name"]))
    busy = set(orders.loc[orders["o_orderstatus"] == "F", "o_custkey"])
    idle = c[~c["c_custkey"].isin(busy)]
    expect = dict(Counter(nm[k] for k in idle["c_nationkey"]))
    got = {
        r["n_name"]: r["n_idle_customers"]
        for r in QUERIES["f11_antijoin_new_work"](spark, sf_dir).collect()
    }
    assert got == expect and expect


def test_j10_lookup_join(spark, sf_dir):
    c = pd.read_parquet(f"{sf_dir}/customer.parquet")
    n = pd.read_parquet(f"{sf_dir}/nation.parquet")
    rg = pd.read_parquet(f"{sf_dir}/region.parquet")
    nm = {r.n_nationkey: (r.n_name, r.n_regionkey) for r in n.itertuples()}
    rm = dict(zip(rg["r_regionkey"], rg["r_name"]))
    counts: Counter = Counter()
    for r in c[c["c_acctbal"] > 5000].itertuples():
        n_name, rk = nm[r.c_nationkey]
        counts[(rm[rk], n_name)] += 1
    got = {
        (r["r_name"], r["n_name"]): r["n_customers"]
        for r in QUERIES["j10_lookup_join"](spark, sf_dir).collect()
    }
    assert got == dict(counts) and counts


def test_j13_prev_forecast_delta(spark, sf_dir, events):
    daily: dict[tuple, Decimal] = defaultdict(Decimal)
    for r in events.itertuples():
        daily[(r.user_id, r.ts.date())] += _q(r.value, 2)
    expect = {}
    for (user, day), v in daily.items():
        prev = daily.get((user, day - pd.Timedelta(days=1).to_pytimedelta()))
        if prev is not None:
            expect[(user, str(day))] = float(
                _q(float(v) - float(prev), 6)
            )
    got = {
        (r["user_id"], r["day"]): r["delta"]
        for r in QUERIES["j13_prev_forecast_delta"](spark, sf_dir).collect()
    }
    assert set(got) == set(expect) and expect
    for k in expect:
        _close(got[k], expect[k])


def test_w1_track_segments(spark, sf_dir, events):
    expect = {}
    for _user, g in events.sort_values("event_id").groupby("user_id"):
        rows = list(g.itertuples())
        for cur, nxt in zip(rows, rows[1:]):
            # date_diff('second') counts boundary CROSSINGS: floor each
            # epoch to seconds, then subtract (not floor-of-difference)
            gap = (nxt.ts.value // 1_000_000_000) - (cur.ts.value // 1_000_000_000)
            expect[cur.event_id] = (cur.user_id, cur.value, nxt.value, gap)
    got = {
        r["event_id"]: (r["user_id"], r["value"], r["value_next"], r["gap_seconds"])
        for r in QUERIES["w1_track_segments"](spark, sf_dir).collect()
    }
    assert got == expect and expect


def test_w5_dedup_keep_first(spark, sf_dir, lineitem):
    expect = {}
    for ok, g in lineitem.groupby("l_orderkey"):
        first = min(
            (r.l_linenumber, r.l_partkey, r.l_quantity) for r in g.itertuples()
        )
        expect[ok] = (first[1], first[2])
    got = {
        r["l_orderkey"]: (r["l_partkey"], r["l_quantity"])
        for r in QUERIES["w5_dedup_keep_first"](spark, sf_dir).collect()
    }
    assert got == expect


def test_w6_argmax_per_group(spark, sf_dir, orders):
    expect = {}
    for ck, g in orders.groupby("o_custkey"):
        top = max((r.o_totalprice, r.o_orderkey) for r in g.itertuples())
        expect[ck] = (top[1], top[0])
    got = {
        r["o_custkey"]: (r["o_orderkey"], r["o_totalprice"])
        for r in QUERIES["w6_argmax_per_group"](spark, sf_dir).collect()
    }
    assert got == expect


def test_a5_member_severity(spark, sf_dir, events):
    acc: dict[tuple, list] = defaultdict(lambda: [Decimal(0), 0])
    for r in events.itertuples():
        acc[(r.user_id, r.event_type)][0] += _q(r.value, 2)
        acc[(r.user_id, r.event_type)][1] += 1
    got = {
        (r["member"], r["threshold"]): (r["total_exposure"], r["n_zones"])
        for r in QUERIES["a5_member_severity"](spark, sf_dir).collect()
    }
    assert set(got) == set(acc)
    for k, (s, n) in acc.items():
        assert got[k][1] == n, k
        _close(got[k][0], float(s))


def test_a6_report_totals(spark, sf_dir, lineitem):
    expect = {}
    for flag, g in lineitem.groupby("l_returnflag"):
        qty = float(sum((_q(v, 2) for v in g["l_quantity"]), Decimal(0)))
        deep = [
            _q(r.l_extendedprice, 2)
            for r in g.itertuples() if r.l_discount > 0.09
        ]
        expect[flag] = (
            math.ceil(qty),
            float(sum(deep, Decimal(0))) if deep else None,
        )
    got = {
        r["l_returnflag"]: (r["total_qty_ceil"], r["deep_discount_value"])
        for r in QUERIES["a6_report_totals"](spark, sf_dir).collect()
    }
    assert set(got) == set(expect)
    for k, (qc, dd) in expect.items():
        assert got[k][0] == qc, k
        if dd is None:
            assert got[k][1] is None, k
        else:
            _close(got[k][1], dd)


def test_a7_vulnerability_bands(spark, sf_dir):
    c = pd.read_parquet(f"{sf_dir}/customer.parquet")
    acc: dict[str, Decimal] = defaultdict(Decimal)
    for r in c.itertuples():
        band = (
            "severe" if r.c_acctbal < 0
            else ("vulnerable" if r.c_acctbal < 1000 else "stable")
        )
        acc[band] += _q(r.c_acctbal, 2)
    got = {
        r["band"]: r["band_balance"]
        for r in QUERIES["a7_vulnerability_bands"](spark, sf_dir).collect()
    }
    assert set(got) == set(acc)
    for k, v in acc.items():
        _close(got[k], float(v))


def test_a8_topk_per_group(spark, sf_dir, orders):
    expect = {}
    for pri, g in orders.groupby("o_orderpriority"):
        rows = sorted(
            ((-r.o_totalprice, r.o_orderkey) for r in g.itertuples())
        )
        for rank, (ntp, ok) in enumerate(rows[:5], 1):
            expect[(pri, rank)] = (ok, -ntp)
    got = {
        (r["o_orderpriority"], r["rank_in_group"]):
            (r["o_orderkey"], r["o_totalprice"])
        for r in QUERIES["a8_topk_per_group"](spark, sf_dir).collect()
    }
    assert got == expect


def test_a9_max_active_threshold(spark, sf_dir, lineitem):
    sig: dict[tuple, float] = defaultdict(float)
    for r in lineitem.itertuples():
        if r.l_discount > 0.08:
            sig[(r.l_returnflag, r.l_linenumber)] += r.l_quantity
    expect: dict[str, int] = {}
    for (flag, ln), s in sig.items():
        if s > 0:
            expect[flag] = max(expect.get(flag, 0), ln)
    got = {
        r["l_returnflag"]: r["max_threshold"]
        for r in QUERIES["a9_max_active_threshold"](spark, sf_dir).collect()
    }
    assert got == expect and expect


def test_a10_first_match_stats(spark, sf_dir, events):
    err = events[events["event_type"] == "error"]
    firsts = {}
    for r in err.itertuples():
        key = (r.ts, r.event_id)
        if r.user_id not in firsts or key < firsts[r.user_id]:
            firsts[r.user_id] = key
    ts_list = [k[0] for k in firsts.values()]
    got = QUERIES["a10_first_match_stats"](spark, sf_dir).collect()[0]
    assert got["n_members_hit"] == len(firsts)
    assert got["earliest"] == min(ts_list).strftime(FMT)
    assert got["latest"] == max(ts_list).strftime(FMT)


def test_a14_value_counts(spark, sf_dir, orders):
    expect = dict(Counter(orders["o_orderpriority"]))
    got = {
        r["o_orderpriority"]: r["n"]
        for r in QUERIES["a14_value_counts"](spark, sf_dir).collect()
    }
    assert got == expect


def test_scalar_functions(spark, sf_dir, events):
    ev = events[events["event_id"] < 2000]
    jun = pd.Timestamp("2024-06-01").date()
    expect = {}
    for r in ev.itertuples():
        m = re.search(r'"k":\s*(\d+)', r.props or "")
        expect[r.event_id] = (
            r.ts.strftime("%Y%m%d%H%M%S"),
            (r.ts + pd.Timedelta(hours=6)).strftime(FMT),
            (jun - r.ts.date()).days,
            int(m.group(1)) if m else None,
            f"EVT_{r.event_type}_{r.ts.strftime('%Y%m%d')}",
        )
    got = {
        r["event_id"]: (r["ts_compact"], r["ts_plus_6h"], r["days_to_jun"],
                        r["k_value"], r["file_key"])
        for r in QUERIES["scalar_functions"](spark, sf_dir).collect()
    }
    assert got == expect and expect


def test_smod_recode_map(spark, sf_dir):
    p = pd.read_parquet(f"{sf_dir}/part.parquet")
    counts: Counter = Counter()
    for s in p["p_size"]:
        cls = (
            1.0 if s in (10, 11, 12, 13)
            else (2.0 if s in (21, 22, 23) else (3.0 if s == 30 else None))
        )
        counts[cls] += 1
    got = {
        r["smod_class_l1"]: r["n_parts"]
        for r in QUERIES["smod_recode_map"](spark, sf_dir).collect()
    }
    assert got == dict(counts)
